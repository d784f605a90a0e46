"""ABR XML source (SURVEY.md xml-source, u7).

The reference walks ABR bulk-extract XML with ElementTree and a
per-field fallback chain (reference: ETL_PIPELINE_AUS/scripts/
extraction/extract_abr_xml.py:74-141). Spark-first re-expression:

- scan: Spark 4's built-in XML data source with rowTag='ABR' —
  distributed, schema-on-read, no driver-side file walk;
- fallback resolution: ``coalesce()`` chains over the nested struct
  columns (f10), entirely JVM-side — the ElementTree try/except
  ladder becomes one projection.

At 100 TB of XML the scan parallelizes per-file/per-split and the
projection is codegen; nothing here touches Python rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

ABR_ROW_TAG = "ABR"


def read_abr_xml(spark: SparkSession, path: str) -> DataFrame:
    """Scan ABR XML into nested rows (one row per <ABR> record)."""
    return spark.read.format("xml").option("rowTag", ABR_ROW_TAG).load(path)


def _opt(df: DataFrame, dotted: str) -> Column:
    """Column reference that degrades to NULL when the path is absent
    from the inferred schema (sparse XML corpora)."""
    parts = dotted.split(".")
    cur = df.schema
    for p in parts:
        names = {f.name: f.dataType for f in cur.fields} if hasattr(cur, "fields") else {}
        if p not in names:
            return F.lit(None).cast("string")
        cur = names[p]
    return F.col(dotted).cast("string")


def extract_abr_records(df: DataFrame) -> DataFrame:
    """Project nested ABR rows onto the flat 8-field record the
    reference extractor emits (extract_abr_xml.py:129-138), with the
    same fallback semantics:

    - entity_name: main non-individual name, else legal-entity
      individual name (given + family concatenated, :45-47), else null
    - entity_status / start_date from the ABN element attributes
    - state/postcode from whichever of MainEntity/LegalEntity has a
      business address (:59-72); address = "state postcode" (:134)
    """
    name_main = _opt(df, "MainEntity.NonIndividualName.NonIndividualNameText")
    given = _opt(df, "LegalEntity.IndividualName.GivenName")
    family = _opt(df, "LegalEntity.IndividualName.FamilyName")
    name_individual = F.when(
        given.isNotNull() | family.isNotNull(), F.trim(F.concat_ws(" ", given, family))
    )
    state = F.coalesce(
        _opt(df, "MainEntity.BusinessAddress.AddressDetails.State"),
        _opt(df, "LegalEntity.BusinessAddress.AddressDetails.State"),
    )
    postcode = F.coalesce(
        _opt(df, "MainEntity.BusinessAddress.AddressDetails.Postcode"),
        _opt(df, "LegalEntity.BusinessAddress.AddressDetails.Postcode"),
    )
    return df.select(
        _opt(df, "ABN._VALUE").alias("abn"),
        F.coalesce(name_main, name_individual).alias("entity_name"),
        _opt(df, "EntityType.EntityTypeText").alias("entity_type"),
        _opt(df, "ABN._status").alias("entity_status"),
        F.concat_ws(" ", state, postcode).alias("address"),
        postcode.alias("postcode"),
        state.alias("state"),
        F.to_date(_opt(df, "ABN._ABNStatusFromDate"), "yyyyMMdd").alias("start_date"),
    )
