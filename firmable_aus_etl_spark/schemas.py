"""Schema registry (SURVEY.md §1.3).

Two families:

A. Driver testdata tables (/root/testdata/sf*/<name>.parquet) — declared
   here so reads are strict (``spark.read.schema(...)``) instead of
   relying on inference; at 100 TB a schema-inference pass over parquet
   footers is wasted work and inference drift is a correctness hazard.

B. Reference-domain tables, re-expressed from the reference's DDL
   (reference: ETL_PIPELINE_AUS/sql/schema_postgres.sql:22-91) for the
   cleaning/matching/audit operators' unit fixtures.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _st(*fields: tuple[str, object]) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


# --- A. driver testdata tables (FIXTURES.md §A) -------------------------

TESTDATA_SCHEMAS: dict[str, StructType] = {
    "region": _st(("r_regionkey", IntegerType()), ("r_name", StringType())),
    "nation": _st(
        ("n_nationkey", IntegerType()),
        ("n_name", StringType()),
        ("n_regionkey", IntegerType()),
    ),
    "customer": _st(
        ("c_custkey", LongType()),
        ("c_name", StringType()),
        ("c_nationkey", IntegerType()),
        ("c_acctbal", DoubleType()),
        ("c_mktsegment", StringType()),
    ),
    "supplier": _st(
        ("s_suppkey", LongType()),
        ("s_name", StringType()),
        ("s_nationkey", IntegerType()),
        ("s_acctbal", DoubleType()),
    ),
    "part": _st(
        ("p_partkey", LongType()),
        ("p_name", StringType()),
        ("p_brand", StringType()),
        ("p_type", StringType()),
        ("p_size", IntegerType()),
        ("p_retailprice", DoubleType()),
    ),
    "orders": _st(
        ("o_orderkey", LongType()),
        ("o_custkey", LongType()),
        ("o_orderstatus", StringType()),
        ("o_totalprice", DoubleType()),
        ("o_orderdate", TimestampType()),
        ("o_orderpriority", StringType()),
    ),
    "lineitem": _st(
        ("l_orderkey", LongType()),
        ("l_partkey", LongType()),
        ("l_suppkey", LongType()),
        ("l_linenumber", IntegerType()),
        ("l_quantity", DoubleType()),
        ("l_extendedprice", DoubleType()),
        ("l_discount", DoubleType()),
        ("l_tax", DoubleType()),
        ("l_returnflag", StringType()),
        ("l_linestatus", StringType()),
        ("l_shipdate", TimestampType()),
    ),
    # events.ts encoding varies across testdata generations: TIMESTAMP
    # MICROS maps straight to TimestampType (declared here), but
    # TIMESTAMP(NANOS) is rejected by Spark 4 (PARQUET_TYPE_ILLEGAL) —
    # datasets.load_table probes the parquet footer and falls back to a
    # nanosAsLong read + /1000 conversion for ns-encoded files.
    "events": _st(
        ("event_id", LongType()),
        ("ts", TimestampType()),
        ("user_id", LongType()),
        ("event_type", StringType()),
        ("value", DoubleType()),
        ("props", StringType()),
    ),
    "documents": _st(
        ("doc_id", LongType()),
        ("text", StringType()),
        ("lang", StringType()),
        ("source", StringType()),
        ("n_chars", LongType()),
    ),
    "embeddings": _st(
        ("vec_id", LongType()),
        ("embedding", ArrayType(FloatType())),
        ("label", IntegerType()),
    ),
}


# --- B. reference-domain schemas ----------------------------------------
# Canonical cleaned ABR column order, reference:
# ETL_PIPELINE_AUS/scripts/cleaning/clean_abr.py:42-51
ABR_CLEAN_COLUMNS = [
    "abn",
    "entity_name",
    "entity_type",
    "entity_status",
    "address_line1",
    "address_line2",
    "suburb",
    "state",
    "postcode",
    "start_date",
]

ABR_COMPANIES = _st(*[(c, StringType()) for c in ABR_CLEAN_COLUMNS])

# reference: ETL_PIPELINE_AUS/scripts/extraction/extract_common_crawl.py:137
COMMON_CRAWL_COMPANIES = _st(
    ("website_url", StringType()),
    ("company_name", StringType()),
    ("industry", StringType()),
)

# reference: ETL_PIPELINE_AUS/scripts/matching/entity_matching_tfidf.py:52-74
ENTITY_MATCHES = _st(
    ("abn", StringType()),
    ("url", StringType()),
    ("company_name", StringType()),
    ("abr_company", StringType()),
    ("industry", StringType()),
    ("entity_type", StringType()),
    ("entity_status", StringType()),
    ("address", StringType()),
    ("postcode", StringType()),
    ("state", StringType()),
    ("start_date", DateType()),
    ("match_confidence", DoubleType()),
    ("source_commoncrawl_id", LongType()),
    ("source_abr_id", LongType()),
)

# reference: ETL_PIPELINE_AUS/sql/schema_postgres.sql:51-64 — unified
# companies; JSONB address kept as a JSON string column, data_sources as
# array<string>, confidence as decimal(4,3).
COMPANIES_UNIFIED = _st(
    ("company_id", LongType()),
    ("company_name", StringType()),
    ("abn", StringType()),
    ("website_url", StringType()),
    ("industry", StringType()),
    ("entity_type", StringType()),
    ("entity_status", StringType()),
    ("address", StringType()),  # JSON string (JSONB in reference)
    ("confidence_score", DecimalType(4, 3)),
    ("data_sources", ArrayType(StringType())),
)

# reference: ETL_PIPELINE_AUS/sql/schema_postgres.sql:83-91
DATA_QUALITY_METRICS = _st(
    ("pipeline_run_id", StringType()),
    ("metric_name", StringType()),
    ("metric_value", DecimalType(10, 2)),
    ("threshold_value", DecimalType(10, 2)),
    ("status", StringType()),
)
