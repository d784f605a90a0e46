"""End-to-end reference-parity pipelines (SURVEY.md §3).

The reference's five Airflow stages (extract -> schema -> clean ->
load -> match, dags/etl_pipeline.py:91-103) collapse into lazy
DataFrame compositions here: no intermediate CSVs, no process
boundaries — stage handoff is lineage, and the only actions are at
sinks. Each pipeline is a pure ``DataFrame -> DataFrame`` function a
reference user can run verbatim on Spark.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from firmable_aus_etl_spark.operators import cleaning, dedup, joins
from firmable_aus_etl_spark.schemas import ABR_CLEAN_COLUMNS


def clean_abr_companies(raw: DataFrame) -> DataFrame:
    """The ABR cleaning stage (reference: scripts/cleaning/clean_abr.py).

    normalize column names (:20) -> trim all strings (:23) -> valid
    11-digit ABN (:26-27) -> valid 4-digit postcode, blanks allowed
    (:30-31) -> full-row + keyed dedup on abn (:34-35) -> active-only
    (:38-39) -> conform to the canonical 10-column schema (:42-51).

    All narrow transformations: the whole stage fuses into the scan.
    """
    df = cleaning.normalize_column_names(raw)
    df = cleaning.trim_all_strings(df)
    df = cleaning.regex_filter(df, "abn", r"^[0-9]{11}$")
    if "postcode" in df.columns:
        df = df.filter(
            (F.col("postcode") == "") | F.col("postcode").rlike(r"^[0-9]{4}$")
        )
    df = dedup.dedup_full(df)
    df = dedup.dedup_keyed(df, ["abn"], [F.col("entity_name").asc_nulls_last()])
    df = cleaning.eq_filter_ci(df, "entity_status", "active")
    return cleaning.conform_schema(df, ABR_CLEAN_COLUMNS)


def clean_common_crawl_companies(raw: DataFrame) -> DataFrame:
    """The Common Crawl cleaning stage (reference:
    scripts/cleaning/clean_common_crawl.py).

    normalize names (:25) -> drop rows missing url/name (:28) -> dedup
    on (website_url, company_name) (:29) -> url strip+truncate 500
    (:5-8) -> display-name cleanup (:10-13).
    """
    df = cleaning.normalize_column_names(raw)
    df = cleaning.drop_null_required(df, ["website_url", "company_name"])
    df = dedup.dedup_keyed(
        df, ["website_url", "company_name"], [F.col("website_url").asc()]
    )
    df = df.withColumn("website_url", cleaning.clean_url(F.col("website_url"), 500))
    return df.withColumn("company_name", cleaning.titlecase_clean(F.col("company_name")))


def match_entities(
    cc: DataFrame,
    abr: DataFrame,
    *,
    threshold: float = 85.0,
    block_size: int = 2,
    broadcast_abr: bool = False,
) -> DataFrame:
    """The production matcher (reference: entity_matching_tfidf.py):
    blocked fuzzy top-1 match CC -> ABR with confidence = score/100.

    Output carries both sides' columns plus match_confidence — the
    entity_matches row shape (schema_postgres.sql:66-78).
    """
    matched = joins.similarity_join(
        cc,
        abr,
        "company_name",
        "entity_name",
        block=lambda c: F.substring(F.lower(F.trim(c)), 1, block_size),
        threshold=threshold,
        k=1,
        left_id="website_url",
        right_tiebreak="abn",
        broadcast_right=broadcast_abr,
    )
    return matched.withColumn("match_confidence", F.round(F.col("score") / 100.0, 3)).drop(
        "score"
    )


def unify_companies(matches: DataFrame) -> DataFrame:
    """Build the unified companies table (reference:
    sql/schema_postgres.sql:51-64): JSONB address as a JSON string
    (f15), data_sources as array<string> (f16), decimal confidence.
    """
    return matches.select(
        F.col("entity_name").alias("company_name"),
        F.col("abn"),
        F.col("website_url"),
        F.to_json(
            F.struct(
                F.col("state").alias("state"), F.col("postcode").alias("postcode")
            )
        ).alias("address"),
        F.col("match_confidence").cast("decimal(4,3)").alias("confidence_score"),
        F.array(F.lit("abr"), F.lit("common_crawl")).alias("data_sources"),
        # f14 — created_at/updated_at defaults (schema_postgres.sql:28-29)
        F.current_timestamp().alias("created_at"),
    )


def merge_matches(
    existing: DataFrame, new_matches: DataFrame, *, keys=("abn", "website_url")
) -> DataFrame:
    """Incremental match load: greater-confidence-wins merge
    (reference: entity_matching_tfidf.py:117-140, predicate :134)."""
    return joins.merge_upsert(
        existing,
        new_matches,
        list(keys),
        prefer_update_when=F.col("u.match_confidence") > F.col("e.match_confidence"),
    )


def llm_adjudicate_pairs(
    pairs: DataFrame,
    *,
    call_model=None,
    abr_col: str = "entity_name",
    cc_col: str = "company_name",
) -> DataFrame:
    """u8 — LLM pairwise match adjudication (reference:
    LLM/llm_entity_matching_demo.py:26-46): candidate (ABR, CC) pairs ->
    {is_match, confidence, reason}.

    ``call_model(abr_name, cc_name) -> (bool, float, str)`` is injected;
    the default raises inside the task (no model endpoint here — gated
    exactly like the reference's OpenAI dependency). Distribution shape:
    mapInPandas so one model client is built per Arrow batch, never per
    row; at scale this is the pattern for batched endpoint calls.
    """
    import pandas as pd
    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        list(pairs.schema.fields)
        + [
            StructField("is_match", BooleanType(), True),
            StructField("llm_confidence", DoubleType(), True),
            StructField("reason", StringType(), True),
        ]
    )

    def run(batches):
        fn = call_model
        if fn is None:
            raise NotImplementedError(
                "no model endpoint configured; inject call_model"
            )
        for pdf in batches:
            res = [fn(a, b) for a, b in zip(pdf[abr_col], pdf[cc_col])]
            pdf = pdf.copy()
            pdf["is_match"] = [r[0] for r in res]
            pdf["llm_confidence"] = [r[1] for r in res]
            pdf["reason"] = [r[2] for r in res]
            yield pdf

    return pairs.mapInPandas(run, schema=out_schema)
