"""Query-registry part: see section header below.

Split from the monolithic queries.py (round-9, verdict Next #6);
registration order preserved by the package __init__ import order.
"""

from __future__ import annotations

from firmable_aus_etl_spark.queries._base import *  # noqa: F401,F403
from firmable_aus_etl_spark.queries.llm_text import (  # noqa: F401
    _NORM_SQL,
    _TOKENS_SQL,
)

# =========================================================================
# Scalar-function coverage (SURVEY §2.9): f5-f10, f13-f17 as queries.
# =========================================================================

@register(
    "string_projection_documents",
    f"""
    WITH d AS (SELECT doc_id, {_NORM_SQL} AS t, {_TOKENS_SQL} AS w FROM documents)
    SELECT doc_id,
           substr(array_to_string(
             list_transform(string_split(t, ' '),
                            x -> upper(x[1]) || x[2:]), ' '), 1, 40) AS title_40,
           w[-1] AS last_token,
           w[1] AS first_token,
           len(w) AS n_tokens,
           CASE WHEN starts_with(t, 'the ') THEN 1 ELSE 0 END AS starts_the
    FROM d
    """,
)
def q_string_projection_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """f5 initcap + f6 substring + f7 startswith + f8 split/element_at
    + f11 length — the projection family as one pass (all codegen)."""
    from firmable_aus_etl_spark.functions.similarity import normalize_name
    from firmable_aus_etl_spark.operators.cleaning import titlecase_clean

    docs = load_table(spark, sf_dir, "documents")
    norm = normalize_name(F.col("text"))
    toks = F.split(norm, " ")
    return docs.select(
        "doc_id",
        F.substring(titlecase_clean(norm), 1, 40).alias("title_40"),
        F.element_at(toks, -1).alias("last_token"),
        F.element_at(toks, 1).alias("first_token"),
        F.size(toks).alias("n_tokens"),
        F.when(norm.startswith("the "), 1).otherwise(0).alias("starts_the"),
    )


# --- cleaning-family oracles (round-3 verdict item #5: op6/7/10/11/16
# were test-only; each gets a DuckDB twin so COVERAGE.md's "test-only"
# rows in §2.2-2.3 go to zero) ---------------------------------------

@register(
    "rename_normalize_customers",
    """
    SELECT c_custkey, c_name, c_acctbal FROM customer
    """,
)
def q_rename_normalize_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op6 rename-normalize (reference clean_abr.py:20): dirty mixed-
    case/padded column names conform to snake_case. The oracle's proof
    IS the schema compare — the driver matches sorted column NAMES, so
    ' C Name ' must come out exactly 'c_name' (values pass through
    untouched)."""
    from firmable_aus_etl_spark.operators.cleaning import normalize_column_names

    cust = load_table(spark, sf_dir, "customer")
    dirty = cust.select(
        F.col("c_custkey").alias("C_CustKey"),
        F.col("c_name").alias(" C Name "),
        F.col("c_acctbal").alias("C_ACCTBAL"),
    )
    return normalize_column_names(dirty)


@register(
    "trim_all_customers",
    """
    SELECT c_custkey, c_name, c_mktsegment, c_acctbal FROM customer
    """,
)
def q_trim_all_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op7 trim-all (reference clean_abr.py:23): whitespace-padded
    string columns come back exactly as the clean originals while the
    non-string column passes through the type-dispatch untouched —
    proven by comparing against the unpadded table."""
    from firmable_aus_etl_spark.operators.cleaning import trim_all_strings

    cust = load_table(spark, sf_dir, "customer")
    padded = cust.select(
        "c_custkey",
        # space padding only: Spark's trim() strips the space character,
        # not tabs (pandas .str.strip() would also take \t — documented
        # semantic difference, cf. operators/cleaning.py op7)
        F.concat(F.lit("  "), F.col("c_name"), F.lit("   ")).alias("c_name"),
        F.concat(F.lit(" "), F.col("c_mktsegment")).alias("c_mktsegment"),
        "c_acctbal",
    )
    return trim_all_strings(padded)


@register(
    "notnull_filter_documents",
    """
    SELECT doc_id, text, lang FROM documents WHERE doc_id % 7 <> 0
    """,
)
def q_notnull_filter_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op10 notnull filter (reference clean_common_crawl.py:28): nulls
    planted on a deterministic key pattern, na.drop recovers exactly
    the complement — the oracle filters on the planting rule, so a
    filter that dropped too much or too little mismatches."""
    from firmable_aus_etl_spark.operators.cleaning import drop_null_required

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("text"))
        .alias("text"),
        "lang",
    )
    return drop_null_required(docs, ["text"])


@register(
    "conform_schema_documents",
    """
    SELECT doc_id, lang, '' AS ingest_batch, source FROM documents
    """,
)
def q_conform_schema_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op11 conform schema (reference clean_abr.py:42-51): coerce onto
    a canonical column list — adds the missing ingest_batch as '',
    drops text/n_chars, reorders. Add/drop/reorder all visible to the
    oracle's schema + value compare."""
    from firmable_aus_etl_spark.operators.cleaning import conform_schema

    docs = load_table(spark, sf_dir, "documents")
    return conform_schema(docs, ["doc_id", "lang", "ingest_batch", "source"])


@register(
    "dedup_full_rows_documents",
    """
    SELECT DISTINCT lang, source FROM documents
    """,
)
def q_dedup_full_rows_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op16 full-row distinct (reference clean_abr.py:34) on a
    projection with real duplicates (every lang x source combination
    repeats across documents)."""
    docs = load_table(spark, sf_dir, "documents").select("lang", "source")
    return dedup.dedup_full(docs)


@register(
    "coalesce_fallback_events",
    """
    SELECT coalesce(json_extract_string(props, '$.missing'),
                    json_extract_string(props, '$.k'),
                    '0') AS k_resolved,
           count(*) AS cnt
    FROM events GROUP BY k_resolved
    """,
)
def q_coalesce_fallback_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """f10 coalesce fallback chain (reference: extract_abr_xml.py:40-57
    multi-source field resolution) over JSON extraction."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.coalesce(
            F.get_json_object(F.col("props"), "$.missing"),
            F.get_json_object(F.col("props"), "$.k"),
            F.lit("0"),
        ).alias("k_resolved")
    ).agg(F.count("*").alias("cnt"))


@register(
    "date_parts_orders",
    """
    SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mo,
           count(*) AS cnt,
           CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total
    FROM orders GROUP BY yr, mo
    """,
)
def q_date_parts_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """f13/f14 date handling: year/month extraction + grouped totals."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
            "o_totalprice",
        )
        .groupBy("yr", "mo")
        .agg(
            F.count("*").alias("cnt"),
            (F.sum(_cents(F.col("o_totalprice"))).cast("double") / 100.0).alias("total"),
        )
    )


@register(
    "array_ops_documents",
    f"""
    WITH d AS (SELECT doc_id, {_TOKENS_SQL} AS w FROM documents)
    SELECT doc_id,
           len(w) AS n_tokens,
           CASE WHEN list_contains(w, 'spark') THEN 1 ELSE 0 END AS has_spark,
           list_sort(list_distinct(w))[1] AS first_distinct_token,
           len(list_distinct(w)) AS n_distinct
    FROM d
    """,
)
def q_array_ops_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """f16 array construct/contains/sort/distinct over token arrays."""
    from firmable_aus_etl_spark.functions.similarity import normalize_name

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(normalize_name(F.col("text")), " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.when(F.array_contains(toks, "spark"), 1).otherwise(0).alias("has_spark"),
        F.element_at(F.sort_array(F.array_distinct(toks)), 1).alias("first_distinct_token"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
    )


@register(
    "concat_address_customers",
    """
    SELECT c_custkey,
           concat_ws(' ', n_name, c_mktsegment) AS addr,
           concat_ws('|', c_name, CAST(c_nationkey AS VARCHAR)) AS tagged
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    """,
)
def q_concat_address_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """f9 concat_ws (reference: extract_abr_xml.py:134 '{state} {postcode}')."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")).select(
        "c_custkey",
        F.concat_ws(" ", F.col("n_name"), F.col("c_mktsegment")).alias("addr"),
        F.concat_ws("|", F.col("c_name"), F.col("c_nationkey").cast("string")).alias("tagged"),
    )

