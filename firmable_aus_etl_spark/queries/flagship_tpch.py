"""Flagship blocked-similarity join + TPC-H-shaped core (pricing summary,
star joins, top-k windows, dedup, merge/upsert, audits).

Split from the monolithic queries.py (round-9, verdict Next #6);
registration order preserved by the package __init__ import order.
"""

from __future__ import annotations

from firmable_aus_etl_spark.queries._base import *  # noqa: F401,F403

# Names look like 'Customer#000000017' / 'Supplier#000000003'; the digit
# suffix is the entity identity, so normalization strips the table-name
# prefix (reference analog: clean-name normalization entity_matching.py:19-25)
# and blocking keys on the LAST 2 digits -> ~100 uniform blocks (prefix
# blocking would be a single degenerate block here — the skew case
# SURVEY §7.4 warns about).
_SIM_ORACLE = """
WITH c AS (
  SELECT c_custkey, c_name,
         regexp_replace(lower(trim(c_name)), '^[a-z]+#', '') AS norm
  FROM customer
), s AS (
  SELECT s_suppkey, s_name,
         regexp_replace(lower(trim(s_name)), '^[a-z]+#', '') AS norm
  FROM supplier
), scored AS (
  SELECT c.c_custkey, c.c_name, s.s_suppkey, s.s_name,
         100.0 * (1.0 - CAST(levenshtein(c.norm, s.norm) AS DOUBLE)
                  / CAST(greatest(length(c.norm), length(s.norm), 1) AS DOUBLE)) AS score
  FROM c JOIN s
    ON substr(c.norm, length(c.norm) - 1, 2) = substr(s.norm, length(s.norm) - 1, 2)
), thresh AS (
  SELECT * FROM scored WHERE score >= 85.0
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY score DESC, s_suppkey) AS rn
  FROM thresh
)
SELECT c_custkey, c_name, s_suppkey, s_name, round(score, 2) AS score
FROM ranked WHERE rn = 1
"""


@register("similarity_join_blocked_top1", _SIM_ORACLE)
def q_similarity_join_blocked_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op20 blocked fuzzy join + op33 top-1 (reference: entity_matching_tfidf.py:163-206)."""
    strip = lambda c: F.regexp_replace(F.lower(F.trim(c)), "^[a-z]+#", "")  # noqa: E731
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", strip(F.col("c_name")).alias("c_norm")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", strip(F.col("s_name")).alias("s_norm")
    )
    out = joins.similarity_join(
        cust,
        supp,
        "c_norm",
        "s_norm",
        block=lambda c: F.substring(c, -2, 2),
        threshold=85.0,
        k=1,
        left_id="c_custkey",
        right_tiebreak="s_suppkey",
        broadcast_right=True,
    )
    return out.select(
        "c_custkey", "c_name", "s_suppkey", "s_name", F.round("score", 2).alias("score")
    )


# The skew case itself (round-7): the reference's production matcher
# blocks on raw 2-char name prefixes (entity_matching_tfidf.py:159-160),
# Zipf-distributed on real names — one "TH"-like block can hold a huge
# share of the corpus, and its O(n_block²) candidate fan-out lands on
# ONE task no matter how AQE splits partitions. Here the fixture keeps
# the DEGENERATE blocking deliberately: after prefix-strip every norm
# starts "00", so the FIRST-2 block key puts the ENTIRE corpus in one
# hot block, and block_cap tiles that block's pair space into bounded
# per-task grids (joins._salted_block_join). The oracle replays the
# plain blocked join — salting must be invisible in the result.
_SIM_SALTED_ORACLE = """
WITH c AS (
  SELECT c_custkey, c_name,
         regexp_replace(lower(trim(c_name)), '^[a-z]+#', '') AS norm
  FROM customer
), s AS (
  SELECT s_suppkey, s_name,
         regexp_replace(lower(trim(s_name)), '^[a-z]+#', '') AS norm
  FROM supplier
), scored AS (
  SELECT c.c_custkey, c.c_name, s.s_suppkey, s.s_name,
         100.0 * (1.0 - CAST(levenshtein(c.norm, s.norm) AS DOUBLE)
                  / CAST(greatest(length(c.norm), length(s.norm), 1) AS DOUBLE)) AS score
  FROM c JOIN s
    ON substr(c.norm, 1, 2) = substr(s.norm, 1, 2)
), thresh AS (
  SELECT * FROM scored WHERE score >= 85.0
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY score DESC, s_suppkey) AS rn
  FROM thresh
)
SELECT c_custkey, c_name, s_suppkey, s_name, round(score, 2) AS score
FROM ranked WHERE rn = 1
"""


@register("similarity_join_salted_top1", _SIM_SALTED_ORACLE)
def q_similarity_join_salted_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op20 under adversarial block skew (SURVEY §7.4): ONE degenerate
    hot block (every normalized name shares the '00' first-2 prefix —
    the fixture does NOT dodge the skew, unlike the uniform last-2
    blocking of the flagship), handled by ``block_cap`` grid salting.
    Output is bit-identical to the unsalted blocked join, which is
    exactly what the DuckDB twin replays."""
    strip = lambda c: F.regexp_replace(F.lower(F.trim(c)), "^[a-z]+#", "")  # noqa: E731
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", strip(F.col("c_name")).alias("c_norm")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", strip(F.col("s_name")).alias("s_norm")
    )
    out = joins.similarity_join(
        cust,
        supp,
        "c_norm",
        "s_norm",
        block=lambda c: F.substring(c, 1, 2),
        threshold=85.0,
        k=1,
        left_id="c_custkey",
        right_tiebreak="s_suppkey",
        block_cap=256,
    )
    return out.select(
        "c_custkey", "c_name", "s_suppkey", "s_name", F.round("score", 2).alias("score")
    )


# --- aggregation family ---------------------------------------------------

# Money sums go through exact integer cents (floor(x*100+0.5) per row is
# bit-identical across engines; integer sums are order-independent), so
# results are immune to partial-aggregation-order FP noise — see PERF.md.
_PRICING_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_disc_price,
       round(avg(l_quantity), 2) AS avg_qty,
       CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / (100.0 * count(*)) AS avg_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("pricing_summary", _PRICING_ORACLE)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op26/op27 grouped aggregation (TPC-H Q1 shape on the lineitem fixture)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            (F.sum(_cents(F.col("l_extendedprice"))).cast("double") / 100.0).alias(
                "sum_base_price"
            ),
            (
                F.sum(
                    _cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4)
                ).cast("double")
                / 10000.0
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            (
                F.sum(_cents(F.col("l_extendedprice"))).cast("double")
                / (F.lit(100.0) * F.count("*"))
            ).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


_REVENUE_ORACLE = """
SELECT r_name, n_name,
       count(*) AS line_count,
       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


@register("revenue_by_nation", _REVENUE_ORACLE)
def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op25 FK star join with broadcast dims (reference: schema_postgres.sql:71-73)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = joins.fk_star_join(
        li,
        [
            # lineitem⋈orders and ⋈customer are fact-scale joins: no
            # forced broadcast (AQE upgrades them locally; they shuffle
            # at 100 TB, which is correct). nation/region are true dims.
            (orders, F.col("l_orderkey") == F.col("o_orderkey"), False),
            (cust, F.col("o_custkey") == F.col("c_custkey"), False),
            (nation, F.col("c_nationkey") == F.col("n_nationkey"), True),
            (region, F.col("n_regionkey") == F.col("r_regionkey"), True),
        ],
    )
    return joined.groupBy("r_name", "n_name").agg(
        F.count("*").alias("line_count"),
        (
            F.sum(_cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4)).cast(
                "double"
            )
            / 10000.0
        ).alias("revenue"),
    )


@register(
    "group_counts_mktsegment",
    "SELECT c_mktsegment, count(*) AS cnt FROM customer GROUP BY c_mktsegment",
)
def q_group_counts_mktsegment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op26 — per-group counts."""
    return agg.group_counts(load_table(spark, sf_dir, "customer"), ["c_mktsegment"])


@register(
    "avg_acctbal_by_nation",
    """
    SELECT n_name,
           CAST(sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
             / (100.0 * count(*)) AS avg_acctbal,
           count(*) AS cnt
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q_avg_acctbal_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op27 mean + broadcast dim join."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            (
                F.sum(_cents(F.col("c_acctbal"))).cast("double") / (F.lit(100.0) * F.count("*"))
            ).alias("avg_acctbal"),
            F.count("*").alias("cnt"),
        )
    )


@register(
    "argmax_order_per_customer",
    """
    SELECT o_custkey, o_totalprice AS max_o_totalprice, o_orderkey AS argmax_o_orderkey
    FROM (
      SELECT o_custkey, o_totalprice, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def q_argmax_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op28 — per-group argmax via max_by/struct with deterministic ties.

    Tie-break: highest price wins; equal prices -> LOWEST orderkey (hence
    the struct carries -o_orderkey on both sides).
    """
    orders = load_table(spark, sf_dir, "orders")
    s = F.max(F.struct(F.col("o_totalprice"), (-F.col("o_orderkey")).alias("neg"))).alias("_s")
    return (
        orders.groupBy("o_custkey")
        .agg(s)
        .select(
            "o_custkey",
            F.col("_s.o_totalprice").alias("max_o_totalprice"),
            (-F.col("_s.neg")).alias("argmax_o_orderkey"),
        )
    )


# --- window family ---------------------------------------------------------

@register(
    "topk_lineitems_per_order",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice FROM (
      SELECT l_orderkey, l_linenumber, l_extendedprice,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY l_extendedprice DESC, l_linenumber) AS rn
      FROM lineitem
    ) WHERE rn <= 5
    """,
)
def q_topk_lineitems_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op33 — top-5 per group with deterministic tie-break."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    return topk_per_group(
        li,
        ["l_orderkey"],
        [F.col("l_extendedprice").desc(), F.col("l_linenumber").asc()],
        k=5,
    )


@register(
    "global_top20_orders",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
)
def q_global_top20_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op35/op36 — global top-k = orderBy + limit (TakeOrderedAndProject)."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


# --- dedup family ------------------------------------------------------------

@register(
    "dedup_documents_keyed",
    """
    SELECT doc_id, source, lang, n_chars FROM (
      SELECT doc_id, source, lang, n_chars,
             row_number() OVER (PARTITION BY source, lang ORDER BY doc_id) AS rn
      FROM documents
    ) WHERE rn = 1
    """,
)
def q_dedup_documents_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op17 — keyed dedup with deterministic keep-lowest-id survivor
    (reference: clean_abr.py:35, clean_common_crawl.py:29)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "lang", "n_chars")
    return dedup.dedup_keyed(docs, ["source", "lang"], [F.col("doc_id").asc()])


@register(
    "dedup_best_order_status",
    """
    SELECT o_custkey, o_orderstatus, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderstatus, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey, o_orderstatus
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def q_dedup_best_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op18 — best-record dedup: greatest value wins per key
    (reference: entity_matching_tfidf.py:121-137, predicate :134)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderstatus", "o_orderkey", "o_totalprice"
    )
    return dedup.dedup_best(
        orders, ["o_custkey", "o_orderstatus"], "o_totalprice", [F.col("o_orderkey").asc()]
    )


# --- filters / projections ----------------------------------------------------

@register(
    "regex_filter_events",
    """
    SELECT event_id, event_type, props FROM events
    WHERE regexp_matches(props, '"k": 8[0-9]}')
    """,
)
def q_regex_filter_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op8/f3 — regex validity filter (reference: clean_abr.py:26-31)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "props")
    return ev.filter(F.col("props").rlike('"k": 8[0-9]}'))


@register(
    "eq_filter_ci_events",
    """
    SELECT event_id, user_id, upper(event_type) AS event_type_uc
    FROM events WHERE lower(event_type) = 'error'
    """,
)
def q_eq_filter_ci_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op9/f1 — case-insensitive equality filter (reference: clean_abr.py:38-39)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.lower(F.col("event_type")) == "error").select(
        "event_id", "user_id", F.upper(F.col("event_type")).alias("event_type_uc")
    )


@register(
    "events_json_agg",
    """
    SELECT event_type,
           count(*) AS cnt,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
             / (100.0 * count(*)) AS avg_value
    FROM events GROUP BY event_type
    """,
)
def q_events_json_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """f15 — JSON extraction (JSONB analog, schema_postgres.sql:59) + agg."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.sum(F.get_json_object(F.col("props"), "$.k").cast("long")).alias("sum_k"),
        (F.sum(_cents(F.col("value"))).cast("double") / (F.lit(100.0) * F.count("*"))).alias(
            "avg_value"
        ),
    )


# --- audits (dbt semantics) ----------------------------------------------------

@register(
    "uniqueness_audit_orders",
    """
    SELECT o_orderkey, count(*) AS cnt FROM orders
    GROUP BY o_orderkey HAVING count(*) > 1
    """,
)
def q_uniqueness_audit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op30 — dbt `unique` audit; empty result == pass
    (reference: abr_companies_quality.yml:6-10)."""
    return agg.uniqueness_violations(load_table(spark, sf_dir, "orders"), "o_orderkey")


@register(
    "notnull_audit_documents",
    """
    SELECT 'text' AS column_name, CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_count FROM documents
    UNION ALL
    SELECT 'lang', CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM documents
    UNION ALL
    SELECT 'source', CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM documents
    """,
)
def q_notnull_audit_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op31 — dbt `not_null` audit as one conditional-agg pass
    (reference: abr_companies_quality.yml:8-13)."""
    docs = load_table(spark, sf_dir, "documents")
    return agg.notnull_violation_counts(docs, ["text", "lang", "source"])


# --- merge / upsert -------------------------------------------------------------

_MERGE_ORACLE = """
WITH updates AS (
  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
         o_totalprice * 1.1 AS o_totalprice
  FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey + 1000000, o_custkey, 'N', o_totalprice
  FROM orders WHERE o_orderkey % 13 = 0
), existing AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
), merged AS (
  SELECT
    CASE WHEN u.o_orderkey IS NOT NULL
              AND (e.o_orderkey IS NULL
                   OR e.o_totalprice IS DISTINCT FROM u.o_totalprice
                   OR e.o_orderstatus IS DISTINCT FROM u.o_orderstatus)
         THEN u.o_orderkey ELSE e.o_orderkey END AS o_orderkey,
    CASE WHEN u.o_orderkey IS NOT NULL
              AND (e.o_orderkey IS NULL
                   OR e.o_totalprice IS DISTINCT FROM u.o_totalprice
                   OR e.o_orderstatus IS DISTINCT FROM u.o_orderstatus)
         THEN u.o_custkey ELSE e.o_custkey END AS o_custkey,
    CASE WHEN u.o_orderkey IS NOT NULL
              AND (e.o_orderkey IS NULL
                   OR e.o_totalprice IS DISTINCT FROM u.o_totalprice
                   OR e.o_orderstatus IS DISTINCT FROM u.o_orderstatus)
         THEN u.o_orderstatus ELSE e.o_orderstatus END AS o_orderstatus,
    CASE WHEN u.o_orderkey IS NOT NULL
              AND (e.o_orderkey IS NULL
                   OR e.o_totalprice IS DISTINCT FROM u.o_totalprice
                   OR e.o_orderstatus IS DISTINCT FROM u.o_orderstatus)
         THEN u.o_totalprice ELSE e.o_totalprice END AS o_totalprice
  FROM existing e FULL OUTER JOIN updates u ON e.o_orderkey = u.o_orderkey
)
SELECT * FROM merged
"""


@register("merge_upsert_orders", _MERGE_ORACLE)
def q_merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op24/op5 — UPSERT-as-batch-merge (reference:
    loadingcsv_topostgre_fast.py:62-76; change predicate IS DISTINCT FROM
    at :71-73). Updates = 10% price bump on keys %7, inserts = new keys
    from %13."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    updates = (
        orders.filter(F.col("o_orderkey") % 7 == 0)
        .withColumn("o_orderstatus", F.lit("U"))
        .withColumn("o_totalprice", F.col("o_totalprice") * 1.1)
        .unionByName(
            orders.filter(F.col("o_orderkey") % 13 == 0)
            .withColumn("o_orderkey", F.col("o_orderkey") + 1000000)
            .withColumn("o_orderstatus", F.lit("N"))
        )
    )
    return joins.merge_upsert(
        orders, updates, ["o_orderkey"], tracked=["o_totalprice", "o_orderstatus"]
    )


# --- set ops ----------------------------------------------------------------------

@register(
    "union_distinct_nationkeys",
    """
    SELECT DISTINCT c_nationkey AS nationkey FROM customer
    UNION
    SELECT DISTINCT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def q_union_distinct_nationkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op29/op38/op39 — distinct key-set union, sorted
    (reference: entity_matching_tfidf.py:192)."""
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    return agg.distinct_key_union(cust, "c_nationkey", supp, "s_nationkey", alias="nationkey")

