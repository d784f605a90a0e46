"""Query-registry part: see section header below.

Split from the monolithic queries.py (round-9, verdict Next #6);
registration order preserved by the package __init__ import order.
"""

from __future__ import annotations

from firmable_aus_etl_spark.queries._base import *  # noqa: F401,F403
from firmable_aus_etl_spark.queries.llm_text import (  # noqa: F401
    _JACCARD_ORACLE,
    _NORM_SQL,
)

# =========================================================================
# Grouping-set / set-op / pivot coverage (SURVEY §2.5 note: rollup/cube
# are native — exercised here; §2.8 intersect/except).
# =========================================================================

@register(
    "rollup_revenue_region_nation",
    """
    SELECT coalesce(r_name, '<all>') AS r_name,
           coalesce(n_name, '<all>') AS n_name,
           count(*) AS cnt,
           round(sum(c_acctbal), 2) AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def q_rollup_revenue_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets via rollup: (region, nation) -> (region) -> ()
    subtotals in one pass. NULL group markers coalesced to '<all>' so
    the oracle compare is null-unambiguous."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("c_acctbal"), 2).alias("total_bal"))
        .select(
            F.coalesce(F.col("r_name"), F.lit("<all>")).alias("r_name"),
            F.coalesce(F.col("n_name"), F.lit("<all>")).alias("n_name"),
            "cnt",
            "total_bal",
        )
    )


@register(
    "nationkeys_intersect_except",
    """
    SELECT 'both' AS tag, nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT
      SELECT s_nationkey FROM supplier
    )
    UNION ALL
    SELECT 'customer_only', nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT
      SELECT s_nationkey FROM supplier
    )
    """,
)
def q_nationkeys_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 set ops: intersect + except of key sets, tagged."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    both = cust.intersect(supp).select(F.lit("both").alias("tag"), "nationkey")
    # subtract == EXCEPT DISTINCT (exceptAll would keep keys whose
    # multiplicity merely differs between the sides)
    only = cust.subtract(supp).select(F.lit("customer_only").alias("tag"), "nationkey")
    return both.unionByName(only)


_PIVOT_ORACLE = """
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
FROM events GROUP BY user_id
"""


@register("pivot_event_counts", _PIVOT_ORACLE)
def q_pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide counts per user). The pivot value list is declared
    explicitly — at scale an undeclared pivot forces an extra distinct
    pass over the data to discover values."""
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.count(F.lit(1)))
    )
    return out.na.fill(0)


@register(
    "audit_suite_orders",
    """
    WITH m AS (
      SELECT CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT) AS k_unique,
             CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS k_notnull,
             CAST(sum(CASE WHEN o_orderstatus NOT IN ('F','O','P') AND o_orderstatus IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS s_accepted,
             CAST(sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT) AS p_nonneg
      FROM orders
    )
    SELECT column_name, test_name, violations,
           CASE WHEN violations = 0 THEN 'pass' ELSE 'fail' END AS status
    FROM (
      SELECT 'o_orderkey' AS column_name, 'unique' AS test_name, k_unique AS violations FROM m
      UNION ALL SELECT 'o_orderkey', 'not_null', k_notnull FROM m
      UNION ALL SELECT 'o_orderstatus', 'accepted_values:F|O|P', s_accepted FROM m
      UNION ALL SELECT 'o_totalprice', 'non_negative', p_nonneg FROM m
    )
    """,
)
def q_audit_suite_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative dbt-style audit suite compiled to ONE aggregation
    pass (reference: firmable_dbt/models/abr_companies_quality.yml)."""
    from firmable_aus_etl_spark.operators.audit_suite import run_audits

    orders = load_table(spark, sf_dir, "orders")
    return run_audits(
        orders,
        {
            "o_orderkey": ["unique", "not_null"],
            "o_orderstatus": ["accepted_values:F|O|P"],
            "o_totalprice": ["non_negative"],
        },
    )


@register(
    "sliding_window_events",
    """
    WITH e AS (
      SELECT event_type,
             unnest([date_trunc('hour', CAST(ts AS TIMESTAMP)) - INTERVAL 1 HOUR,
                     date_trunc('hour', CAST(ts AS TIMESTAMP))]) AS win_start
      FROM events
    )
    SELECT strftime(win_start, '%Y-%m-%d %H:%M') AS window_start,
           event_type, count(*) AS cnt
    FROM e GROUP BY window_start, event_type
    """,
)
def q_sliding_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (2h window, 1h slide): each event
    lands in two overlapping buckets — the streaming sliding-agg shape
    as a batch oracle query."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type",
            "cnt",
        )
    )


def _langid_ngram_oracle() -> str:
    """DuckDB twin of language_id_ngram, generated from the same
    trigram profiles (single source of truth)."""
    from firmable_aus_etl_spark.functions.text import NGRAM_PROFILES

    langs = sorted(NGRAM_PROFILES)
    score_cols = []
    for lang in langs:
        lits = ", ".join("'" + g.replace("'", "''") + "'" for g in NGRAM_PROFILES[lang])
        score_cols.append(
            f"CAST(len(list_intersect(g, [{lits}])) AS DOUBLE)"
            f" / CAST(greatest(len(g), 1) AS DOUBLE) AS s_{lang}"
        )
    mx = "greatest(" + ", ".join(f"s_{la}" for la in langs) + ")"
    whens = "\n".join(
        f"WHEN s_{la} >= {mx} AND {mx} >= 0.05 THEN '{la}'" for la in langs
    )
    return f"""
    WITH d AS (SELECT lang, {_NORM_SQL} AS t FROM documents),
    gr AS (
      SELECT lang, list_distinct(
        list_transform(generate_series(1, greatest(length(t) - 2, 1)),
                       i -> t[i:i+2])) AS g
      FROM d
    ),
    s AS (SELECT lang, {", ".join(score_cols)} FROM gr),
    c AS (SELECT lang, CASE {whens} ELSE 'und' END AS detected FROM s)
    SELECT lang, detected, count(*) AS cnt FROM c GROUP BY lang, detected
    """


@register("language_id_ngram_confusion", _langid_ngram_oracle())
def q_language_id_ngram_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: char-trigram-profile language ID (the classic
    n-gram heuristic), tallied against the fixture's lang column.
    The heavy per-row trigram map must not inherit the single-file
    scan's one partition (13 s -> 1 s at sf0.1: ensure_parallelism +
    the projection-staged variant that computes the trigram array once
    per row)."""
    from firmable_aus_etl_spark.functions import text as T
    from firmable_aus_etl_spark.operators.partitioning import ensure_parallelism

    docs = ensure_parallelism(
        load_table(spark, sf_dir, "documents"), "doc_id"
    )
    return (
        T.with_language_id_ngram(docs, "text")
        .groupBy("lang", "detected")
        .agg(F.count("*").alias("cnt"))
    )


# --- as-of join (engine widening: time-series surface) --------------------

_ASOF_ORACLE = """
WITH e AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
), p AS (
  SELECT event_id AS purchase_event_id, user_id, ts,
         value AS purchase_value
  FROM events WHERE event_type = 'purchase'
), m AS (
  SELECT e.event_id, e.user_id, p.purchase_event_id, p.purchase_value,
         row_number() OVER (
           PARTITION BY e.event_id
           ORDER BY p.ts DESC, p.purchase_event_id DESC) AS rn
  FROM e LEFT JOIN p
    ON e.user_id = p.user_id AND p.ts <= e.ts
)
SELECT event_id, user_id, purchase_event_id, purchase_value
FROM m WHERE rn = 1
"""


@register("asof_error_last_purchase", _ASOF_ORACLE)
def q_asof_error_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each 'error' event, the same user's most recent
    'purchase' at-or-before it (null if none). Union+window merge —
    one shuffle over |L|+|R|, no range-join fan-out; the oracle is the
    equivalent (quadratic) lateral top-1, proving the merge loses no
    rows. Raw ts is never emitted (ns-vs-us parquet precision)."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_event_id"),
        F.col("value").alias("purchase_value"),
    )
    out = joins.asof_join(
        errors,
        purchases,
        on="ts",
        by=["user_id"],
        value_cols=["purchase_event_id", "purchase_value"],
        tiebreak="purchase_event_id",
    )
    return out.select("event_id", "user_id", "purchase_event_id", "purchase_value")


_RANGE_ORACLE = """
WITH p AS (
  SELECT event_id AS purchase_event_id, user_id, ts AS start_ts,
         ts + INTERVAL 1 HOUR AS end_ts
  FROM events WHERE event_type = 'purchase'
), e AS (
  SELECT event_id AS error_event_id, user_id, ts FROM events
  WHERE event_type = 'error'
)
SELECT p.purchase_event_id, e.error_event_id, p.user_id
FROM p JOIN e
  ON p.user_id = e.user_id AND e.ts >= p.start_ts AND e.ts <= p.end_ts
"""


@register("errors_within_hour_after_purchase", _RANGE_ORACLE)
def q_errors_within_hour_after_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (point-in-interval): error events inside the hour
    after each purchase, per user. Binned equi-join on (user, time
    bucket) — hash-partitionable — where the naive inequality join
    would be a nested-loop; the oracle runs exactly that naive form,
    proving the binning loses no pairs."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"),
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("end_ts"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_event_id"), "user_id", "ts"
    )
    out = joins.point_in_interval_join(
        errors,
        purchases,
        point_ts="ts",
        start_ts="start_ts",
        end_ts="end_ts",
        by=["user_id"],
        bucket_seconds=3600,
    )
    return out.select("purchase_event_id", "error_event_id", "user_id")


_TIME_ROLLUP_ORACLE = """
WITH e AS (
  SELECT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
         strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H') AS hour,
         strftime(date_trunc('minute', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M') AS minute,
         value
  FROM events
)
SELECT day, hour, minute,
       CAST(GROUPING(day, hour, minute) AS BIGINT) AS lvl,
       count(*) AS cnt,
       CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
FROM e GROUP BY ROLLUP(day, hour, minute)
"""


@register("time_rollup_events", _TIME_ROLLUP_ORACLE)
def q_time_rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: minute/hour/day/total
    resolutions of the event stream in ONE pass via ROLLUP — partial
    aggregation combines map-side, so the fact table is read and
    shuffled once for all four resolutions (vs. four separate
    scans+aggs). grouping_id tags the resolution; integer-cents sums
    keep the value hash order-independent."""
    ev = load_table(spark, sf_dir, "events")
    bucketed = ev.select(
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day"),
        F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH").alias("hour"),
        F.date_format(F.date_trunc("minute", F.col("ts")), "yyyy-MM-dd HH:mm").alias("minute"),
        "value",
    )
    return (
        bucketed.rollup("day", "hour", "minute")
        .agg(
            F.grouping_id().cast("long").alias("lvl"),
            F.count("*").alias("cnt"),
            (F.sum(_cents(F.col("value"))).cast("double") / 100.0).alias("total_value"),
        )
        .select("day", "hour", "minute", "lvl", "cnt", "total_value")
    )


@register_pipeline("approx_stats_events")  # rows-only: sketch internals are engine-specific
def q_approx_stats_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates — the 100 TB scale path for distincts and
    quantiles: HyperLogLog++ count-distinct and a quantile sketch are
    single-pass, mergeable, fixed-memory (vs exact percentile's
    per-group sort / exact distinct's full shuffle of the key set).
    Engine-specific sketch contents -> rows-only driver check;
    tests/test_aggregates.py bounds the error vs the exact answers
    (relative error <= 5% for HLL at default rsd, exact-vs-approx
    percentile within the value spread)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.percentile_approx("value", [0.5, 0.95], 10000).alias("value_q"),
            F.count("*").alias("cnt"),
        )
        .select(
            "event_type", "approx_users",
            F.col("value_q")[0].alias("p50"),
            F.col("value_q")[1].alias("p95"),
            "cnt",
        )
    )


_CLUSTER_ORACLE = f"""
WITH RECURSIVE pairs AS (
  SELECT a_id, b_id FROM ({_JACCARD_ORACLE.strip()})
),
und AS (SELECT a_id AS x, b_id AS y FROM pairs
        UNION ALL SELECT b_id, a_id FROM pairs),
reach AS (
  SELECT doc_id AS node, doc_id AS root FROM documents
  UNION
  SELECT u.y AS node, r.root
  FROM reach r JOIN und u ON u.x = r.node
)
SELECT node AS doc_id, min(root) AS cluster FROM reach GROUP BY node
"""


@register("near_dup_clusters", _CLUSTER_ORACLE)
def q_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup clustering: exact-Jaccard near-dup pairs (>= 0.5) grouped
    into connected components; cluster id = min reachable doc_id, so
    keep-the-representative is `filter(doc_id == cluster)`. The oracle
    is a DuckDB recursive-CTE reachability closure over the same pair
    set — every singleton doc keeps its own id as cluster."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs_prefix(
        docs, "doc_id", "text", shingle_n=3, threshold=0.5
    ).select("a_id", "b_id")
    return dedup.connected_components(
        pairs, nodes=docs.select(F.col("doc_id")), node_id="doc_id"
    )


@register("near_dup_clusters_star", _CLUSTER_ORACLE)
def q_near_dup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """near_dup_clusters through the alternating large-star/small-star
    contraction (Kiveris et al. SoCC 2014) instead of min-label
    propagation — O(log^2 n) rounds on ANY graph shape, the variant to
    reach for when dedup graphs contain long chains (URL redirects,
    co-citation paths) where label propagation needs diameter-many
    rounds. Shares the recursive-CTE oracle with near_dup_clusters:
    both algorithms must produce the identical min-reachable
    labeling."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs_prefix(
        docs, "doc_id", "text", shingle_n=3, threshold=0.5
    ).select("a_id", "b_id")
    return dedup.connected_components(
        pairs,
        nodes=docs.select(F.col("doc_id")),
        node_id="doc_id",
        algorithm="star",
    )


_SCD2_ORACLE = """
SELECT o_custkey, o_orderkey, o_orderpriority,
       strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
       strftime(lead(o_orderdate) OVER w, '%Y-%m-%d') AS valid_to,
       CAST(CASE WHEN lead(o_orderkey) OVER w IS NULL THEN 1 ELSE 0 END
            AS BIGINT) AS is_current
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@register("scd2_order_priority_history", _SCD2_ORACLE)
def q_scd2_order_priority_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history build: a change log (orders per customer) becomes
    slowly-changing-dimension rows with [valid_from, valid_to) validity
    and an is_current flag — one lead() window per key, no self-join
    (the classic ETL dimension-maintenance op the reference's UPSERT
    loaders approximate destructively). Tie-break on o_orderkey keeps
    same-day changes deterministic."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderpriority",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("valid_from"),
        F.date_format(F.lead("o_orderdate").over(w), "yyyy-MM-dd").alias("valid_to"),
        F.lead("o_orderkey").over(w).isNull().cast("long").alias("is_current"),
    )


@register(
    "distinct_agg_lineitem",
    """
    SELECT l_returnflag,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_distinct_agg_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped DISTINCT aggregation — Spark plans multi-distinct via
    Expand (one replicated row-set per distinct column) with partial
    aggregation before the shuffle; no driver-side distinct."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count("*").alias("n_rows"),
    )


@register(
    "order_rank_metrics",
    """
    WITH w AS (
      SELECT o_custkey, o_orderkey,
             CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
             percent_rank() OVER win AS pr,
             cume_dist() OVER win AS cd,
             first_value(o_orderkey) OVER win AS cheapest_order
      FROM orders
      WINDOW win AS (PARTITION BY o_custkey ORDER BY
                     CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT),
                     o_orderkey)
    )
    SELECT o_custkey, o_orderkey, round(pr, 6) AS pr, round(cd, 6) AS cd,
           cheapest_order
    FROM w
    """,
)
def q_order_rank_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window functions: percent_rank / cume_dist /
    first_value per customer, ordered by exact integer cents (+ key
    tie-break) so rank positions cannot flip between engines on equal
    doubles (verify-skill gotcha)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    cents = _cents(F.col("o_totalprice"))
    w = Window.partitionBy("o_custkey").orderBy(cents, "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.first("o_orderkey").over(w).alias("cheapest_order"),
    )


@register(
    "stratified_sample_customers",
    """
    WITH r AS (
      SELECT c_custkey, c_mktsegment,
             row_number() OVER (
               PARTITION BY c_mktsegment
               ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey) AS rn
      FROM customer
    )
    SELECT c_custkey, c_mktsegment FROM r WHERE rn <= 10
    """,
)
def q_stratified_sample_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: top-10 per stratum under an
    md5 hash order — the reproducible form of per-group random
    sampling (df.sampleBy is seed- and partitioning-dependent; a hash
    order gives the same sample on any cluster layout, any engine —
    which is why it is oracle-checkable at all). Plans as
    WindowGroupLimit: only 10 survivors per stratum per mapper cross
    the shuffle."""
    from firmable_aus_etl_spark.operators.windows import topk_per_group

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return topk_per_group(
        cust.withColumn("__h", F.md5(F.col("c_custkey").cast("string"))),
        ["c_mktsegment"],
        [F.col("__h").asc(), F.col("c_custkey").asc()],
        k=10,
    ).select("c_custkey", "c_mktsegment")


@register(
    "salted_join_segments",
    """
    WITH dim AS (
      SELECT c_mktsegment AS seg,
             row_number() OVER (ORDER BY c_mktsegment) AS seg_rank
      FROM (SELECT DISTINCT c_mktsegment FROM customer)
    )
    SELECT c.c_custkey, c.c_mktsegment, d.seg_rank
    FROM customer c JOIN dim d ON c.c_mktsegment = d.seg
    """,
)
def q_salted_join_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated equi-join: c_mktsegment has 5 values, so a plain
    hash join lands the whole fact side on 5 reducers — the textbook
    hot-key case. salted_join scatters each hot key across 8 salt
    buckets (deterministic row-hash salt) and replicates the 5-row dim
    side per salt. The oracle runs the UNSALTED join: salting must be
    invisible in the result, and the gate proves it."""
    from firmable_aus_etl_spark.operators.partitioning import salted_join
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    dim = (
        cust.select(F.col("c_mktsegment").alias("seg"))
        .distinct()
        .withColumn("seg_rank", F.row_number().over(Window.orderBy("seg")))
        .withColumnRenamed("seg", "c_mktsegment")
    )
    out = salted_join(cust, dim, "c_mktsegment", salt_buckets=8)
    return out.select("c_custkey", "c_mktsegment", "seg_rank")

