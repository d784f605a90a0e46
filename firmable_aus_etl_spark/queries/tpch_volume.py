"""Query-registry part: see section header below.

Split from the monolithic queries.py (round-9, verdict Next #6);
registration order preserved by the package __init__ import order.
"""

from __future__ import annotations

from firmable_aus_etl_spark.queries._base import *  # noqa: F401,F403

# =========================================================================
# TPC-H-shaped depth: Q18 (large-volume customers), Q14 (promo revenue
# share), Q17 (small-quantity revenue vs per-part average).
# =========================================================================


@register(
    "large_volume_customers",
    """
    WITH big AS (
      SELECT l_orderkey, CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT))
                              AS BIGINT) AS qty_c
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) > 30000
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS o_orderdate,
           CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS totalprice_c,
           b.qty_c
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total line quantity exceeds a
    threshold, joined back to orders+customer. The HAVING runs on the
    pre-aggregated lineitem rollup BEFORE the joins, so the join fan-in
    is the handful of big orders, not the fact table. Quantities and
    prices in integer cents for hash-exactness."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_cents(F.col("l_quantity"))).alias("qty_c"))
        .filter(F.col("qty_c") > 30000)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            _cents(F.col("o_totalprice")).alias("totalprice_c"),
            "qty_c",
        )
    )


@register(
    "promo_revenue_share",
    """
    WITH j AS (
      SELECT CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5)
                  AS BIGINT) AS rev,
             CASE WHEN p_type LIKE 'PROMO%' THEN 1 ELSE 0 END AS is_promo
      FROM lineitem JOIN part ON l_partkey = p_partkey
    )
    SELECT CAST(sum(CASE WHEN is_promo = 1 THEN rev ELSE 0 END) AS BIGINT)
             AS promo_rev_c,
           CAST(sum(rev) AS BIGINT) AS total_rev_c,
           CAST(100.0 * sum(CASE WHEN is_promo = 1 THEN rev ELSE 0 END)
                / sum(rev) AS DOUBLE) AS promo_pct
    FROM j
    """,
)
def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of revenue from promo parts — fact join
    to the part dim (broadcast-sized) + one conditional aggregate to a
    single row. Integer-scaled revenue; the final percentage is one
    exact integer division in double."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = _cents(F.col("l_extendedprice") * (1.0 - F.col("l_discount")), 4)
    j = li.join(part, li.l_partkey == part.p_partkey).select(
        rev.alias("rev"),
        F.when(F.col("p_type").startswith("PROMO"), 1).otherwise(0).alias(
            "is_promo"
        ),
    )
    promo = F.sum(F.when(F.col("is_promo") == 1, F.col("rev")).otherwise(0))
    total = F.sum("rev")
    return j.agg(
        promo.alias("promo_rev_c"),
        total.alias("total_rev_c"),
        (100.0 * promo / total).cast("double").alias("promo_pct"),
    )


@register(
    "small_qty_part_revenue",
    """
    WITH w AS (
      SELECT l_partkey,
             CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS qty_c,
             CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS price_c,
             CAST(count(*) OVER (PARTITION BY l_partkey) AS BIGINT) AS n,
             CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT))
                  OVER (PARTITION BY l_partkey) AS BIGINT) AS qty_sum_c
      FROM lineitem
    )
    SELECT l_partkey,
           CAST(count(*) AS BIGINT) AS n_small,
           CAST(sum(price_c) AS BIGINT) AS small_rev_c
    FROM w
    WHERE n >= 2 AND 5 * qty_c * n < qty_sum_c
    GROUP BY l_partkey
    """,
)
def q_small_qty_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lineitems whose quantity is below
    20% of the part's average — the correlated-average filter
    decorrelated into one window over l_partkey, with the comparison
    cross-multiplied (5*qty*n < sum) so it stays in exact integer
    arithmetic (no average division, no FP threshold)."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    frame = li.select(
        "l_partkey",
        _cents(F.col("l_quantity")).alias("qty_c"),
        _cents(F.col("l_extendedprice")).alias("price_c"),
    ).select(
        "l_partkey",
        "qty_c",
        "price_c",
        F.count("*").over(w).alias("n"),
        F.sum("qty_c").over(w).alias("qty_sum_c"),
    )
    return (
        frame.filter(
            (F.col("n") >= 2)
            & (5 * F.col("qty_c") * F.col("n") < F.col("qty_sum_c"))
        )
        .groupBy("l_partkey")
        .agg(
            F.count("*").alias("n_small"),
            F.sum("price_c").alias("small_rev_c"),
        )
    )


@register(
    "cdc_apply_orders",
    """
    WITH chg AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 10 = 0 THEN 'D'
                  WHEN o_orderkey % 10 = 1 THEN 'U'
                  ELSE NULL END AS op,
             o_custkey, o_orderstatus,
             CASE WHEN o_orderkey % 10 = 1
                  THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders
    ), c AS (SELECT * FROM chg WHERE op IS NOT NULL)
    SELECT e.o_orderkey,
           CASE WHEN c.op IS NOT NULL THEN c.o_custkey ELSE e.o_custkey END
             AS o_custkey,
           CAST(floor((CASE WHEN c.op IS NOT NULL THEN c.o_totalprice
                            ELSE e.o_totalprice END) * 100.0 + 0.5) AS BIGINT)
             AS totalprice_c,
           CASE WHEN c.op IS NOT NULL THEN c.o_orderpriority
                ELSE e.o_orderpriority END AS o_orderpriority
    FROM orders e LEFT JOIN c ON e.o_orderkey = c.o_orderkey
    WHERE c.op IS NULL OR c.op <> 'D'
    """,
)
def q_cdc_apply_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply (binlog/Debezium shape): a synthetic change batch
    derived from orders — keys ending in 0 are deletes, keys ending in
    1 are updates (+1.00 on the total) — applied to the snapshot with
    joins.apply_cdc: tombstones drop rows, updates win, untouched rows
    pass through. One full-outer join; oracle replays the same
    semantics as a LEFT JOIN + CASE."""
    orders = load_table(spark, sf_dir, "orders")
    changes = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 10 == 0, "D")
        .when(F.col("o_orderkey") % 10 == 1, "U")
        .alias("op"),
        "o_custkey",
        "o_orderstatus",
        F.when(
            F.col("o_orderkey") % 10 == 1, F.col("o_totalprice") + 1.0
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    ).filter(F.col("op").isNotNull())
    applied = joins.apply_cdc(orders, changes, ["o_orderkey"])
    return applied.select(
        "o_orderkey",
        "o_custkey",
        _cents(F.col("o_totalprice")).alias("totalprice_c"),
        "o_orderpriority",
    )


@register(
    "point_in_time_priority",
    """
    WITH hist AS (
      SELECT o_custkey, o_orderpriority, o_orderdate AS valid_from,
             lead(o_orderdate) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey)
               AS valid_to
      FROM orders
    )
    SELECT l.l_orderkey, l.l_linenumber, h.o_orderpriority AS priority_at_ship
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN hist h ON h.o_custkey = o.o_custkey
              AND h.valid_from <= l.l_shipdate
              AND (h.valid_to IS NULL OR l.l_shipdate < h.valid_to)
    """,
)
def q_point_in_time_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join: each lineitem's ship date looks
    up the customer's priority VERSION valid at that instant — the
    SCD2 validity intervals built inline via lead() (same construction
    as scd2_order_priority_history), then an interval-containment
    join. Versions of one customer don't overlap, so each lineitem
    matches at most one version; at 100 TB the containment join runs
    as the binned range join (point_in_interval_join) instead of the
    BETWEEN theta-join the oracle uses."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    hist = orders.select(
        "o_custkey",
        "o_orderpriority",
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
    )
    fact = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).select("l_orderkey", "l_linenumber", "o_custkey", "l_shipdate")
    return (
        fact.join(
            hist,
            on=[
                fact.o_custkey == hist.o_custkey,
                hist.valid_from <= fact.l_shipdate,
                hist.valid_to.isNull() | (fact.l_shipdate < hist.valid_to),
            ],
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("o_orderpriority").alias("priority_at_ship"),
        )
    )


@register(
    "dau_wau_stickiness",
    """
    WITH daily AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ), days AS (
      SELECT DISTINCT day FROM daily
    ), wau AS (
      SELECT d.day, CAST(count(DISTINCT a.user_id) AS BIGINT) AS wau
      FROM days d JOIN daily a
        ON a.day <= d.day AND a.day >= d.day - INTERVAL 6 DAY
      GROUP BY d.day
    ), dau AS (
      SELECT day, CAST(count(*) AS BIGINT) AS dau FROM daily GROUP BY day
    )
    SELECT dau.day, dau.dau, wau.wau,
           CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE) AS stickiness
    FROM dau JOIN wau ON dau.day = wau.day
    """,
)
def q_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness: daily actives over trailing-7-day actives.
    COUNT(DISTINCT) over a RANGE frame isn't a window Spark (or most
    engines) support, so WAU is the day-spine joined to the distinct
    (day,user) relation over the 7-day interval — the fan-out is
    7 rows per active user-day, not |days| x |users|. Division of the
    two exact bigints is the only FP step."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    days = daily.select("day").distinct()
    wau = (
        days.alias("d")
        .join(
            daily.alias("a"),
            on=[
                F.col("a.day") <= F.col("d.day"),
                F.col("a.day") >= F.date_sub(F.col("d.day"), 6),
            ],
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.count_distinct("a.user_id").alias("wau"))
    )
    dau = daily.groupBy("day").agg(F.count("*").alias("dau"))
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        (F.col("dau").cast("double") / F.col("wau").cast("double")).alias(
            "stickiness"
        ),
    )


@register(
    "priority_transition_matrix",
    """
    WITH seq AS (
      SELECT o_custkey, o_orderpriority AS cur,
             lag(o_orderpriority) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey)
               AS prev
      FROM orders
    )
    SELECT prev, cur, CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE prev IS NOT NULL
    GROUP BY prev, cur
    """,
)
def q_priority_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition matrix over each customer's order
    priority sequence (lag + group count) — the Markov-chain
    estimation shape for sequence features; one window + one
    aggregation, both on o_custkey-compatible partitioning."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = orders.select(
        F.col("o_orderpriority").alias("cur"),
        F.lag("o_orderpriority").over(w).alias("prev"),
    )
    return (
        seq.filter(F.col("prev").isNotNull())
        .groupBy("prev", "cur")
        .agg(F.count("*").alias("n"))
    )

