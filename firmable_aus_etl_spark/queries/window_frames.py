"""Query-registry part: see section header below.

Split from the monolithic queries.py (round-9, verdict Next #6);
registration order preserved by the package __init__ import order.
"""

from __future__ import annotations

from firmable_aus_etl_spark.queries._base import *  # noqa: F401,F403

# =========================================================================
# Widening batch: window frames, part/supplier coverage, subquery shape.
# =========================================================================

@register(
    "moving_avg_order_totals",
    """
    WITH o AS (
      SELECT o_custkey, o_orderkey, o_orderdate,
             CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
      FROM orders
    )
    SELECT o_custkey, o_orderkey,
           CAST(sum(cents) OVER w AS DOUBLE)
             / (100.0 * count(*) OVER w) AS moving_avg
    FROM o
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def q_moving_avg_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frame specs (SURVEY §2.6 note): 3-row moving average per
    customer over order date, deterministic frame order via orderkey.

    Prices are summed as integer CENTS inside the frame: integer frame
    sums are order-independent and exact, so the result is bit-identical
    across engines regardless of their windowed-aggregation internals
    (DuckDB segment trees vs Spark frame recompute) — and no round() is
    needed, avoiding the engines' half-rounding divergence.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (
            F.sum(cents).over(w).cast("double") / (F.lit(100.0) * F.count("*").over(w))
        ).alias("moving_avg"),
    )


@register(
    "trailing_30d_revenue",
    """
    WITH o AS (
      SELECT o_custkey, o_orderkey,
             date_diff('day', DATE '1970-01-01', o_orderdate) AS day_no,
             CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
      FROM orders WHERE o_custkey % 50 = 0
    )
    SELECT o_custkey, o_orderkey, CAST(day_no AS BIGINT) AS day_no,
           CAST(sum(cents) OVER w AS BIGINT) AS trailing_cents,
           CAST(count(*) OVER w AS BIGINT)   AS n_orders_30d
    FROM o
    WINDOW w AS (PARTITION BY o_custkey ORDER BY day_no
                 RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
    """,
)
def q_trailing_30d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame spec (§2.6: frames are native, zero custom work):
    per-customer trailing-30-day revenue — a VALUE-based frame over
    days-since-epoch, so two orders 40 days apart never share a frame
    even when adjacent by row. Integer-cents sum keeps the hash gate
    exact. RANGE frames are order-dependent state per partition: at
    100 TB the shuffle is one hash exchange on the partition key, same
    as any window — the frame bound adds no extra pass."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 50 == 0)
    day_no = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
    cents = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
    base = orders.select(
        "o_custkey", "o_orderkey", day_no.alias("day_no"), cents.alias("cents")
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day_no")
        .rangeBetween(-30, Window.currentRow)
    )
    return base.select(
        "o_custkey",
        "o_orderkey",
        F.col("day_no").cast("long").alias("day_no"),
        F.sum("cents").over(w).alias("trailing_cents"),
        F.count("*").over(w).alias("n_orders_30d"),
    )


@register(
    "customer_order_gaps",
    """
    WITH o AS (
      SELECT o_custkey, o_orderkey, o_orderdate,
             CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
      FROM orders WHERE o_custkey % 100 = 0
    )
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day', o_orderdate,
                lead(o_orderdate) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey))
                AS BIGINT) AS days_to_next,
           CAST(ntile(4) OVER (PARTITION BY o_custkey ORDER BY cents, o_orderkey)
                AS BIGINT) AS price_quartile
    FROM o
    """,
)
def q_customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic functions (§2.6 widening): lead() inter-order gap in
    days and ntile(4) price quartile per customer. Deterministic via
    orderkey tie-breaks; ntile ranks integer cents so equal prices
    cannot flip quartiles between engines."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 100 == 0)
    cents = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
    wd = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wp = Window.partitionBy("o_custkey").orderBy(cents, "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.lead("o_orderdate").over(wd), F.col("o_orderdate"))
        .cast("long")
        .alias("days_to_next"),
        F.ntile(4).over(wp).cast("long").alias("price_quartile"),
    )


@register(
    "part_brand_stats",
    """
    SELECT p_brand,
           count(*) AS cnt,
           CAST(sum(CAST(floor(p_retailprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
             / (100.0 * count(*)) AS avg_price,
           min(p_size) AS min_size,
           max(p_size) AS max_size,
           CAST(sum(CASE WHEN p_type LIKE 'SMALL%' THEN 1 ELSE 0 END) AS BIGINT) AS small_types
    FROM part GROUP BY p_brand
    """,
)
def q_part_brand_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part-table coverage: grouped stats + LIKE-prefix conditional agg."""
    part = load_table(spark, sf_dir, "part")
    return part.groupBy("p_brand").agg(
        F.count("*").alias("cnt"),
        (F.sum(_cents(F.col("p_retailprice"))).cast("double") / (F.lit(100.0) * F.count("*"))).alias(
            "avg_price"
        ),
        F.min("p_size").alias("min_size"),
        F.max("p_size").alias("max_size"),
        F.sum(F.col("p_type").startswith("SMALL").cast("long")).alias("small_types"),
    )


@register(
    "top_suppliers_by_revenue",
    """
    WITH rev AS (
      SELECT l_suppkey,
             sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5) AS BIGINT)) AS rev_c
      FROM lineitem GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(rev_c AS DOUBLE) / 10000.0 AS revenue
    FROM rev JOIN supplier ON l_suppkey = s_suppkey
    ORDER BY rev_c DESC, s_suppkey LIMIT 10
    """,
)
def q_top_suppliers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """agg -> broadcast dim join -> global top-k (TakeOrderedAndProject)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(_cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4)).alias(
            "rev_c"
        )
    )
    return (
        rev.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        # integer-cents ordering: the top-10 cut is deterministic even
        # under cross-engine/run FP noise
        .orderBy(F.col("rev_c").desc(), F.col("s_suppkey").asc())
        .limit(10)
        .select("s_suppkey", "s_name", (F.col("rev_c").cast("double") / 10000.0).alias("revenue"))
    )


@register(
    "orders_well_above_customer_avg",
    """
    WITH o AS (
      SELECT o_orderkey, o_custkey, o_totalprice,
             CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
      FROM orders
    ), avgs AS (
      SELECT o_custkey AS k, sum(cents) AS sum_cents, count(*) AS n
      FROM o GROUP BY o_custkey
    )
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM o JOIN avgs ON o_custkey = k
    WHERE 2 * o.cents * n > 3 * sum_cents
    """,
)
def q_orders_well_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decorrelated-subquery shape: orders 50% above their customer's
    average (Catalyst rewrites the correlated form to this same
    aggregate+join — expressed directly as the join). The 1.5x
    threshold compares in pure integer cents (2*cents*n > 3*sum) so no
    FP multiply can flip a boundary row between engines. Sibling of
    orders_above_customer_avg (window-decorrelated, 1x threshold)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice",
        _cents(F.col("o_totalprice")).alias("cents"),
    )
    avgs = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.sum("cents").alias("sum_cents"), F.count("*").alias("n")
    )
    return (
        orders.join(avgs, F.col("o_custkey") == F.col("k"))
        .filter(2 * F.col("cents") * F.col("n") > 3 * F.col("sum_cents"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )

