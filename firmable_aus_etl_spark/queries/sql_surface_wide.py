"""Query-registry part: see section header below.

Split from the monolithic queries.py (round-9, verdict Next #6);
registration order preserved by the package __init__ import order.
"""

from __future__ import annotations

from firmable_aus_etl_spark.queries._base import *  # noqa: F401,F403

# =========================================================================
# SQL-surface widening: grouping sets, decorrelated subquery, unpivot,
# conditional aggregates, histogram. (Engine breadth beyond SURVEY §2 —
# the reference's quality-metric/analytics layer would use all of these;
# cf. analytics schema sql/schema_postgres.sql:83-91.)
# =========================================================================

@register(
    "grouping_sets_part_stats",
    """
    SELECT CAST(GROUPING(p_brand) AS INTEGER) AS g_brand,
           CAST(GROUPING(p_size) AS INTEGER) AS g_size,
           p_brand, p_size,
           count(*) AS n_parts,
           CAST(sum(CAST(floor(p_retailprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
             / (100.0 * count(*)) AS avg_retail
    FROM part
    GROUP BY GROUPING SETS ((p_brand), (p_size), ())
    """,
)
def q_grouping_sets_part_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-dimension GROUPING SETS — (brand), (size), and grand total
    in ONE pass (Expand + single shuffle). ROLLUP can't express
    non-hierarchical sets; the naive form is 3 scans + union. Money
    means go through exact integer cents (see _cents)."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.groupingSets([["p_brand"], ["p_size"], []], "p_brand", "p_size")
        .agg(
            F.grouping("p_brand").cast("int").alias("g_brand"),
            F.grouping("p_size").cast("int").alias("g_size"),
            F.count("*").alias("n_parts"),
            (
                F.sum(_cents(F.col("p_retailprice"))).cast("double")
                / (F.lit(100.0) * F.count("*"))
            ).alias("avg_retail"),
        )
        .select("g_brand", "g_size", "p_brand", "p_size", "n_parts", "avg_retail")
    )


@register(
    "orders_above_customer_avg",
    """
    WITH o AS (
      SELECT o_orderkey, o_custkey,
             CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
      FROM orders
    ), s AS (
      SELECT o_custkey, sum(cents) AS sum_cents, count(*) AS n_orders
      FROM o GROUP BY o_custkey
    )
    SELECT o.o_orderkey, o.o_custkey,
           CAST(o.cents AS DOUBLE) / 100.0 AS order_price,
           CAST(s.sum_cents AS DOUBLE) / (100.0 * s.n_orders) AS cust_avg_price
    FROM o JOIN s USING (o_custkey)
    WHERE o.cents * s.n_orders > s.sum_cents
    """,
)
def q_orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape ("orders above this customer's
    average"), decorrelated to a WINDOW over o_custkey — one shuffle,
    no self-join (the oracle keeps the join form DuckDB plans well).
    The filter is pure integer arithmetic (cents*n > sum_cents): no
    FP avg near-tie can flip a row between engines."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", _cents(F.col("o_totalprice")).alias("cents")
    )
    w = Window.partitionBy("o_custkey")
    enriched = orders.select(
        "o_orderkey",
        "o_custkey",
        "cents",
        F.sum("cents").over(w).alias("sum_cents"),
        F.count("*").over(w).alias("n_orders"),
    )
    return enriched.filter(
        F.col("cents") * F.col("n_orders") > F.col("sum_cents")
    ).select(
        "o_orderkey",
        "o_custkey",
        (F.col("cents").cast("double") / 100.0).alias("order_price"),
        (F.col("sum_cents").cast("double") / (F.lit(100.0) * F.col("n_orders"))).alias(
            "cust_avg_price"
        ),
    )


@register(
    "unpivot_part_attrs",
    """
    SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS attr, p_retailprice AS val FROM part
    """,
)
def q_unpivot_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide -> long unpivot (melt) via the native Unpivot node (Spark
    3.4+) — no per-attribute scan+union; one pass emits both rows.
    Inverse of pivot_event_counts' pivot."""
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice"),
    )
    return part.unpivot(["p_partkey"], ["p_size", "p_retailprice"], "attr", "val")


@register(
    "conditional_agg_orders",
    """
    SELECT o_orderpriority,
           count(*) AS n_orders,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           CAST(sum(CASE WHEN o_orderstatus = 'O'
                         THEN CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
                         ELSE 0 END) AS DOUBLE) / 100.0 AS open_revenue,
           CAST(max(CASE WHEN o_orderstatus = 'F'
                         THEN CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
                         END) AS DOUBLE) / 100.0 AS max_finished_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_conditional_agg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregates (FILTER / CASE pivoting) — one scan, one
    shuffle computes per-status metrics side by side; the naive form is
    one query per status. count_if + sum(when) + max(when)."""
    orders = load_table(spark, sf_dir, "orders")
    cents = _cents(F.col("o_totalprice"))
    return orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
        (
            F.sum(F.when(F.col("o_orderstatus") == "O", cents).otherwise(F.lit(0))).cast(
                "double"
            )
            / 100.0
        ).alias("open_revenue"),
        (F.max(F.when(F.col("o_orderstatus") == "F", cents)).cast("double") / 100.0).alias(
            "max_finished_price"
        ),
    )


@register(
    "price_histogram_orders",
    """
    SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bucket,
           count(*) AS n_orders,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price
    FROM orders
    GROUP BY 1
    """,
)
def q_price_histogram_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (distribution profiling): floor-division
    bucketing is a pure per-row expr, so the whole histogram is one
    map-side-combinable groupBy. min/max of raw doubles are
    order-independent — no rounding needed."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.withColumn(
            "bucket", F.floor(F.col("o_totalprice") / F.lit(25000.0)).cast("long")
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


@register(
    "label_centroids_embeddings",
    """
    WITH ex AS (
      SELECT label, unnest(range(len(embedding))) AS pos,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS sv
      FROM embeddings
    )
    SELECT label, CAST(pos AS INTEGER) AS pos,
           CAST(sum(sv) AS DOUBLE) / (1000000.0 * count(*)) AS centroid,
           count(*) AS n_vecs
    FROM ex GROUP BY label, pos
    """,
)
def q_label_centroids_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element-wise per-label centroid of the embedding vectors —
    posexplode + groupBy(label, pos): the distributed alternative to
    collecting vectors to the driver (how ivf_topk trains its
    centroids, here as a standalone oracle-checked query). One
    map-side-combinable shuffle on (label, pos); element sums go
    through exact integer micro-units so accumulation order can't
    drift the hash."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select("label", F.posexplode("embedding").alias("pos", "val"))
    ex = ex.select(
        "label", "pos", _cents(F.col("val").cast("double"), 6).alias("sv")
    )
    return ex.groupBy("label", "pos").agg(
        (F.sum("sv").cast("double") / (F.lit(1000000.0) * F.count("*"))).alias(
            "centroid"
        ),
        F.count("*").alias("n_vecs"),
    )


@register(
    "daily_order_spine",
    """
    WITH b AS (SELECT CAST(min(o_orderdate) AS DATE) AS d0,
                      CAST(max(o_orderdate) AS DATE) AS d1 FROM orders),
    days AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
             FROM b),
    cnt AS (SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_orders
            FROM orders GROUP BY 1)
    SELECT d.day, coalesce(c.n_orders, 0) AS n_orders
    FROM days d LEFT JOIN cnt c USING (day)
    """,
)
def q_daily_order_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine gap fill: sequence(min, max, 1 day) + explode
    generates the dense day dimension FROM the data (no driver-side
    date loop), left-joined to per-day counts with zero fill. The
    spine derives from a 1-row aggregate, so at 100 TB the only real
    work is the map-side-combined count; the join is dim-sized."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("day")
    )
    bounds = orders.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    days = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day")
    )
    cnt = orders.groupBy("day").agg(F.count("*").alias("n_orders"))
    return days.join(cnt, "day", "left").select(
        "day", F.coalesce(F.col("n_orders"), F.lit(0).cast("long")).alias("n_orders")
    )

