"""Query-registry part: see section header below.

Split from the monolithic queries.py (round-9, verdict Next #6);
registration order preserved by the package __init__ import order.
"""

from __future__ import annotations

from firmable_aus_etl_spark.queries._base import *  # noqa: F401,F403
from firmable_aus_etl_spark.queries.llm_text import (  # noqa: F401
    _TOKENS_SQL,
)
from firmable_aus_etl_spark.queries.minhash_portable import (  # noqa: F401
    _portable_minhash_oracle,
)

# =========================================================================
# TPC-H depth family: the classic decision-support shapes (Q3/Q7/Q8/
# Q10/Q19/Q22 analogs on the driver testdata's column subset) — the
# query semantics a reference user would expect an analytics engine to
# run, each with the exact-cents revenue discipline and a DuckDB twin.
# =========================================================================

_Q3_ORACLE = """
SELECT l_orderkey,
       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("shipping_priority_top10", _Q3_ORACLE)
def q_shipping_priority_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped-revenue top-10 for one market segment.
    The segment filter prunes customer BEFORE the join (selective dim
    side), date predicates push to both fact scans, and the top-10 is
    TakeOrderedAndProject — only 10 rows per partition survive."""
    cutoff = F.lit("1998-01-01").cast("timestamp")
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    joined = li.join(
        orders, F.col("l_orderkey") == F.col("o_orderkey")
    ).join(cust, F.col("o_custkey") == F.col("c_custkey"))
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            (
                F.sum(
                    _cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4)
                ).cast("double")
                / 10000.0
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


_Q7_ORACLE = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
   OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
GROUP BY supp_nation, cust_nation, l_year
"""


@register("volume_shipping_by_year", _Q7_ORACLE)
def q_volume_shipping_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations per
    ship year. The nation dim broadcasts twice (supplier-side and
    customer-side roles); the pair predicate is applied after both
    roles resolve — Catalyst pushes each nation's IN-filter into its
    own broadcast, so the fact only carries rows from the two nations."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sn = F.broadcast(
        nation.filter(F.col("n_name").isin("NATION_1", "NATION_2")).select(
            F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
        )
    )
    cn = F.broadcast(
        nation.filter(F.col("n_name").isin("NATION_1", "NATION_2")).select(
            F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
        )
    )
    joined = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(sn, F.col("s_nationkey") == F.col("s_nk"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(cn, F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(
        (
            F.sum(
                _cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4)
            ).cast("double")
            / 10000.0
        ).alias("revenue")
    )


_Q8_ORACLE = """
WITH allrev AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5) AS BIGINT) AS volume,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region    ON cn.n_regionkey = r_regionkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
)
SELECT o_year,
       CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END) AS DOUBLE)
         / CAST(sum(volume) AS DOUBLE) AS mkt_share
FROM allrev GROUP BY o_year
"""


@register("market_share_by_year", _Q8_ORACLE)
def q_market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of PROMO-part revenue among
    ASIA customers per order year. The share is a conditional-sum /
    total-sum ratio computed in ONE aggregation pass (no self-join);
    numerator and denominator are exact integer cents, so the division
    is bit-identical across engines."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    supp = F.broadcast(
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    asia_nations = F.broadcast(
        nation.join(
            region, F.col("n_regionkey") == F.col("r_regionkey")
        )
        .filter(F.col("r_name") == "ASIA")
        .select(F.col("n_nationkey").alias("c_nk"))
    )
    supp_nation = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
        )
    )
    joined = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(supp_nation, F.col("s_nationkey") == F.col("s_nk"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(asia_nations, F.col("c_nationkey") == F.col("c_nk"))
    )
    vol = _cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4)
    return (
        joined.select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
                        F.lit(0)
                    )
                ).cast("double")
                / F.sum("volume").cast("double")
            ).alias("mkt_share")
        )
    )


_Q10_ORACLE = """
SELECT c_custkey, c_name,
       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
       CAST(floor(c_acctbal * 100.0 + 0.5) AS DOUBLE) / 100.0 AS c_acctbal,
       n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-07-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("returned_items_top_customers", _Q10_ORACLE)
def q_returned_items_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue in a
    two-quarter window. Both date bounds and the returnflag filter
    push to the fact scans; nation broadcasts; the global top-20 is
    TakeOrderedAndProject."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    nation = F.broadcast(
        load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            (
                F.sum(
                    _cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4)
                ).cast("double")
                / 10000.0
            ).alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            (_cents(F.col("c_acctbal"), 2).cast("double") / 100.0).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


_Q19_ORACLE = """
SELECT CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 25)
   OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 35)
"""


@register("brand_quantity_revenue", _Q19_ORACLE)
def q_brand_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive brand x quantity-band predicate
    revenue. The quantity range union (1..35) prunes the fact scan
    BEFORE the join; the brand-band disjunction evaluates after the
    broadcast part join resolves p_brand — one broadcast, no shuffle
    until the single-row aggregate."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
        .select("p_partkey", "p_brand")
    )
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("l_quantity").between(1, 15))
        | ((F.col("p_brand") == "Brand#2") & F.col("l_quantity").between(10, 25))
        | ((F.col("p_brand") == "Brand#3") & F.col("l_quantity").between(20, 35))
    )
    # scan-level prune: no qualifying row has quantity outside [1, 35]
    joined = (
        li.filter(F.col("l_quantity").between(1, 35))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
    )
    return joined.agg(
        (
            F.sum(
                _cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4)
            ).cast("double")
            / 10000.0
        ).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


_Q22_ORACLE = """
WITH avg_bal AS (
  SELECT CAST(sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
           / (100.0 * count(*)) AS a
  FROM customer WHERE c_acctbal > 0.0
),
idle AS (
  SELECT c.c_custkey, c.c_nationkey, c.c_acctbal
  FROM customer c
  WHERE c.c_acctbal > (SELECT a FROM avg_bal)
    AND NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '1999-01-01')
)
SELECT n_name,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS totacctbal
FROM idle JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


@register("idle_rich_customers", _Q22_ORACLE)
def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no recent
    orders, by nation. The scalar average is a one-row broadcast
    (cross join), the NOT EXISTS is a left-anti join against the
    date-pruned orders scan — the decorrelated plan Catalyst produces
    from the subquery form, written directly."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(_cents(F.col("c_acctbal"), 2)).cast("double")
            / (F.lit(100.0) * F.count("*"))
        ).alias("a")
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    idle = (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    )
    nation = F.broadcast(
        load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    return (
        idle.join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            (F.sum(_cents(F.col("c_acctbal"), 2)).cast("double") / 100.0).alias(
                "totacctbal"
            ),
        )
    )


_Q4_ORACLE = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
"""


@register("priority_late_orders", _Q4_ORACLE)
def q_priority_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): count orders per
    priority that had at least one lineitem shipped >30 days after the
    order date (the commitdate-miss analog on this column subset).
    EXISTS compiles to a LEFT SEMI hash join on l_orderkey — the fact
    side is deduplicated by the semi join itself, no distinct needed;
    the date window pushes to the orders scan."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


_Q6_ORACLE = """
SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue_delta
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24.0
"""


@register("forecast_revenue_change", _Q6_ORACLE)
def q_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecasting revenue change): the pure
    filtered-scan scalar aggregate — all three predicates push into the
    parquet scan (PushedFilters on shipdate/discount/quantity), then a
    single partial+final sum; zero joins, zero wide shuffles. The
    discount*price product uses the exact-cents discipline so both
    engines sum identical integers."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24.0)
    )
    return li.agg(
        (
            F.sum(_cents(F.col("l_extendedprice") * F.col("l_discount"), 4)).cast(
                "double"
            )
            / 10000.0
        ).alias("revenue_delta")
    )


_Q13_ORACLE = """
WITH c_orders AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '4-%'
  GROUP BY c_custkey
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM c_orders GROUP BY c_count
"""


@register("custdist_order_counts", _Q13_ORACLE)
def q_custdist_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer distribution): histogram of per-customer
    order counts INCLUDING zero-order customers — the left outer join
    with the priority filter in the join condition (not a WHERE, which
    would drop the never-ordered rows). Two aggregations: the first
    shuffles on c_custkey, the second on the tiny count domain."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    joined = cust.join(
        orders,
        (F.col("c_custkey") == F.col("o_custkey"))
        & (~F.col("o_orderpriority").like("4-%")),
        "left",
    )
    per_cust = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


_Q16_ORACLE = """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


@register("supplier_breadth_parts", _Q16_ORACLE)
def q_supplier_breadth_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): how many distinct
    suppliers ship each qualifying (brand, type, size), excluding
    blacklisted suppliers (negative balance = the complaints analog;
    lineitem is this testdata's part-supplier link, there is no
    partsupp table). Both dims broadcast: part filters BEFORE its
    join, the blacklist rides a broadcast LEFT ANTI; the only wide
    exchange is the final distinct-count on the (brand,type,size)
    group keys."""
    # part/supplier scale with the fact table: no forced broadcast —
    # size stats elect BroadcastHashJoin locally (plan-tested) and AQE
    # re-plans at runtime; at 100 TB these sides exceed the threshold
    # and correctly fall back to shuffle joins
    part = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#5")
            & (F.col("p_type") != "PROMO")
            & (F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49))
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    blacklist = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(blacklist, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


_Q21_ORACLE = """
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
"""


@register("suppliers_kept_waiting", _Q21_ORACLE)
def q_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): for finished
    orders, count per supplier the multi-supplier orders where ONLY that
    supplier shipped late (>60 days after order date — the
    receipt/commit analog on this column subset).

    The oracle keeps the textbook correlated EXISTS / NOT EXISTS; the
    Spark plan DEcorrelates both into ONE per-order aggregation:
    distinct (order, supplier, was_late) -> per-order supplier count +
    late-supplier count -> the qualifying rows are late suppliers in
    orders with n_suppliers > 1 AND n_late = 1. One shuffle on
    l_orderkey replaces two correlated re-scans of lineitem — the
    oracle hash-match is the equivalence proof."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    # late_items keeps lineitem granularity: Q21's count(*) counts every
    # qualifying l1 ROW, so a supplier twice-late on one order counts 2
    per_supp = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.sum(
                (
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
                ).cast("long")
            ).alias("late_items")
        )
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count("*").alias("n_suppliers"),
        F.sum((F.col("late_items") > 0).cast("long")).alias("n_late"),
    )
    waiting = (
        per_supp.filter(F.col("late_items") > 0)
        .join(per_order, on="l_orderkey")
        .filter((F.col("n_suppliers") > 1) & (F.col("n_late") == 1))
    )
    # supplier scales with SF: stats/AQE elect the broadcast, no hint
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("late_items").alias("numwait"))
    )


_Q15_ORACLE = """
WITH rev AS (
  SELECT l_suppkey,
         sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5) AS BIGINT)) AS rev_c
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(rev_c AS DOUBLE) / 10000.0 AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_c = (SELECT max(rev_c) FROM rev)
"""


@register("max_revenue_suppliers", _Q15_ORACLE)
def q_max_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier, tie-inclusive): quarterly revenue
    per supplier, return EVERY supplier matching the maximum (the view +
    scalar-subquery form, not a LIMIT cut). Integer-cents revenue makes
    the equality well-defined across engines. The scalar max is a
    one-row broadcast against the already-aggregated (tiny) rev frame —
    the fact table is scanned once."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            _cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4)
        ).alias("rev_c")
    )
    mx = rev.agg(F.max("rev_c").alias("mx"))
    # supplier scales with SF: stats/AQE elect the broadcast, no hint
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), F.col("rev_c") == F.col("mx"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_c").cast("double") / 10000.0).alias("total_revenue"),
        )
    )


_Q2_ORACLE = """
WITH costs AS (
  SELECT l_partkey, l_suppkey,
         min(CAST(floor(l_extendedprice / l_quantity * 100.0 + 0.5) AS BIGINT)) AS unit_c
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY l_partkey, l_suppkey
),
best AS (
  SELECT l_partkey, l_suppkey, unit_c,
         row_number() OVER (PARTITION BY l_partkey
                            ORDER BY unit_c, l_suppkey) AS rn
  FROM costs
)
SELECT p_partkey, p_name, s_name, s_acctbal,
       CAST(unit_c AS DOUBLE) / 100.0 AS min_unit_price
FROM best JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE rn = 1 AND p_size = 15
"""


@register("min_cost_supplier_per_part", _Q2_ORACLE)
def q_min_cost_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): for each size-15 part,
    the cheapest EUROPE supplier by observed unit price (lineitem is
    this testdata's partsupp; unit price rounds to integer cents first
    so the arg-min and its tie-break are exact). Region filter prunes
    the supplier dim BEFORE the fact join (broadcast), and the p_size
    filter prunes the fact scan BEFORE the aggregation + window: the
    per-part arg-min commutes with any filter on the window's own
    partition key, so joining the filtered part dim first (broadcast)
    drops ~98% of the (part, supplier) aggregation and window work —
    a semi-join pushdown through the window that Catalyst does not
    derive on its own (it only pushes literal predicates through
    Window, not join-sourced ones). Round-8b: previously the part
    filter applied AFTER the arg-min; same rows, measured faster."""
    # region/nation are fixed-size (hinted); the supplier-derived frame
    # scales with SF — stats/AQE elect its broadcast
    eu_supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").join(
                    F.broadcast(
                        load_table(spark, sf_dir, "region").filter(
                            F.col("r_name") == "EUROPE"
                        )
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal")
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") == 15)
        .select("p_partkey", "p_name")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    costs = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(eu_supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "p_name", "l_suppkey")
        .agg(
            F.min(
                _cents(F.col("l_extendedprice") / F.col("l_quantity"), 2)
            ).alias("unit_c")
        )
    )
    from firmable_aus_etl_spark.operators.windows import topk_per_group

    best = topk_per_group(
        costs,
        ["l_partkey"],
        [F.col("unit_c").asc(), F.col("l_suppkey").asc()],
        k=1,
    )
    supp_names = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal"
    )
    return (
        best.withColumn("p_partkey", F.col("l_partkey"))
        .join(supp_names, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "s_acctbal",
            (F.col("unit_c").cast("double") / 100.0).alias("min_unit_price"),
        )
    )


_Q11_ORACLE = """
WITH val AS (
  SELECT l_partkey,
         sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5) AS BIGINT)) AS val_c
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, CAST(val_c AS DOUBLE) / 10000.0 AS part_value
FROM val
WHERE CAST(val_c AS DOUBLE) > 0.0005 * (SELECT CAST(sum(val_c) AS DOUBLE) FROM val)
"""


@register("important_parts_value", _Q11_ORACLE)
def q_important_parts_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): parts whose shipped value
    exceeds a fixed fraction of the GLOBAL shipped value — groupwise agg
    + scalar-subquery HAVING. The global total re-aggregates the tiny
    per-part frame (no second fact scan) and broadcasts as a one-row
    join; exchange reuse dedups the shared agg subtree."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    val = li.groupBy("l_partkey").agg(
        F.sum(
            _cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4)
        ).alias("val_c")
    )
    total = val.agg(F.sum("val_c").cast("double").alias("tot"))
    return (
        val.join(F.broadcast(total))
        .filter(F.col("val_c").cast("double") > 0.0005 * F.col("tot"))
        .select(
            "l_partkey", (F.col("val_c").cast("double") / 10000.0).alias("part_value")
        )
    )


_Q20_ORACLE = """
WITH per_ps AS (
  SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_partkey, l_suppkey
),
per_p AS (SELECT l_partkey, sum(qty) AS tot FROM per_ps GROUP BY l_partkey)
SELECT DISTINCT s_suppkey, s_name
FROM per_ps JOIN per_p USING (l_partkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE qty > 0.5 * tot AND tot > qty
"""


@register("excess_volume_suppliers", _Q20_ORACLE)
def q_excess_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (excess-share suppliers): suppliers who shipped
    more than half of some contested part's 1997 volume (the
    availability-threshold analog; tot > qty keeps only parts with
    competing suppliers). Quantities are small integers in double, so
    the sums and the 0.5 comparison are exact. Two stacked aggregations
    on co-partitioned keys (the second groups a subset of the first's
    keys), then DISTINCT over the small survivor set."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    per_ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    per_p = per_ps.groupBy("l_partkey").agg(F.sum("qty").alias("tot"))
    # supplier scales with SF: stats/AQE elect the broadcast, no hint
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_ps.join(per_p, on="l_partkey")
        .filter((F.col("qty") > 0.5 * F.col("tot")) & (F.col("tot") > F.col("qty")))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name")
        .distinct()
    )


_Q9_ORACLE = """
SELECT n_name AS nation, CAST(year(l_shipdate) AS INTEGER) AS o_year,
       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5) AS BIGINT)
                - CAST(floor(p_retailprice * l_quantity * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
         / 10000.0 AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_type = 'STANDARD'
GROUP BY 1, 2
"""


@register("product_profit_by_nation_year", _Q9_ORACLE)
def q_product_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): net margin per supplier
    nation per ship year for one part type, cost basis = p_retailprice
    x quantity (this testdata has no ps_supplycost). Both dims
    broadcast with the part-type filter applied BEFORE its join; the
    margin is a difference of integer ten-thousandths so the sum is
    exact; one wide exchange (the final group-by)."""
    # part/supplier scale with SF (no forced broadcast — stats/AQE
    # decide); nation is fixed-size and keeps its hint
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "STANDARD")
        .select("p_partkey", "p_retailprice")
    )
    supp_nation = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "n_name")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_shipdate",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    margin = _cents(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4
    ) - _cents(F.col("p_retailprice") * F.col("l_quantity"), 4)
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
        )
        .agg((F.sum(margin).cast("double") / 10000.0).alias("sum_profit"))
    )


@register(
    "interpolate_daily_revenue",
    """
    WITH b AS (SELECT CAST(min(o_orderdate) AS DATE) AS d0,
                      CAST(max(o_orderdate) AS DATE) AS d1 FROM orders),
    days AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
             FROM b),
    obs AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS rev_c
      FROM orders WHERE o_orderkey % 97 = 0 GROUP BY 1
    ),
    sp AS (SELECT d.day, o.rev_c FROM days d LEFT JOIN obs o USING (day)),
    nb AS (
      SELECT day, rev_c,
             last_value(rev_c IGNORE NULLS) OVER
               (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_c,
             last_value(CASE WHEN rev_c IS NOT NULL THEN day END IGNORE NULLS) OVER
               (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_d,
             first_value(rev_c IGNORE NULLS) OVER
               (ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_c,
             first_value(CASE WHEN rev_c IS NOT NULL THEN day END IGNORE NULLS) OVER
               (ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_d
      FROM sp
    )
    SELECT day,
           CASE WHEN rev_c IS NOT NULL THEN 'observed'
                WHEN prev_c IS NOT NULL AND next_c IS NOT NULL THEN 'interpolated'
                ELSE 'missing' END AS src,
           CASE
             WHEN rev_c IS NOT NULL THEN CAST(rev_c AS DOUBLE) / 100.0
             WHEN prev_c IS NOT NULL AND next_c IS NOT NULL THEN
               (CAST(prev_c AS DOUBLE)
                + (CAST(next_c AS DOUBLE) - CAST(prev_c AS DOUBLE))
                  * (day - prev_d) / (next_d - prev_d)) / 100.0
             ELSE NULL END AS revenue
    FROM nb
    """,
)
def q_interpolate_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series linear interpolation over a calendar spine — the
    gap-repair step beyond LOCF: days with no observation (a ~1%
    deterministic order sample makes the series sparse at every SF)
    get prev + (next-prev) * elapsed/gap between their nearest
    observed neighbors; leading/trailing gaps stay null ('missing').

    One spine join + two windows (last ignoreNulls preceding, first
    ignoreNulls following) on the DAY-grain frame — the windows run
    over the tiny spine, never the fact table; the fact work is one
    map-side-combined daily sum. Exact: observed sums are integer
    cents, and the interpolation arithmetic is identical double ops in
    both engines (emitted UNrounded: the doubles are bit-identical by
    construction, while round() itself disagrees across engines at FP
    half-boundaries — see the verify-skill gotcha)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("day"),
        "o_orderkey",
        "o_totalprice",
    )
    bounds = orders.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    days = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day")
    )
    obs = (
        orders.filter(F.col("o_orderkey") % 97 == 0)
        .groupBy("day")
        .agg(F.sum(_cents(F.col("o_totalprice"), 2)).alias("rev_c"))
    )
    sp = days.join(obs, "day", "left")
    w_prev = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    w_next = Window.orderBy("day").rowsBetween(0, Window.unboundedFollowing)
    obs_day = F.when(F.col("rev_c").isNotNull(), F.col("day"))
    nb = sp.select(
        "day",
        "rev_c",
        F.last("rev_c", ignorenulls=True).over(w_prev).alias("prev_c"),
        F.last(obs_day, ignorenulls=True).over(w_prev).alias("prev_d"),
        F.first("rev_c", ignorenulls=True).over(w_next).alias("next_c"),
        F.first(obs_day, ignorenulls=True).over(w_next).alias("next_d"),
    )
    interp_ok = F.col("prev_c").isNotNull() & F.col("next_c").isNotNull()
    interp = (
        F.col("prev_c").cast("double")
        + (F.col("next_c").cast("double") - F.col("prev_c").cast("double"))
        * F.datediff(F.col("day"), F.col("prev_d"))
        / F.datediff(F.col("next_d"), F.col("prev_d"))
    ) / 100.0
    return nb.select(
        "day",
        F.when(F.col("rev_c").isNotNull(), F.lit("observed"))
        .when(interp_ok, F.lit("interpolated"))
        .otherwise(F.lit("missing"))
        .alias("src"),
        F.when(F.col("rev_c").isNotNull(), F.col("rev_c").cast("double") / 100.0)
        .when(interp_ok, interp)
        .alias("revenue"),
    )


@register(
    "user_event_profiles",
    """
    WITH c AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_types,
           string_agg(event_type || ':' || CAST(n AS VARCHAR), ','
                      ORDER BY event_type) AS profile
    FROM c GROUP BY user_id
    """,
)
def q_user_event_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-type aggregation with a deterministic wire format: each
    user's event-type histogram collected into a SORTED array and
    serialized 'type:count,...' — the feature-store/profile-export
    shape where nested results must hash stably across engines and
    retries (collect_list alone is partition-order-nondeterministic;
    array_sort pins it). Two stacked aggregations on compatible keys —
    the second reuses the first's (user_id, event_type) partitioning
    modulo dropped key."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    return c.groupBy("user_id").agg(
        F.count("*").alias("n_types"),
        F.array_join(
            F.array_sort(
                F.collect_list(
                    F.concat_ws(":", F.col("event_type"), F.col("n").cast("string"))
                )
            ),
            ",",
        ).alias("profile"),
    )


@register(
    "nation_share_of_region_revenue",
    """
    WITH rev AS (
      SELECT n_regionkey, n_name,
             sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS rev_c
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2
    )
    SELECT r_name, n_name,
           CAST(rev_c AS DOUBLE) / 100.0 AS revenue,
           CAST(rev_c AS DOUBLE)
             / CAST(sum(rev_c) OVER (PARTITION BY n_regionkey) AS DOUBLE)
             AS share_of_region
    FROM rev JOIN region ON n_regionkey = r_regionkey
    """,
)
def q_nation_share_of_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent via window total: each nation's share of its
    region's revenue — groupwise agg, then a window sum over the
    ALREADY-aggregated 25-row frame (the percent-of-total pattern where
    the window never touches the fact table). Integer-cents numerator
    and denominator make the ratio bit-identical across engines."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            "n_nationkey", "n_name", "n_regionkey"
        )
    )
    region = F.broadcast(
        load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    )
    rev = (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_regionkey", "n_name")
        .agg(F.sum(_cents(F.col("o_totalprice"), 2)).alias("rev_c"))
    )
    w = Window.partitionBy("n_regionkey")
    return (
        rev.join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "r_name",
            "n_name",
            (F.col("rev_c").cast("double") / 100.0).alias("revenue"),
            (
                F.col("rev_c").cast("double")
                / F.sum("rev_c").over(w).cast("double")
            ).alias("share_of_region"),
        )
    )


def _semantic_dedup_oracle(dim: int, n_cells: int, seed: int, threshold: float) -> str:
    """SemDeDup twin: fixed unit centroids as literals; cell = argmax
    dot (ties -> lower cell id); pairs within a cell, cosine-verified.
    Same contaminated corpus as embedding_cosine_near_dups."""
    from firmable_aus_etl_spark.functions.vectors import make_planes

    raw = make_planes(dim, n_cells, seed=seed)
    cents = [[x / (sum(v * v for v in c) ** 0.5) for x in c] for c in raw]
    values = ", ".join(
        f"({i}, [" + ", ".join(repr(float(x)) for x in v) + "]::DOUBLE[])"
        for i, v in enumerate(cents)
    )
    return f"""
WITH cent(cell, cvec) AS (VALUES {values}),
raw AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE)
           / 127.0 AS scale
  FROM embeddings
),
corpus AS (
  SELECT vec_id AS id, v FROM raw WHERE scale > 0
  UNION ALL
  SELECT vec_id + 1000000 AS id,
         list_transform(v, x -> floor(x / scale + 0.5) * scale) AS v
  FROM raw WHERE scale > 0
),
dots AS (
  SELECT c.id, cent.cell, list_dot_product(c.v, cent.cvec) AS d
  FROM corpus c CROSS JOIN cent
),
ranked AS (SELECT id, cell, row_number() OVER (PARTITION BY id
                                               ORDER BY d DESC, cell) AS rn
           FROM dots),
assign AS (SELECT id, cell FROM ranked WHERE rn = 1),
pairs AS (
  SELECT a.id AS a_id, b.id AS b_id, a.cell AS cell
  FROM assign a JOIN assign b ON a.cell = b.cell AND a.id < b.id
)
SELECT a_id, b_id, cell,
       list_cosine_similarity(ca.v, cb.v) AS cosine
FROM pairs JOIN corpus ca ON a_id = ca.id JOIN corpus cb ON b_id = cb.id
WHERE list_cosine_similarity(ca.v, cb.v) >= {threshold!r}
"""


@register("semantic_dedup_cell_blocked", _semantic_dedup_oracle(64, 64, 7, 0.99))
def q_semantic_dedup_cell_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped dedup (cluster-blocked): the same
    int8-round-trip-contaminated corpus as embedding_cosine_near_dups,
    blocked by nearest-centroid CELL instead of LSH buckets — one
    equi-join on the cell id, exact cosine verify within cells. Fixed
    seeded centroids make the whole pipeline SQL-expressible (the
    k-means-trained variant swaps in kmeans_centroids and keeps the
    identical plan). Recall trade documented on semantic_dedup_pairs:
    boundary-straddling pairs are missed by design — on this corpus
    497/500 twin pairs share a cell; the 3 straddles are the
    demonstrated trade vs the LSH path's 500/500."""
    from pyspark.sql.types import (
        ArrayType, DoubleType, IntegerType, LongType, StructField, StructType,
    )

    from firmable_aus_etl_spark.functions import vectors as V
    from firmable_aus_etl_spark.operators.partitioning import ensure_parallelism

    raw_planes = V.make_planes(64, 64, seed=7)
    cents = [[x / (sum(v * v for v in c) ** 0.5) for x in c] for c in raw_planes]

    # FULLY FUSED map stage (round-3 verdict item #6): contamination
    # (int8 round-trip twin), scale guard, and nearest-centroid
    # assignment in ONE Arrow pass on the map side of the cell
    # shuffle; the gram-matrix verify consumes the shuffled cells.
    # 2 stages total. FP parity with the SQL twin: abs/max/divide and
    # floor(x/scale+0.5)*scale are exact-result elementwise ops
    # (identical IEEE doubles both engines); only the assignment
    # matmul and gram cosines use numpy pairwise summation, which the
    # oracle compare absorbs at its 9-dp rounding (same trade the
    # assign_cells_arrow path made, parity-tested).
    out_schema = StructType(
        [
            StructField("__id", LongType(), True),
            StructField("__v", ArrayType(DoubleType()), True),
            StructField("cell", IntegerType(), True),
        ]
    )

    def fused(batches):
        import numpy as np
        import pandas as pd

        cm = np.array(cents, dtype=np.float64)
        for pdf in batches:
            if not len(pdf):
                continue
            vf = np.stack([np.asarray(x, dtype=np.float32) for x in pdf["embedding"]])
            v = vf.astype(np.float64)
            scale = np.abs(vf).max(axis=1).astype(np.float64) / 127.0
            keep = scale > 0
            ids = pdf["vec_id"].to_numpy()[keep]
            v, scale = v[keep], scale[keep]
            tw = np.floor(v / scale[:, None] + 0.5) * scale[:, None]
            allv = np.concatenate([v, tw])
            allid = np.concatenate([ids, ids + 1000000])
            cells = np.argmax(allv @ cm.T, axis=1).astype(np.int32)
            yield pd.DataFrame(
                {"__id": allid, "__v": list(allv), "cell": cells}
            )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    assigned = ensure_parallelism(emb, "vec_id").mapInPandas(fused, out_schema)
    return V._semantic_verify_arrow(assigned, 0.99)


def _gopher_oracle() -> str:
    from firmable_aus_etl_spark.functions.text import STOPWORDS

    all_sw = sorted({w for ws in STOPWORDS.values() for w in ws})
    lst = ", ".join(f"'{w}'" for w in all_sw)
    return f"""
    WITH d AS (SELECT doc_id, {_TOKENS_SQL} AS w FROM documents),
    m AS (
      SELECT doc_id,
             CAST(len(w) AS BIGINT) AS n_words,
             CAST(list_sum(list_transform(w, t -> length(t))) AS DOUBLE)
               / CAST(greatest(len(w), 1) AS DOUBLE) AS avg_wlen,
             CAST(len(list_distinct(list_filter(w, t -> t IN ({lst})))) AS BIGINT)
               AS n_stop,
             CAST(len(list_transform(generate_series(1, greatest(len(w) - 1, 1)),
                              i -> w[i] || ' ' || w[i+1]))
               - len(list_distinct(
                   list_transform(generate_series(1, greatest(len(w) - 1, 1)),
                                  i -> w[i] || ' ' || w[i+1]))) AS DOUBLE)
               / CAST(greatest(len(w) - 1, 1) AS DOUBLE) AS dup_bigram_frac
      FROM d
    )
    SELECT doc_id, n_words, dup_bigram_frac,
           n_words BETWEEN 10 AND 100000 AS r_wordcount,
           avg_wlen BETWEEN 3.0 AND 10.0 AS r_avg_word_len,
           n_stop >= 2 AS r_stopwords,
           dup_bigram_frac < 0.4 AS r_low_repetition,
           (n_words BETWEEN 10 AND 100000) AND (avg_wlen BETWEEN 3.0 AND 10.0)
             AND n_stop >= 2 AND dup_bigram_frac < 0.4 AS keep
    FROM m
    """


@register("gopher_rules_documents", _gopher_oracle())
def q_gopher_rules_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule filter (Rae et al. 2021, §A1.1, bounds adapted
    to the synthetic corpus' short docs): per-document word-count band,
    mean-word-length band, distinct-stopword floor, duplicate-bigram
    ceiling — emitted as PER-RULE booleans plus the conjunctive keep
    flag, the shape a curation pipeline audits (why was this dropped?)
    rather than a bare filter. One scan, all expressions; the
    dup-bigram fraction reuses the Gopher repetition definition from
    doc_repetition_scores."""
    from firmable_aus_etl_spark.functions.text import STOPWORDS, tokens, word_ngrams
    from firmable_aus_etl_spark.operators.partitioning import ensure_parallelism

    # heavy text HOFs: decouple from the single-file input layout
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = tokens(F.col("text"))
    all_sw = sorted({w for ws in STOPWORDS.values() for w in ws})
    n = F.size(toks).cast("long")
    avg_wlen = (
        F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)).cast(
            "double"
        )
        / F.greatest(n, F.lit(1)).cast("double")
    )
    n_stop = F.size(
        F.array_distinct(
            F.filter(toks, lambda t: t.isin(*all_sw))
        )
    ).cast("long")
    bi = word_ngrams(F.col("text"), 2)
    dup_frac = (
        (F.size(bi) - F.size(F.array_distinct(bi))).cast("double")
        / F.greatest(F.size(bi), F.lit(1)).cast("double")
    )
    m = docs.select(
        "doc_id",
        n.alias("n_words"),
        avg_wlen.alias("avg_wlen"),
        n_stop.alias("n_stop"),
        dup_frac.alias("dup_bigram_frac"),
    )
    r_wc = (F.col("n_words") >= 10) & (F.col("n_words") <= 100000)
    r_wl = (F.col("avg_wlen") >= 3.0) & (F.col("avg_wlen") <= 10.0)
    r_sw = F.col("n_stop") >= 2
    r_rep = F.col("dup_bigram_frac") < 0.4
    return m.select(
        "doc_id",
        "n_words",
        "dup_bigram_frac",
        r_wc.alias("r_wordcount"),
        r_wl.alias("r_avg_word_len"),
        r_sw.alias("r_stopwords"),
        r_rep.alias("r_low_repetition"),
        (r_wc & r_wl & r_sw & r_rep).alias("keep"),
    )


def _minhash_estimate_oracle(num_hashes: int = 16, bands: int = 8) -> str:
    """Extend the portable-minhash twin: per-position signature
    agreement (the unbiased Jaccard estimator) NEXT TO the exact
    Jaccard on every candidate pair."""
    base = _portable_minhash_oracle(num_hashes=num_hashes, bands=bands)
    est_terms = " + ".join(
        f"CASE WHEN x.s{i} = y.s{i} THEN 1 ELSE 0 END" for i in range(num_hashes)
    )
    return base.replace(
        "\n    SELECT a_id, b_id FROM cand",
        f""",
    est AS (
      SELECT c.a_id, c.b_id,
             CAST({est_terms} AS DOUBLE) / {num_hashes}.0 AS est_jaccard
      FROM cand c JOIN sig x ON c.a_id = x.doc_id JOIN sig y ON c.b_id = y.doc_id
    ),
    ver AS (
      SELECT c.a_id, c.b_id,
             CAST(len(list_intersect(x.shl, y.shl)) AS DOUBLE) AS inter,
             CAST(len(x.shl) + len(y.shl) AS DOUBLE) AS szs
      FROM cand c JOIN sh x ON c.a_id = x.doc_id JOIN sh y ON c.b_id = y.doc_id
    )
    SELECT e.a_id, e.b_id, e.est_jaccard,
           v.inter / (v.szs - v.inter) AS jaccard
    FROM est e JOIN ver v ON e.a_id = v.a_id AND e.b_id = v.b_id
    """,
    )


@register("minhash_jaccard_estimates", _minhash_estimate_oracle())
def q_minhash_jaccard_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MinHash ESTIMATOR made visible: for every LSH candidate pair,
    the per-position signature agreement fraction (an unbiased Jaccard
    estimate, Broder 1997) next to the exact shingle-set Jaccard — the
    audit view for tuning num_hashes/bands (how wrong is the sketch on
    MY corpus?). Portable md5 hash family, so DuckDB replays signatures,
    candidates, estimates AND exact values bit-for-bit."""
    from firmable_aus_etl_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_signature_from,
        shingle_frame,
    )

    docs = load_table(spark, sf_dir, "documents")
    cand = minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=16, bands=8, shingle_n=3, portable=True
    )
    sh = shingle_frame(docs, "doc_id", "text", shingle_n=3)
    sig = sh.select(
        "__id",
        "__sh",
        minhash_signature_from(F.col("__sh"), num_hashes=16, portable=True).alias(
            "__sig"
        ),
    )
    a = sig.select(
        F.col("__id").alias("a_id"),
        F.col("__sh").alias("__sh_a"),
        F.col("__sig").alias("__sig_a"),
    )
    b = sig.select(
        F.col("__id").alias("b_id"),
        F.col("__sh").alias("__sh_b"),
        F.col("__sig").alias("__sig_b"),
    )
    est = F.aggregate(
        F.zip_with("__sig_a", "__sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ).cast("double") / 16.0
    inter = F.size(F.array_intersect("__sh_a", "__sh_b")).cast("double")
    szs = (F.size("__sh_a") + F.size("__sh_b")).cast("double")
    return (
        cand.join(a, "a_id")
        .join(b, "b_id")
        .select(
            "a_id",
            "b_id",
            est.alias("est_jaccard"),
            (inter / (szs - inter)).alias("jaccard"),
        )
    )


@register(
    "overlapping_activity_windows",
    """
    WITH e AS (
      SELECT event_id AS a_id, ts AS a_start, ts + INTERVAL 30 MINUTE AS a_end
      FROM events WHERE event_type = 'error'
    ),
    p AS (
      SELECT event_id AS b_id, ts AS b_start, ts + INTERVAL 30 MINUTE AS b_end
      FROM events WHERE event_type = 'purchase'
    )
    SELECT a_id, b_id,
           CAST(epoch_us(least(a_end, b_end)) - epoch_us(greatest(a_start, b_start))
                AS BIGINT) AS overlap_us
    FROM e JOIN p ON a_start <= b_end AND b_start <= a_end
    """,
)
def q_overlapping_activity_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNKEYED interval-overlap join: every (error, purchase) pair
    whose 30-minute activity windows intersect, with the exact overlap
    in microseconds. The oracle keeps the naive inequality join (which
    Spark would execute as an undistributable nested loop); the engine
    runs the binned equi-join with first-shared-bucket dedup —
    hash-partitioned, no distinct, no nested loop (plan-tested)."""
    from firmable_aus_etl_spark.operators.joins import interval_overlap_join

    ev = load_table(spark, sf_dir, "events")
    win = F.expr("INTERVAL 30 MINUTES")
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("a_id"),
        F.col("ts").alias("a_start"),
        (F.col("ts") + win).alias("a_end"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("b_id"),
        F.col("ts").alias("b_start"),
        (F.col("ts") + win).alias("b_end"),
    )
    out = interval_overlap_join(
        e, p,
        left_start="a_start", left_end="a_end",
        right_start="b_start", right_end="b_end",
        bucket_seconds=1800,
    )
    return out.select(
        "a_id",
        "b_id",
        (
            F.unix_micros(F.least("a_end", "b_end"))
            - F.unix_micros(F.greatest("a_start", "b_start"))
        ).alias("overlap_us"),
    )


@register(
    "asof_next_purchase_within_hour",
    """
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
               ORDER BY p.ts ASC, p.purchase_event_id DESC) AS rn
      FROM e LEFT JOIN p
        ON e.user_id = p.user_id AND p.ts >= e.ts
       AND p.ts <= e.ts + INTERVAL 1 HOUR
    )
    SELECT event_id, user_id, purchase_event_id, purchase_value
    FROM m WHERE rn = 1
    """,
)
def q_asof_next_purchase_within_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join with tolerance: for each error, the same
    user's NEXT purchase within one hour (null beyond it) — the
    recovery-time / attribution shape. Exercises the forward direction
    and the tolerance gate of the union+window merge on the driver's
    oracle path (backward is asof_error_last_purchase); same
    single-shuffle |L|+|R| plan, ties pinned to the greatest
    purchase id."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
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
        direction="forward",
        tolerance=F.expr("INTERVAL 1 HOUR"),
        tiebreak="purchase_event_id",
    )
    return out.select("event_id", "user_id", "purchase_event_id", "purchase_value")


@register(
    "yoy_revenue_growth_by_nation",
    """
    WITH rev AS (
      SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS o_year,
             sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS rev_c
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2
    )
    SELECT n_name, o_year,
           CAST(rev_c AS DOUBLE) / 100.0 AS revenue,
           CAST(rev_c - lag(rev_c) OVER w AS DOUBLE)
             / CAST(lag(rev_c) OVER w AS DOUBLE) AS yoy_growth
    FROM rev
    WINDOW w AS (PARTITION BY n_name ORDER BY o_year)
    """,
)
def q_yoy_revenue_growth_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year growth: yearly revenue per nation, then lag over
    the ALREADY-aggregated (nation, year) frame — the BI growth shape
    where the window never touches the fact table (25 nations x 7
    years = 175 rows under the window). First year per nation is null
    growth. Integer-cents numerator/denominator -> the ratio is the
    same double in both engines."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderdate"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = F.broadcast(
        load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    rev = (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(_cents(F.col("o_totalprice"), 2)).alias("rev_c"))
    )
    w = Window.partitionBy("n_name").orderBy("o_year")
    prev = F.lag("rev_c").over(w)
    return rev.select(
        "n_name",
        "o_year",
        (F.col("rev_c").cast("double") / 100.0).alias("revenue"),
        ((F.col("rev_c") - prev).cast("double") / prev.cast("double")).alias(
            "yoy_growth"
        ),
    )


@register(
    "cumulative_distinct_customers",
    """
    WITH first_seen AS (
      SELECT o_custkey, min(date_trunc('month', o_orderdate)) AS m
      FROM orders GROUP BY o_custkey
    ),
    monthly_new AS (SELECT m, CAST(count(*) AS BIGINT) AS new_customers
                    FROM first_seen GROUP BY m)
    SELECT strftime(m, '%Y-%m') AS month, new_customers,
           CAST(sum(new_customers) OVER (ORDER BY m
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_distinct_customers
    FROM monthly_new
    """,
)
def q_cumulative_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct customers by month via the FIRST-SEEN
    rewrite: a running COUNT(DISTINCT) window does not exist in any
    engine, but each customer enters the cumulative curve exactly once
    — at their first order — so min(month) per customer + a running
    sum of monthly news is the exact answer with one narrow
    aggregation + a window over the tiny month-grain frame (vs
    materializing per-month customer sets). The same rewrite powers
    the HLL streaming view's exactness test."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.date_trunc("month", "o_orderdate").alias("m")
    )
    first_seen = orders.groupBy("o_custkey").agg(F.min("m").alias("m"))
    monthly_new = first_seen.groupBy("m").agg(F.count("*").alias("new_customers"))
    w = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, 0)
    return monthly_new.select(
        F.date_format("m", "yyyy-MM").alias("month"),
        "new_customers",
        F.sum("new_customers").over(w).alias("cum_distinct_customers"),
    )


@register(
    "robust_price_stats_by_segment",
    """
    WITH c AS (
      SELECT o_orderkey, c_mktsegment,
             CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
      FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    med AS (SELECT c_mktsegment, round(quantile_cont(cents, 0.5), 4) AS med
            FROM c GROUP BY c_mktsegment),
    dev AS (SELECT c.c_mktsegment, med,
                   abs(CAST(cents AS DOUBLE) - med) AS adev
            FROM c JOIN med USING (c_mktsegment))
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n,
           round(med / 100.0, 6) AS median_price,
           round(round(quantile_cont(adev, 0.5), 4) / 100.0, 6) AS mad_price,
           round(max(adev) / round(quantile_cont(adev, 0.5), 4), 4)
             AS max_dev_in_mads
    FROM dev GROUP BY c_mktsegment, med
    """,
)
def q_robust_price_stats_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust distribution profile per segment: MEDIAN and MEDIAN
    ABSOLUTE DEVIATION — the location/scale estimators that survive
    the outliers a mean/stddev profile absorbs — plus the maximum
    deviation in MAD units (what an outlier fence compares against; on
    this synthetic corpus it tops out ~2, which is why a 3-MAD count
    would be vacuously zero — profile, not fence, is the honest
    output here). Two exact percentile passes over integer cents
    (Spark percentile == DuckDB quantile_cont, both rounded to 4
    before reuse so derived values stay engine-identical); the median
    broadcasts back as a row-per-segment frame."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    c = orders.join(cust, F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", "c_mktsegment", _cents(F.col("o_totalprice"), 2).alias("cents")
    )
    med = c.groupBy("c_mktsegment").agg(
        F.round(F.percentile("cents", F.lit(0.5)), 4).alias("med")
    )
    dev = c.join(F.broadcast(med), "c_mktsegment").select(
        "c_mktsegment",
        "med",
        F.abs(F.col("cents").cast("double") - F.col("med")).alias("adev"),
    )
    mad = F.round(F.percentile("adev", F.lit(0.5)), 4)
    return (
        dev.groupBy("c_mktsegment", "med")
        .agg(
            F.count("*").alias("n"),
            F.round(F.col("med") / 100.0, 6).alias("median_price"),
            F.round(mad / 100.0, 6).alias("mad_price"),
            F.round(F.max("adev") / mad, 4).alias("max_dev_in_mads"),
        )
        .drop("med")
    )


@register(
    "top_event_paths",
    """
    WITH r AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    paths AS (
      SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
      FROM r WHERE rn <= 3 GROUP BY user_id
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_users
    FROM paths GROUP BY path
    """,
)
def q_top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top entry paths: each user's first three events (ts order,
    event_id tie-break) serialized 'a>b>c', counted across users — the
    product-analytics path view. One window (rn <= 3 survives the
    WindowGroupLimit pushdown), ordered struct-sort serialization so
    the path string is deterministic, then a small group count."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first3 = ev.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)
    paths = first3.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("rn"), F.col("event_type")))
                ),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return paths.groupBy("path").agg(F.count("*").alias("n_users"))

