"""Relational workload over the TPC-H-ish testdata tables.

Covers SURVEY §2 operators: scans/pruning (S9, F8), predicates (F2),
equi-joins with broadcast dims (J1-J5), anti-join (J6/F6), catalog-style
aggregations (A1-A5), distinct aggregation, ranking top-k (W11).

Scale notes (100 TB): every join below either broadcasts a dimension
(region/nation/supplier/part/customer are orders-of-magnitude smaller than
the fact tables) or shuffles on a high-cardinality key (o_orderkey) with AQE
skew handling; aggregations are partial-agg (map-side combine) friendly —
group keys are low-cardinality enums or pruned ids. Filters sit directly on
scan columns so they push down to parquet row-group pruning.

Floats are rounded IN the query (both engines) so oracle hashes match; see
SURVEY §7.4 "floating-point drift".
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide aggregate battery over lineitem (A1/A5/A7)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            # no derived avgs: round(rounded_sum/count, 4) sits exactly on
            # .xxxx5 for power-of-two counts and the two engines round it
            # differently — emit rounded sums + count, consumers divide
            F.round(F.sum("l_discount"), 2).alias("sum_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                  AS sum_qty,
       round(sum(l_extendedprice), 2)                             AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)          AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(sum(l_discount), 2)                                  AS sum_disc,
       count(*)                                                   AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + top-k by revenue (J3, W11)."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("date")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("date")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("o_orderdate"),
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT o_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       strftime(min(o_orderdate), '%Y-%m-%d')            AS o_orderdate
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
  AND CAST(l_shipdate AS DATE) > DATE '1998-01-01'
GROUP BY o_orderkey
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join over all dims, revenue per nation (J1-J5)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("s_nationkey") == F.col("c_nationkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


Q5_SQL = """
SELECT r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE s_nationkey = c_nationkey
GROUP BY r_name, n_name
"""


def q_order_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Status × priority matrix with a distinct aggregate (A3-style)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        # no derived avg (parity rule: half-boundary ties on 2-decimal money)
        F.round(F.sum("o_totalprice"), 2).alias("sum_total"),
    )


Q_ORDER_PROFILE_SQL = """
SELECT o_orderstatus, o_orderpriority,
       count(*)                        AS n_orders,
       count(DISTINCT o_custkey)       AS n_customers,
       round(sum(o_totalprice), 2)     AS sum_total
FROM orders
GROUP BY o_orderstatus, o_orderpriority
"""


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join (J6/F6 incremental-filter shape): customers with no orders,
    counted per nation."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
        )
    )


Q_CUST_NO_ORDERS_SQL = """
SELECT n_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS sum_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY n_name
"""


def q_top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k (W11): 3 highest-revenue parts per brand via
    row_number window; ties broken by partkey for determinism."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    from pyspark.sql import Window

    per_part = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_partkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    w = Window.partitionBy("p_brand").orderBy(F.desc("revenue"), F.asc("p_partkey"))
    return (
        per_part.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("p_brand", "p_partkey", "rank", "revenue")
    )


Q_TOP_PARTS_SQL = """
WITH per_part AS (
  SELECT p_brand, p_partkey,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand, p_partkey
)
SELECT p_brand, p_partkey, rank, revenue
FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey ASC) AS INTEGER) AS rank
  FROM per_part
)
WHERE rank <= 3
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: tight scan-level predicate battery → single-row agg.
    All three filters push down to the parquet scan (PushedFilters)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


Q6_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
  AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q_rollup_order_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping-set aggregation (beyond the reference's surface —
    Spark/DuckDB both support it natively; subtotal rows carry NULL keys)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_total"),
    )


Q_ROLLUP_SQL = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def q_parts_below_type_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape (decorrelated as an agg-join): parts priced
    below their type's average, counted per type."""
    part = load_table(spark, sf_dir, "part")
    # threshold rounded to 4dp on both sides: engine summation-order ulp
    # drift in the raw avg could flip `<` for a price within 1 ulp of the
    # mean. After rounding, the engines agree except on half-boundaries
    # (1e-4 apart) — and no 2-decimal price can fall inside that window,
    # so membership is deterministic.
    type_avg = part.groupBy("p_type").agg(
        F.round(F.avg("p_retailprice"), 4).alias("_avg_price")
    )
    return (
        part.join(F.broadcast(type_avg), "p_type")
        .filter(F.col("p_retailprice") < F.col("_avg_price"))
        .groupBy("p_type")
        .agg(
            F.count(F.lit(1)).alias("n_below_avg"),
            F.round(F.min("p_retailprice"), 2).alias("cheapest"),
        )
    )


Q_PARTS_BELOW_AVG_SQL = """
SELECT p_type, count(*) AS n_below_avg, round(min(p_retailprice), 2) AS cheapest
FROM part p
WHERE p_retailprice < (SELECT round(avg(p_retailprice), 4) FROM part WHERE p_type = p.p_type)
GROUP BY p_type
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: groupBy-HAVING on the fact table feeding a semi-join
    back into an enriched top-k — the 'large volume customer' pattern.

    Scale: the HAVING aggregate shuffles once on o_orderkey (partial aggs
    combine map-side); the qualifying-key set is tiny, so the join back is
    effectively a broadcast semi-join; top-k is TakeOrdered."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(cust, F.col("o_custkey") == cust["c_custkey"])
        .select(
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(20)
    )


Q18_SQL = """
WITH big AS (
  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING round(sum(l_quantity), 2) > 150
)
SELECT c_name, o_orderkey,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
       round(o_totalprice, 2) AS o_totalprice, total_qty
FROM big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey
LIMIT 20
"""


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-count aggregation over a join with a
    NOT-IN anti-subquery (suppliers from EUROPE-region nations excluded —
    the exclusion set is itself join-derived)."""
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    bad = (
        nation.join(
            region.filter(F.col("r_name") == "EUROPE"),
            nation["n_regionkey"] == region["r_regionkey"],
        )
        .select(F.col("n_nationkey").alias("s_nationkey"))
        .distinct()
    )
    good = supplier.join(bad, "s_nationkey", "left_anti")
    joined = li.join(
        good.select("s_suppkey"), li["l_suppkey"] == F.col("s_suppkey")
    ).join(part, li["l_partkey"] == part["p_partkey"])
    return (
        joined.groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type")
    )


Q16_SQL = """
WITH bad AS (
  SELECT DISTINCT n_nationkey
  FROM nation JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
good AS (
  SELECT s_suppkey FROM supplier
  WHERE s_nationkey NOT IN (SELECT n_nationkey FROM bad)
)
SELECT p_brand, p_type,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN good ON l_suppkey = s_suppkey
JOIN part ON l_partkey = p_partkey
GROUP BY p_brand, p_type
ORDER BY supplier_cnt DESC, p_brand, p_type
"""


def q12_priority_by_date_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional-sum pivot — order-priority counts split
    into high/low per ship-year. Pure map-side expressions + one groupBy."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    j = li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(high.cast("long")).alias("high_line_count"),
            F.sum((~high).cast("long")).alias("low_line_count"),
        )
        .orderBy("ship_year")
    )


Q12_SQL = """
SELECT EXTRACT(year FROM CAST(l_shipdate AS DATE)) AS ship_year,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1 ORDER BY 1
"""


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: supplier-nation x customer-nation shipping volume —
    a two-dimension join graph (lineitem→supplier→nation, →orders→customer→
    nation) with every dimension broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(n1), supp["s_nationkey"] == F.col("s_nk"))
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(n2), cust["c_nationkey"] == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    # exact decimal accumulation: double sums over per-group thousands of
    # lines drift in the last ulp between engines and a 2-decimal round at
    # a half-cent boundary flips — decimal addition is order-independent
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        j.groupBy("supp_nation", "cust_nation")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(vol), 2).cast("double").alias("volume"),
        )
        .orderBy("supp_nation", "cust_nation")
    )


Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       count(*) AS n_lines,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS volume
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q4_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join — orders in a date window having at
    least one lineitem shipped >90 days after the order date, counted per
    priority. Scale: left-semi hash join on o_orderkey (the non-equi date
    predicate rides the join as a residual condition); tiny groupBy after."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    late = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"].cast("date") > F.date_add(o["o_orderdate"].cast("date"), 90)),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o_orderdate AS DATE) <  DATE '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o.o_orderkey
      AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + INTERVAL 90 DAY
  )
GROUP BY o_orderpriority
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed k orders (INCLUDING the
    zero-order customers — the left-join-then-histogram pattern). Urgent
    orders are excluded inside the join, not before the count, so 0 means
    'no qualifying orders'. Two shuffles: join on custkey, histogram on k."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional revenue share — % of one month's revenue
    from PROMO parts. Decimal accumulation (order-independent) on both
    engines; part broadcasts into the fact scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-03-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1996-04-01").cast("date"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    j = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    return j.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum(promo), 2).cast("double").alias("promo_revenue"),
        F.round(F.sum(rev), 2).cast("double").alias("total_revenue"),
        F.round(
            (F.lit(100.0) * F.round(F.sum(promo), 2).cast("double"))
            / F.round(F.sum(rev), 2).cast("double"),
            4,
        ).alias("promo_pct"),
    )


Q14_SQL = """
SELECT count(*) AS n_lines,
       CAST(round(sum(CASE WHEN p_type = 'PROMO'
                           THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                           ELSE CAST(0 AS DECIMAL(18,6)) END), 2) AS DOUBLE) AS promo_revenue,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_revenue,
       round(100.0 * CAST(round(sum(CASE WHEN p_type = 'PROMO'
                           THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                           ELSE CAST(0 AS DECIMAL(18,6)) END), 2) AS DOUBLE)
             / CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE), 4) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE CAST(l_shipdate AS DATE) >= DATE '1996-03-01'
  AND CAST(l_shipdate AS DATE) <  DATE '1996-04-01'
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) achieving the MAX revenue over a
    quarter — the scalar-subquery-over-aggregated-view pattern. The global
    max is a one-row aggregate broadcast back into the per-supplier rows
    (bounded SinglePartition, justified in the plan lint)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1996-04-01").cast("date"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .join(F.broadcast(supp), rev["l_suppkey"] == supp["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
    )


Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
    AND CAST(l_shipdate AS DATE) <  DATE '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small orders — lineitems with
    quantity under 20% of their part's average, for one brand. The per-part
    threshold decorrelates to an agg + broadcast join; the final sum is a
    one-row global (justified SinglePartition)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    avg_qty = li.groupBy("l_partkey").agg(
        F.round(F.lit(0.2) * F.avg("l_quantity"), 4).alias("_thresh")
    )
    j = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(avg_qty.join(part, avg_qty["l_partkey"] == part["p_partkey"])
                          .select(avg_qty["l_partkey"].alias("_pk"), "_thresh")),
              li["l_partkey"] == F.col("_pk"))
        .filter(F.col("l_quantity") < F.col("_thresh"))
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(18,6)")) / 7, 2
        ).cast("double").alias("avg_yearly"),
    )


Q17_SQL = """
SELECT count(*) AS n_lines,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))) / 7, 2) AS DOUBLE) AS avg_yearly
FROM lineitem l JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#13'
  AND l_quantity < (
    SELECT round(0.2 * avg(l_quantity), 4) FROM lineitem WHERE l_partkey = l.l_partkey
  )
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate across the join (brand x size
    x quantity bands). Catalyst extracts the common l_partkey = p_partkey
    conjunct so this stays a hash join with a residual disjunction — never
    a cartesian. One-row global result (justified SinglePartition)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 45)
            & F.col("l_quantity").between(20, 40)
        )
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return j.filter(band).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum(rev), 2).cast("double").alias("revenue"),
    )


Q19_SQL = """
SELECT count(*) AS n_lines,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 45 AND l_quantity BETWEEN 20 AND 40)
"""


def q22_idle_wealthy_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average balance and NO urgent
    orders — global-scalar threshold + anti-join, rolled up per nation. The
    average is a one-row aggregate broadcast into the filter (justified
    SinglePartition); the anti-join shuffles on custkey. (Plain 'no orders'
    is vacuous on this testdata — every customer has orders — so the
    anti-join runs against the urgent subset to keep the check non-empty.)"""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.round(F.avg("c_acctbal"), 4).alias("_avg")
    )
    wealthy = (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg"))
    )
    idle = wealthy.join(
        orders, wealthy["c_custkey"] == orders["o_custkey"], "left_anti"
    )
    return idle.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_custs"),
        F.round(F.sum(F.col("c_acctbal").cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("total_bal"),
    )


Q22_SQL = """
SELECT c_nationkey, count(*) AS n_custs,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_bal
FROM customer c
WHERE c_acctbal > (SELECT round(avg(c_acctbal), 4) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c.c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
"""


QUERIES = {
    "q4_late_shipments": q4_late_shipments,
    "q13_customer_distribution": q13_customer_distribution,
    "q14_promo_share": q14_promo_share,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q22_idle_wealthy_customers": q22_idle_wealthy_customers,
    "q18_large_orders": q18_large_orders,
    "q16_supplier_part_counts": q16_supplier_part_counts,
    "q12_priority_by_date_band": q12_priority_by_date_band,
    "q7_nation_volume": q7_nation_volume,
    "q1_pricing_summary": q1_pricing_summary,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q_parts_below_type_avg": q_parts_below_type_avg,
    "q_rollup_order_profile": q_rollup_order_profile,
    "q3_top_revenue_orders": q3_top_revenue_orders,
    "q5_region_revenue": q5_region_revenue,
    "q_order_profile": q_order_profile,
    "q_customers_without_orders": q_customers_without_orders,
    "q_top_parts_per_brand": q_top_parts_per_brand,
}

ORACLES = {
    "q4_late_shipments": Q4_SQL,
    "q13_customer_distribution": Q13_SQL,
    "q14_promo_share": Q14_SQL,
    "q15_top_supplier": Q15_SQL,
    "q17_small_quantity_revenue": Q17_SQL,
    "q19_disjunctive_revenue": Q19_SQL,
    "q22_idle_wealthy_customers": Q22_SQL,
    "q18_large_orders": Q18_SQL,
    "q16_supplier_part_counts": Q16_SQL,
    "q12_priority_by_date_band": Q12_SQL,
    "q7_nation_volume": Q7_SQL,
    "q1_pricing_summary": Q1_SQL,
    "q6_forecast_revenue": Q6_SQL,
    "q_parts_below_type_avg": Q_PARTS_BELOW_AVG_SQL,
    "q_rollup_order_profile": Q_ROLLUP_SQL,
    "q3_top_revenue_orders": Q3_SQL,
    "q5_region_revenue": Q5_SQL,
    "q_order_profile": Q_ORDER_PROFILE_SQL,
    "q_customers_without_orders": Q_CUST_NO_ORDERS_SQL,
    "q_top_parts_per_brand": Q_TOP_PARTS_SQL,
}
