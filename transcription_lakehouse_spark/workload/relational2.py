"""Second batch of TPC-H-shaped relational queries — completes the 22-query
shape inventory (Q2/Q8/Q9/Q10/Q11/Q20/Q21 were the shapes still missing
after round 1's Q1/3/4/5/6/7/12-19/22).

The testdata has no ``partsupp`` table and no commit/receipt dates, so each
query keeps its TPC-H *relational shape* (the plan-level pattern the
optimizer must handle) while re-basing the predicates on columns that exist:

- Q2  correlated-min subquery / argmin join  → min observed unit price per
  part from lineitem instead of min ps_supplycost.
- Q8  conditional-share-of-total by year      → unchanged (no partsupp need).
- Q9  multi-join profit rollup by nation/year → cost proxy from p_retailprice
  instead of ps_supplycost.
- Q10 returned-item revenue ranking           → unchanged.
- Q11 HAVING-vs-global-scalar value threshold → per-part lineitem value
  instead of stock value.
- Q20 nested semi-join chain (dominant qty)   → supplier's share of a part's
  yearly quantity instead of availqty vs demand.
- Q21 EXISTS/NOT-EXISTS self-join on order    → "late" = shipped >90 days
  after order date instead of receipt > commit.

Scale notes (100 TB): identical discipline to ``relational.py`` — dims
broadcast, facts shuffle once on their join key, one-row global aggregates
are explicitly bounded SinglePartitions, decimal accumulation wherever a
cross-engine money sum is compared at a round boundary.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table

_DEC = "decimal(18,6)"


def _revenue() -> F.Column:
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each part, the supplier(s) achieving the MINIMUM
    unit price — a correlated-min subquery realized as aggregate + equi-join
    back on (part, min_value). Unit price stays a raw IEEE double through
    the min/join (both engines compute the identical division bit-for-bit;
    rounding happens only at projection) so the argmin equality is exact.

    Plan: lineitem shuffles once on (l_partkey, l_suppkey); the per-part min
    re-shuffles the *aggregated* (small) relation; part/supplier/nation/
    region broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "ECONOMY")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    unit = (
        li.filter(F.col("l_quantity") > 0)
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "unit_cost"
            )
        )
    )
    best = unit.groupBy("l_partkey").agg(F.min("unit_cost").alias("_best"))
    best = best.select(F.col("l_partkey").alias("_bp"), "_best")
    return (
        unit.join(
            best,
            (unit["l_partkey"] == F.col("_bp"))
            & (unit["unit_cost"] == F.col("_best")),
        )
        .drop("_bp", "_best")
        .join(F.broadcast(part), unit["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supp), unit["l_suppkey"] == supp["s_suppkey"])
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.round("unit_cost", 4).alias("unit_cost"),
        )
        .orderBy("p_partkey", "s_name")
        .limit(100)
    )


Q2_SQL = """
WITH unit AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE' AND l_quantity > 0
  GROUP BY l_partkey, l_suppkey
)
SELECT p_partkey, p_name, s_name, round(unit_cost, 4) AS unit_cost
FROM unit u
JOIN part     ON u.l_partkey = p_partkey
JOIN supplier ON u.l_suppkey = s_suppkey
WHERE p_size <= 10 AND p_type = 'ECONOMY'
  AND unit_cost = (SELECT min(unit_cost) FROM unit i
                   WHERE i.l_partkey = u.l_partkey)
ORDER BY p_partkey, s_name
LIMIT 100
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_0's share of EUROPE-customer ECONOMY revenue
    per order year — conditional numerator over a grouped total (share-of-
    total without a second pass). Decimal accumulation on both sums so the
    share's 6-decimal round can't straddle an ulp between engines."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    )
    n_supp = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    j = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(n_supp), supp["s_nationkey"] == F.col("sn_key"))
    )
    vol = _revenue()
    target = F.when(F.col("supp_nation") == "NATION_0", vol).otherwise(
        F.lit(0).cast(_DEC)
    )
    return (
        j.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(F.sum(target) / F.sum(vol), 6)
            .cast("double")
            .alias("mkt_share"),
            F.round(F.sum(vol), 2).cast("double").alias("total_volume"),
        )
        .orderBy("o_year")
    )


Q8_SQL = """
SELECT EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS o_year,
       CAST(round(sum(CASE WHEN n2.n_name = 'NATION_0'
                           THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                           ELSE CAST(0 AS DECIMAL(18,6)) END)
                  / sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 6) AS DOUBLE) AS mkt_share,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_volume
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
GROUP BY 1 ORDER BY 1
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year over a
    5-way join with a LIKE filter on part name. Cost proxy (no partsupp):
    10% of retail price per unit. Profit accumulates in decimal —
    thousands of signed terms per group is exactly where double sums
    diverge between engines."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    )
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.lit(0.1) * F.col("l_quantity")
    ).cast(_DEC)
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.round(F.sum(amount), 2).cast("double").alias("sum_profit"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("nation", F.desc("o_year"))
    )


Q9_SQL = """
SELECT n_name AS nation,
       EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS o_year,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                           - p_retailprice * 0.1 * l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_profit,
       count(*) AS n_lines
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2 ORDER BY nation, o_year DESC
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in one
    quarter — fact-fact join pruned by both filters, then a customer-grain
    aggregate ranked with a deterministic tiebreak."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("date"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(F.round(F.sum(_revenue()), 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name, c_acctbal,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o_orderdate AS DATE) <  DATE '1996-04-01'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose traded value (from NATION_0 suppliers)
    exceeds a fixed fraction of the nation's total — GROUP BY ... HAVING >
    global-scalar-subquery. The total is a one-row aggregate of the
    *already-aggregated* per-part relation, broadcast into the filter."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_0"
    )
    value = (F.col("l_extendedprice") * F.col("l_quantity")).cast(_DEC)
    per_part = (
        li.join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .groupBy("l_partkey")
        .agg(F.sum(value).alias("_val"))
    )
    total = per_part.agg(F.sum("_val").alias("_total"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("_val") > F.col("_total") * F.lit(0.005))
        .select(
            "l_partkey",
            F.round("_val", 2).cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "l_partkey")
    )


Q11_SQL = """
WITH per_part AS (
  SELECT l_partkey,
         sum(CAST(l_extendedprice * l_quantity AS DECIMAL(18,6))) AS _val
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_0'
  GROUP BY l_partkey
)
SELECT l_partkey, CAST(round(_val, 2) AS DOUBLE) AS part_value
FROM per_part
WHERE _val > (SELECT sum(_val) FROM per_part) * 0.005
ORDER BY part_value DESC, l_partkey
"""


def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who dominated supply of some filtered part
    in 1997 (shipped >50% of the part's yearly quantity) — the nested
    IN-subquery chain (supplier IN (... part IN (...))) realized as
    aggregate → share filter → semi-join. The share is per-part, computed
    with one window over the (part, supplier) aggregate — grain is already
    reduced, so the window input is small relative to the fact table."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.year("l_shipdate") == 1997
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%gear%")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    qty = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("supp_qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        qty.withColumn("part_qty", F.sum("supp_qty").over(w))
        .filter(F.col("supp_qty") > F.col("part_qty") * 0.5)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(dominant, supp["s_suppkey"] == dominant["l_suppkey"], "semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation["n_nationkey"])
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


Q20_SQL = """
SELECT s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM (
    SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty,
           sum(sum(l_quantity)) OVER (PARTITION BY l_partkey) AS part_qty
    FROM lineitem
    WHERE EXTRACT(year FROM CAST(l_shipdate AS DATE)) = 1997
      AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%gear%')
    GROUP BY l_partkey, l_suppkey
  ) WHERE supp_qty > part_qty * 0.5
)
ORDER BY s_suppkey
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers solely responsible for a late multi-
    supplier order — EXISTS (another supplier on the order) AND NOT EXISTS
    (another supplier who was ALSO late), both realized as self-joins of
    lineitem on l_orderkey (semi + anti). "Late" (no receipt/commit dates
    in testdata) = line shipped >90 days after the order date.

    Plan: orders joins once to flag lateness; the two self-joins shuffle on
    the same l_orderkey key, so the exchange is reused across semi and
    anti."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    supp = load_table(spark, sf_dir, "supplier")
    flagged = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)).alias(
                "late"
            ),
        )
    )
    l1 = flagged.filter(F.col("late")).select("l_orderkey", "l_suppkey")
    others = flagged.select(
        F.col("l_orderkey").alias("o2_key"), F.col("l_suppkey").alias("s2_key")
    )
    late_others = flagged.filter(F.col("late")).select(
        F.col("l_orderkey").alias("o3_key"), F.col("l_suppkey").alias("s3_key")
    )
    waiting = (
        l1.join(
            others,
            (l1["l_orderkey"] == F.col("o2_key"))
            & (l1["l_suppkey"] != F.col("s2_key")),
            "semi",
        )
        .join(
            late_others,
            (l1["l_orderkey"] == F.col("o3_key"))
            & (l1["l_suppkey"] != F.col("s3_key")),
            "anti",
        )
    )
    return (
        waiting.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp["s_suppkey"])
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


Q21_SQL = """
WITH flagged AS (
  SELECT l_orderkey, l_suppkey,
         CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + INTERVAL 90 DAY AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
)
SELECT s_name, count(*) AS numwait
FROM flagged l1
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE l1.late
  AND EXISTS (SELECT 1 FROM flagged l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM flagged l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


def q_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table referential-integrity audit: orphan counts for every
    foreign-key edge of the schema graph in ONE result — the lakehouse
    constraint check engines without enforced FKs (Spark, most warehouses)
    must run as a query. Each edge is a left-anti join against the DISTINCT
    key set of the parent (parent key sets broadcast — dimension-sized),
    rolled up with a union of one-row counts."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    def orphans(child: DataFrame, ckey: str, parent: DataFrame, pkey: str, edge: str) -> DataFrame:
        pk = parent.select(F.col(pkey).alias(ckey)).distinct()
        return (
            child.select(ckey)
            .join(F.broadcast(pk), ckey, "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .select(F.lit(edge).alias("fk_edge"), "n_orphans")
        )

    checks = [
        orphans(li, "l_orderkey", orders, "o_orderkey", "lineitem->orders"),
        orphans(li, "l_partkey", part, "p_partkey", "lineitem->part"),
        orphans(li, "l_suppkey", supp, "s_suppkey", "lineitem->supplier"),
        orphans(orders, "o_custkey", cust, "c_custkey", "orders->customer"),
        orphans(cust, "c_nationkey", nation, "n_nationkey", "customer->nation"),
        orphans(supp, "s_nationkey", nation, "n_nationkey", "supplier->nation"),
        orphans(nation, "n_regionkey", region, "r_regionkey", "nation->region"),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.orderBy("fk_edge")


Q_REF_INTEGRITY_SQL = """
SELECT 'customer->nation' AS fk_edge, CAST(count(*) AS BIGINT) AS n_orphans
FROM customer WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation)
UNION ALL
SELECT 'lineitem->orders', count(*)
FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
UNION ALL
SELECT 'lineitem->part', count(*)
FROM lineitem WHERE l_partkey NOT IN (SELECT p_partkey FROM part)
UNION ALL
SELECT 'lineitem->supplier', count(*)
FROM lineitem WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier)
UNION ALL
SELECT 'nation->region', count(*)
FROM nation WHERE n_regionkey NOT IN (SELECT r_regionkey FROM region)
UNION ALL
SELECT 'orders->customer', count(*)
FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
UNION ALL
SELECT 'supplier->nation', count(*)
FROM supplier WHERE s_nationkey NOT IN (SELECT n_nationkey FROM nation)
ORDER BY fk_edge
"""


def q_nation_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT set operation (the one set-op shape the workload didn't
    yet exercise): nations that BOTH have a BUILDING-segment customer AND
    a supplier with above-average balance. Each side reduces to a distinct
    key set before the intersect, so the set op runs on dimension-sized
    relations regardless of fact-table size."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    supp = load_table(spark, sf_dir, "supplier")
    avg_bal = supp.agg(F.avg("s_acctbal").alias("_avg"))
    rich_supp = supp.join(F.broadcast(avg_bal)).filter(
        F.col("s_acctbal") > F.col("_avg")
    )
    a = cust.select(F.col("c_nationkey").alias("nationkey")).distinct()
    b = rich_supp.select(F.col("s_nationkey").alias("nationkey")).distinct()
    nation = load_table(spark, sf_dir, "nation")
    return (
        a.intersect(b)
        .join(F.broadcast(nation), F.col("nationkey") == nation["n_nationkey"])
        .select("nationkey", "n_name")
        .orderBy("nationkey")
    )


Q_NATION_INTERSECT_SQL = """
SELECT nationkey, n_name
FROM (
  SELECT DISTINCT c_nationkey AS nationkey FROM customer
  WHERE c_mktsegment = 'BUILDING'
  INTERSECT
  SELECT DISTINCT s_nationkey FROM supplier
  WHERE s_acctbal > (SELECT avg(s_acctbal) FROM supplier)
)
JOIN nation ON nationkey = n_nationkey
ORDER BY nationkey
"""


QUERIES = {
    "q_nation_intersect": q_nation_intersect,
    "q_referential_integrity": q_referential_integrity,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q10_returned_items": q10_returned_items,
    "q11_important_parts": q11_important_parts,
    "q20_dominant_suppliers": q20_dominant_suppliers,
    "q21_waiting_suppliers": q21_waiting_suppliers,
}

ORACLES = {
    "q_nation_intersect": Q_NATION_INTERSECT_SQL,
    "q_referential_integrity": Q_REF_INTEGRITY_SQL,
    "q2_min_cost_supplier": Q2_SQL,
    "q8_market_share": Q8_SQL,
    "q9_product_profit": Q9_SQL,
    "q10_returned_items": Q10_SQL,
    "q11_important_parts": Q11_SQL,
    "q20_dominant_suppliers": Q20_SQL,
    "q21_waiting_suppliers": Q21_SQL,
}
