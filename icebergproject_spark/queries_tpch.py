"""TPC-H analog batch 2 (§2.6 relational breadth).

The reference (bobo1108/IceBergProject) has no relational benchmark
surface at all — its four Flink jobs are routing + enrichment + one
aggregate (SURVEY §2).  These queries give the engine the classic
decision-support shapes users run on the same star schema: multi-way
joins with mixed nation roles (Q7), return-flag revenue ranking (Q10),
distribution-of-counts (Q13), conditional-aggregate shares (Q14),
correlated-average threshold scans (Q17), HAVING-gated semi joins (Q18),
disjunctive pushdown predicates (Q19), blame-style multi-exists
self-joins (Q21 adapted — the synthetic lineitem has no commit/receipt
dates), and anti-join + scalar-subquery gating (Q22).

Conventions (NOTES.md): money math in DECIMAL end-to-end, terminal cast
to DOUBLE for driver-stable rendering; thresholds as integer/decimal
cross-multiplication, never float division; oracle column names aliased
identically on both sides.

Scale notes per query in docstrings; the common themes: dimension sides
broadcast, aggregates partial-aggregate map-side before their one
shuffle, top-k via TakeOrderedAndProject (never a global sort), and
filters sit in the parquet scan (PushedFilters).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from icebergproject_spark.queries import DEC, DEC4, Query, _t


# --- Q7: volume shipping between two nations -------------------------------

def q_nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue flow between two nations in both
    directions (supplier nation ≠ customer nation), by ship year.

    Plan: lineitem⋈orders is the one big (fact⋈fact) shuffle join on
    l_orderkey; customer, supplier, and both nation dims broadcast; the
    nation-pair filter collapses the probe early.  At 100 TB the
    orderkey join co-locates via bucketing (operators/bucketing.py)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    rev = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    pair = F.col("supp_nation").isin("NATION_1", "NATION_2") & F.col(
        "cust_nation"
    ).isin("NATION_1", "NATION_2")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        # customer/supplier scale with SF: no forced broadcast — AQE
        # broadcasts them while they fit and shuffle-joins beyond that
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair & (F.col("supp_nation") != F.col("cust_nation")))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.sum(rev).cast(DEC4).cast("double").alias("revenue"))
    )


ORACLE_NATION_VOLUME = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))))
            AS DECIMAL(24,4)) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE n1.n_name IN ('NATION_1', 'NATION_2')
  AND n2.n_name IN ('NATION_1', 'NATION_2')
  AND n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
"""


# --- Q10: returned-item reporting ------------------------------------------

def q_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue LOST to returns
    (l_returnflag = 'R').  The return filter reaches the lineitem scan
    (PushedFilters), customer+nation broadcast, top-20 is
    TakeOrderedAndProject over the aggregate — never a full sort."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        # customer scales with SF — AQE decides; nation is bounded (25)
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).cast(DEC4).cast("double").alias("lost_revenue"))
        .orderBy(F.col("lost_revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


ORACLE_RETURNED_ITEMS = """
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))))
            AS DECIMAL(24,4)) AS DOUBLE) AS lost_revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY lost_revenue DESC, c_custkey ASC
LIMIT 20
"""


# --- Q13: customer distribution --------------------------------------------

def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the distribution of orders-per-customer — LEFT
    join so zero-order customers count, then a second aggregate over the
    first (count of counts).  Both aggregates partial-aggregate map-side;
    the second one's input is one row per customer, tiny."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


ORACLE_CUSTOMER_DISTRIBUTION = """
SELECT c_count, COUNT(*) AS custdist FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --- Q14: promotion effect --------------------------------------------------

def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: % of revenue from promo parts in one month —
    conditional aggregation (CASE inside SUM), single scan, broadcast
    part dim.  The share is one double division of two exact DECIMAL
    sums, rounded — deterministic at any parallelism."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-09-01") & (F.col("l_shipdate") < "1995-10-01")
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(
        F.lit(0).cast(DEC4)
    )
    agg = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .agg(
            F.sum(promo).cast(DEC4).alias("promo_rev"),
            F.sum(rev).cast(DEC4).alias("total_rev"),
        )
    )
    return agg.select(
        F.round(
            F.lit(100.0) * F.col("promo_rev").cast("double")
            / F.col("total_rev").cast("double"),
            6,
        ).alias("promo_revenue_pct"),
        F.col("promo_rev").cast("double").alias("promo_rev"),
        F.col("total_rev").cast("double").alias("total_rev"),
    )


ORACLE_PROMO_SHARE = """
WITH agg AS (
  SELECT CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                  THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                       (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(24,4)) AS promo_rev,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                  (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))))
              AS DECIMAL(24,4)) AS total_rev
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= DATE '1995-09-01' AND l.l_shipdate < DATE '1995-10-01'
)
SELECT ROUND(100.0 * CAST(promo_rev AS DOUBLE) / CAST(total_rev AS DOUBLE), 6)
         AS promo_revenue_pct,
       CAST(promo_rev AS DOUBLE) AS promo_rev,
       CAST(total_rev AS DOUBLE) AS total_rev
FROM agg
"""


# --- Q17: small-quantity-order revenue --------------------------------------

def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lineitems whose quantity is below
    20% of the part's average — the correlated scalar subquery
    decorrelated into one per-part aggregate joined back.

    Threshold test by integer/decimal CROSS-MULTIPLICATION
    (qty · 5 · n > sum ⟺ qty > sum/(5n)) so no float-division boundary
    can disagree between engines.  Per-brand output keeps the result
    set audit-friendly."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.col("l_quantity").cast(DEC)).alias("qty_sum"),
        F.count(F.lit(1)).alias("qty_n"),
    )
    price = F.col("l_extendedprice").cast(DEC)
    below = (
        F.col("l_quantity").cast(DEC) * F.lit(5) * F.col("qty_n")
    ) < F.col("qty_sum")
    return (
        # per_part/part are one row per part — they scale with SF, so no
        # forced broadcast (AQE handles the small-SF case)
        li.join(per_part, li["l_partkey"] == F.col("pk"))
        .filter(below)
        .join(part, li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_small_lines"),
            F.sum(price).cast(DEC4).cast("double").alias("small_qty_revenue"),
        )
    )


ORACLE_SMALL_QUANTITY = """
WITH per_part AS (
  SELECT l_partkey AS pk,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_sum,
         COUNT(*) AS qty_n
  FROM lineitem GROUP BY 1
)
SELECT p.p_brand,
       COUNT(*) AS n_small_lines,
       CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(24,4))
            AS DOUBLE) AS small_qty_revenue
FROM lineitem l
JOIN per_part ON l.l_partkey = per_part.pk
JOIN part p ON l.l_partkey = p.p_partkey
WHERE CAST(l.l_quantity AS DECIMAL(18,2)) * 5 * qty_n < qty_sum
GROUP BY 1
"""


# --- Q18: large-volume customers --------------------------------------------

def q_large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold,
    with their customer — a HAVING-gated aggregate SEMI-joining the
    fact back.  The heavy aggregate runs FIRST and only qualifying
    orderkeys (few) flow into the join — broadcast, not shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("total_qty"))
        .filter(F.col("total_qty") > F.lit(180).cast(DEC))
    )
    return (
        orders.join(F.broadcast(big), orders["o_orderkey"] == big["l_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.col("o_totalprice").cast(DEC).cast("double").alias("o_totalprice"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
    )


ORACLE_LARGE_ORDERS = """
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
       CAST(big.total_qty AS DOUBLE) AS total_qty
FROM orders o
JOIN (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
  FROM lineitem GROUP BY 1
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 180
) big ON o.o_orderkey = big.l_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
"""


# --- Q19: discounted revenue (disjunctive predicates) ------------------------

def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of three (brand, size,
    quantity-range) predicate bundles.  One join, one aggregate; the
    disjunction is a single boolean column expression, so Catalyst can
    still push the common conjuncts (p_size ≥ 1) and evaluate the OR
    without a union of three scans."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    rev = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    qty = F.col("l_quantity")
    bundle = (
        ((F.col("p_brand") == "Brand#12") & (F.col("p_size").between(1, 5))
         & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & (F.col("p_size").between(1, 10))
           & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & (F.col("p_size").between(1, 15))
           & qty.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .filter(bundle)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(rev).cast(DEC4).cast("double").alias("revenue"),
        )
    )


ORACLE_DISJUNCTIVE = """
SELECT COUNT(*) AS n_lines,
       CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))))
            AS DECIMAL(24,4)) AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
"""


# --- Q21 (adapted): suppliers who shipped last on shared orders --------------

def q_blame_last_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape, adapted to the synthetic schema (no commit /
    receipt dates): on orders served by MULTIPLE suppliers, count how
    often each supplier shipped strictly LAST — the multi-EXISTS blame
    self-join.  Decorrelated into one per-order aggregate (max ship
    date + distinct-supplier count) joined back onto the fact; both
    EXISTS become predicates on that aggregate.  Top-20 suppliers."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    per_order = li.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.max("l_shipdate").alias("max_ship"),
        F.countDistinct("l_suppkey").alias("n_supp"),
    )
    last_lines = (
        # per_order scales with SF (one row per order): no forced broadcast
        li.join(per_order, li["l_orderkey"] == F.col("ok"))
        .filter((F.col("n_supp") >= 2) & (F.col("l_shipdate") == F.col("max_ship")))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    # strictly last: no OTHER supplier shares the max ship date
    solo_last = last_lines.withColumn(
        "n_last", F.count(F.lit(1)).over(Window.partitionBy("l_orderkey"))
    ).filter(F.col("n_last") == 1)
    return (
        solo_last.join(F.broadcast(supp), F.col("l_suppkey") == supp["s_suppkey"])
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_suppkey").asc())
        .limit(20)
    )


ORACLE_BLAME_LAST = """
WITH per_order AS (
  SELECT l_orderkey AS ok, MAX(l_shipdate) AS max_ship,
         COUNT(DISTINCT l_suppkey) AS n_supp
  FROM lineitem GROUP BY 1
),
last_lines AS (
  SELECT DISTINCT l.l_orderkey, l.l_suppkey
  FROM lineitem l JOIN per_order p ON l.l_orderkey = p.ok
  WHERE p.n_supp >= 2 AND l.l_shipdate = p.max_ship
),
solo AS (
  SELECT l_orderkey, l_suppkey,
         COUNT(*) OVER (PARTITION BY l_orderkey) AS n_last
  FROM last_lines
)
SELECT s.s_suppkey, s.s_name, COUNT(*) AS numwait
FROM solo JOIN supplier s ON solo.l_suppkey = s.s_suppkey
WHERE n_last = 1
GROUP BY 1, 2
ORDER BY numwait DESC, s_suppkey ASC
LIMIT 20
"""


# --- Q22: global sales opportunity ------------------------------------------

def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with ABOVE-AVERAGE account balance and
    no RECENT orders (none since 1998-01-01 — every synthetic customer
    has lifetime orders, so the classic "never ordered" gate would be
    degenerate), grouped by nation — scalar subquery (global positive-
    balance average) + anti join.  The average compare cross-multiplies
    (bal · n > sum) to avoid a float boundary; the anti join's build side
    is just the distinct custkeys of the recent window."""
    cust = _t(spark, sf_dir, "customer")
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "1998-01-01")
        .select("o_custkey")
    )
    pos = cust.filter(F.col("c_acctbal") > 0)
    avg_row = pos.agg(
        F.sum(F.col("c_acctbal").cast(DEC)).alias("bal_sum"),
        F.count(F.lit(1)).alias("bal_n"),
    )
    rich = cust.crossJoin(F.broadcast(avg_row)).filter(
        F.col("c_acctbal").cast(DEC) * F.col("bal_n") > F.col("bal_sum")
    )
    idle = rich.join(orders, rich["c_custkey"] == orders["o_custkey"], "left_anti")
    return idle.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(F.col("c_acctbal").cast(DEC)).cast(DEC).cast("double").alias("totacctbal"),
    )


ORACLE_IDLE_RICH = """
WITH avg_bal AS (
  SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS bal_sum, COUNT(*) AS bal_n
  FROM customer WHERE c_acctbal > 0
)
SELECT c.c_nationkey, COUNT(*) AS numcust,
       CAST(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE)
         AS totacctbal
FROM customer c, avg_bal
WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * bal_n > bal_sum
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= DATE '1998-01-01')
GROUP BY 1
"""


TPCH_REGISTRY: dict[str, Query] = {
    "nation_volume_shipping": Query(q_nation_volume_shipping, ORACLE_NATION_VOLUME),
    "returned_item_revenue": Query(q_returned_item_revenue, ORACLE_RETURNED_ITEMS),
    "customer_order_distribution": Query(
        q_customer_order_distribution, ORACLE_CUSTOMER_DISTRIBUTION
    ),
    "promo_revenue_share": Query(q_promo_revenue_share, ORACLE_PROMO_SHARE),
    "small_quantity_revenue": Query(q_small_quantity_revenue, ORACLE_SMALL_QUANTITY),
    "large_order_customers": Query(q_large_order_customers, ORACLE_LARGE_ORDERS),
    "disjunctive_revenue": Query(q_disjunctive_revenue, ORACLE_DISJUNCTIVE),
    "blame_last_supplier": Query(q_blame_last_supplier, ORACLE_BLAME_LAST),
    "idle_rich_customers": Query(q_idle_rich_customers, ORACLE_IDLE_RICH),
}
