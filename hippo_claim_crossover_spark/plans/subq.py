"""§2b relational extensions — correlated-subquery / decorrelation family.

Six TPC-H-shaped queries (Q14/Q15/Q17/Q18/Q19/Q22 silhouettes, adapted to
the fixture schema) whose reference SQL is naturally written with scalar
or correlated subqueries.  The Spark plans are the *decorrelated* forms a
100 TB cluster actually wants:

- correlated AVG per group   → grouped pre-aggregate + equi-join
  (q_small_qty — TPC-H Q17's ``l_quantity < 0.2 * (SELECT avg ...)``),
- scalar global aggregate    → 1-row broadcast nested-loop join, never a
  driver-side ``collect()`` (q_idle_customers, q_top_supplier),
- HAVING over a grouped join → partial/final aggregate then filter
  (q_large_orders — Q18's ``sum(l_quantity) > k``),
- disjunctive OR-of-ANDs     → single scan, CASE-labelled branches
  (q_disjunctive — Q19's bracket predicate, one pass not three),
- conditional-aggregation ratio in exact integer micros
  (q_promo_share — Q14's promo revenue share).

Generalizes the reference's one correlated lookup (parent back-reference,
``lib/hippo_claim_crossover.rb:61-66``) to the full subquery surface.

Scale notes: no plan here materializes a per-row subquery.  Every
correlated form is re-expressed as one extra hash aggregate plus one join
on the correlation key, so the added cost at 100 TB is a single shuffle
of the *aggregated* side (≤ |parts| or |suppliers| rows, not lineitems).
Scalar aggregates ride a 1-row broadcast — zero shuffle.  All money math
is exact integer micros (money_sum), so results are engine-identical and
order-insensitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hippo_claim_crossover_spark.plans.base import (
    QuerySpec,
    duck_round,
    money_micros,
    money_sum,
    money_sum_sql,
    t,
)


def q_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape, per brand: revenue locked in small-quantity
    lineitems — lines whose quantity is below 20% of that part's average
    order quantity — as a correlated-AVG filter.

    Reference SQL correlates ``l_quantity < 0.2 * (SELECT avg(l_quantity)
    WHERE l_partkey = outer.l_partkey)``.  The declared plan decorrelates:
    one grouped pre-aggregate over lineitem (partial/final, exact — the
    quantities are small integers so the double sum is order-insensitive),
    an equi-join back on ``l_partkey`` (shuffle carries one row per part,
    not per line), then the brand dimension joins the *filtered* remainder.
    At 100 TB the per-part average table is ~|parts| rows — the join is
    the cheap side; no per-row subquery is ever evaluated.
    """
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice")
    part_avg = (li.groupBy("l_partkey")
                .agg((F.sum("l_quantity") / F.count("l_quantity"))
                     .alias("avg_qty"))
                .withColumnRenamed("l_partkey", "ap_partkey"))
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    small = (li.join(part_avg, li.l_partkey == part_avg.ap_partkey)
             .where(F.col("l_quantity") < 0.2 * F.col("avg_qty")))
    return (small.join(p, small.l_partkey == p.p_partkey)
            .groupBy("p_brand")
            .agg(money_sum(F.col("l_extendedprice")).alias("locked_revenue"),
                 F.count(F.lit(1)).alias("n_small_lines"))
            .orderBy("p_brand"))


ORACLE_SMALL_QTY = f"""
WITH part_avg AS (
  SELECT l_partkey AS ap_partkey,
         sum(l_quantity) / count(l_quantity) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT p.p_brand,
       {money_sum_sql('l.l_extendedprice')} AS locked_revenue,
       count(*) AS n_small_lines
FROM lineitem l
JOIN part_avg a ON l.l_partkey = a.ap_partkey
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_quantity < 0.2 * a.avg_qty
GROUP BY p.p_brand
ORDER BY p.p_brand
"""


def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders — orders whose total line
    quantity exceeds 200 — with their customer, ranked by volume.

    Reference SQL nests ``o_orderkey IN (SELECT l_orderkey ... GROUP BY
    l_orderkey HAVING sum(l_quantity) > 200)``.  Declared plan: the
    grouped HAVING is one partial/final hash aggregate over lineitem
    (map-side combine crushes ~4 lines/order before the shuffle); the
    surviving ~top-percent of orders then join orders and customer.
    Aggregate-before-join: customer never touches raw lineitems.  Top-100
    is TakeOrdered, not a global sort.  Quantities are small integers so
    the double sum is exact and the ranking engine-identical.
    """
    big = (t(spark, sf_dir, "lineitem")
           .groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("sum_qty"))
           .where(F.col("sum_qty") > 200))
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (big.join(o, big.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .select("c_custkey", "c_name", "o_orderkey",
                    F.date_format("o_orderdate", "yyyy-MM-dd")
                    .alias("orderdate"),
                    duck_round(F.col("o_totalprice"), 2).alias("totalprice"),
                    "sum_qty")
            .orderBy(F.col("sum_qty").desc(), "o_orderkey")
            .limit(100))


ORACLE_LARGE_ORDERS = """
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 200
)
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       round(o.o_totalprice, 2) AS totalprice, big.sum_qty
FROM big
JOIN orders o ON big.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY big.sum_qty DESC, o.o_orderkey
LIMIT 100
"""


def q_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive OR-of-ANDs bracket predicate over
    part⋈lineitem, reported per bracket.

    Reference SQL repeats the join three times (one per OR arm) or leans
    on the optimizer to merge them.  Declared plan: ONE scan, one join,
    a CASE labels each surviving row with its bracket, and a single
    grouped aggregate yields revenue per bracket — the disjunction is
    evaluated row-local inside the scan stage, so at 100 TB the
    three-bracket report costs exactly one pass over lineitem.  The
    bracket predicate pushes into the scan as an OR filter.
    """
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size",
                                        "p_type")
    j = li.join(p, li.l_partkey == p.p_partkey)
    b1 = ((F.col("p_type") == "SMALL") & (F.col("p_size") <= 10)
          & F.col("l_quantity").between(1, 15))
    b2 = ((F.col("p_type") == "MEDIUM") & (F.col("p_size") <= 20)
          & F.col("l_quantity").between(10, 25))
    b3 = ((F.col("p_type") == "LARGE") & (F.col("p_size") <= 30)
          & F.col("l_quantity").between(20, 35))
    return (j.where(b1 | b2 | b3)
            .withColumn("bracket",
                        F.when(b1, "small").when(b2, "medium")
                        .otherwise("large"))
            .groupBy("bracket")
            .agg(money_sum(F.col("l_extendedprice")
                           * (F.lit(1.0) - F.col("l_discount")))
                 .alias("revenue"),
                 F.count(F.lit(1)).alias("n_lines"))
            .orderBy("bracket"))


ORACLE_DISJUNCTIVE = f"""
WITH j AS (
  SELECT CASE
           WHEN p.p_type = 'SMALL' AND p.p_size <= 10
                AND l.l_quantity BETWEEN 1 AND 15 THEN 'small'
           WHEN p.p_type = 'MEDIUM' AND p.p_size <= 20
                AND l.l_quantity BETWEEN 10 AND 25 THEN 'medium'
           ELSE 'large'
         END AS bracket,
         l.l_extendedprice, l.l_discount
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE (p.p_type = 'SMALL' AND p.p_size <= 10
         AND l.l_quantity BETWEEN 1 AND 15)
     OR (p.p_type = 'MEDIUM' AND p.p_size <= 20
         AND l.l_quantity BETWEEN 10 AND 25)
     OR (p.p_type = 'LARGE' AND p.p_size <= 30
         AND l.l_quantity BETWEEN 20 AND 35)
)
SELECT bracket,
       {money_sum_sql('l_extendedprice * (1.0 - l_discount)')} AS revenue,
       count(*) AS n_lines
FROM j GROUP BY bracket ORDER BY bracket
"""


def q_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: monthly promo-revenue share over 1996 — the
    conditional-aggregation ratio ``100 * sum(rev WHERE promo) /
    sum(rev)`` per order month.

    One join (lineitem⋈orders for the date, then the part dim for the
    type), one grouped aggregate computing both the conditional and the
    unconditional sum in the same pass — never two scans.  Both sums ride
    exact integer micros, so the final double division and 4dp round are
    engine-identical.  At 100 TB the date filter prunes the orders scan
    and the aggregate is partial/final on a 12-value key.
    """
    o = (t(spark, sf_dir, "orders")
         .where((F.col("o_orderdate") >= "1996-01-01")
                & (F.col("o_orderdate") < "1997-01-01"))
         .select("o_orderkey", F.month("o_orderdate").alias("mth")))
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice", "l_discount")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    agg = (li.join(o, li.l_orderkey == o.o_orderkey)
           .join(p, li.l_partkey == p.p_partkey)
           .groupBy("mth")
           .agg(money_sum(F.when(F.col("p_type") == "PROMO", rev)
                          .otherwise(F.lit(0.0))).alias("promo_rev"),
                money_sum(rev).alias("total_rev")))
    return (agg.select(
        "mth", "promo_rev", "total_rev",
        duck_round(F.lit(100.0) * F.col("promo_rev") / F.col("total_rev"), 4)
        .alias("promo_share_pct"))
        .orderBy("mth"))


ORACLE_PROMO_SHARE = f"""
WITH agg AS (
  SELECT month(o.o_orderdate) AS mth,
         {money_sum_sql("CASE WHEN p.p_type = 'PROMO' "
                        "THEN l.l_extendedprice * (1.0 - l.l_discount) "
                        "ELSE 0.0 END")} AS promo_rev,
         {money_sum_sql('l.l_extendedprice * (1.0 - l.l_discount)')}
           AS total_rev
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate <  TIMESTAMP '1997-01-01'
  GROUP BY month(o.o_orderdate)
)
SELECT mth, promo_rev, total_rev,
       floor((100.0 * promo_rev / total_rev) * 1e4 + 0.5) / 1e4
         AS promo_share_pct
FROM agg ORDER BY mth
"""


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the top revenue supplier(s) over one quarter —
    ties kept — via a scalar-subquery MAX.

    Reference SQL builds a revenue view and filters ``total_revenue =
    (SELECT max(total_revenue) FROM revenue)``.  Declared plan: the
    per-supplier aggregate (exact integer micros, partial/final), then
    the scalar max rides a 1-row broadcast cross join — never a driver
    collect, never a second shuffle.  The long-vs-long equality keeps the
    tie semantics exact (no float max).  At 100 TB: one shuffle of
    |suppliers| aggregated rows + a broadcast of 8 bytes.
    """
    o = (t(spark, sf_dir, "orders")
         .where((F.col("o_orderdate") >= "1996-01-01")
                & (F.col("o_orderdate") < "1996-04-01"))
         .select("o_orderkey"))
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    rev_micros = F.sum(money_micros(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))))
    # Two consumers (the max scalar and the final filter) — materialize
    # the small per-supplier aggregate once so lineitem is scanned once.
    per_supp = (li.join(o, li.l_orderkey == o.o_orderkey)
                .groupBy("l_suppkey")
                .agg(rev_micros.alias("rev_u"))
                .localCheckpoint(eager=False))
    mx = per_supp.agg(F.max("rev_u").alias("max_u"))
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (per_supp.join(F.broadcast(mx), F.col("rev_u") == F.col("max_u"))
            .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
            .select("s_suppkey", "s_name",
                    duck_round(F.col("rev_u").cast("double") / F.lit(1e6), 6)
                    .alias("total_revenue"))
            .orderBy("s_suppkey"))


ORACLE_TOP_SUPPLIER = """
WITH per_supp AS (
  SELECT l.l_suppkey,
         sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 1e6
                        + 0.5) AS BIGINT)) AS rev_u
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate <  TIMESTAMP '1996-04-01'
  GROUP BY l.l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       round(CAST(rev_u AS DOUBLE) / 1e6, 6) AS total_revenue
FROM per_supp
JOIN supplier s ON per_supp.l_suppkey = s.s_suppkey
WHERE rev_u = (SELECT max(rev_u) FROM per_supp)
ORDER BY s.s_suppkey
"""


def q_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded idle customers — above the global
    average positive account balance (scalar subquery) with no order
    since 2000 (anti join) — counted per market segment.

    Two correlated forms, both decorrelated: the scalar AVG is an exact
    integer-micros aggregate broadcast as one row (never collected to the
    driver); the NOT EXISTS is a LEFT ANTI join against the date-pruned
    orders scan (the predicate pushes down, so the anti build side is
    only recent orders).  Balances aggregate in micros so both the
    threshold comparison and the output sum are engine-exact.  At 100 TB:
    one broadcast row + one anti shuffle on custkey + a 5-key aggregate.
    """
    c = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal")
    bal_u = money_micros(F.col("c_acctbal"))
    avg_pos = (c.where(F.col("c_acctbal") > 0)
               .agg((F.sum(bal_u).cast("double") / F.lit(1e6)
                     / F.count(F.lit(1))).alias("avg_bal")))
    recent = (t(spark, sf_dir, "orders")
              .where(F.col("o_orderdate") >= "2000-01-01")
              .select("o_custkey"))
    idle = (c.crossJoin(F.broadcast(avg_pos))
            .where(F.col("c_acctbal") > F.col("avg_bal"))
            .join(recent, c.c_custkey == recent.o_custkey, "left_anti"))
    return (idle.groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_idle"),
                 money_sum(F.col("c_acctbal")).alias("idle_balance"))
            .orderBy("c_mktsegment"))


ORACLE_IDLE_CUSTOMERS = f"""
WITH avg_pos AS (
  SELECT CAST(sum(CAST(floor(c_acctbal * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
         / 1e6 / count(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT c.c_mktsegment,
       count(*) AS n_idle,
       {money_sum_sql('c.c_acctbal')} AS idle_balance
FROM customer c
WHERE c.c_acctbal > (SELECT avg_bal FROM avg_pos)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""


SPECS: dict[str, QuerySpec] = {
    "q_small_qty": QuerySpec(
        q_small_qty, ORACLE_SMALL_QTY,
        "TPC-H Q17-shaped correlated-AVG filter, decorrelated"),
    "q_large_orders": QuerySpec(
        q_large_orders, ORACLE_LARGE_ORDERS,
        "TPC-H Q18-shaped grouped-HAVING IN-subquery, decorrelated"),
    "q_disjunctive": QuerySpec(
        q_disjunctive, ORACLE_DISJUNCTIVE,
        "TPC-H Q19-shaped OR-of-ANDs bracket, one-pass CASE"),
    "q_promo_share": QuerySpec(
        q_promo_share, ORACLE_PROMO_SHARE,
        "TPC-H Q14-shaped conditional-aggregation ratio"),
    "q_top_supplier": QuerySpec(
        q_top_supplier, ORACLE_TOP_SUPPLIER,
        "TPC-H Q15-shaped scalar-MAX view filter, broadcast scalar"),
    "q_idle_customers": QuerySpec(
        q_idle_customers, ORACLE_IDLE_CUSTOMERS,
        "TPC-H Q22-shaped scalar-AVG + NOT-EXISTS, broadcast + anti join"),
}
