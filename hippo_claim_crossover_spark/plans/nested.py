"""Nested / semi-structured operators: explode (E1/E2), unpivot (E3), JSON
extraction (§2b).

The reference's core dataflow is loop iteration over a nested tree
(lib/hippo_claim_crossover.rb:104, :189); in Spark that's ArrayType columns
+ explode, with parent columns carried alongside for free (no join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hippo_claim_crossover_spark.plans.base import (
    QuerySpec,
    money_sum_sql,
    money_sum,
    t,
)


def q_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 explode (claim-loop iteration, lib/hippo_claim_crossover.rb:104):
    one row per generated occurrence, parent columns carried through."""
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("claim_id"),
        F.col("l_linenumber").alias("service_line"),
        F.explode(F.sequence(F.lit(1).cast("long"),
                             F.col("l_linenumber").cast("long")))
        .alias("occurrence"),
    )


ORACLE_EXPLODE = """
SELECT l_orderkey AS claim_id, l_linenumber AS service_line,
       unnest(generate_series(1, CAST(l_linenumber AS BIGINT))) AS occurrence
FROM lineitem
"""


def q_explode_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 nested explode (service lines under each claim,
    lib/hippo_claim_crossover.rb:188-208): build the nested shape
    (collect_list of line structs per claim), then explode it back with the
    header columns alongside — the round-trip proves ArrayType<Struct>
    plumbing; the oracle is the equivalent flat join."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    nested = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list(F.struct(
            F.col("l_linenumber").alias("line_no"),
            F.col("l_quantity").alias("units")))).alias("service_lines"))
    )
    joined = nested.join(o, nested.l_orderkey == o.o_orderkey)
    line = F.explode("service_lines").alias("line")
    return joined.select(
        F.col("o_orderkey").alias("claim_id"),
        F.col("o_orderstatus").alias("claim_status"),
        line,
    ).select(
        "claim_id", "claim_status",
        F.col("line.line_no").alias("service_line"),
        F.col("line.units").alias("units"),
    )


ORACLE_EXPLODE_NESTED = """
SELECT o.o_orderkey AS claim_id, o.o_orderstatus AS claim_status,
       l.l_linenumber AS service_line, l.l_quantity AS units
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
"""


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 positional unpivot (4 diagnosis slots → long form, inverse of
    lib/hippo_claim_crossover.rb:136-139) via stack()."""
    p = t(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").alias("part_id"),
        F.expr("stack(2, 'size', CAST(p_size AS DOUBLE), "
               "'retailprice', p_retailprice) AS (metric, value)"),
    ).select("part_id", "metric", F.round("value", 2).alias("value"))


ORACLE_UNPIVOT = """
SELECT p_partkey AS part_id, 'size' AS metric,
       round(CAST(p_size AS DOUBLE), 2) AS value FROM part
UNION ALL
SELECT p_partkey AS part_id, 'retailprice' AS metric,
       round(p_retailprice, 2) AS value FROM part
"""


def q_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DataFrame.unpivot`` (Spark 4's melt API — the declarative
    sibling of q_unpivot's stack() expression): three lineitem measures
    melt to long form, then a per-metric profile aggregates the melted
    stream in the same job.

    The API matters at scale for the same reason stack() does: the
    unpivot is an Expand node — each input row fans to |measures| rows
    INSIDE the scan stage, no shuffle, and the downstream aggregate's
    map-side combine sees the long form immediately. The profile rides
    exact integer micros for the sum; min/max pass through raw."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_discount")
    melted = li.unpivot(
        ["l_orderkey"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "metric", "value")
    return (melted.groupBy("metric")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("value").alias("vmin"),
                 F.max("value").alias("vmax"),
                 money_sum(F.col("value")).alias("vsum"))
            .orderBy("metric"))


ORACLE_MELT = f"""
WITH melted AS (
  SELECT l_orderkey, 'l_quantity' AS metric, l_quantity AS value
  FROM lineitem
  UNION ALL
  SELECT l_orderkey, 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL
  SELECT l_orderkey, 'l_discount', l_discount FROM lineitem
)
SELECT metric, count(*) AS n,
       min(value) AS vmin, max(value) AS vmax,
       {money_sum_sql("value")} AS vsum
FROM melted GROUP BY metric ORDER BY metric
"""


def q_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2b JSON extraction from events.props (schema-on-read over a string
    column; get_json_object is codegen'd JsonPath, no UDF)."""
    e = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("long")
    return (
        e.withColumn("k", k)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum("k").alias("sum_k"),
             F.max("k").alias("max_k"))
    )


ORACLE_JSON = """
SELECT event_type, count(*) AS n_events,
       CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       max(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events) GROUP BY event_type
"""


def q_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT (Spark 4): ``parse_json`` turns props into
    the binary variant encoding once, then ``try_variant_get`` does typed
    path extraction — the open-schema third way between
    ``get_json_object`` (string re-tokenize per path) and ``from_json``
    (fixed StructType). At 100 TB the parse happens once at ingest and
    lands in Parquet's variant shredding; every later extraction is a
    path read over the binary encoding, no JSON re-parse per access."""
    e = t(spark, sf_dir, "events")
    k = F.expr("try_variant_get(parse_json(props), '$.k', 'long')")
    return (
        e.withColumn("k", k)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum("k").alias("sum_k"),
             F.min("k").alias("min_k"),
             F.max("k").alias("max_k"))
    )


ORACLE_VARIANT = """
SELECT user_id, count(*) AS n_events,
       CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS sum_k,
       min(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       max(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY user_id
"""


def q_json_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level JSON field projection (from_json with explicit schema —
    the production path for typed extraction)."""
    e = t(spark, sf_dir, "events")
    parsed = F.from_json("props", "k LONG")
    return e.select(
        F.col("event_id"),
        F.col("event_type"),
        parsed.getField("k").alias("prop_k"),
    )


ORACLE_JSON_PROJECT = """
SELECT event_id, event_type,
       TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events)
"""


def q_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``explode_outer``: exploding an EMPTY/NULL child collection keeps
    the parent row (one row with a null child) — the semantics the
    reference's child loops need when a claim has no occurrences of a
    segment (`claim[:services] ||= []` guard,
    lib/hippo_claim_crossover.rb:189). Plain explode silently DROPS such
    parents — the classic lost-row bug this query pins.

    Shape: per-customer arrays of their urgent orders (customers with
    none get no array → null after the left join), outer-exploded, then
    a per-segment audit counting total rows and matchless parents. The
    oracle is the equivalent flat LEFT JOIN — outer-explode of a
    collected array IS a left join, which is exactly the identity the
    hash match proves."""
    c = t(spark, sf_dir, "customer")
    urgent = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.collect_list("o_orderkey").alias("order_keys"))
    )
    return (
        c.join(urgent, c.c_custkey == urgent.o_custkey, "left")
        .select("c_mktsegment",
                F.explode_outer("order_keys").alias("order_key"))
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.count_if(F.col("order_key").isNull()).alias("n_matchless"))
    )


ORACLE_EXPLODE_OUTER = """
SELECT c_mktsegment, count(*) AS n_rows,
       count(*) FILTER (o_orderkey IS NULL) AS n_matchless
FROM customer c
LEFT JOIN (SELECT o_custkey, o_orderkey FROM orders
           WHERE o_orderpriority = '1-URGENT') o
  ON c.c_custkey = o.o_custkey
GROUP BY c_mktsegment
"""


SPECS: dict[str, QuerySpec] = {
    "q_explode": QuerySpec(q_explode, ORACLE_EXPLODE, "E1 explode"),
    "q_explode_outer": QuerySpec(q_explode_outer, ORACLE_EXPLODE_OUTER,
                                 "explode_outer keeps empty-collection "
                                 "parents (left-join identity)"),
    "q_explode_nested": QuerySpec(q_explode_nested, ORACLE_EXPLODE_NESTED,
                                  "E2 nested array round-trip"),
    "q_unpivot": QuerySpec(q_unpivot, ORACLE_UNPIVOT, "E3 stack unpivot"),
    "q_melt": QuerySpec(q_melt, ORACLE_MELT,
                        "DataFrame.unpivot (melt API) + per-metric "
                        "profile"),
    "q_json": QuerySpec(q_json, ORACLE_JSON, "JSON agg"),
    "q_variant": QuerySpec(q_variant, ORACLE_VARIANT,
                           "VARIANT parse + typed path extraction"),
    "q_json_project": QuerySpec(q_json_project, ORACLE_JSON_PROJECT,
                                "from_json projection"),
}
