"""As-of join query: events ⟕asof orders (latest order at-or-before each
event, per user).

The Spark side uses :func:`operators.joins.asof_join` — the union+window
formulation (one shuffle, no range explosion; see that docstring for the
100 TB reasoning). The oracle uses DuckDB's native ``ASOF LEFT JOIN``,
which implements exactly the greatest-ts-≤ semantics, so the two
independent implementations cross-check each other.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hippo_claim_crossover_spark.operators.joins import asof_join
from hippo_claim_crossover_spark.plans.base import QuerySpec, t


def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each event, the user's most recent order at-or-before the event
    timestamp (left-outer: events with no prior order keep NULLs)."""
    e = t(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type")
    # Deterministic right side: orders is not unique per (custkey, date), so
    # reduce to one row per key+ts first — argmax by o_orderkey via struct
    # max (field-order comparison; o_orderkey is globally unique).
    o = (
        t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"),
                 F.col("o_orderdate").alias("claim_ts"))
        .agg(F.max(F.struct("o_orderkey", "o_totalprice")).alias("s"))
        .select("user_id", "claim_ts",
                F.col("s.o_orderkey").alias("claim_id"),
                F.round(F.col("s.o_totalprice"), 2).alias("claim_total"))
    )
    return asof_join(e, o, on="user_id", left_ts="ts", right_ts="claim_ts")


ORACLE_JOIN_ASOF = """
WITH o1 AS (
  SELECT o_custkey AS user_id, o_orderdate AS claim_ts,
         max(o_orderkey) AS claim_id,
         round(max_by(o_totalprice, o_orderkey), 2) AS claim_total
  FROM orders GROUP BY 1, 2
)
SELECT e.user_id, e.event_id, e.ts, e.event_type,
       o1.claim_ts, o1.claim_id, o1.claim_total
FROM events e ASOF LEFT JOIN o1
  ON e.user_id = o1.user_id AND e.ts >= o1.claim_ts
"""


SPECS: dict[str, QuerySpec] = {
    "q_join_asof": QuerySpec(q_join_asof, ORACLE_JOIN_ASOF,
                             "as-of join via union+window vs DuckDB ASOF"),
}
