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


def q_join_asof_fwd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of with a tolerance horizon: for each ``error``
    event, the user's next ``purchase`` at-or-after it, nulled if more
    than 2 days out — time-to-recovery / conversion-lag semantics
    (pandas ``merge_asof(direction='forward', tolerance=...)``). The
    Spark side is :func:`operators.joins.asof_join_forward` (the
    union+window mirror of the backward operator — one shuffle, no
    range explosion); the oracle is DuckDB's native ``ASOF LEFT JOIN``
    with the ``<=`` comparator plus the same tolerance nullify, so two
    independent implementations cross-check both direction and
    horizon."""
    from hippo_claim_crossover_spark.operators.joins import (
        asof_join_forward)

    e = t(spark, sf_dir, "events")
    errors = (e.where(F.col("event_type") == "error")
              .select("user_id", "event_id", "ts"))
    # deterministic right side: one row per (user, ts), argmax event_id
    buys = (e.where(F.col("event_type") == "purchase")
            .groupBy("user_id", F.col("ts").alias("buy_ts"))
            .agg(F.max(F.struct("event_id", "value")).alias("s"))
            .select("user_id", "buy_ts",
                    F.col("s.event_id").alias("buy_id"),
                    F.col("s.value").alias("buy_value")))
    out = asof_join_forward(errors, buys, on="user_id",
                            left_ts="ts", right_ts="buy_ts",
                            tolerance="2 days")
    return out.orderBy("user_id", "event_id")


ORACLE_JOIN_ASOF_FWD = """
WITH b AS (
  SELECT user_id, ts AS buy_ts, max(event_id) AS buy_id,
         max_by(value, event_id) AS buy_value
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
), m AS (
  SELECT e.user_id, e.event_id, e.ts, b.buy_ts, b.buy_id, b.buy_value
  FROM (SELECT user_id, event_id, ts FROM events
        WHERE event_type = 'error') e
  ASOF LEFT JOIN b ON e.user_id = b.user_id AND e.ts <= b.buy_ts
)
SELECT user_id, event_id, ts,
       CASE WHEN buy_ts <= ts + INTERVAL 2 DAY THEN buy_ts END AS buy_ts,
       CASE WHEN buy_ts <= ts + INTERVAL 2 DAY THEN buy_id END AS buy_id,
       CASE WHEN buy_ts <= ts + INTERVAL 2 DAY THEN buy_value END
         AS buy_value
FROM m ORDER BY user_id, event_id
"""


def q_join_asof_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of: for each ``click`` event, the user's CLOSEST
    ``purchase`` in either time direction (pandas
    ``merge_asof(direction='nearest')``; exact ties prefer the earlier
    match) — attribution semantics when the touch can precede or follow
    the conversion. Spark side:
    :func:`operators.joins.asof_join_nearest` — ONE shuffle+window pass
    carrying both direction candidates, picked by exact integer
    microsecond deltas. Oracle: DuckDB's two native ASOF joins (>= and
    <=) re-picked with the identical epoch_us arithmetic — two
    independent implementations of both the direction semantics and
    the tie rule."""
    from hippo_claim_crossover_spark.operators.joins import (
        asof_join_nearest)

    e = t(spark, sf_dir, "events")
    clicks = (e.where(F.col("event_type") == "click")
              .select("user_id", "event_id", "ts"))
    buys = (e.where(F.col("event_type") == "purchase")
            .groupBy("user_id", F.col("ts").alias("buy_ts"))
            .agg(F.max(F.struct("event_id", "value")).alias("s"))
            .select("user_id", "buy_ts",
                    F.col("s.event_id").alias("buy_id"),
                    F.col("s.value").alias("buy_value")))
    out = asof_join_nearest(clicks, buys, on="user_id",
                            left_ts="ts", right_ts="buy_ts")
    return out.orderBy("user_id", "event_id")


ORACLE_JOIN_ASOF_NEAR = """
WITH b AS (
  SELECT user_id, ts AS buy_ts, max(event_id) AS buy_id,
         max_by(value, event_id) AS buy_value
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
), c AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
), back AS (
  SELECT c.user_id, c.event_id, c.ts,
         b.buy_ts AS bts, b.buy_id AS bid, b.buy_value AS bval
  FROM c ASOF LEFT JOIN b
    ON c.user_id = b.user_id AND c.ts >= b.buy_ts
), fwd AS (
  SELECT c.user_id, c.event_id,
         b.buy_ts AS fts, b.buy_id AS fid, b.buy_value AS fval
  FROM c ASOF LEFT JOIN b
    ON c.user_id = b.user_id AND c.ts <= b.buy_ts
), m AS (
  SELECT back.user_id, back.event_id, back.ts,
         CASE WHEN bts IS NULL THEN 'f'
              WHEN fts IS NULL THEN 'b'
              WHEN epoch_us(fts) - epoch_us(back.ts)
                   < epoch_us(back.ts) - epoch_us(bts) THEN 'f'
              ELSE 'b' END AS side,
         bts, bid, bval, fts, fid, fval
  FROM back JOIN fwd USING (user_id, event_id)
)
SELECT user_id, event_id, ts,
       CASE WHEN side = 'b' THEN bts ELSE fts END AS buy_ts,
       CASE WHEN side = 'b' THEN bid ELSE fid END AS buy_id,
       CASE WHEN side = 'b' THEN bval ELSE fval END AS buy_value
FROM m ORDER BY user_id, event_id
"""


SPECS: dict[str, QuerySpec] = {
    "q_join_asof": QuerySpec(q_join_asof, ORACLE_JOIN_ASOF,
                             "as-of join via union+window vs DuckDB ASOF"),
    "q_join_asof_near": QuerySpec(
        q_join_asof_near, ORACLE_JOIN_ASOF_NEAR,
        "nearest as-of (either direction, tie->backward) in one "
        "union+window pass vs DuckDB dual ASOF re-pick"),
    "q_join_asof_fwd": QuerySpec(
        q_join_asof_fwd, ORACLE_JOIN_ASOF_FWD,
        "forward as-of with tolerance (next purchase within 2 days of "
        "each error) vs DuckDB ASOF <="),
}
