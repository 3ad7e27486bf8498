"""§2b window functions: ranking, running aggregates, explicit frames.

All windows shuffle once on the partition key, then sort within partitions.
Running sums are computed in frame order (identical left-to-right double
accumulation in Spark and DuckDB), so results are deterministic given the
unique-key tiebreakers in every ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hippo_claim_crossover_spark.plans.base import (
    QuerySpec,
    duck_round,
    money_micros,
    money_sum,
    money_sum_sql,
    t,
)


def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank per nation by balance."""
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey"))
    return c.select(
        F.col("c_custkey").alias("subscriber_id"),
        F.col("c_nationkey").alias("nation_id"),
        F.round(F.col("c_acctbal"), 2).alias("balance"),
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


ORACLE_WIN_RANK = """
SELECT c_custkey AS subscriber_id, c_nationkey AS nation_id,
       round(c_acctbal, 2) AS balance,
       row_number() OVER w AS rn,
       rank() OVER w AS rnk,
       dense_rank() OVER w AS drnk
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
"""


def q_win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead + running sum (unbounded preceding → current row) per
    customer in order-date order."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        F.col("o_custkey").alias("subscriber_id"),
        F.col("o_orderkey").alias("claim_id"),
        F.col("o_orderdate").alias("claim_ts"),
        # duck_round: the running sum of 2dp-exact doubles accumulates
        # binary error and can print as .xx5 — the quotient/accumulation
        # class where Spark round() diverges from scaled-double engines.
        duck_round(F.sum("o_totalprice").over(run), 2).alias("running_total"),
        F.lag("o_orderkey", 1).over(w).alias("prev_claim"),
        F.lead("o_orderkey", 1).over(w).alias("next_claim"),
    )


ORACLE_WIN_RUNNING = """
SELECT o_custkey AS subscriber_id, o_orderkey AS claim_id,
       o_orderdate AS claim_ts,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
       lag(o_orderkey, 1) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey) AS prev_claim,
       lead(o_orderkey, 1) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey) AS next_claim
FROM orders
"""


def q_win_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit frames: a 3-row moving average (ROWS 2 PRECEDING) and a
    value-range frame (RANGE 5 PRECEDING on quantity)."""
    li = t(spark, sf_dir, "lineitem")
    # ORDER BY must be a total order: (l_orderkey, l_linenumber) is NOT
    # unique in the fixtures (45832 distinct pairs over 60000 rows), and a
    # ROWS frame under an ambiguous sort is nondeterministic — adding
    # (partkey, suppkey, extendedprice, quantity) makes the key unique.
    wrows = (Window.partitionBy("l_orderkey")
             .orderBy("l_linenumber", "l_partkey", "l_suppkey",
                      "l_extendedprice", "l_quantity")
             .rowsBetween(-2, 0))
    wrange = (Window.partitionBy("l_orderkey")
              .orderBy("l_quantity").rangeBetween(-5, 0))
    # Portable moving average: exact long-micros sum over the frame / count
    # (see base.money_micros) — engines disagree on float accumulation
    # inside window frames (DuckDB uses a segment tree), so avg() directly
    # would flip cents at rounding boundaries. The quotient of a 2dp-exact
    # sum by cnt=2 lands exactly on .xxxx5 (a true halfway at 4dp) whenever
    # the scaled sum is odd, so the final rounding goes through duck_round
    # (mimics DuckDB's raw-double rounding bit-for-bit) instead of Spark's
    # shortest-repr HALF_UP.
    mic_sum = F.sum(money_micros(F.col("l_extendedprice"))).over(wrows)
    cnt = F.count(F.lit(1)).over(wrows)
    return li.select(
        F.col("l_orderkey").alias("claim_id"),
        F.col("l_linenumber").alias("service_line"),
        F.col("l_quantity").alias("units"),
        duck_round(mic_sum.cast("double") / F.lit(1e6) / cnt, 4)
        .alias("moving_avg3"),
        F.count(F.lit(1)).over(wrange).alias("n_similar_qty"),
    )


ORACLE_WIN_FRAME = """
SELECT l_orderkey AS claim_id, l_linenumber AS service_line,
       l_quantity AS units,
       round(CAST(sum(CAST(floor(l_extendedprice * 1e6 + 0.5) AS BIGINT))
                  OVER wrows AS DOUBLE) / 1e6
             / count(*) OVER wrows, 4) AS moving_avg3,
       count(*) OVER (PARTITION BY l_orderkey ORDER BY l_quantity
             RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS n_similar_qty
FROM lineitem
WINDOW wrows AS (PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_partkey, l_suppkey,
                          l_extendedprice, l_quantity
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


def q_win_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution + value-position window functions: ntile, percent_rank,
    cume_dist, first/last value. Same single-shuffle shape as ranking;
    percent_rank/cume_dist are exact rational ratios of row positions, so
    they are bit-identical across engines (no rounding wrapper needed)."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey"))
    wall = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        F.col("o_custkey").alias("subscriber_id"),
        F.col("o_orderkey").alias("claim_id"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("o_orderkey").over(wall).alias("biggest_claim"),
        F.last("o_orderkey").over(wall).alias("smallest_claim"),
    )


ORACLE_WIN_DIST = """
SELECT o_custkey AS subscriber_id, o_orderkey AS claim_id,
       ntile(4) OVER w AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume,
       first_value(o_orderkey) OVER wall AS biggest_claim,
       last_value(o_orderkey) OVER wall AS smallest_claim
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey),
       wall AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def q_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-record-per-key compaction — the CDC/SCD "current snapshot"
    every log-structured pipeline runs: ``row_number() = 1`` over
    (user_id ORDER BY ts DESC, event_id DESC). ONE shuffle on the key,
    no self-join against a max-ts aggregate (the naive two-pass form);
    at 100 TB this is the log→snapshot compaction job, and the batch
    analogue of streaming last-wins dropDuplicates. event_id breaks
    equal-ts ties deterministically."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("user_id",
                F.col("event_id").alias("last_event_id"),
                F.col("ts").alias("last_ts"),
                F.col("event_type").alias("last_type"),
                # duck_round, not F.round: value is a full-precision double
                # in some fixture generations, and Spark round()'s
                # shortest-decimal HALF_UP can diverge from DuckDB's scaled
                # rounding on .xx5-printing values (non-negative here, so
                # the floor formula matches DuckDB round exactly).
                duck_round(F.col("value"), 2).alias("last_value"))
    )


ORACLE_LATEST_SNAPSHOT = """
SELECT user_id, event_id AS last_event_id, CAST(ts AS TIMESTAMP) AS last_ts,
       event_type AS last_type, round(value, 2) AS last_value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id
            ORDER BY ts DESC, event_id DESC) AS rk
  FROM events
) WHERE rk = 1
"""


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-style upsert apply — the batch form of the warehouse
    ``MERGE INTO target USING source`` every CDC pipeline runs (the
    reference's output record is itself a mutable upsert accumulator,
    `lib/hippo_claim_crossover.rb:12`): target = latest pre-cutoff
    *purchase* snapshot per user, source = latest post-cutoff event per
    user, then one FULL OUTER join on the key applies

    * WHEN MATCHED AND source is an ``error``  → DELETE,
    * WHEN MATCHED                             → UPDATE (source wins),
    * WHEN NOT MATCHED BY TARGET               → INSERT,
    * WHEN NOT MATCHED BY SOURCE               → keep the target row.

    Scale shape: both snapshots and the join shuffle on the SAME key
    (user_id), so AQE plans the outer join without a third exchange of
    either side; no driver-side diffing, no per-row lookups. The
    ``action`` column makes the branch taken auditable downstream."""
    from hippo_claim_crossover_spark.operators.cdc import merge_apply

    e = t(spark, sf_dir, "events")
    cutoff = F.to_timestamp_ntz(F.lit("2024-01-16"))
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc())

    def _latest(df: DataFrame) -> DataFrame:
        return (df.withColumn("rk", F.row_number().over(w))
                .where(F.col("rk") == 1)
                .select("user_id", "event_id", "ts", "event_type",
                        duck_round(F.col("value"), 2).alias("value")))

    target = _latest(e.where((F.col("ts") < cutoff)
                             & (F.col("event_type") == "purchase")))
    source = _latest(e.where(F.col("ts") >= cutoff))
    return merge_apply(target, source, "user_id",
                       delete_cond=F.col("sr.event_type") == "error")


ORACLE_MERGE_UPSERT = """
WITH tgt AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
         round(value, 2) AS value
  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
              ORDER BY ts DESC, event_id DESC) AS rk
        FROM events
        WHERE ts < TIMESTAMP '2024-01-16' AND event_type = 'purchase')
  WHERE rk = 1),
src AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
         round(value, 2) AS value
  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
              ORDER BY ts DESC, event_id DESC) AS rk
        FROM events WHERE ts >= TIMESTAMP '2024-01-16')
  WHERE rk = 1)
SELECT coalesce(s.user_id, t.user_id) AS user_id,
       CASE WHEN s.user_id IS NOT NULL THEN s.event_id
            ELSE t.event_id END AS event_id,
       CASE WHEN s.user_id IS NOT NULL THEN s.ts ELSE t.ts END AS ts,
       CASE WHEN s.user_id IS NOT NULL THEN s.event_type
            ELSE t.event_type END AS event_type,
       CASE WHEN s.user_id IS NOT NULL THEN s.value
            ELSE t.value END AS value,
       CASE WHEN s.user_id IS NOT NULL AND t.user_id IS NOT NULL
              THEN 'update'
            WHEN s.user_id IS NOT NULL THEN 'insert'
            ELSE 'keep' END AS action
FROM tgt t FULL OUTER JOIN src s ON t.user_id = s.user_id
WHERE NOT (s.user_id IS NOT NULL AND t.user_id IS NOT NULL
           AND s.event_type = 'error')
"""


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history build: collapse each user's event stream into
    validity intervals of the tracked attribute (event_type) — one row
    per *change*, with ``valid_from`` / ``valid_to`` / ``version`` /
    ``is_current``. The other classic CDC materialization next to
    q_latest_snapshot's type-1 "current row wins".

    Two windows over ONE shuffle on user_id: lag() marks change rows,
    then lead()/row_number() over the filtered change set close each
    interval. Spark keeps the partitioning between the two sorts (both
    windows share the partition key), so at 100 TB this is a single
    exchange + two in-partition sorts, never a self-join of the history
    against itself (the naive interval-close formulation)."""
    from hippo_claim_crossover_spark.operators.cdc import scd2_intervals

    e = t(spark, sf_dir, "events")
    return scd2_intervals(e, "user_id", "event_type", ["ts", "event_id"])


ORACLE_SCD2_HISTORY = """
WITH chg AS (
  SELECT * FROM (
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev
    FROM events)
  WHERE prev IS NULL OR prev <> event_type)
SELECT user_id, event_type AS attr, ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       row_number() OVER w AS version,
       lead(ts) OVER w IS NULL AS is_current
FROM chg
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def _mor_commits(o: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The ONE deterministic base+log recipe shared by q_mor_read
    (latest-version read) and q_time_travel (VERSION AS OF): base =
    keys ∉ 0 mod 10 at commit seq 0; commit 1 upserts keys ≡ 3 mod 7
    with a +10.00 price revision; commit 2 tombstones keys ≡ 5 mod 13;
    commit 3 late-inserts the base-missing keys ≡ 0 mod 10 — so
    update-wins, delete-wins, and insert-after-miss all occur (and a
    key can traverse several commits). Single-sourced (with the
    :data:`_MOR_RECS_SQL` oracle CTE) so retuning the commit moduli
    cannot desynchronize the two queries that read the same table."""
    k = F.col("o_orderkey")

    def _rec(df: DataFrame, price: F.Column, seq: int, op: str) -> DataFrame:
        return df.select(
            "o_orderkey", "o_orderpriority", price.alias("price"),
            F.lit(seq).cast("long").alias("seq"), F.lit(op).alias("op"))

    base = _rec(o.where(k % 10 != 0), F.col("o_totalprice"), 0, "u")
    log = (
        _rec(o.where(k % 7 == 3), F.col("o_totalprice") + F.lit(10.0),
             1, "u")
        .unionByName(_rec(o.where(k % 13 == 5), F.col("o_totalprice"),
                          2, "d"))
        .unionByName(_rec(o.where(k % 10 == 0), F.col("o_totalprice"),
                          3, "u")))
    return base, log


# Oracle-side mirror of _mor_commits (interpolated into both oracles).
_MOR_RECS_SQL = """
  SELECT o_orderkey AS k, o_orderpriority AS pr, o_totalprice AS price,
         CAST(0 AS BIGINT) AS seq, 'u' AS op
  FROM orders WHERE o_orderkey % 10 != 0
  UNION ALL
  SELECT o_orderkey, o_orderpriority, o_totalprice + 10.0, 1, 'u'
  FROM orders WHERE o_orderkey % 7 = 3
  UNION ALL
  SELECT o_orderkey, o_orderpriority, o_totalprice, 2, 'd'
  FROM orders WHERE o_orderkey % 13 = 5
  UNION ALL
  SELECT o_orderkey, o_orderpriority, o_totalprice, 3, 'u'
  FROM orders WHERE o_orderkey % 10 = 0
"""


def q_mor_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read lakehouse read — the Delta/Iceberg-shaped read path
    the CDC family was missing: a compacted BASE snapshot plus an
    ordered change LOG (upsert commit, delete commit, late-insert
    commit) resolved at read time, newest commit wins, tombstones hide
    rows. Completes change-data *application* (q_merge_upsert) and
    *generation* (q_snapshot_diff) with the log-structured *read*.

    Base and log are derived deterministically from ``orders``: base =
    keys ∉ 0 mod 10 at commit seq 0; commit 1 upserts keys ≡ 3 mod 7
    with a +10.00 price revision; commit 2 tombstones keys ≡ 5 mod 13;
    commit 3 late-inserts the base-missing keys ≡ 0 mod 10 — so
    update-wins, delete-wins, and insert-after-miss all occur (and a
    key can traverse several commits). The merge is
    ``operators.cdc.mor_read``: one union + ONE shuffle on the key
    (q_latest_snapshot's window), never a per-commit self-join, so at
    100 TB a day of commits costs the same exchange as one. The rollup
    audits the read: visible rows, tombstoned keys, patched/late-insert
    winners, and the exact money total over visible rows."""
    from hippo_claim_crossover_spark.operators.cdc import mor_read

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice")
    base, log = _mor_commits(o)
    win = mor_read(base, log, "o_orderkey")
    visible = F.col("op") != "d"
    return (
        win.groupBy("o_orderpriority")
        .agg(F.sum(visible.cast("long")).alias("n_visible"),
             F.sum((~visible).cast("long")).alias("n_tombstoned"),
             money_sum(F.when(visible, F.col("price")))
             .alias("total_price"),
             F.sum((visible & (F.col("seq") == 1)).cast("long"))
             .alias("n_patched"),
             F.sum((F.col("seq") == 3).cast("long"))
             .alias("n_late_inserts"))
        .orderBy("o_orderpriority"))


ORACLE_MOR_READ = f"""
WITH recs AS ({_MOR_RECS_SQL}), win AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rk
    FROM recs)
  WHERE rk = 1
)
SELECT pr AS o_orderpriority,
       CAST(sum(CASE WHEN op != 'd' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_visible,
       CAST(sum(CASE WHEN op = 'd' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_tombstoned,
       {money_sum_sql("CASE WHEN op != 'd' THEN price END")}
         AS total_price,
       CAST(sum(CASE WHEN op != 'd' AND seq = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_patched,
       CAST(sum(CASE WHEN seq = 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_late_inserts
FROM win GROUP BY pr ORDER BY pr
"""


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff — change-data *generation*, the inverse of
    q_merge_upsert's change *application*: given yesterday's and today's
    snapshot of a keyed table, emit the insert/update/delete rows that
    transform one into the other (what Delta/Iceberg call a change data
    feed, computed engine-side when the storage layer doesn't provide
    one).

    The two snapshots are derived deterministically from orders
    (old = keys ∉ 0 mod 10; new = keys ∉ 3 mod 7, with a +10.00 price
    revision on keys ≡ 0 mod 5), so inserts, deletes, updates, and
    unchanged rows all occur. One FULL OUTER join on the key — both
    sides shuffle-partition on o_orderkey, AQE plans a single exchange
    pair — then a null-pattern CASE classifies each row and unchanged
    rows are dropped. No driver-side diffing; at 100 TB this is the
    only shape that works (two scans + one co-partitioned join).
    """
    o = t(spark, sf_dir, "orders")
    old = (o.where(F.col("o_orderkey") % 10 != 0)
           .select("o_orderkey",
                   duck_round(F.col("o_totalprice"), 2).alias("old_value")))
    new = (o.where(F.col("o_orderkey") % 7 != 3)
           .select("o_orderkey",
                   duck_round(
                       F.when(F.col("o_orderkey") % 5 == 0,
                              F.col("o_totalprice") + F.lit(10.0))
                       .otherwise(F.col("o_totalprice")), 2)
                   .alias("new_value")))
    joined = old.join(new, "o_orderkey", "full_outer")
    op = (F.when(F.col("old_value").isNull(), F.lit("insert"))
          .when(F.col("new_value").isNull(), F.lit("delete"))
          .when(F.col("old_value") != F.col("new_value"), F.lit("update")))
    return (joined.withColumn("op", op)
            .where(F.col("op").isNotNull())
            .select("o_orderkey", "op", "old_value", "new_value"))


ORACLE_SNAPSHOT_DIFF = """
WITH old AS (
  SELECT o_orderkey, round(o_totalprice, 2) AS old_value
  FROM orders WHERE o_orderkey % 10 <> 0
), new AS (
  SELECT o_orderkey,
         round(CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 10.0
                    ELSE o_totalprice END, 2) AS new_value
  FROM orders WHERE o_orderkey % 7 <> 3
)
SELECT coalesce(old.o_orderkey, new.o_orderkey) AS o_orderkey,
       CASE WHEN old.o_orderkey IS NULL THEN 'insert'
            WHEN new.o_orderkey IS NULL THEN 'delete'
            WHEN old_value <> new_value THEN 'update' END AS op,
       old_value, new_value
FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
WHERE CASE WHEN old.o_orderkey IS NULL THEN 'insert'
           WHEN new.o_orderkey IS NULL THEN 'delete'
           WHEN old_value <> new_value THEN 'update' END IS NOT NULL
"""


def q_win_nav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window navigation functions: ``first_value`` / ``last_value`` /
    ``nth_value`` over the customer order history — the per-entity
    timeline summary (first order, latest order, second order) every
    lifecycle analysis starts with.

    One window spec, full-frame (unbounded both sides), unique ordering
    (o_orderdate, o_orderkey) so every navigation value is
    engine-deterministic; then one row per customer via row_number.  The
    partition key is c-cardinality so the window shuffle is naturally
    balanced; no second shuffle — the dedup rides the same window.
    """
    o = t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    w = (Window.partitionBy("o_custkey")
         .orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    wseq = Window.partitionBy("o_custkey").orderBy("o_orderdate",
                                                   "o_orderkey")
    return (o
            .withColumn("first_date", F.date_format(
                F.first("o_orderdate").over(w), "yyyy-MM-dd"))
            .withColumn("last_date", F.date_format(
                F.last("o_orderdate").over(w), "yyyy-MM-dd"))
            .withColumn("second_price", duck_round(
                F.nth_value("o_totalprice", 2).over(w), 2))
            .withColumn("n_orders", F.count(F.lit(1)).over(w))
            .withColumn("_rn", F.row_number().over(wseq))
            .where(F.col("_rn") == 1)
            .select(F.col("o_custkey").alias("custkey"), "n_orders",
                    "first_date", "last_date", "second_price")
            .orderBy("custkey"))


ORACLE_WIN_NAV = """
WITH w AS (
  SELECT o_custkey,
         strftime(first_value(o_orderdate) OVER win, '%Y-%m-%d')
           AS first_date,
         strftime(last_value(o_orderdate) OVER win, '%Y-%m-%d')
           AS last_date,
         round(nth_value(o_totalprice, 2) OVER win, 2) AS second_price,
         count(*) OVER win AS n_orders,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
  WINDOW win AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING)
)
SELECT o_custkey AS custkey, n_orders, first_date, last_date,
       second_price
FROM w WHERE rn = 1 ORDER BY custkey
"""


def q_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic grouped collection: each customer's order keys as
    ONE comma-joined string in strict (date, key) order — the portable
    form of ``collect_list``, whose raw order is partition-dependent and
    therefore unusable for content-addressed downstream keys.

    ``collect_list(struct(date, key))`` → ``sort_array`` → ``transform``
    → ``array_join`` makes the aggregation order-insensitive (the sort
    happens AFTER collection, row-local), so the result is identical
    under any shuffle schedule — and hash-checkable against DuckDB's
    ``string_agg(... ORDER BY ...)``.  Per-customer arrays are bounded
    (≤ orders-per-customer), so reduce state is the real row payload,
    not a skew cliff; the md5 of the joined history doubles as a
    change-detection digest for CDC of the whole timeline.
    """
    o = t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate")
    return (o.groupBy("o_custkey")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.array_join(
                     F.transform(
                         F.sort_array(F.collect_list(
                             F.struct("o_orderdate", "o_orderkey"))),
                         lambda s: s["o_orderkey"].cast("string")),
                     ",").alias("order_history"))
            .select(F.col("o_custkey").alias("custkey"), "n_orders",
                    "order_history",
                    F.md5(F.col("order_history")).alias("history_digest"))
            .orderBy("custkey"))


ORACLE_COLLECT_SORTED = """
SELECT o_custkey AS custkey,
       count(*) AS n_orders,
       string_agg(CAST(o_orderkey AS VARCHAR), ','
                  ORDER BY o_orderdate, o_orderkey) AS order_history,
       md5(string_agg(CAST(o_orderkey AS VARCHAR), ','
                      ORDER BY o_orderdate, o_orderkey)) AS history_digest
FROM orders
GROUP BY o_custkey
ORDER BY custkey
"""


def q_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (as-of) lookup against the SCD2 history — the
    CONSUMPTION side of q_scd2_history: for every purchase event, the
    user's activity state ONE HOUR EARLIER (the attribution-style
    lookback that makes the lookup non-trivial — at the purchase's own
    timestamp the state is the purchase itself).

    The lookup is an equi join on the user key with the interval
    containment (``valid_from ≤ t < valid_to``, open-ended current row)
    as a residual predicate — at most one interval matches because SCD2
    intervals partition each key's timeline, so the join never inflates.
    LEFT join keeps purchases that predate the first interval
    ('(none)' state). At 100 TB: intervals-per-user is the CHANGE
    count (small by construction), so the shuffle pairs each purchase
    with only its user's few intervals — never a time-cross-product.
    The rollup audits totality: states' n_purchases sum to the purchase
    count."""
    from hippo_claim_crossover_spark.operators.cdc import scd2_intervals

    e = t(spark, sf_dir, "events")
    dim = scd2_intervals(e, "user_id", "event_type", ["ts", "event_id"]) \
        .select(F.col("user_id").alias("d_user"), "attr",
                "valid_from", "valid_to")
    facts = (e.where(F.col("event_type") == "purchase")
             .select("user_id", "event_id", "value",
                     (F.col("ts") - F.expr("INTERVAL 1 HOUR"))
                     .alias("pts")))
    j = facts.join(
        dim,
        (facts.user_id == dim.d_user)
        & (dim.valid_from <= F.col("pts"))
        & (F.col("pts") < F.coalesce(
            dim.valid_to, F.lit("9999-01-01").cast("timestamp_ntz"))),
        "left")
    return (j.groupBy(F.coalesce(F.col("attr"), F.lit("(none)"))
                      .alias("state_1h_before"))
            .agg(F.count(F.lit(1)).alias("n_purchases"),
                 F.countDistinct("user_id").alias("n_users"),
                 money_sum(F.col("value")).alias("purchase_value"))
            .orderBy("state_1h_before"))


ORACLE_SCD2_LOOKUP = f"""
WITH chg AS (
  SELECT * FROM (
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev
    FROM events)
  WHERE prev IS NULL OR prev <> event_type
), dim AS (
  SELECT user_id AS d_user, event_type AS attr, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS valid_to
  FROM chg
), facts AS (
  SELECT user_id, event_id, value,
         CAST(ts AS TIMESTAMP) - INTERVAL 1 HOUR AS pts
  FROM events WHERE event_type = 'purchase'
)
SELECT coalesce(d.attr, '(none)') AS state_1h_before,
       count(*) AS n_purchases,
       CAST(count(DISTINCT f.user_id) AS BIGINT) AS n_users,
       {money_sum_sql('f.value')} AS purchase_value
FROM facts f
LEFT JOIN dim d
  ON f.user_id = d.d_user
 AND d.valid_from <= f.pts
 AND f.pts < coalesce(d.valid_to, TIMESTAMP '9999-01-01')
GROUP BY coalesce(d.attr, '(none)')
ORDER BY state_1h_before
"""


def q_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel over the log-structured table: the SAME deterministic
    base+log as q_mor_read, read AS OF every commit sequence 0..3 — the
    ``VERSION AS OF`` face of the lakehouse read path (q_mor_read is
    "latest"; this is the trajectory).

    A single-version production read filters the log to ``seq ≤ as_of``
    and runs exactly q_mor_read's plan. The four-version AUDIT form here
    fans each record to the versions that can see it (broadcast 4-row
    version frame, one filter) and resolves winners with ONE
    partial/final ``max_by(·, seq)`` aggregate per (version, key) — no
    window, no per-version re-merge, so reading V versions costs one
    shuffle of ≤ V× the log (not V separate jobs). Monotonicity of the
    trajectory (deletes only at commit 2, inserts at 0/1/3) is visible
    in the output and pinned by the plan audit."""
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice")
    base, log = _mor_commits(o)
    recs = base.unionByName(log).select(
        "o_orderkey", "price", "seq", "op")
    versions = spark.range(4).select(F.col("id").alias("as_of"))
    states = (recs.crossJoin(F.broadcast(versions))
              .where(F.col("seq") <= F.col("as_of"))
              .groupBy("as_of", "o_orderkey")
              .agg(F.max_by("op", "seq").alias("op"),
                   F.max_by("price", "seq").alias("price")))
    visible = F.col("op") != "d"
    return (states.groupBy("as_of")
            .agg(F.sum(visible.cast("long")).alias("n_visible"),
                 F.sum((~visible).cast("long")).alias("n_tombstoned"),
                 money_sum(F.when(visible, F.col("price")))
                 .alias("total_price"))
            .orderBy("as_of"))


ORACLE_TIME_TRAVEL = f"""
WITH recs AS ({_MOR_RECS_SQL}), versions AS (
  SELECT * FROM (VALUES (CAST(0 AS BIGINT)), (1), (2), (3)) v(as_of)
), states AS (
  SELECT v.as_of, r.k,
         arg_max(r.op, r.seq) AS op,
         arg_max(r.price, r.seq) AS price
  FROM recs r CROSS JOIN versions v
  WHERE r.seq <= v.as_of
  GROUP BY v.as_of, r.k
)
SELECT as_of,
       CAST(sum(CASE WHEN op != 'd' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_visible,
       CAST(sum(CASE WHEN op = 'd' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_tombstoned,
       {money_sum_sql("CASE WHEN op != 'd' THEN price END")}
         AS total_price
FROM states GROUP BY as_of ORDER BY as_of
"""


SPECS: dict[str, QuerySpec] = {
    "q_time_travel": QuerySpec(
        q_time_travel, ORACLE_TIME_TRAVEL,
        "VERSION-AS-OF time travel over base+log, one max_by aggregate "
        "for all versions"),
    "q_scd2_lookup": QuerySpec(
        q_scd2_lookup, ORACLE_SCD2_LOOKUP,
        "point-in-time SCD2 lookup (1h lookback), interval-residual "
        "equi join"),
    "q_win_nav": QuerySpec(
        q_win_nav, ORACLE_WIN_NAV,
        "window navigation: first/last/nth_value, full frame"),
    "q_collect_sorted": QuerySpec(
        q_collect_sorted, ORACLE_COLLECT_SORTED,
        "deterministic sorted collect_list + history digest"),
    "q_win_rank": QuerySpec(q_win_rank, ORACLE_WIN_RANK, "ranking fns"),
    "q_win_running": QuerySpec(q_win_running, ORACLE_WIN_RUNNING,
                               "lag/lead/running sum"),
    "q_win_frame": QuerySpec(q_win_frame, ORACLE_WIN_FRAME,
                             "rows+range frames"),
    "q_win_dist": QuerySpec(q_win_dist, ORACLE_WIN_DIST,
                            "ntile/percent_rank/cume_dist/first/last"),
    "q_latest_snapshot": QuerySpec(q_latest_snapshot, ORACLE_LATEST_SNAPSHOT,
                                   "latest-record-per-key compaction"),
    "q_merge_upsert": QuerySpec(q_merge_upsert, ORACLE_MERGE_UPSERT,
                                "MERGE-style insert/update/delete apply"),
    "q_scd2_history": QuerySpec(q_scd2_history, ORACLE_SCD2_HISTORY,
                                "SCD type-2 validity-interval history"),
    "q_snapshot_diff": QuerySpec(q_snapshot_diff, ORACLE_SNAPSHOT_DIFF,
                                 "snapshot diff (change-data generation)"),
    "q_mor_read": QuerySpec(
        q_mor_read, ORACLE_MOR_READ,
        "merge-on-read lakehouse read (base + commit log, newest wins, "
        "tombstone filter after the window)"),
}
