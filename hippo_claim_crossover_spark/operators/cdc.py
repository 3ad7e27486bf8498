"""CDC apply operators: MERGE-style upsert and SCD Type-2 intervals.

The reference's whole pipeline is an upsert accumulator — it mutates one
output record field-by-field as it walks the claim tree
(`lib/hippo_claim_crossover.rb:12`, `:23-160`). Generalized to tables,
that is the warehouse ``MERGE INTO`` (type-1 apply) and the SCD Type-2
validity-interval history build. Both are implemented as single-shuffle
DataFrame compositions — no per-row lookups, no driver-side diffing —
so they hold at log-structured 100 TB scale where "apply the day's
changes" is the dominant recurring job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def merge_apply(target: DataFrame, source: DataFrame, key: str,
                delete_cond: Column | None = None,
                action_col: str = "action") -> DataFrame:
    """Apply ``source`` onto ``target`` with ``MERGE INTO`` semantics.

    * WHEN MATCHED AND ``delete_cond`` (on source columns) → row dropped,
    * WHEN MATCHED → source row wins (type-1 update),
    * WHEN NOT MATCHED BY TARGET → source row inserted,
    * WHEN NOT MATCHED BY SOURCE → target row kept.

    Both inputs must share a schema; the result carries it plus
    ``action_col`` ∈ {update, insert, keep}. One FULL OUTER join on the
    key — when both sides were produced by a shuffle on ``key`` (the
    usual latest-per-key snapshots), AQE plans it without an extra
    exchange of either side.
    """
    cols = target.columns
    assert cols == source.columns, (cols, source.columns)
    tg, sr = target.alias("tg"), source.alias("sr")
    joined = tg.join(sr, F.col(f"tg.{key}") == F.col(f"sr.{key}"),
                     "full_outer")
    matched = (F.col(f"tg.{key}").isNotNull()
               & F.col(f"sr.{key}").isNotNull())
    use_src = F.col(f"sr.{key}").isNotNull()
    if delete_cond is not None:
        joined = joined.where(~(matched & delete_cond))

    def pick(c: str) -> Column:
        if c == key:
            return F.coalesce(F.col(f"sr.{c}"), F.col(f"tg.{c}"))
        return F.when(use_src, F.col(f"sr.{c}")).otherwise(F.col(f"tg.{c}"))

    return joined.select(
        *[pick(c).alias(c) for c in cols],
        F.when(matched, F.lit("update"))
        .when(use_src, F.lit("insert"))
        .otherwise(F.lit("keep")).alias(action_col))


def scd2_intervals(df: DataFrame, key: str, attr: str,
                   order_cols: list[str]) -> DataFrame:
    """Collapse a change log into SCD Type-2 validity intervals of
    ``attr``: one row per change of value, with ``valid_from`` /
    ``valid_to`` (next change's timestamp, NULL while current),
    ``version`` and ``is_current``.

    ``order_cols[0]`` is the event-time column; the rest break ties so
    the interval chain is deterministic. Two windows over ONE shuffle on
    the key (lag to mark changes, lead/row_number over the filtered
    change set) — Spark keeps the hash partitioning between the sorts,
    so this never self-joins the history (the naive interval-close
    formulation that doubles the shuffle volume).
    """
    ts = order_cols[0]
    w = Window.partitionBy(key).orderBy(*order_cols)
    chg = (df.withColumn("_prev", F.lag(attr).over(w))
           .where(F.col("_prev").isNull() | (F.col("_prev") != F.col(attr))))
    return chg.select(
        key,
        F.col(attr).alias("attr"),
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w).alias("valid_to"),
        F.row_number().over(w).alias("version"),
        F.lead(ts).over(w).isNull().alias("is_current"),
    )


def mor_read(base: DataFrame, log: DataFrame, key: str,
             seq_col: str = "seq") -> DataFrame:
    """Merge-on-read: resolve a compacted base snapshot plus an ordered
    change log into the latest visible view AT READ TIME — the
    Delta/Iceberg read path when deletes/upserts haven't been compacted
    yet (base files + newer log files, newest commit wins, tombstones
    hide rows).

    ``base`` rows must carry the lowest ``seq_col`` (the compaction
    watermark); ``log`` rows carry their commit sequence. Both must
    share a schema. One union + ONE shuffle on the key (the
    q_latest_snapshot window, row_number over seq desc) — never a
    per-commit self-join, so a day of commits costs the same shuffle as
    one. Tombstone semantics belong to the CALLER: every column of the
    winning record (including any op/tombstone marker) is returned
    untouched, and the caller filters deletes AFTER this merge — that
    ordering is what lets a delete followed by a re-insert at a higher
    seq correctly resurface the key (see q_mor_read)."""
    cols = base.columns
    assert cols == log.columns, (cols, log.columns)
    w = Window.partitionBy(key).orderBy(F.col(seq_col).desc())
    return (base.unionByName(log)
            .withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") == 1)
            .drop("_rk"))
