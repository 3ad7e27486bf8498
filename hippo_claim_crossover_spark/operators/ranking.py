"""Distributed global-order ranking.

A ``Window.orderBy(...)`` with no partition key plans as an Exchange to a
SINGLE partition — the whole table sorts on one task, the classic hidden
scale cliff of global rank/ntile/percentile queries. The operators here
compute the same *exact* results with every stage distributed, the same way
a TeraSort distributes a global sort:

1. ``repartitionByRange`` on the order key (sampled range boundaries —
   Spark's distributed sort machinery; deterministic sampling seed);
2. a per-partition local ``row_number`` (window partitioned by the range
   partition id — each partition ranks independently);
3. partition-count prefix offsets turning local ranks into global ranks —
   computed with a window over the COUNTS table (one row per partition, a
   broadcast-sized side), never a driver collect;
4. closed-form bucket assignment from the global rank.

The order columns must form a unique key (add a tiebreaker id) — the same
requirement engine-deterministic ntile has anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_rank(df: DataFrame, order_cols: list[str],
                n_partitions: int | None = None,
                out_col: str = "_rank") -> DataFrame:
    """Append the exact 1-based global rank of each row under
    ``order_cols`` (ascending, unique key) with no single-partition
    stage: range-shuffle + per-partition window + broadcast prefix
    offsets. Adds ``out_col``; drops nothing."""
    parts = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (df.repartitionByRange(parts, *[F.col(c) for c in order_cols])
              .withColumn("_pid", F.spark_partition_id()))
    local_w = Window.partitionBy("_pid").orderBy(*order_cols)
    local = ranged.withColumn("_lrn", F.row_number().over(local_w))
    counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    # Prefix offsets over the tiny per-partition counts table (≤ parts
    # rows): a single-partition window HERE is over partition COUNTS,
    # not data — broadcast-sized by construction.
    off_w = (Window.orderBy("_pid")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = counts.select(
        "_pid",
        F.coalesce(F.sum("_cnt").over(off_w), F.lit(0)).alias("_off"))
    return (local.join(F.broadcast(offsets), "_pid")
            .withColumn(out_col, F.col("_lrn") + F.col("_off"))
            .drop("_pid", "_lrn", "_off"))


def ntile_bucket(rank: Column, total: Column, n: int) -> Column:
    """Exact ntile bucket from a 1-based global rank: the first
    ``total mod n`` buckets hold ``total div n + 1`` rows, the rest
    ``total div n`` — Spark's (and the SQL standard's) ntile fill rule,
    in closed form so it composes with :func:`global_rank` instead of a
    single-partition window."""
    small = F.floor(total / F.lit(n))       # total div n
    big = total % F.lit(n)                  # count of (small+1)-row buckets
    cutoff = big * (small + F.lit(1))       # rows living in the big buckets
    return (F.when(rank <= cutoff,
                   F.floor((rank - 1) / (small + F.lit(1))))
            .otherwise(big + F.floor((rank - cutoff - 1) / small))
            .cast("long") + F.lit(1))


def distributed_ntile(df: DataFrame, n: int, order_cols: list[str],
                      out_col: str = "bucket",
                      n_partitions: int | None = None) -> DataFrame:
    """Exact ``ntile(n) OVER (ORDER BY order_cols)`` without the
    single-partition sort: :func:`global_rank` + the closed-form
    :func:`ntile_bucket` (total row count rides a broadcast 1-row
    aggregate). Results are bit-identical to the window ntile for a
    unique order key — the declared query's DuckDB oracle stays the
    window formulation and hash-matches."""
    ranked = global_rank(df, order_cols, n_partitions)
    total = ranked.agg(F.count(F.lit(1)).alias("_total"))
    return (ranked.join(F.broadcast(total))
            .withColumn(out_col,
                        ntile_bucket(F.col("_rank"), F.col("_total"), n))
            .drop("_rank", "_total"))
