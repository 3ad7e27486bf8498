"""Distributed k-means (Lloyd's algorithm) over a vector column — the
semantic-clustering primitive of a training-data curation pipeline
(cluster-balanced sampling, topic discovery, SemDeDup-style pruning).

Scale shape, per Lloyd iteration:

- **Assignment is map-side and shuffle-free.** The C centroids are carried
  as a single broadcast row holding an ``array<struct<cent_id, cv, cnrm>>``;
  every vector scores all C centroids inside one whole-stage-codegen'd
  projection and picks the argmax via ``array_min`` over
  ``struct(-cosine, cent_id)`` (struct ordering = max cosine, min-id
  tiebreak). No N-row shuffle, no N×C intermediate — at 100 TB the
  assignment stage is embarrassingly parallel.
- **The update shuffles only C×D rows.** Member vectors posexplode to
  (cell, dim, micros) and partial-aggregate map-side, so the exchange for
  the new centroids carries at most partitions×C×D partial sums — never the
  data. (Contrast groupBy(vec_id) argmax formulations, which shuffle N rows
  per iteration.)
- **Exact-integer means make the iteration engine-portable.** Components
  are quantized to integer micros (``floor(x·1e6 + 0.5)``, round-half-up)
  *before* summation, so the per-cell sums are exact integers — immune to
  the float-addition order differences that would otherwise let two engines
  drift apart across iterations — and the mean is a single deterministic
  IEEE division. This is what lets an *iterative* algorithm hash-match a
  DuckDB oracle bit-for-bit (same trick as plans/base.money_sum).

Centroids stay lazy DataFrames (fixed small iteration count ⇒ bounded plan
depth). A production long-running fit would collect the C×D centroid table
(KBs, independent of N) to the driver per round — the canonical k-means
shape — or ``localCheckpoint`` it; see operators/graph.py for the same
lineage-control trade in the components loop.

The reference has no clustering (319-line field-mapper,
lib/hippo_claim_crossover.rb); this is §2b training-data-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hippo_claim_crossover_spark.operators.similarity import (
    _duck_round,
    dot,
    ivf_centroids,
    l2_norm,
)

MICROS = 1e6


def _micros(x: Column) -> Column:
    """Round-half-up integer micros — deterministic per element, identical
    to the oracle's ``CAST(floor(x*1e6+0.5) AS BIGINT)``."""
    return F.floor(x * F.lit(MICROS) + F.lit(0.5))


def kmeans_assign(df: DataFrame, cents: DataFrame, id_col: str = "vec_id",
                  vec_col: str = "v") -> DataFrame:
    """(id, v, cell) nearest-centroid assignment by cosine, 6dp-rounded
    with cent_id tiebreak (engine-deterministic argmax).

    ``cents`` (cent_id, cv) collapses to ONE broadcast row carrying all
    centroids as an array, so the big side is never joined row-to-row:
    scoring + argmax run as a map-side expression over the array —
    shuffle-free, unlike a groupBy(id).min_by over an N×C join."""
    packed = (
        cents.select(F.struct(
            F.col("cent_id"), F.col("cv"),
            l2_norm(F.col("cv")).alias("cnrm")).alias("c"))
        .agg(F.array_sort(F.collect_list("c")).alias("cents"))
    )
    nrm = l2_norm(F.col(vec_col))
    best = F.array_min(F.transform(
        F.col("cents"),
        lambda c: F.struct(
            (-_duck_round(dot(F.col(vec_col), c["cv"]) / (nrm * c["cnrm"]),
                          6)).alias("ncos"),
            c["cent_id"].alias("cid"))))
    return (
        df.crossJoin(F.broadcast(packed))
        .select(id_col, vec_col, best["cid"].alias("cell"))
    )


def kmeans_update(assigned: DataFrame, vec_col: str = "v") -> DataFrame:
    """New centroids (cent_id, cv) = element-wise mean of member vectors,
    computed over exact integer micros. posexplode → partial-agg'd
    groupBy(cell, dim) → rebuild ordered arrays; the exchange carries C×D
    partial sums, not vectors. Cells that lost every member drop out
    (standard Lloyd; both engines drop them identically)."""
    m = assigned.select(
        "cell",
        F.posexplode(F.transform(F.col(vec_col), _micros)).alias("i", "m"))
    means = (
        m.groupBy("cell", "i")
        .agg(F.sum("m").alias("s"), F.count(F.lit(1)).alias("n"))
        # exactly CAST(s AS DOUBLE)/CAST(n AS DOUBLE)/1e6 in the oracle
        .select("cell", "i",
                (F.col("s").cast("double") / F.col("n").cast("double")
                 / F.lit(MICROS)).alias("mu"))
    )
    return (
        means.groupBy("cell")
        .agg(F.transform(F.array_sort(F.collect_list(F.struct("i", "mu"))),
                         lambda s: s["mu"]).alias("cv"))
        .select(F.col("cell").alias("cent_id"), "cv")
    )


def kmeans_fit(df: DataFrame, n_cells: int, iters: int,
               id_col: str = "vec_id",
               vec_col: str = "v") -> tuple[DataFrame, DataFrame]:
    """``iters`` Lloyd rounds from deterministic hash-sampled seeds
    (:func:`ivf_centroids` — content-independent, oracle-reproducible).
    Returns ``(assign, cents)``: the final assignment (id, v, cell) under
    the last centroids, and those centroids (cent_id, cv)."""
    cents = ivf_centroids(df, n_cells, id_col=id_col, vec_col=vec_col)
    for _ in range(iters):
        cents = kmeans_update(
            kmeans_assign(df, cents, id_col=id_col, vec_col=vec_col),
            vec_col=vec_col)
    return kmeans_assign(df, cents, id_col=id_col, vec_col=vec_col), cents
