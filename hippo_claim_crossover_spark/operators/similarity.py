"""Similarity-search operators over any DataFrame with a vector column.

Scale shapes (SCALE.md): brute-force against one query vector is a
broadcast + map-side score + TakeOrdered (linear, no big-side shuffle);
all-pairs search goes through SRP-LSH bucket ids so neighbor candidates
come from an equi-join, never a cross join. ``plans/similarity.py``
applies these to the fixture ``embeddings`` table with DuckDB oracles.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """JVM-side dot product via higher-order functions (no UDF)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(v: Column) -> Column:
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def srp_hyperplane(plane_idx: int, dim: int) -> list[float]:
    """Deterministic ±1 hyperplane from md5 bits — seedless, so any engine
    (or the DuckDB oracle) can reproduce the same family."""
    return [1.0 if hashlib.md5(f"plane:{plane_idx}:dim:{d}".encode())
            .digest()[0] & 1 else -1.0 for d in range(dim)]


def srp_bucket(v: Column, planes: list[list[float]]) -> Column:
    """Signed-random-projection bucket id: sign(dot(v, plane_p)) per plane
    packed into an integer — the LSH equi-join key."""
    acc = None
    for p, plane in enumerate(planes):
        arr = F.array(*[F.lit(c) for c in plane])
        bit = F.when(dot(v, arr) > 0, F.lit(1 << p)).otherwise(F.lit(0))
        acc = bit if acc is None else acc + bit
    return acc.cast("long")


def cosine_topk(df: DataFrame, query: DataFrame, k: int,
                id_col: str = "vec_id", vec_col: str = "v") -> DataFrame:
    """Top-k rows of ``df`` by cosine similarity to the single-row
    ``query`` (columns ``qv``/``qnrm``) — broadcast + TakeOrdered, the
    exact-scoring baseline. Scores rounded to 4dp with id tiebreak for
    cross-engine determinism."""
    nrm = l2_norm(F.col(vec_col))
    cos = F.round(dot(F.col(vec_col), F.col("qv")) / (nrm * F.col("qnrm")), 4)
    return (
        df.join(F.broadcast(query))
        .select(id_col, cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def knn_blocked(df: DataFrame, n_planes: int, dim: int, k: int = 3,
                id_col: str = "vec_id", vec_col: str = "v") -> DataFrame:
    """Per-vector approximate top-k neighbors within the SRP-LSH bucket:
    bucket equi-join + windowed top-k. The full ANN query shape — at scale,
    widen recall with multiple plane families (union of bucket joins)."""
    planes = [srp_hyperplane(p, dim) for p in range(n_planes)]
    eb = (df.withColumn("bucket", srp_bucket(F.col(vec_col), planes))
          .withColumn("nrm", l2_norm(F.col(vec_col))))
    a, b = eb.alias("a"), eb.alias("b")
    cos = F.round(dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
                  / (F.col("a.nrm") * F.col("b.nrm")), 4)
    pairs = (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias(id_col),
                F.col(f"b.{id_col}").alias("neighbor_id"),
                cos.alias("cosine"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    return (pairs.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= k)
            .select(id_col, "neighbor_id", "cosine",
                    F.col("rk").alias("rank")))
