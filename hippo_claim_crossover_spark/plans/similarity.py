"""Similarity search over ``embeddings`` (§2b): brute-force cosine top-k
(the correctness baseline) and signed-random-projection LSH bucketing (the
scale path).

Scale design: brute-force against a single query vector is a broadcast
(1-row dim table) + map-side expression + TakeOrdered — linear, no shuffle
of the big side. For all-pairs search at 100 TB, the SRP-LSH bucket id
turns neighbor search into an equi-join on bucket keys; hyperplanes are
deterministic (md5-seeded at plan-build time), so even the bucket histogram
is oracle-checkable.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hippo_claim_crossover_spark.plans.base import QuerySpec, t

DIM = 64
N_PLANES = 8
QUERY_VEC_ID = 0
TOP_K = 10


def _hyperplane(p: int) -> list[float]:
    """Deterministic ±1 hyperplane from md5 bits — identical constants are
    baked into both the Spark plan and the oracle SQL."""
    out: list[float] = []
    for d in range(DIM):
        h = hashlib.md5(f"plane:{p}:dim:{d}".encode()).digest()
        out.append(1.0 if h[0] & 1 else -1.0)
    return out


_PLANES = [_hyperplane(p) for p in range(N_PLANES)]


def _dot(vec, const: list[float]):
    arr = F.array(*[F.lit(c) for c in const])
    return F.aggregate(F.zip_with(vec, arr, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def q_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k against one query vector (vec_id=0),
    ranked on the rounded score with vec_id tiebreak (deterministic across
    engines). Query side is a broadcast single-row join — no collect()."""
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    norm = F.sqrt(F.aggregate(F.col("v"), F.lit(0.0),
                              lambda acc, x: acc + x * x))
    e = e.withColumn("nrm", norm)
    q = (e.where(F.col("vec_id") == QUERY_VEC_ID)
         .select(F.col("v").alias("qv"), F.col("nrm").alias("qnrm")))
    dot = F.aggregate(F.zip_with(F.col("v"), F.col("qv"), lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    cos = F.round(dot / (F.col("nrm") * F.col("qnrm")), 4)
    return (
        e.where(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(q))
        .select("vec_id", cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(TOP_K)
    )


ORACLE_SIM_TOPK = f"""
WITH n AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings
), q AS (SELECT v AS qv, nrm AS qnrm FROM n WHERE vec_id = {QUERY_VEC_ID})
SELECT n.vec_id,
       round(list_dot_product(n.v, q.qv) / (n.nrm * q.qnrm), 4) AS cosine
FROM n, q
WHERE n.vec_id != {QUERY_VEC_ID}
ORDER BY cosine DESC, vec_id
LIMIT {TOP_K}
"""


def q_sim_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH bucket assignment + histogram: sign(dot(v, hyperplane_p))
    per plane → bucket id. The equi-join key for approximate neighbor
    search at scale; deterministic hyperplanes ⇒ oracle-checked."""
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    bucket = None
    for p, plane in enumerate(_PLANES):
        bit = F.when(_dot(F.col("v"), plane) > 0,
                     F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return (
        e.select(bucket.cast("long").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
    )


def _sql_plane(plane: list[float]) -> str:
    vals = ", ".join(str(v) for v in plane)
    return f"CAST([{vals}] AS DOUBLE[])"


_SQL_BUCKET = " + ".join(
    f"CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), "
    f"{_sql_plane(plane)}) > 0 THEN {1 << p} ELSE 0 END"
    for p, plane in enumerate(_PLANES))
ORACLE_SIM_LSH_BUCKETS = f"""
SELECT CAST({_SQL_BUCKET} AS BIGINT) AS bucket, count(*) AS n_vecs
FROM embeddings GROUP BY 1
"""


def q_sim_knn_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector approximate top-3 neighbors within the SRP-LSH bucket —
    the full ANN query shape (bucket equi-join + windowed top-k), kept
    deterministic via rounded scores + id tiebreaks."""
    from pyspark.sql.window import Window

    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    bucket = None
    for p, plane in enumerate(_PLANES):
        bit = F.when(_dot(F.col("v"), plane) > 0,
                     F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    norm = F.sqrt(F.aggregate(F.col("v"), F.lit(0.0),
                              lambda acc, x: acc + x * x))
    eb = e.withColumn("bucket", bucket.cast("long")).withColumn("nrm", norm)
    a, b = eb.alias("a"), eb.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x)
    cos = F.round(dot / (F.col("a.nrm") * F.col("b.nrm")), 4)
    pairs = (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.vec_id") != F.col("b.vec_id")))
        .select(F.col("a.vec_id").alias("vec_id"),
                F.col("b.vec_id").alias("neighbor_id"),
                cos.alias("cosine"))
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("vec_id", "neighbor_id", "cosine", F.col("rk").alias("rank"))
    )


ORACLE_SIM_KNN_BLOCKED = f"""
WITH n AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS nrm,
         CAST({_SQL_BUCKET} AS BIGINT) AS bucket
  FROM embeddings
), pairs AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
         round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) AS cosine
  FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id != b.vec_id
)
SELECT vec_id, neighbor_id, cosine, rk AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
      ORDER BY cosine DESC, neighbor_id) AS rk FROM pairs)
WHERE rk <= 3
"""


SPECS: dict[str, QuerySpec] = {
    "q_sim_topk": QuerySpec(q_sim_topk, ORACLE_SIM_TOPK,
                            "brute-force cosine top-k"),
    "q_sim_lsh_buckets": QuerySpec(q_sim_lsh_buckets, ORACLE_SIM_LSH_BUCKETS,
                                   "SRP-LSH bucket histogram"),
    "q_sim_knn_blocked": QuerySpec(q_sim_knn_blocked, ORACLE_SIM_KNN_BLOCKED,
                                   "bucketed approximate kNN"),
}
