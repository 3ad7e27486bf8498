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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hippo_claim_crossover_spark.operators import similarity as ops_sim
from hippo_claim_crossover_spark.plans.base import QuerySpec, t

DIM = 64
N_PLANES = 8
QUERY_VEC_ID = 0
TOP_K = 10


# Hyperplanes come from the operators API (md5-seeded, deterministic) —
# identical constants are baked into both the Spark plan and the oracle SQL.
_PLANES = [ops_sim.srp_hyperplane(p, DIM) for p in range(N_PLANES)]


def q_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k against one query vector (vec_id=0),
    ranked on the rounded score with vec_id tiebreak (deterministic across
    engines). Query side is a broadcast single-row join — no collect()."""
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    q = (e.where(F.col("vec_id") == QUERY_VEC_ID)
         .select(F.col("v").alias("qv"),
                 ops_sim.l2_norm(F.col("v")).alias("qnrm")))
    return ops_sim.cosine_topk(
        e.where(F.col("vec_id") != QUERY_VEC_ID), q, TOP_K)


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
    return (
        e.select(ops_sim.srp_bucket(F.col("v"), _PLANES).alias("bucket"))
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
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    return ops_sim.knn_blocked(e, n_planes=N_PLANES, dim=DIM, k=3)


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
