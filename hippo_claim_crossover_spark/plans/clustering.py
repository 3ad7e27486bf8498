"""Semantic clustering over ``embeddings`` (§2b training-data-pipeline
surface): distributed spherical k-means, hash-checked through the full
iterative fit.

The oracle replays every Lloyd round in SQL — seed sample, cosine-argmax
assignment, exact-integer-micros centroid means — so the driver's
value-hash pins the *entire* iterative computation, not just the final
aggregate shape. See operators/clustering.py for why the means are exact
across engines (micros quantization before summation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hippo_claim_crossover_spark.operators import clustering as ops_km
from hippo_claim_crossover_spark.operators.similarity import l2_norm
from hippo_claim_crossover_spark.plans.base import QuerySpec, t_wide

N_CELLS = 8
ITERS = 2


def _r4(expr: str) -> str:
    return f"floor(({expr}) * 1e4 + 0.5) / 1e4"


def _r6(expr: str) -> str:
    return f"floor(({expr}) * 1e6 + 0.5) / 1e6"


def q_cluster_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means cluster profile after ``ITERS`` Lloyd rounds: per-cell
    member count + 4dp centroid norm. Assignment is map-side over a
    broadcast centroid array (zero shuffle); each update shuffles only
    C×D partial sums (operators/clustering.py)."""
    e = t_wide(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    assign, cents = ops_km.kmeans_fit(e, N_CELLS, ITERS)
    sizes = assign.groupBy("cell").agg(F.count(F.lit(1)).alias("n_vecs"))
    norms = cents.select(
        F.col("cent_id"),
        ops_km._duck_round(l2_norm(F.col("cv")), 4).alias("centroid_norm"))
    return (
        sizes.join(F.broadcast(norms), sizes.cell == norms.cent_id)
        .select("cell", "n_vecs", "centroid_norm")
    )


def _assign_cte(name: str, cents: str) -> str:
    """One cosine-argmax assignment round: rounded cosine DESC with
    cent_id tiebreak — mirrors kmeans_assign's array_min(struct(-cos, id))
    bit-for-bit."""
    cos = _r6(f"list_dot_product(e.v, c.cv) / (e.nrm * "
              f"sqrt(list_dot_product(c.cv, c.cv)))")
    return f"""{name} AS (
  SELECT vec_id, v, cent_id AS cell FROM (
    SELECT e.vec_id, e.v, c.cent_id, row_number() OVER (
      PARTITION BY e.vec_id ORDER BY {cos} DESC, c.cent_id) AS rn
    FROM e, {cents} c) WHERE rn = 1
)"""


def _update_cte(uname: str, cname: str, assign: str) -> str:
    """One centroid update: integer-micros element sums → one IEEE mean
    division — mirrors kmeans_update exactly (same division association:
    (s / n) / 1e6)."""
    return f"""{uname} AS (
  SELECT cell, unnest(generate_series(1, len(v))) AS i,
         unnest(list_transform(v,
                x -> CAST(floor(x * 1e6 + 0.5) AS BIGINT))) AS m
  FROM {assign}
), {cname} AS (
  SELECT cell AS cent_id, list(mu ORDER BY i) AS cv
  FROM (SELECT cell, i,
               CAST(sum(m) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1e6 AS mu
        FROM {uname} GROUP BY cell, i)
  GROUP BY cell
)"""


ORACLE_CLUSTER_KMEANS = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings
), c0 AS (
  SELECT vec_id AS cent_id, v AS cv
  FROM e ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {N_CELLS}
), {_assign_cte("a0", "c0")}, {_update_cte("u1", "c1", "a0")},
{_assign_cte("a1", "c1")}, {_update_cte("u2", "c2", "a1")},
{_assign_cte("a2", "c2")}
SELECT s.cell, s.n_vecs,
       {_r4("sqrt(list_dot_product(c.cv, c.cv))")} AS centroid_norm
FROM (SELECT cell, count(*) AS n_vecs FROM a2 GROUP BY cell) s
JOIN c2 c ON s.cell = c.cent_id
"""


SPECS: dict[str, QuerySpec] = {
    "q_cluster_kmeans": QuerySpec(
        q_cluster_kmeans, ORACLE_CLUSTER_KMEANS,
        "distributed k-means (2 Lloyd rounds, exact-integer means)"),
}
