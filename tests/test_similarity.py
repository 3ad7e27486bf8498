"""Unit tests for the SRP-LSH similarity operators.

The ANN surface generalizes the reference's fixed field-mapping pipeline
(`lib/hippo_claim_crossover.rb` has no similarity ops) per the §2b
extension mandate; these tests pin the scale policy (plane count grows
with N) and the multi-family candidate algebra.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hippo_claim_crossover_spark.operators.similarity import (
    MAX_PLANES,
    MIN_PLANES,
    knn_blocked,
    planes_for,
    srp_family,
    srp_hyperplane,
)


def test_planes_for_grows_with_n_and_clamps():
    assert planes_for(0) == MIN_PLANES
    assert planes_for(100) == MIN_PLANES
    # smallest p with 32 * 2^p >= n
    assert planes_for(2000) == 6
    assert planes_for(4096) == 7
    # doubling N adds one plane: bucket population stays bounded
    assert planes_for(8192) == planes_for(4096) + 1
    assert planes_for(10**12) == MAX_PLANES


def test_planes_for_matches_log_formula():
    for n in (33, 64, 65, 1000, 2048, 2049, 10**6):
        expected = max(MIN_PLANES,
                       min(MAX_PLANES, math.ceil(math.log2(n / 32))))
        assert planes_for(n) == expected, n


def test_srp_families_are_disjoint():
    f0 = srp_family(0, 4, 8)
    f1 = srp_family(1, 4, 8)
    assert f0 != f1
    assert f0[0] == srp_hyperplane(0, 8)
    assert f1[0] == srp_hyperplane(1000, 8)


def _vec(seed: int, dim: int = 8) -> list[float]:
    # deterministic pseudo-random unit-free vector
    return [math.sin(seed * 31 + d * 7) + 0.01 for d in range(dim)]


def test_knn_blocked_pairs_are_disjoint_across_families(spark):
    rows = [(i, _vec(i)) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    out = knn_blocked(df, dim=8, k=40, n_planes=2, n_families=3)
    pairs = out.select("vec_id", "neighbor_id").collect()
    assert len(pairs) == len({(r.vec_id, r.neighbor_id) for r in pairs})


def test_knn_blocked_finds_exact_duplicates(spark):
    # identical vectors share every SRP bucket in every family, so a
    # duplicate is always a candidate and ranks first at cosine 1.0
    rows = [(i, _vec(i)) for i in range(30)] + [(100, _vec(7))]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    out = knn_blocked(df, dim=8, k=1, n_planes=3).collect()
    top = {r.vec_id: (r.neighbor_id, r.cosine) for r in out}
    assert top[7] == (100, 1.0)
    assert top[100] == (7, 1.0)
