"""Unit tests for the distributed k-means operator.

The reference has no clustering (319-line field-mapper); this is §2b
training-data-pipeline surface. Tests pin the argmax semantics, the
exact-integer mean, empty-cell dropout, and the zero-shuffle assignment
plan shape that makes the operator 100 TB-viable.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hippo_claim_crossover_spark.operators.clustering import (
    kmeans_assign,
    kmeans_fit,
    kmeans_update,
)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, v array<double>")


def _cents(spark, rows):
    return spark.createDataFrame(rows, "cent_id long, cv array<double>")


def test_assign_picks_max_cosine_with_id_tiebreak(spark):
    df = _vecs(spark, [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])])
    # cents 10/11 are identical: the tie must go to the smaller cent_id
    cents = _cents(spark, [(10, [2.0, 0.0]), (11, [2.0, 0.0]),
                           (12, [0.0, 5.0])])
    got = {r.vec_id: r.cell for r in kmeans_assign(df, cents).collect()}
    assert got == {1: 10, 2: 12, 3: 10}


def test_assign_is_shuffle_free(spark):
    """The 100 TB contract: assignment must be a map-side expression over
    a broadcast centroid array — no Exchange on the big side (the only
    exchanges in the plan are the broadcast build of the tiny side)."""
    df = _vecs(spark, [(i, [float(i), 1.0]) for i in range(20)])
    cents = _cents(spark, [(0, [1.0, 0.0]), (1, [0.0, 1.0])])
    plan = kmeans_assign(df, cents)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    for line in plan.splitlines():
        # allowed: the BroadcastExchange itself and the SinglePartition
        # pack of the C-row centroid array — both O(C), never O(N)
        if ("Exchange" in line and "Broadcast" not in line
                and "SinglePartition" not in line):
            pytest.fail(f"data-sized exchange in assign plan: {line}")


def test_update_is_exact_integer_mean(spark):
    assigned = spark.createDataFrame(
        [(1, [0.25, 1.0], 7), (2, [0.75, 3.0], 7), (3, [5.0, 5.0], 9)],
        "vec_id long, v array<double>, cell long")
    got = {r.cent_id: r.cv for r in kmeans_update(assigned).collect()}
    # micros are exact for these values: mean is (sum_micros/n)/1e6
    assert got[7] == [0.5, 2.0]
    assert got[9] == [5.0, 5.0]


def test_update_drops_empty_cells_and_fit_converges(spark):
    # two tight groups; a third seed centroid loses all members and
    # must disappear from the next round's centroid table
    rows = [(i, [10.0 + 0.001 * i, 0.0]) for i in range(5)]
    rows += [(10 + i, [0.0, 10.0 + 0.001 * i]) for i in range(5)]
    df = _vecs(spark, rows)
    assign, cents = kmeans_fit(df, n_cells=3, iters=2)
    cells = [r.cell for r in assign.collect()]
    # exactly the two natural clusters survive, 5 members each
    sizes = sorted(
        assign.groupBy("cell").count().select("count").toPandas()["count"])
    assert sizes == [5, 5]
    assert cents.count() == len(set(cells))


def test_fit_is_deterministic_across_runs(spark):
    df = _vecs(spark, [(i, [float((i * 7) % 13), float((i * 5) % 11), 1.0])
                       for i in range(40)])
    a1, c1 = kmeans_fit(df, n_cells=4, iters=2)
    a2, c2 = kmeans_fit(df, n_cells=4, iters=2)
    assert sorted((r.vec_id, r.cell) for r in a1.collect()) == \
           sorted((r.vec_id, r.cell) for r in a2.collect())
    assert sorted(map(tuple, ((r.cent_id, tuple(r.cv)) for r in c1.collect()))) == \
           sorted(map(tuple, ((r.cent_id, tuple(r.cv)) for r in c2.collect())))


def test_sem_subplanes_thresholds():
    """Sub-planes engage exactly past SEM_MAX_KMEANS_CELLS·SEM_TARGET_CELL
    rows (16,384) and double the bucket count per extra plane — the
    integer-only rule the DuckDB oracle recomputes from COUNT(*)."""
    from hippo_claim_crossover_spark.operators.similarity import MAX_PLANES
    from hippo_claim_crossover_spark.plans.clustering import (
        _sem_subplanes_for,
    )

    assert _sem_subplanes_for(1) == 0
    assert _sem_subplanes_for(16384) == 0
    assert _sem_subplanes_for(16385) == 1
    assert _sem_subplanes_for(32768) == 1
    assert _sem_subplanes_for(32769) == 2
    assert _sem_subplanes_for(10**12) == MAX_PLANES


def test_semdedup_subbuckets_only_prune_pairs(spark, monkeypatch):
    """Forcing the SRP sub-split on the small fixture (cap constants
    shrunk so p_sub=4 while the k-means level is unchanged at nc=8)
    must keep the members partition identical and can only REMOVE
    near-dup pairs relative to plain cell blocking — a pair straddling
    two sub-buckets of one cell is the documented LSH recall trade,
    never a new removal."""
    from hippo_claim_crossover_spark.plans import clustering as mod

    sf = "/root/testdata/sf0.001"
    base = {r["cell"]: r for r in mod.q_semdedup(spark, sf).collect()}
    # 8·4·2^p >= 500 -> p_sub = 4; nc = max(8, min(8, 500//4)) = 8 as before
    monkeypatch.setattr(mod, "SEM_MAX_KMEANS_CELLS", 8)
    monkeypatch.setattr(mod, "SEM_TARGET_CELL", 4)
    split = {r["cell"]: r for r in mod.q_semdedup(spark, sf).collect()}
    assert set(split) == set(base)
    assert sum(r["n_removed"] for r in split.values()) < sum(
        r["n_removed"] for r in base.values())  # 16 sub-buckets must prune
    for cell, r in split.items():
        assert r["n_members"] == base[cell]["n_members"]
        assert r["n_removed"] <= base[cell]["n_removed"]
        assert r["n_kept"] + r["n_removed"] == r["n_members"]
