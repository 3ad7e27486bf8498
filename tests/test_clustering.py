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
