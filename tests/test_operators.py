"""Unit tests for operators/joins.py: as-of join edge semantics and
salted-join equivalence."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from hippo_claim_crossover_spark.operators.joins import asof_join, salted_join


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, _ts(5), "a"), (1, _ts(10), "b"), (2, _ts(3), "c"),
         (3, _ts(7), "d")],
        "k int, ts timestamp, ev string")
    right = spark.createDataFrame(
        [(1, _ts(4), 100.0), (1, _ts(10), 200.0), (2, _ts(9), 300.0)],
        "k int, rts timestamp, val double")
    return left, right


def test_asof_backward_picks_latest_at_or_before(spark):
    left, right = _frames(spark)
    out = {(r["k"], r["ts"]): (r["rts"], r["val"])
           for r in asof_join(left, right, "k", "ts", "rts").collect()}
    assert out[(1, _ts(5))] == (_ts(4), 100.0)      # strictly before
    assert out[(1, _ts(10))] == (_ts(10), 200.0)    # equal ts → inclusive
    assert out[(2, _ts(3))] == (None, None)         # right is later → NULL
    assert out[(3, _ts(7))] == (None, None)         # key absent → NULL


def test_asof_tolerance_nulls_stale_matches(spark):
    left, right = _frames(spark)
    out = {(r["k"], r["ts"]): r["val"]
           for r in asof_join(left, right, "k", "ts", "rts",
                              tolerance="12 HOURS").collect()}
    assert out[(1, _ts(5))] is None       # match is 1 day old > 12h
    assert out[(1, _ts(10))] == 200.0     # exact-ts match survives
    assert len(out) == 4                  # left-outer: row count preserved


def test_asof_rejects_overlapping_columns(spark):
    left = spark.createDataFrame([(1, _ts(1), 1.0)],
                                 "k int, ts timestamp, val double")
    right = spark.createDataFrame([(1, _ts(1), 2.0)],
                                  "k int, rts timestamp, val double")
    try:
        asof_join(left, right, "k", "ts", "rts")
        raise AssertionError("expected ValueError")
    except ValueError as exc:
        assert "val" in str(exc)


def test_salted_join_matches_plain_join(spark):
    big = spark.range(0, 1000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("payload"))
    dim = spark.createDataFrame(
        [(int(k), f"name_{k}") for k in range(7)], "k bigint, name string")
    plain = big.join(dim, "k").select("k", "payload", "name")
    salted = salted_join(big, dim, "k", salt=8).select("k", "payload", "name")
    assert sorted(map(tuple, plain.collect())) == \
        sorted(map(tuple, salted.collect()))
