"""Tests for plans/extras.py: sampling determinism and pivot/cube shape."""

from __future__ import annotations

from hippo_claim_crossover_spark.plans import ALL_SPECS


def test_hash_sample_is_stable_across_runs(spark, sf_dir):
    q = ALL_SPECS["q_sample_hash"].fn
    a = sorted(r["claim_id"] for r in q(spark, sf_dir).collect())
    b = sorted(r["claim_id"] for r in q(spark, sf_dir).collect())
    assert a == b and len(a) > 0
    # ~10% of orders, loose band
    total = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert 0.05 * total < len(a) < 0.15 * total


def test_stratified_sample_deterministic_per_seed(spark, sf_dir):
    q = ALL_SPECS["q_sample_stratified"].fn
    a = {r["l_returnflag"]: r["n_sampled"] for r in q(spark, sf_dir).collect()}
    b = {r["l_returnflag"]: r["n_sampled"] for r in q(spark, sf_dir).collect()}
    assert a == b
    assert set(a) == {"A", "N", "R"}


def test_cube_emits_all_grouping_combinations(spark, sf_dir):
    rows = ALL_SPECS["q_cube"].fn(spark, sf_dir).collect()
    combos = {(r["l_returnflag"] is None, r["l_linestatus"] is None)
              for r in rows}
    assert combos == {(False, False), (False, True), (True, False),
                      (True, True)}
    grand = [r for r in rows if r["l_returnflag"] is None
             and r["l_linestatus"] is None]
    assert len(grand) == 1
    assert grand[0]["n_lines"] == sum(
        r["n_lines"] for r in rows
        if r["l_returnflag"] is not None and r["l_linestatus"] is not None)
