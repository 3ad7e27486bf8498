"""DataSketches HLL surface: the merged-partials estimate must equal the
one-shot estimate exactly (same library, same default lgK, union over
exact per-day partials), and both must sit within HLL's error envelope
of the exact distinct count."""

from __future__ import annotations

from hippo_claim_crossover_spark.plans import ALL_SPECS


def test_hll_merge_equals_direct_and_tracks_exact(spark, sf_dir):
    rows = ALL_SPECS["q_hll_sketch"].fn(spark, sf_dir).collect()
    assert len(rows) == 5  # one per event type
    for r in rows:
        assert r["approx_merged"] == r["approx_direct"], r
        # default lgK=12 → relative standard error ~1.6%; 5σ envelope.
        assert abs(r["approx_direct"] - r["n_exact"]) <= max(
            5, 0.08 * r["n_exact"]), r
