"""DataSketches HLL surface: merged-partials and one-shot estimates must
both sit within HLL's error envelope of the exact distinct count.

Bit-for-bit merge==direct equality holds only while every daily partial
stays in one sketch mode; past the sparse→dense promotion threshold the
union path estimates differently (observed at sf0.1), so the
scale-stable invariant asserted here — and by the query's verdict
columns — is each estimate's shared 8% (~5σ at lgK=12) envelope around
the exact count (which transitively bounds merged-vs-direct
disagreement at ~16%); a red here means a broken merge/estimate, not
tail luck.
"""

from __future__ import annotations

from hippo_claim_crossover_spark.plans import ALL_SPECS


def test_hll_estimates_track_exact(spark, sf_dir):
    rows = ALL_SPECS["q_hll_sketch"].fn(spark, sf_dir).collect()
    assert len(rows) == 5  # one per event type
    for r in rows:
        assert r["merged_within_band"], r
        assert r["direct_within_band"], r
