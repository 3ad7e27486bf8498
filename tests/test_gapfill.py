"""Gap-fill semantics beyond the hash oracle: the spine is complete and
gap-free, locf carries the previous observation exactly, and interpolated
values sit on the line between their bracketing observations."""

from __future__ import annotations

from hippo_claim_crossover_spark.plans import ALL_SPECS


def test_gapfill_invariants(spark, sf_dir):
    rows = sorted(
        ALL_SPECS["q_gapfill"].fn(spark, sf_dir).collect(),
        key=lambda r: (r["priority"], r["day"]))
    by_series: dict[str, list] = {}
    for r in rows:
        by_series.setdefault(r["priority"], []).append(r)
    assert len(by_series) == 5
    for series in by_series.values():
        # complete 59-day spine, consecutive days
        assert len(series) == 59
        for a, b in zip(series, series[1:]):
            assert (b["day"] - a["day"]).days == 1
        prev = None
        for r in series:
            if r["n_orders"] > 0:
                prev = r
                # an observed day interpolates to itself
                assert r["interp_value"] == r["locf_value"]
            elif prev is not None:
                # locf carries the last observed value forward
                assert r["locf_value"] == prev["locf_value"]
        # every interpolated gap value lies between its bracketing
        # observations (linear ⇒ bounded by endpoints)
        obs_idx = [i for i, r in enumerate(series) if r["n_orders"] > 0]
        for lo, hi in zip(obs_idx, obs_idx[1:]):
            vlo = series[lo]["interp_value"]
            vhi = series[hi]["interp_value"]
            lo_b, hi_b = min(vlo, vhi), max(vlo, vhi)
            for i in range(lo + 1, hi):
                v = series[i]["interp_value"]
                assert lo_b - 1e-6 <= v <= hi_b + 1e-6, (i, v, lo_b, hi_b)
        # before the first / after the last observation: no interpolation
        for i in range(obs_idx[0]):
            assert series[i]["interp_value"] is None
            assert series[i]["locf_value"] is None
        for i in range(obs_idx[-1] + 1, 59):
            assert series[i]["interp_value"] is None
