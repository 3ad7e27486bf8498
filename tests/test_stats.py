"""Semantic tests for the statistics family (plans/stats.py) beyond the
hash oracle: the OLS fit agrees with an independent numpy solver, the
drift score behaves like a χ² divergence, sessionization satisfies its
gap invariants, and the snapshot diff classifies exactly the rows the
key arithmetic predicts."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from hippo_claim_crossover_spark.plans import ALL_SPECS


def test_regr_matches_numpy(spark, sf_dir):
    rows = {r["l_returnflag"]: r for r in
            ALL_SPECS["q_regr_group"].fn(spark, sf_dir).collect()}
    pdf = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
           .select("l_returnflag", "l_quantity", "l_extendedprice")
           .toPandas())
    for flag, grp in pdf.groupby("l_returnflag"):
        slope, intercept = np.polyfit(grp["l_quantity"],
                                      grp["l_extendedprice"], 1)
        got = rows[flag]
        assert got["n"] == len(grp)
        # numpy solves via lstsq on doubles; agree to ~1e-6 relative.
        assert abs(got["slope"] - slope) <= 1e-4 * max(1.0, abs(slope))
        assert abs(got["intercept"] - intercept) <= (
            1e-4 * max(1.0, abs(intercept)))
        r = np.corrcoef(grp["l_quantity"], grp["l_extendedprice"])[0, 1]
        assert abs(got["r2"] - r * r) <= 1e-4


def test_outlier_zscore_shape(spark, sf_dir):
    rows = ALL_SPECS["q_outlier_zscore"].fn(spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for ty, grp in by_type.items():
        assert sorted(r["rk"] for r in grp) == list(range(1, len(grp) + 1))
        assert len(grp) <= 5
        # |z| is non-increasing in rank
        zs = [abs(r["z"]) for r in sorted(grp, key=lambda r: r["rk"])]
        assert zs == sorted(zs, reverse=True)


def test_drift_chi2_invariants(spark, sf_dir):
    rows = ALL_SPECS["q_drift_chi2"].fn(spark, sf_dir).collect()
    assert len(rows) == 8
    assert all(r["chi2"] >= 0.0 for r in rows)
    # shards are a partition of the event table
    total = (spark.read.parquet(f"{sf_dir}/events.parquet").count())
    assert sum(r["n_events"] for r in rows) == total


def test_sessionize_gap_invariants(spark, sf_dir):
    """Within a session max gap ≤ threshold is NOT required (only
    consecutive gaps are), but consecutive sessions of one user must be
    separated by > 4h, sessions must not overlap, and the per-user event
    count must be conserved."""
    sess = ALL_SPECS["q_sessionize"].fn(spark, sf_dir).collect()
    ev_counts = {r["user_id"]: r["n"] for r in
                 spark.read.parquet(f"{sf_dir}/events.parquet")
                 .groupBy("user_id").agg(F.count("*").alias("n"))
                 .collect()}
    by_user: dict[int, list] = {}
    for r in sess:
        assert r["duration_us"] >= 0
        by_user.setdefault(r["user_id"], []).append(r)
    gap_us = 4 * 3600 * 1_000_000
    for uid, grp in by_user.items():
        grp.sort(key=lambda r: r["session_id"])
        assert [r["session_id"] for r in grp] == list(
            range(1, len(grp) + 1))
        assert sum(r["n_events"] for r in grp) == ev_counts[uid]
        for a, b in zip(grp, grp[1:]):
            d = (b["session_start"] - a["session_end"])
            assert d.total_seconds() * 1e6 > gap_us, (uid, a, b)


def test_snapshot_diff_classification(spark, sf_dir):
    rows = ALL_SPECS["q_snapshot_diff"].fn(spark, sf_dir).collect()
    keys = [r["o_orderkey"] for r in
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .select("o_orderkey").collect()]
    expect = {}
    for k in keys:
        in_old, in_new = k % 10 != 0, k % 7 != 3
        if in_new and not in_old:
            expect[k] = "insert"
        elif in_old and not in_new:
            expect[k] = "delete"
        elif in_old and in_new and k % 5 == 0:
            expect[k] = "update"
    got = {r["o_orderkey"]: r["op"] for r in rows}
    assert got == expect
    for r in rows:
        if r["op"] == "insert":
            assert r["old_value"] is None and r["new_value"] is not None
        elif r["op"] == "delete":
            assert r["new_value"] is None and r["old_value"] is not None
        else:
            assert abs(r["new_value"] - r["old_value"] - 10.0) < 1e-9


def test_skyline_matches_bruteforce(spark):
    """Distributed two-phase skyline == O(n²) brute-force dominance scan
    on randomized small inputs (3 seeds, with deliberate price ties and
    duplicate points)."""
    import os
    import random
    import tempfile

    for seed in (7, 42, 1337):
        rng = random.Random(seed)
        # (key, price with many ties, second-of-minute date dimension)
        rows = [(i, float(rng.randint(1, 40)), rng.randint(0, 59))
                for i in range(200)]
        df = spark.createDataFrame(
            rows, "o_orderkey long, price double, s int")
        with tempfile.TemporaryDirectory() as tmp:
            (df.select(
                "o_orderkey",
                F.col("price").alias("o_totalprice"),
                F.to_timestamp_ntz(F.concat(
                    F.lit("2024-01-01 00:00:"),
                    F.lpad(F.col("s").cast("string"), 2, "0")))
                .alias("o_orderdate"),
                F.lit("O").alias("o_orderstatus"),
                F.lit("x").alias("o_orderpriority"),
                F.lit(0).cast("long").alias("o_custkey"))
             .write.mode("overwrite")
             .parquet(os.path.join(tmp, "orders.parquet")))
            got = {r["o_orderkey"] for r in
                   ALL_SPECS["q_skyline"].fn(spark, tmp).collect()}
        expect = {k for k, p, s in rows
                  if not any(p2 > p and s2 > s for _, p2, s2 in rows)}
        assert got == expect, f"seed {seed}"


def test_reconcile_detects_injected_faults_exactly(spark, sf_dir):
    """Buckets flagged inconsistent must be EXACTLY those containing a
    faulted key (≡0 mod 97) — no false positives, no misses."""
    import pyspark.sql.functions as F  # noqa: F811

    rows = {r["bucket"]: r for r in
            ALL_SPECS["q_reconcile"].fn(spark, sf_dir).collect()}
    faulted = {r["b"] for r in
               spark.read.parquet(f"{sf_dir}/orders.parquet")
               .where(F.col("o_orderkey") % 97 == 0)
               .select(F.pmod("o_orderkey", F.lit(64)).alias("b"))
               .distinct().collect()}
    assert len(rows) == 64
    for b, r in rows.items():
        assert r["n_a"] == r["n_b"]
        assert r["is_consistent"] == (b not in faulted), b


def test_reconcile_lost_bucket_reports_false_not_null(spark):
    """A bucket present on only ONE side (wholly lost data — the
    headline case reconciliation exists to catch) must report
    is_consistent = False, never NULL: a consumer filtering
    WHERE NOT is_consistent has to see the loss (ADVICE r5)."""
    from hippo_claim_crossover_spark.plans.stats import reconcile_digests

    a = spark.createDataFrame(
        [(0, 2, 100), (1, 3, 200)], "bucket int, n_a long, sum_a long")
    b = spark.createDataFrame(
        [(0, 2, 100)], "bucket int, n_b long, sum_b long")
    rows = {r["bucket"]: r for r in reconcile_digests(a, b).collect()}
    assert rows[0]["is_consistent"] is True
    assert rows[1]["is_consistent"] is False          # lost bucket
    assert rows[1]["n_b"] == 0
    # and the symmetric case: a bucket that only EXISTS on side b
    c = spark.createDataFrame(
        [(7, 1, 5)], "bucket int, n_b long, sum_b long")
    rows2 = {r["bucket"]: r for r in reconcile_digests(a, c).collect()}
    assert rows2[7]["is_consistent"] is False
    assert rows2[7]["n_a"] == 0


def test_outlier_mad_matches_numpy_and_resists_outliers(spark, sf_dir):
    """The med/MAD per segment must equal numpy's, and the robust score
    must actually be robust: recomputing z the classic way (mean/std)
    on a contaminated copy shifts, while med/MAD stays put."""
    import numpy as np

    vals = {r["event_type"]: r["vs"] for r in
            ALL_SPECS["q_outlier_mad"].fn.__globals__["t"](
                spark, sf_dir, "events")
            .groupBy("event_type").agg(F.collect_list("value").alias("vs"))
            .collect()}
    got = {(r["event_type"], r["rk"]): r for r in
           ALL_SPECS["q_outlier_mad"].fn(spark, sf_dir).collect()}
    assert len(got) == 25  # 5 types x top-5
    for etype, vs in vals.items():
        a = np.array(vs)
        med = float(np.median(a))
        mad = float(np.median(np.abs(a - med)))
        # the reported top-1 |rz| matches an independent recomputation
        top = got[(etype, 1)]
        want_rz = sorted(((v - med) / mad for v in vs), key=abs)[-1]
        assert abs(abs(top["rz"]) - abs(want_rz)) < 1e-3, etype
        # robustness: med/MAD of a 1%-contaminated copy moves < 2%,
        # while the mean moves far more (the reason MAD exists)
        contaminated = np.concatenate([a, np.full(max(1, len(a) // 100),
                                                  a.max() * 100)])
        med_c = float(np.median(contaminated))
        mad_c = float(np.median(np.abs(contaminated - med_c)))
        assert abs(med_c - med) <= 0.02 * abs(med) + 1e-9
        assert abs(mad_c - mad) <= 0.05 * abs(mad) + 1e-9
        assert abs(float(contaminated.mean()) - float(a.mean())) \
            > 0.5 * abs(float(a.mean()))


def test_drift_ks_statistic_bounds_and_self_zero(spark, sf_dir):
    """KS invariants: every reported gap is in [0, 1]; and the gap of a
    sample against itself is exactly 0 (computed by rebuilding the CDF
    machinery with the same sample on both sides)."""
    from pyspark.sql import functions as F

    from hippo_claim_crossover_spark.operators.ranking import global_cumsum
    from hippo_claim_crossover_spark.plans import ALL_SPECS
    from hippo_claim_crossover_spark.plans.base import t

    rows = ALL_SPECS["q_drift_ks"].fn(spark, sf_dir).collect()
    assert rows, "KS query returned no rows"
    for r in rows:
        assert 0.0 <= r["ks_gap"] <= 1.0
        assert r["c1"] <= r["n1"] and r["c2"] <= r["n2"]

    # self-comparison: identical samples on both sides → D == 0
    e = (t(spark, sf_dir, "events")
         .where(F.col("event_type") == "click")
         .select("value"))
    per_val = e.groupBy("value").agg(F.count(F.lit(1)).alias("d1"))
    per_val = per_val.withColumn("d2", F.col("d1"))
    cum = global_cumsum(per_val, ["value"], ["d1", "d2"])
    mx = (cum.agg(F.max(F.abs(F.col("_cum_d1") - F.col("_cum_d2"))))
          .collect()[0][0])
    assert mx == 0


def test_gini_bounds_and_degenerate_zero(spark, sf_dir):
    """Gini invariants: every segment's coefficient is in [0, 1) and the
    top-decile share is within (0, 1]; a constant-revenue population has
    Gini exactly 0 under the same closed form."""
    from hippo_claim_crossover_spark.plans import ALL_SPECS

    rows = ALL_SPECS["q_gini"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["gini"] < 1.0, r
        assert 0.0 < r["top_decile_share"] <= 1.0, r
        # exact guaranteed lower bound for a positive distribution:
        # the floor(n/10) top customers hold >= their uniform share
        assert r["top_decile_share"] >= (r["n"] // 10) / r["n"] - 1e-9, r
    # degenerate: equal values -> (2*sum(i*x) - (n+1)*sum(x)) = 0
    n, x = 100, 7
    sum_x = n * x
    sum_rx = x * n * (n + 1) // 2
    assert 2 * sum_rx - (n + 1) * sum_x == 0


def test_interval_coverage_bounds(spark, sf_dir):
    """Coverage invariants: per user, merged coverage is at least one
    interval length, at most n_events * interval length, and islands
    never exceed events."""
    from hippo_claim_crossover_spark.plans import ALL_SPECS

    rows = ALL_SPECS["q_interval_coverage"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_islands"] <= r["n_events"]
        assert 300.0 <= r["covered_seconds"] <= r["n_events"] * 300.0
