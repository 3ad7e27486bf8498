"""Century stress: ONE 100× point for the three largest decade-exponent
queries (VERDICT r9 #6 — the brief's question is 100×, the decade table
only proves 10×).

Reuses stress_decade's replica machinery (key-namespace shifts, salted
document text) to materialize 1× and 100× legs of each query's input
tables, runs the declared plans unmodified (full materialization through
the noop sink, best-of-2), and records wall time, the per-century scaling
exponent log100(t_100x/t_1x), and shuffle metrics (peak single-stage and
total shuffle-write bytes, via the Spark UI REST API) so SCALE.md can
show a measured — not extrapolated — 100× row with spill evidence.

Usage: python tools/stress_century.py [query ...]
       (default: q_percentile q_join_setsim q_recommend)
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stress_decade import TABLES_FOR, materialize  # noqa: E402

from hippo_claim_crossover_spark.plans import ALL_SPECS  # noqa: E402
from hippo_claim_crossover_spark.session import get_spark  # noqa: E402

SCRATCH = "/root/repo/_scratch/century"
DEFAULT_QUERIES = ["q_percentile", "q_join_setsim", "q_recommend"]


def _stage_metrics(spark) -> list[dict]:
    # uiWebUrl, not a hardcoded :4040 — Spark binds the next free port
    # when another app already holds 4040
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app_id}/stages"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def timed_with_shuffle(spark, build, reps: int = 2):
    """Best-of-N wall + the shuffle bytes of one (the first) execution.
    Only stages whose id is NEW relative to the pre-run snapshot count,
    so materialization / earlier-query shuffles never leak in."""
    before = {s["stageId"] for s in _stage_metrics(spark)}
    best = float("inf")
    shuffle_total = peak = 0
    for i in range(reps):
        t0 = time.time()
        build().write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
        if i == 0:
            new = [s for s in _stage_metrics(spark)
                   if s["stageId"] not in before]
            writes = [s.get("shuffleWriteBytes", 0) for s in new]
            shuffle_total = sum(writes)
            peak = max(writes, default=0)
    return best, shuffle_total, peak


def main() -> None:
    queries = sys.argv[1:] or DEFAULT_QUERIES
    unknown = [q for q in queries if q not in TABLES_FOR]
    if unknown:
        sys.exit(f"unknown queries {unknown} — supported: "
                 f"{sorted(TABLES_FOR)}")
    spark = get_spark("stress_century",
                      extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    one_dir, c_dir = f"{SCRATCH}/x1", f"{SCRATCH}/x100"
    tables = sorted({t for q in queries for t in TABLES_FOR[q]})
    materialize(spark, tables, 1, one_dir)
    materialize(spark, tables, 100, c_dir)

    rows = []
    for q in queries:
        fn = ALL_SPECS[q].fn
        t1, sh1, pk1 = timed_with_shuffle(spark, lambda: fn(spark, one_dir))
        t100, sh100, pk100 = timed_with_shuffle(
            spark, lambda: fn(spark, c_dir))
        exp = math.log10(t100 / t1) / 2  # per-decade exponent over 2 decades
        rows.append({
            "query": q, "t_1x_s": round(t1, 2), "t_100x_s": round(t100, 2),
            "exponent_per_decade": round(exp, 2),
            "shuffle_total_100x_mb": round(sh100 / 1e6, 1),
            "shuffle_peak_stage_100x_mb": round(pk100 / 1e6, 1),
        })
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"century": rows}))
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
