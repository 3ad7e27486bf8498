"""Bench stage-metrics audit (the r12/r13 verdicts' queued
"history-server stage-metrics audit for bench"): one materialization of
every ``bench.HEADLINE`` query at the bench SF with per-query STAGE
metrics pulled from the Spark UI REST API — shuffle read/write bytes,
memory/disk spill, task counts, and the heaviest stage — so hidden
spills or shuffle blow-ups are auditable per query without reading 207
``.explain`` dumps.

Attribution: each query's stages are isolated by stage-id SNAPSHOT
(same discipline as tools/stress_century.py) — only stages whose id is
new relative to the pre-query snapshot are attributed to it. Queries
whose fn() performs actions at plan-build time (stream harnesses, the
AQE-materialized percentile checkpoints — SCALE.md Round 14) have that
build-time work attributed too, deliberately: the audit's question is
"what does this query DO to the cluster", not bench's steady-state
timing question, so fn-time stages belong in its ledger.

Usage: python tools/stage_audit.py [sf_dir] [--json PATH] [query ...]
       (default sf_dir /root/testdata/sf0.1, default PATH
       stage_audit.json, default queries: all of bench.HEADLINE)

Output: one JSON with per-query {wall_sec, n_stages, n_tasks,
shuffle_write_mb, shuffle_read_mb, spill_mem_mb, spill_disk_mb,
peak_stage_shuffle_write_mb} plus a top-10 summary printed to stdout.
Spill > 0 on local[32]/128 GiB is the 100 TB red flag the audit
exists to catch: a plan that spills at sf0.1 has row-proportional
state somewhere.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from hippo_claim_crossover_spark.plans import ALL_SPECS  # noqa: E402
from hippo_claim_crossover_spark.session import get_spark  # noqa: E402

MB = 1024.0 * 1024.0


def _stages(spark) -> list[dict]:
    # No status filter: FAILED stages must be attributed too, else a
    # query whose job retried/errored gets a silently partial ledger
    # (undercounted shuffle/spill) instead of being flagged (r15).
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app_id}/stages"
    with urllib.request.urlopen(url, timeout=15) as r:
        return json.load(r)


def audit_query(spark, name: str, sf_dir: str) -> dict:
    before = {s["stageId"] for s in _stages(spark)}
    t0 = time.time()
    ALL_SPECS[name].fn(spark, sf_dir).write.format("noop") \
        .mode("overwrite").save()
    wall = time.time() - t0
    new = [s for s in _stages(spark) if s["stageId"] not in before]
    return {"wall_sec": round(wall, 3), **_ledger(new)}


def _ledger(new: list[dict]) -> dict:
    """Aggregate one query's newly-appeared stage entries into the
    per-query ledger. The endpoint returns one entry per stage
    ATTEMPT; summing raw entries would double-count a retried stage
    (the failed attempt's partial shuffle plus the retry's full one)
    and would count SKIPPED exchange-reuse placeholders toward
    n_stages. Metrics therefore come from the LATEST attempt per
    stage, excluding SKIPPED; retries and reuse are flagged, not
    summed (r15)."""
    latest: dict[int, dict] = {}
    for s in new:
        k = s["stageId"]
        if k not in latest or s.get("attemptId", 0) \
                > latest[k].get("attemptId", 0):
            latest[k] = s
    live = [s for s in latest.values() if s.get("status") != "SKIPPED"]
    writes = [s.get("shuffleWriteBytes", 0) for s in live]
    return {
        "n_stages": len(live),
        "n_skipped_stages": sum(1 for s in latest.values()
                                if s.get("status") == "SKIPPED"),
        "n_failed_stages": sum(1 for s in new
                               if s.get("status") == "FAILED"),
        "n_tasks": sum(s.get("numCompleteTasks", 0) for s in live),
        "shuffle_write_mb": round(sum(writes) / MB, 2),
        "shuffle_read_mb": round(
            sum(s.get("shuffleReadBytes", 0) for s in live) / MB, 2),
        "spill_mem_mb": round(
            sum(s.get("memoryBytesSpilled", 0) for s in live) / MB, 2),
        "spill_disk_mb": round(
            sum(s.get("diskBytesSpilled", 0) for s in live) / MB, 2),
        "peak_stage_shuffle_write_mb": round(max(writes, default=0) / MB, 2),
    }


def main() -> int:
    argv = sys.argv[1:]
    out_path = "stage_audit.json"
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            print("usage: stage_audit.py [sf_dir] [--json PATH] [query ...]",
                  file=sys.stderr)
            return 2
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    names = argv[1:] or list(bench.HEADLINE)
    spark = get_spark("stage_audit",
                      extra_conf={"spark.ui.enabled": "true",
                                  "spark.ui.retainedStages": "20000"})
    results: dict[str, dict] = {}
    for n, name in enumerate(names, 1):
        try:
            results[name] = audit_query(spark, name, sf_dir)
        except Exception as e:  # keep the ledger complete on one failure
            results[name] = {"error": f"{type(e).__name__}: {e}"}
        if n % 25 == 0:
            print(f"...{n}/{len(names)}", file=sys.stderr)
    payload = {"sf_dir": sf_dir, "n_queries": len(results),
               "queries": results}
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.write("\n")

    ok = {k: v for k, v in results.items() if "error" not in v}
    errored = sorted(k for k in results if k not in ok)
    failed_stage = sorted(k for k, v in ok.items()
                          if v.get("n_failed_stages", 0) > 0)
    spillers = {k: v for k, v in ok.items()
                if v["spill_mem_mb"] > 0 or v["spill_disk_mb"] > 0}
    print(f"wrote {out_path} ({len(ok)}/{len(results)} audited)")
    print("top shuffle writers (MB):")
    for k, v in sorted(ok.items(), key=lambda kv: -kv[1]["shuffle_write_mb"])[:10]:
        print(f"  {k:30s} {v['shuffle_write_mb']:10.1f}  "
              f"(peak stage {v['peak_stage_shuffle_write_mb']:.1f})")
    if spillers:
        print("SPILLING QUERIES (100 TB red flag):")
        for k, v in sorted(spillers.items(),
                           key=lambda kv: -(kv[1]["spill_mem_mb"]
                                            + kv[1]["spill_disk_mb"])):
            print(f"  {k:30s} mem {v['spill_mem_mb']:.1f} MB  "
                  f"disk {v['spill_disk_mb']:.1f} MB")
    else:
        print("no query spills at this SF")
    # Distinct exit codes so a green-looking ledger can't hide failures:
    # 3 = a query's audit itself errored, 4 = a stage FAILED during a
    # query (work retried/lost — ledger flagged), 1 = spill. Severity
    # order: a broken audit outranks a failed stage outranks spill, so
    # a spilling run can never mask an errored one (r15).
    if errored:
        print(f"AUDIT ERRORS ({len(errored)}): {' '.join(errored)}")
    if failed_stage:
        print(f"FAILED STAGES in: {' '.join(failed_stage)}")
    if errored:
        return 3
    if failed_stage:
        return 4
    if spillers:
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
