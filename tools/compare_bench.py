"""Cross-round bench comparison: like-for-like totals + per-query deltas.

Usage: python tools/compare_bench.py OLD NEW [--band 0.15]

OLD/NEW each accept: a bench_detail.json (this round's sidecar), a driver
BENCH_r*.json artifact (including the truncated-tail r5 format — per-query
pairs are recovered by regex from the "tail" field), or a raw bench.py
stdout capture (last parseable JSON line wins).

Prints the shared-query totals, any query slower than ``band`` (+0.15s
absolute guard, so sub-second noise doesn't flag), and the top
improvements — the exact comparison the round verdicts grade.
"""

from __future__ import annotations

import json
import re
import sys


def load(path: str) -> dict[str, float]:
    raw = open(path).read()
    try:
        obj = json.loads(raw)
        if "queries" in obj:
            return {k: float(v) for k, v in obj["queries"].items()}
        if "tail" in obj:  # truncated driver artifact (r5 format)
            pairs = re.findall(r'"(q_\w+)": ([0-9.]+)', obj["tail"])
            return {k: float(v) for k, v in pairs}
    except json.JSONDecodeError:
        pass
    # raw stdout: scan lines bottom-up for one with a queries map
    for line in reversed(raw.splitlines()):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            obj = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "queries" in obj:
            return {k: float(v) for k, v in obj["queries"].items()}
    raise SystemExit(f"no per-query timings found in {path}")


def calib_of(path: str) -> str:
    """Session-health probes (bench.py calib_sec/calib_end_sec, r13+) —
    shown so a hot session is visible next to its totals."""
    try:
        obj = json.loads(open(path).read())
    except json.JSONDecodeError:
        return "n/a"
    parts = [f"{obj[k]}s" for k in ("calib_sec", "calib_end_sec")
             if k in obj]
    return "/".join(parts) if parts else "n/a"


def main() -> None:
    band = 0.15
    args = [a for a in sys.argv[1:] if not a.startswith("--band")]
    for a in sys.argv[1:]:
        if a.startswith("--band"):
            band = float(a.split("=", 1)[1] if "=" in a
                         else sys.argv[sys.argv.index(a) + 1])
    old, new = load(args[0]), load(args[1])
    shared = sorted(set(old) & set(new))
    t_old = sum(old[k] for k in shared)
    t_new = sum(new[k] for k in shared)
    import statistics
    ratios = [new[k] / old[k] for k in shared if old[k] > 0.05]
    med = f"{statistics.median(ratios):.3f}" if ratios else "n/a"
    print(f"shared={len(shared)}  old={t_old:.2f}s  new={t_new:.2f}s  "
          f"delta={t_new - t_old:+.2f}s  "
          f"median-ratio={med}  "
          f"calib old={calib_of(args[0])} new={calib_of(args[1])}")
    regr = [(k, old[k], new[k]) for k in shared
            if new[k] > (1 + band) * old[k] + 0.15]
    for k, a, b in sorted(regr, key=lambda t: t[1] - t[2]):
        print(f"  REGR {k:30s} {a:6.2f} -> {b:6.2f}")
    if not regr:
        print(f"  no regressions beyond +{band:.0%}+0.15s")
    impr = [(k, old[k], new[k]) for k in shared
            if new[k] < (1 - band) * old[k] - 0.15]
    for k, a, b in sorted(impr, key=lambda t: t[2] - t[1])[:10]:
        print(f"  IMPR {k:30s} {a:6.2f} -> {b:6.2f}")
    only_new = sorted(set(new) - set(old))
    if only_new:
        t = sum(new[k] for k in only_new)
        print(f"  new-only: {len(only_new)} queries, {t:.2f}s "
              f"({', '.join(only_new)})")


if __name__ == "__main__":
    main()
