"""Driver-evidence freshness histogram (r12 VERDICT #1's done-criterion).

For every declared query, finds the LATEST round whose CORRECTNESS_r*.json
carries a record for it, prints the histogram plus the oldest cohort's
members, and flags any query whose latest record is a failure. A query
with no driver record yet (new this round, window-pending) is listed
separately.

Usage: python tools/freshness.py [--json PATH]

With ``--json PATH`` also writes the histogram, oldest-cohort members,
pending/failing lists, and the CURRENT declared gate window to PATH —
the committed round-close artifact (VERDICT r13 #5) that makes window
composition auditable without running tools.
"""

from __future__ import annotations

import collections
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hippo_claim_crossover_spark.plans import (  # noqa: E402
    ALL_SPECS,
    GATE_ORDER,
    GATE_WINDOW,
)


def main() -> int:
    json_out = None
    if "--json" in sys.argv:
        i = sys.argv.index("--json")
        if i + 1 >= len(sys.argv):
            print("usage: freshness.py [--json PATH]", file=sys.stderr)
            return 2
        json_out = sys.argv[i + 1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, tuple[int, dict]] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        for name, rec in json.load(open(path)).items():
            latest[name] = (rnd, rec)

    hist = collections.Counter()
    failing, pending = [], []
    for name in ALL_SPECS:
        if name not in latest:
            pending.append(name)
            continue
        rnd, rec = latest[name]
        hist[rnd] += 1
        ok = rec.get("rows_match") and rec.get("schema_match") \
            and rec.get("hash_match")
        if not ok:
            failing.append((name, rnd))

    print("latest-driver-evidence histogram (round: queries):")
    for rnd in sorted(hist):
        print(f"  r{rnd:02d}: {hist[rnd]}")
    oldest = min(hist) if hist else None
    if oldest is not None:
        members = sorted(n for n, (r, _) in latest.items()
                         if r == oldest and n in ALL_SPECS)
        print(f"oldest cohort r{oldest:02d}: {' '.join(members)}")
    if pending:
        print(f"no driver record yet ({len(pending)}): {' '.join(sorted(pending))}")
    if json_out:
        payload = {
            "histogram": {f"r{r:02d}": hist[r] for r in sorted(hist)},
            "oldest_cohort": {f"r{oldest:02d}": members}
            if oldest is not None else {},
            "pending": sorted(pending),
            "failing": [{"query": n, "round": r} for n, r in failing],
            "gate_window": GATE_ORDER[:GATE_WINDOW],
        }
        with open(json_out, "w") as f:
            json.dump(payload, f, indent=1)
            f.write("\n")
        print(f"wrote {json_out}")
    if failing:
        print("LATEST RECORD IS A FAILURE:",
              " ".join(f"{n}(r{r})" for n, r in failing))
        return 1
    print("every recorded query's latest driver record is a pass")
    return 0


if __name__ == "__main__":
    sys.exit(main())
