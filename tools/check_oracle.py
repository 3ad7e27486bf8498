"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and (where declared) the matching
``oracle_sql()`` on DuckDB against the same parquet fixtures, then compares
row-count, column names, and order-insensitive values exactly.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
                                    [--times-json PATH]

``--times-json PATH`` additionally dumps per-query Spark wall times (the
toPandas leg, seconds) as one JSON object — the committed timing tier for
the ~80 non-headline queries (r12 VERDICT #4): bench.py ledgers the
headline set, and the full-surface sweep's times make a perf regression
in any remaining query visible round-over-round.
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hippo_claim_crossover_spark.io import TABLES  # noqa: E402
from hippo_claim_crossover_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402


def _norm(v):
    try:
        if v is None or pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass  # arrays etc.
    if isinstance(v, float):
        return float(v)
    if hasattr(v, "to_pydatetime"):
        return v.to_pydatetime()
    if hasattr(v, "item"):  # numpy scalar
        return v.item()
    return v


def _canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_norm(v) for v in row)
            for row in df[cols].itertuples(index=False, name=None)]
    return sorted(rows, key=repr)


def canon_dtype(dtype) -> str:
    """Canonical dtype label for the cross-engine strict-type check.

    The driver's hash compares TYPED values, so ``1`` (int64) and ``1.0``
    (float64) mismatch even when numerically equal — an uncast DuckDB
    ``SUM(BIGINT)`` (HUGEINT → float64 in pandas) against a Spark long is
    exactly the drift class that shipped 8 driver-red queries in r6/r7.
    Canonicalization is deliberately minimal:

    - integer widths collapse (int8..int64, unsigned included) — the
      driver hashes the Python value (``.item()``), so ``int32(5)`` and
      ``int64(5)`` hash identically; 18 driver-GREEN queries carry an
      int32/int64 width split (Spark rank() is int32, DuckDB's is int64).
    - float widths collapse (float32/float64) for the same reason.
    - datetime64 units (ns/us/ms) collapse — Spark emits [ns] / [us]
      depending on Arrow config, DuckDB [us]; same instant either way.
    - pandas extension strings (``string[pyarrow]``) collapse to object.

    int-kind vs float-kind does NOT collapse: ``1`` and ``1.0`` hash
    differently, and that is the drift class this gate exists to catch.
    """
    s = str(dtype)
    if s.startswith("datetime64"):
        return "datetime64"
    if s in ("string", "large_string[pyarrow]") or s.startswith("string["):
        return "object"
    kind = getattr(dtype, "kind", None)
    if kind in ("i", "u"):
        return "int"
    if kind == "f":
        return "float"
    return s


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        problems.append(f"columns differ: spark={sorted(spark_df.columns)} "
                        f"duck={sorted(duck_df.columns)}")
        return problems
    for c in sorted(spark_df.columns):
        sa, da = canon_dtype(spark_df[c].dtype), canon_dtype(duck_df[c].dtype)
        if sa != da:
            problems.append(f"col {c}: dtype differs: spark={sa} duck={da}")
    if problems:
        return problems
    if len(spark_df) != len(duck_df):
        problems.append(f"row count differs: spark={len(spark_df)} "
                        f"duck={len(duck_df)}")
        return problems
    a, b = _canon(spark_df), _canon(duck_df)
    cols = sorted(spark_df.columns)
    bad_by_col: dict[str, list] = {}
    for ra, rb in zip(a, b):
        for c, x, y in zip(cols, ra, rb):
            if x != y and not (x is None and y is None):
                bad_by_col.setdefault(c, []).append((x, y))
    for c, examples in bad_by_col.items():
        problems.append(f"col {c}: {len(examples)} mismatched values, "
                        f"e.g. {examples[:3]}")
    return problems


def main() -> int:
    import json

    argv = sys.argv[1:]
    times_json = None
    if "--times-json" in argv:
        i = argv.index("--times-json")
        if i + 1 >= len(argv):
            print("usage: check_oracle.py [SF_DIR] [QUERY ...] "
                  "[--times-json PATH]", file=sys.stderr)
            return 2
        times_json = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{tbl}.parquet')")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    failures = []
    spark_secs: dict[str, float] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            n_fail += 1
            failures.append(name)
            print(f"FAIL {name}: spark error: {exc}")
            continue
        t1 = time.time()
        spark_secs[name] = round(t1 - t0, 3)
        if name not in oracles:
            n_rowsonly += 1
            print(f"rows-only {name}: {len(sdf)} rows [{t1-t0:.1f}s]")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            n_fail += 1
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {exc}")
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            n_fail += 1
            failures.append(name)
            print(f"FAIL {name}: rows={len(sdf)} [{t1-t0:.1f}s]")
            for p in problems:
                print(f"     {p}")
        else:
            n_pass += 1
            print(f"PASS {name}: {len(sdf)} rows [{t1-t0:.1f}s]")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    if failures:
        print("failures:", " ".join(failures))
    if times_json:
        with open(times_json, "w") as f:
            json.dump({"sf_dir": sf_dir, "unit": "sec",
                       "note": "single-run Spark toPandas wall time per "
                               "query from the correctness sweep (run-1 "
                               "cost incl. codegen warmup, not best-of-N)",
                       "times": dict(sorted(spark_secs.items()))},
                      f, indent=1, sort_keys=True)
        print(f"wrote {len(spark_secs)} timings to {times_json}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
