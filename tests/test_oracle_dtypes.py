"""Cross-engine dtype gate: every declared oracle must return the same
canonical pandas dtypes as its Spark query.

The driver's correctness gate hashes TYPED values, so a DuckDB
``SUM(BIGINT)`` left uncast (HUGEINT -> float64 in pandas) mismatches a
Spark long even when every value is numerically equal — the drift class
that shipped 8 driver-red queries in rounds 6/7.  This module is the
local guard the r7 verdict ordered: re-introducing an uncast count-like
aggregate now fails ``pytest`` and ``tools/check_oracle.py`` alike.

Two layers:
- unit tests pin ``canon_dtype`` / ``compare`` semantics (int widths
  collapse, int-vs-float does NOT) — millisecond-fast;
- a full sweep runs every ``oracle_sql()`` entry at sf0.001 and asserts
  dtype equality column by column (values are covered by the driver and
  by tools/check_oracle.py; this test is the dtype channel only).
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from hippo_claim_crossover_spark.io import TABLES  # noqa: E402
from tools.check_oracle import canon_dtype, compare  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"

_ORACLES = entrymod.oracle_sql()
_QUERIES = entrymod.queries()
_ORACLE_NAMES = sorted(n for n in _QUERIES if n in _ORACLES)


def test_canon_dtype_collapses_int_widths():
    assert canon_dtype(np.dtype("int32")) == canon_dtype(np.dtype("int64"))
    assert canon_dtype(np.dtype("uint32")) == canon_dtype(np.dtype("int64"))
    assert canon_dtype(np.dtype("float32")) == canon_dtype(np.dtype("float64"))


def test_canon_dtype_keeps_int_float_distinct():
    assert canon_dtype(np.dtype("int64")) != canon_dtype(np.dtype("float64"))
    assert canon_dtype(np.dtype("int32")) != canon_dtype(np.dtype("float32"))


def test_canon_dtype_datetime_units_collapse():
    assert (canon_dtype(np.dtype("datetime64[ns]"))
            == canon_dtype(np.dtype("datetime64[us]")))


def test_compare_flags_uncast_hugeint_sum():
    """The exact r6/r7 failure: DuckDB SUM(BIGINT) -> float64 vs Spark
    int64, values numerically equal — must FAIL the gate."""
    spark_side = pd.DataFrame({"k": ["a", "b"],
                               "n": pd.array([1, 2], dtype="int64")})
    duck_side = pd.DataFrame({"k": ["a", "b"],
                              "n": pd.array([1.0, 2.0], dtype="float64")})
    problems = compare("synthetic", spark_side, duck_side)
    assert problems and any("dtype differs" in p for p in problems)


def test_compare_accepts_width_split():
    spark_side = pd.DataFrame({"r": pd.array([1, 2], dtype="int32")})
    duck_side = pd.DataFrame({"r": pd.array([1, 2], dtype="int64")})
    assert compare("synthetic", spark_side, duck_side) == []


@pytest.fixture(scope="module")
def duck_con():
    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM "
                    f"read_parquet('{SF_SMALL}/{tbl}.parquet')")
    yield con
    con.close()


@pytest.mark.parametrize("name", _ORACLE_NAMES)
def test_oracle_dtypes_match(name, spark, duck_con):
    sdf = _QUERIES[name](spark, SF_SMALL).toPandas()
    ddf = duck_con.execute(_ORACLES[name]).fetchdf()
    assert sorted(sdf.columns) == sorted(ddf.columns)
    bad = {c: (canon_dtype(sdf[c].dtype), canon_dtype(ddf[c].dtype))
           for c in sdf.columns
           if canon_dtype(sdf[c].dtype) != canon_dtype(ddf[c].dtype)}
    assert not bad, f"dtype drift in {name}: {bad}"
