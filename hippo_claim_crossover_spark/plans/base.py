"""Shared plumbing for declared query plans.

Every query in ``plans/`` is registered as a :class:`QuerySpec` — a Spark
builder ``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) the
equivalent ANSI SQL the DuckDB oracle runs on the same parquet tables. The
driver hash-compares the two (row-count + schema + order-insensitive
value-hash), so specs here obey three portability rules:

1. **Alias every computed column identically** in both the Spark plan and
   the oracle SQL (the driver sorts columns by name before hashing).
2. **Deterministic floats.** Double summation is order-sensitive in the
   last ulp; any commutative money/value SUM goes through
   :func:`money_sum` (round each term to 4dp → exact DECIMAL(18,4) sum →
   double → round 2dp). All fixture money columns are exact 2dp values
   (verified against sf0.001), so the per-term round is lossless and both
   engines produce bit-identical doubles.
3. **ANSI-safe.** PySpark 4 defaults ``spark.sql.ansi.enabled=true`` and
   the driver supplies its own session: use ``try_cast``-style guards, no
   out-of-bounds ``element_at``, no division by an unguarded zero.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hippo_claim_crossover_spark.io import load_table

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    """One declared query: Spark builder + optional DuckDB oracle SQL.

    ``oracle is None`` ⇒ non-SQL-expressible / approximate op; the driver
    records the weaker rows-only check (BASELINE.md notes).
    """

    fn: SparkQuery
    oracle: str | None = None
    doc: str = ""


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table (explicit-schema parquet scan)."""
    return load_table(spark, sf_dir, name)


def money_sum(term: Column, out_scale: int = 2) -> Column:
    """Order-insensitive, engine-portable SUM of a money-valued term.

    ``round(term, 4)`` is lossless on the fixtures (all money columns are
    2dp; products of two 2dp values are exact 4dp values), then the
    DECIMAL(18,4) sum is exact integer arithmetic — no float ordering
    sensitivity — and the final double is identical in Spark and DuckDB.

    Oracle-side equivalent: :func:`money_sum_sql`.
    """
    dec = F.sum(F.round(term, 4).cast("decimal(18,4)"))
    return F.round(dec.cast("double"), out_scale)


def money_sum_sql(term_sql: str, out_scale: int = 2) -> str:
    """DuckDB SQL mirroring :func:`money_sum` exactly."""
    return (f"round(CAST(sum(CAST(round({term_sql}, 4) AS DECIMAL(18,4))) "
            f"AS DOUBLE), {out_scale})")


def money_avg(term: Column, count: Column | None = None,
              out_scale: int = 4) -> Column:
    """Portable AVG: exact decimal sum / count, rounded — one double
    division, so no accumulation-order sensitivity. Default scale 4, not 2:
    a 2dp sum divided by a small even count lands exactly on .xx5, where
    Spark's and DuckDB's double rounding disagree (see q_win_frame note)."""
    dec = F.sum(F.round(term, 4).cast("decimal(18,4)"))
    n = count if count is not None else F.count(F.lit(1))
    return F.round(dec.cast("double") / n, out_scale)


def money_avg_sql(term_sql: str, out_scale: int = 4) -> str:
    return (f"round(CAST(sum(CAST(round({term_sql}, 4) AS DECIMAL(18,4))) "
            f"AS DOUBLE) / count(*), {out_scale})")
