"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``hippo_claim_crossover_spark/`` — this module is
the thin adapter the driver imports.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hippo_claim_crossover_spark.plans import ALL_SPECS  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the crossover
    denormalization (SURVEY.md §7.1) — scan, header/lines join, broadcast
    dims, CASE map, per-claim SUM/EXISTS in one plan."""
    return ALL_SPECS["q_crossover"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in ALL_SPECS.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every declared query — complete since
    r8: approximate/seeded ops emit deterministic verdict columns (exact
    side + band booleans) their oracles reproduce, so none is omitted."""
    return {name: spec.oracle for name, spec in ALL_SPECS.items()
            if spec.oracle is not None}
