"""Content-addressed hashing primitive shared across layers.

``hex2long`` is bit-exactness-critical: shard membership, sampling, and
bucket keys all derive from it, and every DuckDB oracle mirrors it with
``plans.base.sql_hex2long`` — so it is defined ONCE here (operators sit
below plans; ``plans.base.hex2long`` re-exports it for plan code)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hex2long(hexstr: Column) -> Column:
    """First 15 hex chars (typically of an md5) → non-negative BIGINT
    (< 2^60) — the repo's content-addressed-hash primitive, shared by
    sampling, bucketing, sharding, and feature hashing. DuckDB mirror:
    ``plans.base.sql_hex2long``."""
    return F.conv(F.substring(hexstr, 1, 15), 16, 10).cast("long")
