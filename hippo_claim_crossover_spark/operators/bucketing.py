"""Bucketed storage for co-located joins — the 100 TB shuffle eliminator.

A fact-fact equi-join (lineitem⋈orders at our fixture level; claims⋈lines
in reference terms) shuffles both sides on the key every query. Writing
both tables bucketed by that key makes the join a zero-shuffle local join
forever after: each bucket pairs 1:1 with the matching bucket on the other
side. At 100 TB this converts the dominant recurring cost of the workload
into a one-time write-side cost.

Spark only recognizes bucketing through the session catalog
(``saveAsTable``), not plain ``.parquet(path)`` — reads must go through
``spark.table``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, buckets: int,
                   sort_by: str | None = None,
                   path: str | None = None) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by ``key``.

    ``sort_by`` additionally sorts within buckets, upgrading downstream
    sort-merge joins to skip their sort as well. Bucket counts should match
    between tables that will be joined (or be integer multiples, which AQE
    can still align).
    """
    writer = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort_by:
        writer = writer.sortBy(sort_by)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key — planned
    with NO Exchange on either side (asserted in tests/test_bucketing.py)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
