"""I/O discipline tests: partitioned writes give partition-pruned reads,
and write-side coalesce bounds file counts."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from hippo_claim_crossover_spark.io import load_table, write_parquet


def test_partitioned_write_prunes_on_read(spark, sf_dir, tmp_path):
    """A filter on the partition column must become a PartitionFilter
    (directories skipped at planning time — the 100 TB date-partition
    pattern), not a row-level scan filter."""
    path = str(tmp_path / "orders_by_status")
    o = load_table(spark, sf_dir, "orders")
    write_parquet(o, path, partition_by=["o_orderstatus"])

    back = spark.read.parquet(path).where(F.col("o_orderstatus") == "F")
    plan = back._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters:")[1].split("]")[0]
    assert "o_orderstatus" in pf
    # and values round-trip
    want = o.where(F.col("o_orderstatus") == "F").count()
    assert back.count() == want


def test_write_side_coalesce_bounds_file_count(spark, sf_dir, tmp_path):
    path = str(tmp_path / "li_compact")
    li = load_table(spark, sf_dir, "lineitem").repartition(16)
    write_parquet(li, path, target_partitions=2)
    files = glob.glob(f"{path}/part-*.parquet")
    assert len(files) <= 2
    assert spark.read.parquet(path).count() == li.count()
