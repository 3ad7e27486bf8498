"""Structured Streaming tests: watermarked tumbling windows and session
windows over a file-source stream, drained with availableNow into the
memory sink, checked against the equivalent batch aggregation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hippo_claim_crossover_spark.io import load_table
from hippo_claim_crossover_spark.streaming import (
    read_event_stream,
    run_to_memory,
    sessionized,
    tumbling_agg,
)


@pytest.fixture(scope="module")
def stream_src(spark, sf_dir, tmp_path_factory):
    # Stage the (µs-converted) events as a streaming source directory.
    path = str(tmp_path_factory.mktemp("events_stream"))
    # repartition (not coalesce: that's only an upper bound and the local
    # fixture scan is a single partition) → exactly 2 part files, so
    # maxFilesPerTrigger=1 yields 2 micro-batches.
    load_table(spark, sf_dir, "events").repartition(2).write.mode(
        "overwrite").parquet(path)
    return path


def test_tumbling_stream_matches_batch(spark, sf_dir, stream_src):
    stream = read_event_stream(spark, stream_src)
    assert stream.isStreaming
    run_to_memory(tumbling_agg(stream), "tumble_out", "complete")
    got = {(r["window_start"], r["event_type"]): r["n_events"]
           for r in spark.table("tumble_out").collect()}

    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("window.start").alias("window_start"),
                "event_type", "n_events")
    )
    want = {(r["window_start"], r["event_type"]): r["n_events"]
            for r in batch.collect()}
    assert got == want


def test_session_stream_runs(spark, stream_src):
    stream = read_event_stream(spark, stream_src)
    run_to_memory(sessionized(stream), "session_out", "complete")
    rows = spark.table("session_out").collect()
    assert rows
    # session invariant: end = last event + gap >= start + gap
    for r in rows:
        assert r["session_end"] > r["session_start"]
        assert r["n_events"] >= 1


def test_watermark_is_applied(spark, stream_src):
    stream = read_event_stream(spark, stream_src)
    plan = tumbling_agg(stream, watermark="42 minutes")
    assert "42 minutes" in plan._jdf.queryExecution().analyzed().toString()


def test_stateful_cumulative_profile_across_microbatches(spark, sf_dir,
                                                         stream_src):
    """applyInPandasWithState: state must carry across micro-batches —
    maxFilesPerTrigger=1 over the 2-file source forces 2 batches; the final
    update per user must equal the whole-table batch aggregate."""
    from hippo_claim_crossover_spark.streaming import cumulative_user_profile

    stream = read_event_stream(spark, stream_src, max_files_per_trigger=1)
    run_to_memory(cumulative_user_profile(stream), "profile_out", "update")
    out = spark.table("profile_out").collect()
    # update mode emits one row per user per touched batch; the cumulative
    # count is monotone, so the max per user is the final state.
    got = {}
    for r in out:
        prev = got.get(r["user_id"], (0, 0.0))
        got[r["user_id"]] = max(prev, (r["n_events"], r["sum_value"]))

    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum(F.coalesce(F.col("value"), F.lit(0.0))), 2)
             .alias("s"))
    )
    want = {r["user_id"]: (r["n"], r["s"]) for r in batch.collect()}
    assert got == want
    # and at least one user must have been emitted twice (two batches)
    from collections import Counter
    emits = Counter(r["user_id"] for r in out)
    assert max(emits.values()) == 2
