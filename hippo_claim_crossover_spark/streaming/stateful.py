"""Custom stateful streaming operator via ``applyInPandasWithState``.

Spark's built-in windowed aggregations cover tumbling/sliding/session
shapes (``ops.py``); this is the escape hatch for operator semantics they
can't express — here, a per-user *cumulative* profile that survives across
micro-batches (total events / total value since stream start, emitted on
every update).

At scale: state is one small fixed-width row per user key in the state
store, partitioned by the grouping key — memory is O(distinct users),
not O(events). A production variant adds a timeout
(``GroupStateTimeout.ProcessingTimeTimeout``) to expire idle keys.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double"
STATE_SCHEMA = "n long, s double"


def _update_user_profile(key: tuple[Any, ...],
                         pdfs: Iterator[pd.DataFrame],
                         state: GroupState) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's rows for one user into the running state and
    emit the updated cumulative row. Arrow-batched: each ``pdf`` is a chunk
    of the user's rows in this batch — never row-at-a-time Python."""
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].fillna(0.0).sum())
    state.update((n, s))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                        "sum_value": [round(s, 2)]})


def cumulative_user_profile(events: DataFrame) -> DataFrame:
    """Running per-user totals across the life of the stream (update mode).

    Works on both a streaming DataFrame (stateful, incremental) and — for
    the oracle/batch path — degenerates to a one-batch fold.
    """
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


EXACT_OUTPUT_SCHEMA = "user_id long, n_events long, sum_micros long"
EXACT_STATE_SCHEMA = "n long, s long"


def _update_profile_exact(key: tuple[Any, ...],
                          pdfs: Iterator[pd.DataFrame],
                          state: GroupState) -> Iterator[pd.DataFrame]:
    """Exact-integer sibling of :func:`_update_user_profile`: the value
    sum is carried as BIGINT micros (``floor(v·1e6 + 0.5)`` per row —
    plans/base.money_micros' formula), so the cumulative state is an
    exact integer at every batch and the emitted rows hash-match a SQL
    oracle bit-for-bit (float accumulation order never enters)."""
    import numpy as np

    n, s = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        v = pdf["value"].fillna(0.0).to_numpy(dtype="float64")
        s += int(np.floor(v * 1e6 + 0.5).astype("int64").sum())
    state.update((n, s))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                        "sum_micros": [s]})


def cumulative_profile_exact(events: DataFrame) -> DataFrame:
    """Running per-user (count, exact micros total) across the life of
    the stream (update mode) — the hash-checkable face of
    :func:`cumulative_user_profile`. State is one (long, long) row per
    user in the state store, sharded by the grouping key."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_profile_exact,
            outputStructType=EXACT_OUTPUT_SCHEMA,
            stateStructType=EXACT_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


TWS_OUTPUT_SCHEMA = ("user_id long, n_events long, sum_value double, "
                     "top1 double, top2 double, top3 double")


def profile_with_topk(events: DataFrame) -> DataFrame:
    """The same cumulative profile through ``transformWithStateInPandas``
    — Spark 4's successor to applyInPandasWithState — plus what the old
    API could not express cleanly: a SECOND, independently-typed state
    variable. ``totals`` is a ValueState row; ``top`` is a ListState
    holding the user's 3 largest values so far (bounded: the state store
    keeps ≤3 rows per key no matter how long the stream runs).

    At scale the state store shards by the grouping key exactly like the
    windowed aggregations; per-key state stays fixed-width, and the
    processor's typed handles let a future variant add timers/TTL
    (handle.registerTimer) without restructuring state.

    Environment gates (documented, not hidden): TWS requires the RocksDB
    state store provider (set
    ``spark.sql.streaming.stateStore.providerClass``), and its Python
    state protocol is protobuf-encoded — this container ships no
    ``google.protobuf``, so the cross-batch test in
    tests/test_streaming.py skips here and runs wherever protobuf
    exists. The applyInPandasWithState profile above stays the
    container-proven stateful path."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _ProfileTopK(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", STATE_SCHEMA)
            self._top = handle.getListState("top", "v double")

        def handleInputRows(self, key, rows, timerValues):
            n, s = self._totals.get() if self._totals.exists() else (0, 0.0)
            top = ([float(r[0]) for r in self._top.get()]
                   if self._top.exists() else [])
            for pdf in rows:
                n += len(pdf)
                vals = pdf["value"].dropna()
                s += float(vals.sum())
                top.extend(float(v) for v in vals)
            top = sorted(top, reverse=True)[:3]
            self._totals.update((n, s))
            self._top.put([(v,) for v in top])
            pad = top + [None] * (3 - len(top))
            yield pd.DataFrame({
                "user_id": [key[0]], "n_events": [n],
                "sum_value": [round(s, 2)],
                "top1": [pad[0]], "top2": [pad[1]], "top3": [pad[2]],
            })

        def close(self) -> None:
            pass

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_ProfileTopK(),
            outputStructType=TWS_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
