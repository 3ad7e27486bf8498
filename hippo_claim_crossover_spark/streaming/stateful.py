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
