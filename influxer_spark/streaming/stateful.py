"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.7: "applyInPandasWithState for custom stateful operators").

``running_totals_stream`` keeps per-key running (count, sum) across
micro-batches — the streaming analogue of the reference's ProcessStatus
counters (Influxer/ProcessStatus.cs:3-9), generalized to per-series state
that SURVIVES restarts (state lives in the checkpoint, so a resumed
``availableNow`` run continues the totals instead of restarting them).

Shape notes: state is partitioned by key (same shuffle as a streaming agg);
each micro-batch delivers that key's new rows as pandas frames; the handler
is Arrow-batched per group.  Use this pattern for operators the built-in
windowed aggregates can't express (decaying counters, per-series anomaly
state, open-session accumulators).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals_stream(
    stream_df: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """Per-key cumulative (cnt, sum_v), emitted each micro-batch the key
    appears in."""

    def totals(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        cnt, sv = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            cnt += len(pdf)
            sv += float(pdf[value_col].sum())
        state.update((cnt, sv))
        yield pd.DataFrame({"key": [key[0]], "cnt": [cnt], "sum_v": [sv]})

    return (
        stream_df.groupBy(key_col)
        .applyInPandasWithState(
            totals,
            outputStructType="key string, cnt long, sum_v double",
            stateStructType="cnt long, sum_v double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
