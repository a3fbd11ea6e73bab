"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no streaming subsystem (modin is batch-only); this is the
net-new scale path for per-key running state that windowed aggregation can't
express — e.g. cumulative counters with arbitrary transition logic, or
"alert when a per-user running total crosses a threshold".

State is per-key and bounded: GroupStateTimeout.ProcessingTimeTimeout expires
idle keys, so state size is O(active keys), not O(stream)."""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_running_totals(
    spark: SparkSession,
    schema,
    path: str,
    key_col: str,
    value_col: str,
    query_name: str = "stateful_out",
    idle_timeout_ms: int | None = None,
):
    """Per-key running (count, sum) maintained across micro-batches.

    Each micro-batch emits one row per active key with the UPDATED running
    totals — the canonical applyInPandasWithState shape: state is a tiny
    tuple per key; each batch's rows for a key arrive as pandas chunks."""
    out_schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("running_count", T.LongType()),
            T.StructField("running_sum", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("cnt", T.LongType()), T.StructField("s", T.DoubleType())]
    )

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return iter([])
        (cnt, s) = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            cnt += int(pdf[value_col].count())
            s += float(pdf[value_col].fillna(0.0).sum())
        state.update((cnt, s))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        return iter([pd.DataFrame({"key": [str(key[0])], "running_count": [cnt], "running_sum": [s]})])

    src = spark.readStream.schema(schema).parquet(path)
    out = (
        src.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            # ProcessingTimeTimeout keeps scheduling timeout-check batches
            # (processAllAvailable never drains); enable it only when idle-key
            # expiry is requested — long-running production streams want it,
            # bounded replays/tests do not
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if idle_timeout_ms is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
    return out.writeStream.outputMode("update").format("memory").queryName(query_name).start()
