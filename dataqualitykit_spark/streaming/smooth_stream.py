"""Stateful streaming EWMA: carry the smoothed value per key across
micro-batches via applyInPandasWithState.

The batch operator (operators/anomaly.ewma_smooth) folds a bounded
partition with window algebra; a stream cannot (unbounded input), so the
state store carries ONE (y, n) record per key — constant state per key,
the right shape for per-entity telemetry smoothing over a firehose
(contrast dedup_stream, whose state grows with unique keys).

Semantics: rows fold in (micro-batch, order_col) order — within a batch
rows sort by order_col (deterministic tie-break by arrival position is
avoided: ties sort stably), across batches by arrival. A late row
belonging before an already-folded one cannot retro-correct the fold
(streaming contract; route late data through the batch operator in the
compaction pass instead). NULL values carry the previous smoothed value,
matching the batch operator and py_ewma.

No reference analog (the reference has no streaming at all, SURVEY §2.8).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def ewma_stream(
    stream: DataFrame,
    col: str,
    key_cols: list[str],
    order_col: str,
    alpha: float = 0.5,
    out_col: str | None = None,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming per-key EWMA (y_0 = x_0, y_t = alpha*x_t +
    (1-alpha)*y_{t-1} — the same recurrence as
    anomaly.ewma_smooth/py_ewma). Emits every input row plus the
    smoothed column. With `state_ttl_ms`, an idle key's state expires on
    processing-time timeout and its next row restarts the fold."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    out_col = out_col or f"ewma_{col}"
    in_schema = stream.schema
    cols = [f.name for f in in_schema.fields]
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in in_schema.fields
    )
    out_schema += f", `{out_col}` double"
    a = float(alpha)

    def fold(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        if state.hasTimedOut:
            state.remove()
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(order_col, kind="mergesort")
        y = state.get[0] if state.exists else None
        out = []
        for x in batch[col]:
            if x is not None and not pd.isna(x):
                y = float(x) if y is None else a * float(x) + (1.0 - a) * y
            out.append(y)
        if y is not None:
            state.update((float(y),))
        batch = batch.copy()
        batch[out_col] = pd.Series(out, index=batch.index, dtype="float64")
        yield batch[cols + [out_col]]

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return stream.groupBy(*[F.col(k) for k in key_cols]).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType="y double",
        outputMode="append",
        timeoutConf=timeout,
    )
