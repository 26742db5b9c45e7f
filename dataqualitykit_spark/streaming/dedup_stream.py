"""Stateful streaming exact dedup: keep the FIRST document seen per
content hash across micro-batches via applyInPandasWithState.

The batch pipeline dedups with a window over the whole corpus; a stream
cannot (unbounded input), so the state store carries one tiny record per
seen hash — the canonical custom-stateful-operator shape the task brief
names (`applyInPandasWithState`). At crawl scale the state is
hash -> () (16 bytes + overhead per unique doc); for 10^12 docs that
outgrows a Spark state store and belongs in the batch compaction pass
(lineage.run_resumable) — this operator is for bounded dedup horizons
(e.g. a daily firehose deduped within the day, state TTL'd by the
processing-time timeout).

No reference analog (reference has no streaming at all, SURVEY.md §2.8).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def dedup_stream(
    stream: DataFrame,
    key_col: str = "content_md5",
    order_col: str = "url",
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming keep-first-per-key.

    Emits, per micro-batch, at most one row per NEW key (the minimum
    `order_col` row inside the batch — a deterministic within-batch
    tie-break); keys already recorded in state emit nothing. Output schema
    = input schema. With `state_ttl_ms`, state expires on processing-time
    timeout (bounded dedup horizon).
    """
    schema = stream.schema
    cols = [f.name for f in schema.fields]

    def keep_first(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        if state.hasTimedOut:
            state.remove()
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        if state.exists:
            return
        state.update((True,))
        first = batch.sort_values(order_col, kind="mergesort").head(1)
        yield first[cols]

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        stream.groupBy(F.col(key_col))
        .applyInPandasWithState(
            keep_first,
            outputStructType=schema,
            stateStructType="seen boolean",
            outputMode="append",
            timeoutConf=timeout,
        )
    )
