"""Structured Streaming face of the quality filter.

The reference has no streaming at all (SURVEY.md §2.8) and the batch north
rule doesn't require it — but a crawl firehose is a natural streaming
source, so the per-document stages (scrub -> metrics -> langid/ppl ->
quality decide) are exposed as a stream transformation. They are pure
projections + Arrow UDFs, hence trivially streamable with no state.

Deliberately NOT in the stream: url/content dedup (global state; at
crawl scale that state belongs in the batch compaction pass — see
lineage.run_resumable — or an external dedup service, not an unbounded
Spark state store).

streaming_quality_metrics adds the stateful part that IS cheap: windowed
per-reason counters with a watermark for late events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..pipeline import decide_quality, with_metrics


def streaming_quality_filter(
    stream: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """(url, warc_ts, text, ...) stream -> labeled stream (keep,
    drop_reason, scrubbed_text, metric columns). Stateless: safe under any
    trigger, no watermark needed."""
    return decide_quality(with_metrics(stream, cfg), cfg)


def streaming_quality_metrics(
    labeled: DataFrame,
    ts_col: str = "warc_ts",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-reason doc counters over event-time windows with late-data
    watermark — the streaming analog of pipeline.quality_metrics."""
    return (
        labeled.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window).alias("time_window"),
            F.coalesce(F.col("drop_reason"), F.lit("kept")).alias("reason"),
        )
        .agg(F.count(F.lit(1)).alias("docs"))
    )
