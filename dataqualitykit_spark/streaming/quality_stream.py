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
    trigger, no watermark needed.

    cfg.blocklist and cfg.url_keyword_weights compose for free
    (round 5): both URL gates are plan-literal projections; flagged rows
    take drop_reason='blocked_domain' / 'url_keywords' FIRST (blocklist
    wins, matching the batch decide order) and their text is masked
    BEFORE the Arrow scorer (the batch pipeline's exact semantics —
    URL-gated docs are never scored, their metric columns stay NULL)."""
    url_reason = None
    if cfg.blocklist or cfg.url_keyword_weights:
        flag = F.lit(False)
        url_reason = F.lit(None).cast("string")
        if cfg.url_keyword_weights:
            from ..operators.url_filter import url_keyword_score_col

            kw = url_keyword_score_col(
                F.col("url"), cfg.url_keyword_weights
            ) >= F.lit(cfg.url_keyword_threshold)
            flag = flag | kw
            url_reason = F.when(kw, F.lit("url_keywords"))
        if cfg.blocklist:
            from ..operators.url_filter import blocked_domain_col

            bl = blocked_domain_col(F.col("url"), cfg.blocklist)
            flag = flag | bl
            url_reason = F.when(bl, F.lit("blocked_domain")).otherwise(
                url_reason
            )
        stream = stream.withColumn("_url_gated", flag).withColumn(
            "text", F.when(~F.col("_url_gated"), F.col("text"))
        )
    out = decide_quality(with_metrics(stream, cfg), cfg)
    if url_reason is not None:
        from ..pipeline import _METRIC_COLS

        out = out.withColumn(
            "drop_reason", F.coalesce(url_reason, F.col("drop_reason"))
        ).withColumn("keep", F.col("drop_reason").isNull())
        # metric columns are NULL for URL-gated rows (same post-hoc
        # masking the batch pipeline applies to non-survivors — the Arrow
        # scorer emits typed defaults for masked text, not NULLs)
        for col, typ in _METRIC_COLS.items():
            out = out.withColumn(
                col, F.when(~F.col("_url_gated"), F.col(col)).cast(typ)
            )
        out = out.drop("_url_gated")
    return out


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
