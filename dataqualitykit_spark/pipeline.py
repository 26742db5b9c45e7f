"""The web-text quality pipeline: textprep -> scrub -> metrics -> langid/ppl
-> dedup -> decide.

Execution shape (SURVEY.md §7, BASELINE.json north_rule):

- All heuristic rules are native column algebra over the scrubbed text —
  one projected stage, whole-stage codegen, zero Python until the two
  Arrow-batched UDF columns (scrub; langid+ppl fused struct).
- Optional explicit salted repartition before the UDF stage defuses
  domain/url skew (hot domains concentrate rows in input splits).
- Dedup is two window ops: url keep-most-recent (partitioned by url —
  naturally fine-grained keys, no skew) and exact content-hash keep-one
  (partitioned by md5 of scrubbed text).
- decide folds the per-rule flags into (keep, drop_reason) with a pinned
  priority order shared with the oracle (config.DROP_REASON_ORDER).

Re-imagines the reference's check/fix classes as pipeline stages — mapping
table in SURVEY.md §7.0 (NullValues :16-297 -> missing rule; RangeValidity
:642-1051 -> bounds rules; DuplicateValues :1572-2173 -> dedup windows;
EncodingConformity :3241-3573 -> scrub; FormatConsistency :2176-2529 -> PII
bank; CategoricalValidity :1068-1180 -> langid gate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .config import DEFAULT_CONFIG, PipelineConfig
from .functions import text as T
from .udfs import lang_ppl_udf, scrub_udf

# (reason, builder) in priority order; each builder returns a boolean Column
# over a DataFrame that already has metric columns.


def _rule_flags(cfg: PipelineConfig) -> list[tuple[str, Column]]:
    c = F.col
    return [
        ("missing_text", c("_missing")),
        ("too_short", ~c("_missing") & (c("n_chars") < cfg.min_chars)),
        ("too_long", ~c("_missing") & (c("n_chars") > cfg.max_chars)),
        ("too_few_words", ~c("_missing") & (c("n_words") < cfg.min_words)),
        ("too_many_words", ~c("_missing") & (c("n_words") > cfg.max_words)),
        (
            "mean_word_length",
            ~c("_missing")
            & (
                (c("mean_word_len") < cfg.min_mean_word_len)
                | (c("mean_word_len") > cfg.max_mean_word_len)
            ),
        ),
        ("symbol_ratio", ~c("_missing") & (c("symbol_ratio") > cfg.max_symbol_ratio)),
        (
            "repeated_lines",
            ~c("_missing")
            & (c("n_lines") >= cfg.min_lines_for_ratio)
            & (c("distinct_line_ratio") < cfg.min_distinct_line_ratio),
        ),
        (
            "boilerplate",
            ~c("_missing") & (c("boilerplate_hits") >= cfg.max_boilerplate_hits),
        ),
        (
            "stopword_density",
            ~c("_missing")
            & (c("n_words") > 0)
            & (
                (c("stopword_hits") < cfg.min_stopword_hits)
                | (c("stopword_density") < cfg.min_stopword_density)
            ),
        ),
        (
            "lang",
            ~c("_missing")
            & (
                ~c("lang_pred").isin(*cfg.allowed_langs)
                | (c("lang_conf") < cfg.min_lang_conf)
            ),
        ),
        ("perplexity", ~c("_missing") & (c("ppl") > cfg.max_perplexity)),
    ]


def with_metrics(df: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """scrub + metric + score columns; pure projection (no shuffle)."""
    if cfg.salt_partitions > 0:
        # salted repartition: spreads hot-domain rows evenly before the
        # Python-worker stage so no executor drowns in one domain's docs
        df = df.repartition(cfg.salt_partitions, F.xxhash64("url"))
    s = F.col("scrubbed_text")
    df = df.withColumn("scrubbed_text", scrub_udf(F.col("text")))
    df = df.select(
        "*",
        T.is_missing(F.col("text")).alias("_raw_missing"),
        T.char_count(s).alias("n_chars"),
        T.word_count(s).alias("n_words"),
        T.mean_word_length(s).alias("mean_word_len"),
        T.symbol_ratio(s).alias("symbol_ratio"),
        T.line_count(s).alias("n_lines"),
        T.distinct_line_ratio(s).alias("distinct_line_ratio"),
        T.boilerplate_hits(s).alias("boilerplate_hits"),
        T.stopword_hits(s).alias("stopword_hits"),
        T.stopword_density(s).alias("stopword_density"),
        lang_ppl_udf(s).alias("_score"),
    )
    return df.select(
        "*",
        (F.col("_raw_missing") | T.is_missing(s)).alias("_missing"),
        F.col("_score.lang").alias("lang_pred"),
        F.col("_score.lang_conf").alias("lang_conf"),
        F.col("_score.ppl").alias("ppl"),
    ).drop("_score", "_raw_missing")


def with_dedup_flags(df: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Adds _dup_url / _dup_content boolean columns via two windows.

    - url keep-most-recent: row_number over (url) ordered by
      (warc_ts DESC, scrubbed ASC) — total order, deterministic under any
      partitioning (reference W1, QualityControl.py:1967-1981).
    - content keep-one among still-alive docs: md5(scrubbed) groups ordered
      alive-first then (url ASC, warc_ts ASC); an alive row with rn>1 has an
      earlier alive twin -> dup_content.
    """
    if cfg.dedup_url and "url" in df.columns and "warc_ts" in df.columns:
        w_url = Window.partitionBy("url").orderBy(
            F.col("warc_ts").desc(), F.col("scrubbed_text").asc()
        )
        df = df.withColumn("_dup_url", F.row_number().over(w_url) > 1)
    else:
        df = df.withColumn("_dup_url", F.lit(False))

    if cfg.dedup_content:
        alive = ~F.col("_missing") & ~F.col("_dup_url") & F.col("_doc_pass")
        df = df.withColumn("_alive", alive)
        order = [F.col("_alive").desc(), F.col("url").asc()]
        if "warc_ts" in df.columns:
            order.append(F.col("warc_ts").asc())
        w_content = Window.partitionBy(T.content_hash(F.col("scrubbed_text"))).orderBy(
            *order
        )
        df = df.withColumn(
            "_dup_content", F.col("_alive") & (F.row_number().over(w_content) > 1)
        ).drop("_alive")
    else:
        df = df.withColumn("_dup_content", F.lit(False))
    return df


def decide(df: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Folds rule flags into keep/drop_reason (priority-ordered)."""
    flags = _rule_flags(cfg)
    doc_pass = None
    for _, cond in flags:
        doc_pass = ~cond if doc_pass is None else doc_pass & ~cond
    df = df.withColumn("_doc_pass", doc_pass)
    df = with_dedup_flags(df, cfg)
    all_flags = flags + [
        ("dup_url", F.col("_dup_url")),
        ("dup_content", F.col("_dup_content")),
    ]
    reasons = F.array_compact(
        F.array(*[F.when(cond, F.lit(name)) for name, cond in all_flags])
    )
    return (
        df.withColumn("drop_reason", F.get(reasons, 0))
        .withColumn("keep", F.col("drop_reason").isNull())
        .drop("_doc_pass", "_dup_url", "_dup_content", "_missing")
    )


def run_pipeline(df: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Full pipeline: input (url, warc_ts?, html?, text, lang?) ->
    labeled frame with scrubbed_text, metric columns, keep, drop_reason."""
    return decide(with_metrics(df, cfg), cfg)


def quality_metrics(labeled: DataFrame) -> DataFrame:
    """Per-reason counters — the reference's check() report dicts as a
    DataFrame (one wide partial+final hash agg, SURVEY.md §2.4)."""
    return (
        labeled.groupBy(F.coalesce(F.col("drop_reason"), F.lit("kept")).alias("reason"))
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_chars").alias("chars"),
            F.avg("ppl").alias("avg_ppl"),
        )
        .orderBy("reason")
    )


def adapt_documents(df: DataFrame) -> DataFrame:
    """Adapter: driver `documents` table -> pages schema (FIXTURES.md F2:
    doc_id->url surrogate, source->domain)."""
    return df.select(
        F.concat(F.lit("doc://"), F.col("source"), F.lit("/"), F.col("doc_id")).alias(
            "url"
        ),
        F.col("text"),
        F.col("lang"),
    )
