"""C4-style line/document cleaning (Raffel et al. 2020, "Exploring the
Limits of Transfer Learning" §2.2 — the public C4 heuristics) — the
standard pre-training line filter. No reference analog; task-brief
training-data operator family.

Line rules (a line survives iff ALL hold):
- ends in terminal punctuation (. ! ? " ')
- has at least `min_words_per_line` whitespace words
- contains no line-ban phrase (javascript / cookie / policy boilerplate),
  case-insensitive

Doc rules (after line filtering):
- dropped as 'policy_phrase' if the CLEANED text contains a doc-ban
  marker ("lorem ipsum", "{") — C4 drops source-code and filler pages
- dropped as 'too_few_sentences' if the cleaned text has fewer than
  `min_sentences` terminal-punctuation sentence ends

Everything is native column algebra over split/filter/array ops — zero
UDFs, zero shuffles, whole-stage codegen; the shared constants below
drive both the Spark plan and the DuckDB oracle so they cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import C4_MIN_WORDS_PER_LINE
from ..functions import text as T

# shared by the Spark implementation AND the driver oracle SQL
TERMINAL_PUNCT = (".", "!", "?", '"', "'")
LINE_BAN_PHRASES = (
    "javascript",
    "cookie policy",
    "privacy policy",
    "terms of use",
    "uses cookies",
)
DOC_BAN_PHRASES = ("lorem ipsum", "{")
# Single source of truth is config.C4_MIN_WORDS_PER_LINE (aliased here so
# operator callers keep the local name): PipelineConfig's default and the
# driver oracle SQL all derive from the same constant (ADVICE r4: two
# independent constants could drift). DELIBERATE deviation from the
# paper: C4 (Raffel et al. 2020) uses >= 5 words/line; the default is 3
# because the synthetic fixture corpora run short lines and a 5-word bar
# empties them — pass min_words_per_line=5 for paper-faithful behavior.
MIN_WORDS_PER_LINE = C4_MIN_WORDS_PER_LINE
MIN_SENTENCES = 3
# count of sentence-terminal characters (. ! ?) = sentence-end count
SENTENCE_END_CLASS = r"[.!?]"
# trailing chars ignored by the terminal-punctuation test: every ASCII
# whitespace except \n (the split boundary). Space-only rtrim would fail
# EVERY line of a CRLF-formatted document (trailing \r) and silently
# empty the whole corpus.
LINE_TRIM_CHARS = " \t\r\x0b\f"


def _line_ok(ln, min_words_per_line: int):
    trimmed = F.btrim(ln, F.lit(LINE_TRIM_CHARS))
    ends_ok = F.lit(False)
    for p in TERMINAL_PUNCT:
        ends_ok = ends_ok | trimmed.endswith(p)
    n_words = F.size(T.words(ln))  # the package's one tokenizer
    banned = F.lit(False)
    for ph in LINE_BAN_PHRASES:
        banned = banned | F.contains(F.lower(ln), F.lit(ph))
    return ends_ok & (n_words >= min_words_per_line) & ~banned


def kept_lines_text(txt, min_words_per_line: int = MIN_WORDS_PER_LINE):
    """Column: `txt` rewritten with only the surviving lines (NULL stays
    NULL). Shared by c4_line_filter and the pipeline's cfg.c4_lines
    rewrite stage."""
    kept = F.filter(
        F.split(txt, r"\n"), lambda ln: _line_ok(ln, min_words_per_line)
    )
    return F.when(txt.isNull(), F.lit(None).cast("string")).otherwise(
        F.array_join(kept, "\n")
    )


def doc_ban_col(txt):
    """Column: True when `txt` contains a doc-level ban marker (C4's
    lorem-ipsum / '{' rule), case-insensitive; NULL-safe False."""
    lc = F.lower(txt)
    has = F.lit(False)
    for ph in DOC_BAN_PHRASES:
        has = has | F.contains(lc, F.lit(ph))
    return F.coalesce(has, F.lit(False))


def c4_line_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = MIN_WORDS_PER_LINE,
    min_sentences: int = MIN_SENTENCES,
) -> DataFrame:
    """Returns (id, cleaned_text, n_lines_kept, n_lines_dropped, keep,
    drop_reason). NULL text -> NULL cleaned_text, keep=false,
    drop_reason='missing_text'. Rows are never merged or dropped — this
    is a labeling/rewrite operator like paragraph_scrub."""
    txt = F.col(text_col)
    lines = F.split(txt, r"\n")
    kept = F.filter(lines, lambda ln: _line_ok(ln, min_words_per_line))
    cleaned = F.array_join(kept, "\n")
    n_kept = F.size(kept)
    n_dropped = F.size(lines) - n_kept

    has_ban = doc_ban_col(cleaned)
    n_sentences = F.length(cleaned) - F.length(
        F.regexp_replace(cleaned, SENTENCE_END_CLASS, "")
    )
    drop_reason = (
        F.when(txt.isNull(), F.lit("missing_text"))
        .when(has_ban, F.lit("policy_phrase"))
        .when(n_sentences < min_sentences, F.lit("too_few_sentences"))
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.when(txt.isNull(), F.lit(None).cast("string"))
        .otherwise(cleaned)
        .alias("cleaned_text"),
        F.coalesce(n_kept, F.lit(0)).cast("int").alias("n_lines_kept"),
        F.coalesce(n_dropped, F.lit(0)).cast("int").alias("n_lines_dropped"),
        drop_reason.isNull().alias("keep"),
        drop_reason.alias("drop_reason"),
    )
