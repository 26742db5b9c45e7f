"""Gopher-style repetition metrics (Rae et al. 2021, "Scaling Language
Models: ... Gopher", repetition filters in Table A1) — the standard
excess-repetition signals LLM training pipelines compute per document
before quality filtering. No reference analog (QualityControl.py has no
text-repetition ops); task-brief training-data operator family.

Per-document outputs:

- dup_line_frac        (n_lines - n_distinct_lines) / n_lines over
                       space-trim-nonempty lines
- dup_line_char_frac   fraction of line characters sitting in a line
                       whose exact text occurs >= 2 times in the doc
- dup_5gram_frac       (n_5grams - n_distinct_5grams) / n_5grams over
                       word 5-grams (docs shorter than 5 words have one
                       whole-text gram -> 0.0)
- top_2gram_char_frac  max over distinct word 2-grams g of
                       count(g) * chars(g) / text chars — an upper bound
                       of Gopher's "fraction of characters in the most
                       common 2-gram" that stays deterministic under
                       count ties (max over a scalar, no tie-break
                       needed); 0.0 when no 2-gram repeats

100 TB shape: the line and 5-gram legs are pure per-row column algebra
(zero shuffle, zero UDF — whole-stage codegen over split/array ops; the
line HOF is O(L^2) on the handful of lines a web page has). The top-2gram
leg is the only exchange: grams explode to (id, xxhash64(gram) bigint,
gram chars) and partial-aggregate map-side — gram TEXT never shuffles,
mirroring paragraph_dedup's hash-keyed frequency pass. AQE coalesces the
per-doc join back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import text as T


def _word_ngrams(tokens, n: int):
    """Array column of word n-grams ('w1 w2 ... wn' strings); whole text
    as one gram when shorter than n words (same rule as the shingle ops)."""
    joined = F.array_join(tokens, " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(tokens) - n),
        lambda i: F.array_join(F.slice(tokens, i + 1, n), " "),
    )
    return F.when(F.size(tokens) < n, F.array(joined)).otherwise(grams)


def dup_line_char_frac_col(txt):
    """Fraction of line characters in a line whose exact text occurs >= 2
    times in the doc (unrounded Column; NULL/empty -> 0.0). Shared by
    repetition_metrics and the pipeline's opt-in repetition gate."""
    lines = T.nonempty_lines(txt)
    line_chars = F.aggregate(lines, F.lit(0), lambda acc, l: acc + F.length(l))
    dup_chars = F.aggregate(
        F.filter(
            lines, lambda l: F.size(F.filter(lines, lambda x: x == l)) >= 2
        ),
        F.lit(0),
        lambda acc, l: acc + F.length(l),
    )
    return F.when(line_chars > 0, dup_chars / line_chars.cast("double")).otherwise(
        F.lit(0.0)
    )


def dup_5gram_frac_col(txt):
    """(n_5grams - n_distinct_5grams) / n_5grams over word 5-grams
    (unrounded Column; NULL/short -> 0.0)."""
    g5 = _word_ngrams(T.words(txt), 5)
    n5 = F.size(g5)
    return F.when(
        n5 > 0, (n5 - F.size(F.array_distinct(g5))) / n5.cast("double")
    ).otherwise(F.lit(0.0))


def repetition_metrics(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc repetition metrics; NULL text -> zero lines/grams, 0.0
    fractions. Returns (id, n_lines, dup_line_frac, dup_line_char_frac,
    dup_5gram_frac, top_2gram_char_frac), fractions rounded to 6."""
    txt = F.col(text_col)
    lines = T.nonempty_lines(txt)
    toks = T.words(txt)

    n_lines = F.size(lines)
    dup_line_frac = F.when(n_lines > 0, (n_lines - F.size(F.array_distinct(lines))) / n_lines).otherwise(F.lit(0.0))
    base = df.select(
        F.col(id_col).alias("id"),
        F.coalesce(F.length(txt), F.lit(0)).alias("_nchars"),
        F.greatest(n_lines, F.lit(0)).alias("n_lines"),
        F.round(dup_line_frac, 6).alias("dup_line_frac"),
        F.round(dup_line_char_frac_col(txt), 6).alias("dup_line_char_frac"),
        F.round(dup_5gram_frac_col(txt), 6).alias("dup_5gram_frac"),
        _word_ngrams(toks, 2).alias("_g2"),
    )

    # top-2gram leg: ONE exchange carrying (id, gram hash, gram chars)
    top = (
        base.select("id", F.explode("_g2").alias("_g"))
        .groupBy("id", F.xxhash64("_g").alias("_gh"))
        .agg(F.count(F.lit(1)).alias("_cnt"), F.first(F.length("_g")).alias("_glen"))
        .filter(F.col("_cnt") >= 2)
        .groupBy("id")
        .agg(F.max(F.col("_cnt") * F.col("_glen")).alias("_topchars"))
    )
    return (
        base.drop("_g2")
        .join(top, "id", "left")
        .select(
            "id",
            "n_lines",
            "dup_line_frac",
            "dup_line_char_frac",
            "dup_5gram_frac",
            F.round(
                F.when(
                    (F.col("_topchars").isNotNull()) & (F.col("_nchars") > 0),
                    F.col("_topchars") / F.col("_nchars").cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("top_2gram_char_frac"),
        )
    )


# Gopher line-shape rule constants (Rae et al. 2021, A1.1.1) — shared
# verbatim with the DuckDB oracle SQL so the two cannot drift
BULLET_PREFIXES = ("•", "‣", "·", "- ", "* ")
ELLIPSIS_SUFFIXES = ("...", "…")
MAX_BULLET_LINE_FRAC = 0.9
MAX_ELLIPSIS_LINE_FRAC = 0.3
MIN_ALPHA_WORD_FRAC = 0.8


_LINE_TRIM = " \t\r\x0b\f"


def _nonblank_lines(txt):
    return F.filter(
        F.split(txt, r"\n"),
        lambda ln: F.btrim(ln, F.lit(_LINE_TRIM)) != F.lit(""),
    )


def _starts_bullet_col(ln):
    t = F.ltrim(ln)
    hit = F.lit(False)
    for p in BULLET_PREFIXES:
        hit = hit | t.startswith(p)
    return hit


def _ends_ellipsis_col(ln):
    t = F.btrim(ln, F.lit(_LINE_TRIM))
    hit = F.lit(False)
    for s in ELLIPSIS_SUFFIXES:
        hit = hit | t.endswith(s)
    return hit


def bullet_line_frac_col(txt):
    """Fraction of non-blank lines starting with a bullet marker (0.0 for
    line-less text). Column twin of semantics.line_shape_fracs[0]."""
    lines = _nonblank_lines(txt)
    n = F.size(lines)
    return F.when(
        n > 0, F.size(F.filter(lines, _starts_bullet_col)) / n.cast("double")
    ).otherwise(F.lit(0.0))


def ellipsis_line_frac_col(txt):
    """Fraction of non-blank lines ending with an ellipsis. Column twin
    of semantics.line_shape_fracs[1]."""
    lines = _nonblank_lines(txt)
    n = F.size(lines)
    return F.when(
        n > 0, F.size(F.filter(lines, _ends_ellipsis_col)) / n.cast("double")
    ).otherwise(F.lit(0.0))


def alpha_word_frac_col(txt):
    """Fraction of whitespace words containing >= 1 [A-Za-z] character.
    Column twin of semantics.line_shape_fracs[2]."""
    words = T.words(txt)
    n = F.size(words)
    return F.when(
        n > 0,
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))) / n.cast("double"),
    ).otherwise(F.lit(0.0))


def gopher_line_metrics(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bullet_line_frac: float = MAX_BULLET_LINE_FRAC,
    max_ellipsis_line_frac: float = MAX_ELLIPSIS_LINE_FRAC,
    min_alpha_word_frac: float = MIN_ALPHA_WORD_FRAC,
) -> DataFrame:
    """The OTHER Gopher quality rules (Rae et al. 2021, A1.1.1) — line
    shape, completing the family repetition_metrics started:
      - bullet_line_frac: non-blank lines starting with a bullet marker
        (paper: drop when > 90% — a page that is ALL list is nav/spam)
      - ellipsis_line_frac: non-blank lines ending with an ellipsis
        (paper: drop when > 30% — truncated teaser/preview pages)
      - alpha_word_frac: words containing >= 1 [A-Za-z] character
        (paper: drop when < 80% — symbol/number soup)
    Returns (id, n_lines, bullet_line_frac, ellipsis_line_frac,
    alpha_word_frac, gopher_line_ok). Zero-shuffle column algebra, NULL
    text -> zero metrics with gopher_line_ok=false (nothing to keep).

    Fractions are computed over NON-BLANK lines (space/tab/CR-trimmed,
    the C4 trim discipline) and whitespace words; all thresholds are
    parameters with the paper's values as defaults."""
    txt = F.col(text_col)
    n_lines = F.size(_nonblank_lines(txt))
    bullet_frac = bullet_line_frac_col(txt)
    ellip_frac = ellipsis_line_frac_col(txt)
    alpha_frac = alpha_word_frac_col(txt)
    ok = (
        txt.isNotNull()
        & (bullet_frac <= max_bullet_line_frac)
        & (ellip_frac <= max_ellipsis_line_frac)
        & (alpha_frac >= min_alpha_word_frac)
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.coalesce(n_lines, F.lit(0)).cast("int").alias("n_lines"),
        F.round(F.coalesce(bullet_frac, F.lit(0.0)), 6).alias("bullet_line_frac"),
        F.round(F.coalesce(ellip_frac, F.lit(0.0)), 6).alias("ellipsis_line_frac"),
        F.round(F.coalesce(alpha_frac, F.lit(0.0)), 6).alias("alpha_word_frac"),
        F.coalesce(ok, F.lit(False)).alias("gopher_line_ok"),
    )
