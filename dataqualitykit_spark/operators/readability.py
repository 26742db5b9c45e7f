"""Readability scoring (Flesch reading ease / Flesch-Kincaid grade) as
zero-shuffle column algebra.

Edu-quality selection pipelines (the FineWeb-Edu / textbook-quality
shape) want a cheap readability prior next to the stopword/perplexity
signals. Both scores reduce to three counts, each computable with one
native regex pass over the document — no explode, no Python, no shuffle:

- words: whitespace-delimited runs,
- sentences: non-blank ``[.!?]+``-delimited segments (min 1 once any
  word exists),
- syllables: the classic heuristic — vowel groups ``[aeiouy]+`` per
  word, with a floor of 1 per word. Vowel groups cannot span whitespace,
  so the per-doc total is ``regexp_count(lower(text), '[aeiouy]+')``
  plus one for every vowel-less word ("Mr", digits, "7th"). ASCII-vowel
  heuristic documented: accented vowels count via their base form only
  when NFC text carries combining marks separately; this is a prior, not
  a linguistics engine.

Formulas (Flesch 1948; Kincaid 1975):
  ease  = 206.835 - 1.015 * words/sentences - 84.6 * syllables/words
  grade = 0.39 * words/sentences + 11.8 * syllables/words - 15.59

Every count is an integer and the arithmetic is a fixed IEEE expression
tree, so a DuckDB twin mirroring the same op order is bit-identical; the
driver oracle still applies the shared floor(x*1e6+0.5)/1e6 tie rule on
both sides (the repo's cross-engine rounding discipline).

Reference parity: none — the reference has no text-quality scoring; this
extends the engine's quality-signal bank (semantics.py, entropy.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "readability_counts",
    "flesch_reading_ease_col",
    "flesch_kincaid_grade_col",
    "readability",
]

VOWEL_GROUP_RE = "[aeiouy]+"
SENTENCE_SPLIT_RE = "[.!?]+"
_NO_VOWEL_WORD = "(?i)[aeiouy]"
# explicit ASCII whitespace class instead of \s: Java's \s includes \x0B
# (vertical tab) but RE2's does NOT — spelling the class out keeps Spark,
# DuckDB and the python mirror on identical semantics (probe-verified)
ASCII_WS_RE = r"[ \t\n\x0B\f\r]+"


def readability_counts(text_col: str = "text") -> dict[str, Column]:
    """n_words / n_sentences / n_syllables as Columns (NULL text -> all
    NULL; empty text -> zeros with n_sentences 0)."""
    t = F.col(text_col)
    words = F.filter(F.split(t, ASCII_WS_RE), lambda w: w != F.lit(""))
    # explicit NULL passthrough: under Spark 4 ANSI defaults size(NULL) is
    # already NULL, but pyspark 3.5 (permitted by pyproject) returns -1
    # there — the guard pins the documented 'NULL text -> all NULL'
    # contract on every supported version (ADVICE r6); no-op on Spark 4
    n_words = F.when(t.isNotNull(), F.size(words))
    sentences = F.filter(
        F.split(t, SENTENCE_SPLIT_RE),
        lambda s: F.btrim(s) != F.lit(""),
    )
    # a doc with words but no terminal punctuation is one sentence
    n_sentences = F.when(n_words > 0, F.greatest(F.size(sentences), F.lit(1))).otherwise(
        F.when(t.isNotNull(), F.lit(0))
    )
    vowel_groups = F.regexp_count(F.lower(t), F.lit(VOWEL_GROUP_RE))
    no_vowel_words = F.size(
        F.filter(words, lambda w: ~w.rlike(_NO_VOWEL_WORD))
    )
    n_syllables = vowel_groups + no_vowel_words
    return {
        "n_words": n_words,
        "n_sentences": n_sentences,
        "n_syllables": F.when(n_words >= 0, n_syllables),
    }


def _ratios(c: dict[str, Column]) -> tuple[Column, Column]:
    wps = c["n_words"].cast("double") / c["n_sentences"].cast("double")
    spw = c["n_syllables"].cast("double") / c["n_words"].cast("double")
    return wps, spw


def flesch_reading_ease_col(text_col: str = "text") -> Column:
    c = readability_counts(text_col)
    wps, spw = _ratios(c)
    score = (
        F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
    )
    return F.when(c["n_words"] > 0, score)


def flesch_kincaid_grade_col(text_col: str = "text") -> Column:
    c = readability_counts(text_col)
    wps, spw = _ratios(c)
    grade = F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)
    return F.when(c["n_words"] > 0, grade)


def readability(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_words/n_sentences/n_syllables/flesch_ease/fk_grade in one
    zero-shuffle projection."""
    c = readability_counts(text_col)
    return df.select(
        "*",
        c["n_words"].alias("n_words"),
        c["n_sentences"].alias("n_sentences"),
        c["n_syllables"].alias("n_syllables"),
        flesch_reading_ease_col(text_col).alias("flesch_ease"),
        flesch_kincaid_grade_col(text_col).alias("fk_grade"),
    )


def readability_sql_exprs(text_expr: str = "text") -> dict[str, str]:
    """DuckDB twin: same counts, same IEEE expression tree. Mirrors
    readability_counts exactly — list_filter over regexp splits, vowel
    groups via regexp_extract_all length."""
    words = (
        f"list_filter(regexp_split_to_array({text_expr}, '{ASCII_WS_RE}'),"
        " w -> w <> '')"
    )
    sent = (
        f"list_filter(regexp_split_to_array({text_expr}, '{SENTENCE_SPLIT_RE}'),"
        " s -> trim(s) <> '')"
    )
    n_words = f"len({words})"
    n_sentences = (
        f"CASE WHEN {n_words} > 0 THEN greatest(len({sent}), 1) "
        f"WHEN {text_expr} IS NOT NULL THEN 0 END"
    )
    vg = f"len(regexp_extract_all(lower({text_expr}), '{VOWEL_GROUP_RE}'))"
    nv = f"len(list_filter({words}, w -> NOT regexp_matches(w, '[aeiouy]', 'i')))"
    n_syll = f"({vg} + {nv})"
    wps = f"(CAST({n_words} AS DOUBLE) / CAST({n_sentences} AS DOUBLE))"
    spw = f"(CAST({n_syll} AS DOUBLE) / CAST({n_words} AS DOUBLE))"
    return {
        "n_words": n_words,
        "n_sentences": n_sentences,
        "n_syllables": n_syll,
        "flesch_ease": (
            f"CASE WHEN {n_words} > 0 THEN"
            f" 206.835::DOUBLE - 1.015::DOUBLE * {wps} - 84.6::DOUBLE * {spw}"
            " END"
        ),
        "fk_grade": (
            f"CASE WHEN {n_words} > 0 THEN"
            f" 0.39::DOUBLE * {wps} + 11.8::DOUBLE * {spw} - 15.59::DOUBLE"
            " END"
        ),
    }


def py_readability(text: str | None):
    """Pure-python mirror of readability_counts + both scores (the
    semantics.py discipline; fuzz tests pin Spark == mirror). Java regex
    \\s is ASCII-ONLY (no U+00A0 etc.) while Python's is Unicode — the
    mirror must spell the ASCII class out; likewise Spark btrim and
    DuckDB trim default to stripping SPACES only, so the sentence filter
    strips ' ' alone (fuzz-found divergences, both)."""
    import re as _re

    if text is None:
        return (None, None, None, None, None)
    words = [w for w in _re.split(ASCII_WS_RE, text) if w != ""]
    n_words = len(words)
    sentences = [
        s for s in _re.split(r"[.!?]+", text) if s.strip(" ") != ""
    ]
    n_sentences = max(len(sentences), 1) if n_words > 0 else 0
    vg = len(_re.findall(r"[aeiouy]+", text.lower()))
    nv = sum(1 for w in words if not _re.search(r"(?i)[aeiouy]", w))
    n_syll = vg + nv
    if n_words == 0:
        return (0, n_sentences, n_syll, None, None)
    wps = float(n_words) / float(n_sentences)
    spw = float(n_syll) / float(n_words)
    ease = 206.835 - 1.015 * wps - 84.6 * spw
    grade = 0.39 * wps + 11.8 * spw - 15.59
    return (n_words, n_sentences, n_syll, ease, grade)
