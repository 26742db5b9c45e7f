"""EncodingConformity re-imagined (reference QualityControl.py:3241-3573).

Fix strategies inherit the reference's golden outputs
(tests/test_encoding_conformity.py:44,51,57-58) — note the goldens keep
printable non-ASCII ('text with special char é' survives remove AND
replace); only NON-PRINTABLE chars (char.isprintable() false, reference
:3494) are stripped/replaced:
- remove  : 'invalid \\x80 text' -> 'invalid  text', 'é' intact
- replace : 'invalid \\x80 text' -> 'invalid ? text', 'é' intact
- encode  : 'é' -> '&#233;', '\\x80' -> '&#128;'

remove/replace are pure Java-regex columns (codegen) over the shared
semantics.NONPRINTABLE_REGEX class; xmlcharref encode needs per-char code
points -> Arrow-batched pandas UDF over the shared semantics functions
(same code the oracle calls). detect_encoding's chardet sample-collect
(:3515-3573) is replaced by a distributed aggregation over byte-class
counts.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from ..semantics import NONPRINTABLE_REGEX, encoding_xmlcharref

_NON_ASCII = r"[^\x00-\x7F]"


def remove_invalid(df: DataFrame, col: str) -> DataFrame:
    """Non-printable chars removed (golden :44; printable non-ASCII kept)."""
    return df.withColumn(col, F.regexp_replace(F.col(col), NONPRINTABLE_REGEX, ""))


def replace_invalid(df: DataFrame, col: str, replacement: str = "?") -> DataFrame:
    """Non-printable chars -> replacement (golden :51; 'é' kept)."""
    return df.withColumn(
        col, F.regexp_replace(F.col(col), NONPRINTABLE_REGEX, replacement)
    )


def _xmlcharref_batch(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: None if t is None else encoding_xmlcharref(t))


xmlcharref_udf = F.pandas_udf(_xmlcharref_batch, returnType=StringType())


def encode_xmlcharref(df: DataFrame, col: str) -> DataFrame:
    """Non-ASCII chars -> XML character references (golden :57-58)."""
    return df.withColumn(col, xmlcharref_udf(F.col(col)))


def detect_encoding_profile(df: DataFrame, col: str) -> DataFrame:
    """Distributed stand-in for chardet majority vote (:3557-3571): counts
    of pure-ASCII / extended / control-damaged values in ONE aggregation.
    A corpus with ascii_count == total is 'ascii'; otherwise utf-8."""
    c = F.col(col)
    is_ascii = ~c.rlike(_NON_ASCII)
    has_ctrl = c.rlike(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")
    return df.agg(
        F.count(F.lit(1)).alias("total_values"),
        F.sum(is_ascii.cast("long")).alias("ascii_count"),
        F.sum((~is_ascii).cast("long")).alias("non_ascii_count"),
        F.sum(has_ctrl.cast("long")).alias("control_damaged_count"),
    ).withColumn(
        "detected_encoding",
        F.when(F.col("ascii_count") == F.col("total_values"), F.lit("ascii")).otherwise(
            F.lit("utf-8")
        ),
    )


def normalize_nfc(df, text_col: str = "text", out_col: str | None = None):
    """Unicode NFC composition over a text column — apply BEFORE the
    content-hash dedup key so byte-different renderings of the same
    characters collapse (semantics.nfc_normalize is the shared mirror;
    DuckDB's nfc_normalize is the oracle twin). One Arrow pass, zero
    shuffle; Spark has no built-in NFC, and a per-row java UDF would be
    the measured slow shape."""
    import pandas as pd
    from pyspark.sql import functions as F

    from ..semantics import nfc_normalize

    def batch(texts):  # no type hints (pandas_udf eval-type inference)
        return pd.Series([nfc_normalize(t) for t in texts], dtype="object")

    udf = F.pandas_udf(batch, returnType="string")
    return df.withColumn(out_col or text_col, udf(F.col(text_col)))


# ---------------------------------------------------------------------------
# Homoglyph folding: mixed-script lookalike substitution is the classic
# dedup/blocklist evasion (spam swaps Latin letters for identical-looking
# Cyrillic/Greek so hashes and keyword filters miss). Folding the
# confusable set back to ASCII before hashing/matching closes it, and the
# fold COUNT is itself a spam signal (natural single-script text folds ~0
# chars; evasive text folds many).
# ---------------------------------------------------------------------------

# parallel src -> dst codepoint strings (1:1, translate semantics — the
# SAME constants render into Spark F.translate and DuckDB translate()).
# Conservative confusable set: Cyrillic + Greek glyphs whose rendering is
# identical to a Latin letter in common fonts, plus fullwidth Latin/digits.
_CYR_SRC = "аеорсухѕіјһԛԝАВЕКМНОРСТХУ"
_CYR_DST = "aeopcyxsijhqwABEKMHOPCTXY"
_GRK_SRC = "ονΑΒΕΖΗΙΚΜΝΟΡΤΥΧ"
_GRK_DST = "ovABEZHIKMNOPTYX"
_FW_SRC = "".join(chr(0xFF01 + i) for i in range(94))  # ！.. ～ fullwidth
_FW_DST = "".join(chr(0x21 + i) for i in range(94))
HOMOGLYPH_SRC = _CYR_SRC + _GRK_SRC + _FW_SRC
HOMOGLYPH_DST = _CYR_DST + _GRK_DST + _FW_DST
assert len(HOMOGLYPH_SRC) == len(HOMOGLYPH_DST)


def fold_homoglyphs_col(col):
    """Column: text with the confusable set folded to ASCII."""
    return F.translate(col, HOMOGLYPH_SRC, HOMOGLYPH_DST)


def homoglyph_count_col(col):
    """Column: how many characters the fold touches (deletion-mode
    translate: length delta when the src set is stripped)."""
    return F.length(col) - F.length(F.translate(col, HOMOGLYPH_SRC, ""))


def fold_homoglyphs(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Adds `out_col` (default '<text_col>_folded') + 'homoglyph_count'.
    One zero-shuffle projection; fold before hash keys (dedup) or
    keyword matching (blocklists) to close the mixed-script evasion."""
    out = out_col or f"{text_col}_folded"
    c = F.col(text_col)
    return df.select(
        "*",
        fold_homoglyphs_col(c).alias(out),
        homoglyph_count_col(c).alias("homoglyph_count"),
    )
