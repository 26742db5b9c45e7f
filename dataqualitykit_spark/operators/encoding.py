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
