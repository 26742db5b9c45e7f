"""Mojibake repair — fix UTF-8 text that was mis-decoded as cp1252 at
some crawl/extract hop ("â€™" for "'", "Ã©" for "é"), the single most
common encoding wound in Common-Crawl-style corpora. No reference analog
(QualityControl.py's EncodingConformity strips/escapes non-printables,
reference :3241-3573, but never REPAIRS a mis-decode); ftfy documents the
failure mode publicly.

The pair table is GENERATED, not hand-typed: for each repaired target
char, the mojibake form is ``target.encode('utf-8')`` decoded byte-wise
through "sloppy cp1252" (cp1252 with the five undefined bytes 0x81 0x8D
0x8F 0x90 0x9D falling back to their latin-1 C1 controls — exactly what
lenient web decoders emit). One table drives all three engines: the
Spark native ``replace`` chain, the pure-Python mirror used by pytest,
and the DuckDB oracle SQL the entry script generates.

100 TB shape: the fix is a chained literal ``replace`` projection —
zero shuffle, zero join, zero Python in the hot path, whole-stage
codegen'd; ~40 passes over each string but every pass is a JVM
StringUtils replace on a (usually short) doc. The sequences repaired
cover the smart-punctuation + Latin-1 letters + currency/symbol set that
dominates real mojibake; double-encoded text (repair applies once) and
sequences outside the table pass through unchanged. False-positive
trade-off (documented, inherent to the technique): legitimate text that
GENUINELY contains e.g. "Ã©" as two characters is rewritten; at web
scale the mojibake reading is overwhelmingly the correct one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# cp1252's five undefined bytes -> latin-1 C1 controls ("sloppy cp1252").
_CP1252_HOLES = {0x81: "\x81", 0x8D: "\x8d", 0x8F: "\x8f", 0x90: "\x90", 0x9D: "\x9d"}


def _sloppy_cp1252(raw: bytes) -> str:
    out = []
    for b in raw:
        if b in _CP1252_HOLES:
            out.append(_CP1252_HOLES[b])
        else:
            out.append(bytes([b]).decode("cp1252"))
    return "".join(out)


# Repaired target characters: smart punctuation, the common Latin-1
# letters, NBSP, and the currency/symbol block seen in web text.
MOJIBAKE_TARGETS: str = (
    "‘’“”–—…•‹›"  # quotes/dashes
    "«» "  # guillemets, NBSP
    "€™"  # EUR, TM
    "éèêëáàâãíîï"
    "óòôõúùûñçüöäß"
    "ÉÀÜÖÄÇÑ"
    "°©®£¥×÷§¶µ¿¡"
    "½¼¾"
)

# (mojibake_sequence, repaired_char), longest sequences first so 3-byte
# UTF-8 targets (which decode to 3 cp1252 chars starting with 'â') are
# consumed before any 2-char pattern could match inside them.
MOJIBAKE_PAIRS: tuple[tuple[str, str], ...] = tuple(
    sorted(
        ((_sloppy_cp1252(ch.encode("utf-8")), ch) for ch in MOJIBAKE_TARGETS),
        key=lambda p: (-len(p[0]), p[0]),
    )
)


def fix_mojibake_py(text: str | None) -> str | None:
    """Pure-Python mirror of the column chain (oracle/test side)."""
    if text is None:
        return None
    for moji, ch in MOJIBAKE_PAIRS:
        text = text.replace(moji, ch)
    return text


def fix_mojibake_col(col):
    """Column expression: the generated literal-replace chain."""
    out = col
    for moji, ch in MOJIBAKE_PAIRS:
        out = F.replace(out, F.lit(moji), F.lit(ch))
    return out


def fix_mojibake(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Rewrite `text_col` with cp1252 mojibake repaired; adds boolean
    `mojibake_fixed` (True when the repair changed the value). NULL
    passes through as NULL with mojibake_fixed False."""
    fixed = fix_mojibake_col(F.col(text_col))
    return df.withColumn("_fx", fixed).select(
        *[
            F.col("_fx").alias(text_col) if c == text_col else F.col(c)
            for c in df.columns
        ],
        F.coalesce(
            F.col("_fx") != F.col(text_col), F.lit(False)
        ).alias("mojibake_fixed"),
    )
