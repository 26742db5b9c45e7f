"""Arrow-batched scoring UDF: ALL per-document metrics in one Python pass.

One pandas UDF returning the full metric struct — fused so (a) the text
crosses the JVM<->Python Arrow boundary once, (b) one tokenize pass feeds
langid + word metrics, and (c) no metric is computed by interpreted JVM
string/array expressions. Measured on this host (500k docs, local[32]):
the JVM column-algebra metric projection costs ~1.3 ms/doc (regexp array
materialization, per-element lambdas, line splits); this fused UDF costs
~0.27 ms/doc single-threaded and scales with Python workers.

The column-algebra equivalents live on in functions/text.py — they back
the operator library and the DuckDB-checked driver queries, and
tests/test_text_metrics.py pins all three paths (python, JVM columns,
this UDF) to identical values.

The model code is imported from ``dataqualitykit_spark.semantics`` (same
functions the oracle calls), so engine and oracle cannot disagree. This is
the fastText/KenLM seam: swap `full_metrics` internals for real models on
a cluster; signatures stay put. (Replaces reference row-at-a-time F.udf
patterns, QualityControl.py:1341-1354.)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..semantics import full_metrics

_FIELDS = [
    ("lang", StringType()),
    ("lang_conf", DoubleType()),
    ("ppl", DoubleType()),
    ("n_words", IntegerType()),
    ("mean_word_len", DoubleType()),
    ("stopword_hits", IntegerType()),
    ("n_chars", IntegerType()),
    ("symbol_count", IntegerType()),
    ("n_lines", IntegerType()),
    ("distinct_lines", IntegerType()),
    ("boilerplate_hits", IntegerType()),
    ("missing", BooleanType()),
]

SCORE_SCHEMA = StructType([StructField(n, t) for n, t in _FIELDS])

_NULL_SCORE = ("und", 0.0, 1e9, 0, 0.0, 0, 0, 0, 0, 0, 0, True)
_COLS = [n for n, _ in _FIELDS]


def _score_batch(texts: pd.Series) -> pd.DataFrame:
    scored = [_NULL_SCORE if t is None else full_metrics(t) for t in texts]
    return pd.DataFrame(scored, columns=_COLS)


lang_ppl_udf = F.pandas_udf(_score_batch, returnType=SCORE_SCHEMA)
