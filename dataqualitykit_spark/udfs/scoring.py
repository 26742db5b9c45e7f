"""Arrow-batched scoring UDF: language-ID + char-bigram perplexity.

One pandas UDF returning a struct<(lang string, lang_conf double,
ppl double)> — fused so the text column crosses the JVM<->Python Arrow
boundary once, not twice. The model code is imported from
``dataqualitykit_spark.semantics`` (same functions the oracle calls), so
engine and oracle cannot disagree.

This is the fastText/KenLM seam: swap `_score_batch` internals for real
models on a cluster where those wheels exist; signatures stay put.
(Replaces reference row-at-a-time F.udf patterns, QualityControl.py:1341-1354.)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from ..semantics import langid, perplexity

SCORE_SCHEMA = StructType(
    [
        StructField("lang", StringType()),
        StructField("lang_conf", DoubleType()),
        StructField("ppl", DoubleType()),
    ]
)


def _score_batch(texts: pd.Series) -> pd.DataFrame:
    langs: list[str] = []
    confs: list[float] = []
    ppls: list[float] = []
    for t in texts:
        if t is None:
            langs.append("und")
            confs.append(0.0)
            ppls.append(1e9)
            continue
        lg, cf = langid(t)
        langs.append(lg)
        confs.append(cf)
        ppls.append(perplexity(t))
    return pd.DataFrame({"lang": langs, "lang_conf": confs, "ppl": ppls})


lang_ppl_udf = F.pandas_udf(_score_batch, returnType=SCORE_SCHEMA)
