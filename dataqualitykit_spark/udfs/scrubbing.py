"""Arrow-batched scrub UDF — THE byte-exact contract.

Applies the shared compiled regex bank (semantics.py) with vectorized
pandas `Series.str.replace` in the exact order the oracle applies it, so
scrubbed output is byte-identical to the oracle by construction
(BASELINE.json input_hint per-row invariant).

Replaces the reference's row-at-a-time encoding UDFs
(QualityControl.py:3483-3511) with Arrow batches.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from ..semantics import _CTRL_RE, _TOX_RE, MOJIBAKE_MAP, PII_BANK


def _scrub_batch(texts: pd.Series) -> pd.Series:
    s = texts.fillna("")
    # 1. mojibake repair (plain str replace — vectorized, non-regex)
    for bad, good in MOJIBAKE_MAP:
        s = s.str.replace(bad, good, regex=False)
    # 2. control-char strip
    s = s.str.replace(_CTRL_RE, "", regex=True)
    # 3. PII bank in pinned order
    for pat, repl in PII_BANK:
        s = s.str.replace(pat, repl, regex=True)
    # 4. toxicity mask
    s = s.str.replace(_TOX_RE, "<TOX>", regex=True)
    return s


scrub_udf = F.pandas_udf(_scrub_batch, returnType=StringType())
