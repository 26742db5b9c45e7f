"""Arrow-batched scrub UDF — THE byte-exact contract.

Applies the shared compiled regex bank (semantics.py) with vectorized
pandas `Series.str.replace` in the exact order the oracle applies it, so
scrubbed output is byte-identical to the oracle by construction
(BASELINE.json input_hint per-row invariant).

Replaces the reference's row-at-a-time encoding UDFs
(QualityControl.py:3483-3511) with Arrow batches.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from ..semantics import _CTRL_RE, _TOX_RE, MOJIBAKE_MAP, PII_BANK, TOXICITY_LEXICON

_DIGIT_RE = re.compile(r"\d")

# Exact-equivalence gates: a pattern is applied only to rows where a
# mandatory literal/class of that pattern occurs, so skipping the rest is
# a provable no-op (email REQUIRES '@'; SSN/PHONE/IP REQUIRE a digit;
# every toxicity alternative REQUIRES its word as a case-insensitive
# substring; every mojibake needle starts with 'Ã' or 'â'). Most clean
# web text has no '@' and no lexicon hits — the expensive regex passes
# run on the small dirty subset instead of the whole batch. Byte-parity
# with the ungated oracle is pinned by tests/test_pipeline_oracle.py.


def _scrub_batch(texts: pd.Series) -> pd.Series:
    s = texts.fillna("")
    # 1. mojibake repair (plain str replace — non-regex), gated on the
    # two needle prefixes
    moji = s.str.contains("Ã", regex=False) | s.str.contains("â", regex=False)
    if moji.any():
        sub = s[moji]
        for bad, good in MOJIBAKE_MAP:
            sub = sub.str.replace(bad, good, regex=False)
        s = s.copy()
        s[moji] = sub
    # 2. control-char strip (cheap pattern — ungated)
    s = s.str.replace(_CTRL_RE, "", regex=True)
    # 3. PII bank in pinned order; masks computed up front are SUPERSETS
    # of later match-possible rows (earlier subs only remove matches and
    # the <TOKEN> replacements contain no digits/separators). Gate
    # predicates are declared WITH each bank entry (semantics.PII_BANK
    # 3-tuples), so reordering/extending the bank cannot desync the
    # gates. Masks memoize LAZILY with the cheap memchr scans first:
    # a composite gate whose literal leg is all-False never pays the
    # digit regex scan, and clean prose (no '@'/'-'/'.'/'(') skips every
    # PII regex pass outright.
    memo: dict[str, pd.Series] = {}

    def mask(key: str) -> pd.Series:
        if key not in memo:
            if key == "at":
                memo[key] = s.str.contains("@", regex=False)
            elif key == "digit":
                memo[key] = s.str.contains(_DIGIT_RE, regex=True)
            elif key == "dash":
                memo[key] = s.str.contains("-", regex=False)
            elif key == "dot":
                memo[key] = s.str.contains(".", regex=False)
            elif key == "paren":
                memo[key] = s.str.contains("(", regex=False)
            elif key == "digit_dash":
                m = mask("dash")
                memo[key] = (m & mask("digit")) if m.any() else m
            elif key == "digit_dot":
                m = mask("dot")
                memo[key] = (m & mask("digit")) if m.any() else m
            elif key == "digit_sep":
                m = mask("dash") | mask("dot") | mask("paren")
                memo[key] = (m & mask("digit")) if m.any() else m
            else:  # pragma: no cover — unknown key = programming error
                raise KeyError(key)
        return memo[key]

    for pat, repl, gate_key in PII_BANK:
        if gate_key is None:
            s = s.str.replace(pat, repl, regex=True)
            continue
        gate = mask(gate_key)
        if gate.any():
            s.loc[gate] = s.loc[gate].str.replace(pat, repl, regex=True)
    # 4. toxicity mask, gated on case-insensitive substring presence
    tox = None
    for w in TOXICITY_LEXICON:
        m = s.str.contains(w, case=False, regex=False)
        tox = m if tox is None else (tox | m)
    if tox.any():
        s.loc[tox] = s.loc[tox].str.replace(_TOX_RE, "<TOX>", regex=True)
    return s


scrub_udf = F.pandas_udf(_scrub_batch, returnType=StringType())
