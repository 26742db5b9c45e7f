#!/usr/bin/env python
"""Prototype: python-vs-DuckDB parity for Luhn-validated credit-card
scrubbing BEFORE wiring Spark.

Design under test:
- candidate regex: \\b(?:\\d[ -]?){12,18}\\d\\b (13-19 digits, optional
  single space/dash separators) — leftmost/greedy semantics must agree
  between python re and RE2.
- Luhn over the digit string (right-to-left doubling of every 2nd digit).
- scrub: replace VALID candidates with <CC>, leave invalid ones.
  SQL reconstruction: regexp_split_to_array keeps the non-match parts
  (len = len(matches)+1), so scrubbed = parts interleaved with
  (valid ? '<CC>' : match).
"""
import re
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
CAND = r"\b(?:\d[ -]?){12,18}\d\b"
_cand_re = re.compile(CAND)
_HEXMAP = str.maketrans("abcdef", "012345")


def luhn_valid(digits: str) -> bool:
    s = 0
    for i, ch in enumerate(reversed(digits)):
        d = ord(ch) - 48
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        s += d
    return s % 10 == 0


def scrub(text):
    parts = _cand_re.split(text or "")
    matches = _cand_re.findall(text or "")
    out = [parts[0]]
    n_valid = 0
    for m, p in zip(matches, parts[1:]):
        digits = re.sub(r"[^0-9]", "", m)
        if luhn_valid(digits):
            out.append("<CC>")
            n_valid += 1
        else:
            out.append(m)
        out.append(p)
    return ("".join(out), len(matches), n_valid)


con = duckdb.connect()
con.execute(
    f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
)
rows = con.execute("SELECT doc_id, text FROM documents ORDER BY doc_id").fetchall()


def mk_text(doc_id, text):
    import hashlib

    h = hashlib.md5(str(doc_id).encode()).hexdigest()
    d32 = h.translate(_HEXMAP)
    d16 = d32[:16]
    plain = d16[:15]                      # 15-digit run
    dashed = "-".join(d16[i : i + 4] for i in range(0, 16, 4))
    short = d16[:8]                       # too short — not a candidate
    longrun = d32 + d32[:8]               # 40 digits — exceeds 19: what happens?
    return (
        (text or "")
        + " card " + plain
        + " alt " + dashed
        + " ref " + short
        + " serial " + longrun
    )


py = {}
for doc_id, text in rows:
    py[doc_id] = scrub(mk_text(doc_id, text))

SQL = f"""
WITH src AS (
  SELECT doc_id,
         text || ' card ' || substr(translate(md5(doc_id::VARCHAR), 'abcdef', '012345'), 1, 15)
              || ' alt '  || substr(translate(md5(doc_id::VARCHAR), 'abcdef', '012345'), 1, 4) || '-'
                          || substr(translate(md5(doc_id::VARCHAR), 'abcdef', '012345'), 5, 4) || '-'
                          || substr(translate(md5(doc_id::VARCHAR), 'abcdef', '012345'), 9, 4) || '-'
                          || substr(translate(md5(doc_id::VARCHAR), 'abcdef', '012345'), 13, 4)
              || ' ref '  || substr(translate(md5(doc_id::VARCHAR), 'abcdef', '012345'), 1, 8)
              || ' serial ' || translate(md5(doc_id::VARCHAR), 'abcdef', '012345')
                            || substr(translate(md5(doc_id::VARCHAR), 'abcdef', '012345'), 1, 8)
         AS t
  FROM documents
),
m AS (
  SELECT doc_id, t,
         regexp_split_to_array(t, '{CAND}') AS parts,
         regexp_extract_all(t, '{CAND}') AS cands
  FROM src
),
v AS (
  SELECT doc_id, parts, cands,
    list_transform(cands, c -> (
      list_sum(list_transform(range(1, length(regexp_replace(c, '[^0-9]', '', 'g')) + 1),
        i -> CASE WHEN i % 2 = 0
             THEN CASE WHEN 2 * (ascii(array_extract(reverse(regexp_replace(c, '[^0-9]', '', 'g')), i)) - 48) > 9
                       THEN 2 * (ascii(array_extract(reverse(regexp_replace(c, '[^0-9]', '', 'g')), i)) - 48) - 9
                       ELSE 2 * (ascii(array_extract(reverse(regexp_replace(c, '[^0-9]', '', 'g')), i)) - 48) END
             ELSE ascii(array_extract(reverse(regexp_replace(c, '[^0-9]', '', 'g')), i)) - 48 END
      )) % 10 = 0
    )) AS valid
  FROM m
),
s AS (
  SELECT doc_id,
    parts[1] || list_reduce(
      list_prepend('', list_transform(range(1, len(cands) + 1),
        i -> (CASE WHEN valid[i] THEN '<CC>' ELSE cands[i] END) || parts[i + 1])),
      (a, b) -> a || b) AS scrubbed,
    len(cands)::BIGINT AS n_cands,
    len(list_filter(valid, x -> x))::BIGINT AS n_valid
  FROM v
)
SELECT doc_id, scrubbed, n_cands, n_valid FROM s ORDER BY doc_id
"""
dk = {r[0]: (r[1], r[2], r[3]) for r in con.execute(SQL).fetchall()}

bad = 0
for doc_id, pv in py.items():
    dv = dk[doc_id]
    if pv != dv:
        bad += 1
        if bad <= 3:
            print("MISMATCH", doc_id)
            print("  py  =", repr(pv)[-220:])
            print("  duck=", repr(dv)[-220:])
print(f"docs={len(py)} mismatches={bad}")
from collections import Counter

print("(n_cands, n_valid) dist:", Counter((v[1], v[2]) for v in py.values()).most_common(8))
