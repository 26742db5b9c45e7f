#!/usr/bin/env python
"""Prototype: python-vs-DuckDB parity for the corpus-trained stupid-backoff
trigram LM BEFORE wiring Spark (round-5 lesson: de-risk float oracles by
prototyping engine parity first).

Design under test:
- tokenize: regexp [A-Za-z]+ then ASCII lowercase (dodges unicode lower()
  divergence; DuckDB RE2 and python re agree on this trivial class).
- vocab: top-V unigrams by (count DESC, word ASC); tokens outside vocab
  become '<unk>' BEFORE n-gram counting (KenLM-style closed vocab).
- counts: unigram (all), bigram/trigram capped top-K by
  (count DESC, keys ASC).
- score per token (stupid backoff, penalty ln(0.4) per backoff level from
  the highest AVAILABLE order at that position):
    pos>=2 and tri+ctx2 present:          ln(tri/ctx2)
    bigram+ctx present:                   k*ln(0.4) + ln(bi/uni_ctx)
                                          (k = 1 if pos>=2 else 0)
    else:                                 m*ln(0.4) + ln((c+1)/(total+V+1))
                                          (m = min(pos,2))
- per-doc sum = LEFT FOLD in token order; avg = sum/n; round
  floor(x*1e6+0.5)/1e6 on both sides.
"""
import math
import re
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
V_CAP, B_CAP, T_CAP = 4096, 8192, 8192  # small caps so capping actually bites

con = duckdb.connect()
con.execute(
    f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
)
rows = con.execute("SELECT doc_id, text FROM documents ORDER BY doc_id").fetchall()

TOK = re.compile(r"[A-Za-z]+")


def toks(t):
    return [m.lower() for m in TOK.findall(t or "")]


# ---- python training ----
from collections import Counter

uni_raw = Counter()
for _, t in rows:
    uni_raw.update(toks(t))
vocab = set(
    w for w, _ in sorted(uni_raw.items(), key=lambda kv: (-kv[1], kv[0]))[:V_CAP]
)
uni, bi, tri = Counter(), Counter(), Counter()
for _, t in rows:
    ws = [w if w in vocab else "<unk>" for w in toks(t)]
    uni.update(ws)
    bi.update(zip(ws, ws[1:]))
    tri.update(zip(ws, ws[1:], ws[2:]))
bi = dict(sorted(bi.items(), key=lambda kv: (-kv[1], kv[0]))[:B_CAP])
tri = dict(sorted(tri.items(), key=lambda kv: (-kv[1], kv[0]))[:T_CAP])
total = sum(uni.values())
LN04 = math.log(0.4)


def score(t):
    ws = [w if w in vocab else "<unk>" for w in toks(t)]
    n = len(ws)
    if n == 0:
        return (0, 0, 0, 0, None)
    n_tri = n_bi = n_uni = 0
    s = 0.0
    first = True
    for i, w in enumerate(ws):
        if i >= 2 and (ws[i - 2], ws[i - 1], w) in tri and (ws[i - 2], ws[i - 1]) in bi:
            term = math.log(tri[(ws[i - 2], ws[i - 1], w)] / bi[(ws[i - 2], ws[i - 1])])
            n_tri += 1
        elif i >= 1 and (ws[i - 1], w) in bi and ws[i - 1] in uni:
            k = 1 if i >= 2 else 0
            term = k * LN04 + math.log(bi[(ws[i - 1], w)] / uni[ws[i - 1]])
            n_bi += 1
        else:
            m = min(i, 2)
            term = m * LN04 + math.log((uni.get(w, 0) + 1) / (total + V_CAP + 1))
            n_uni += 1
        if first:
            s = term
            first = False
        else:
            s = s + term
    avg = s / n
    return (n, n_tri, n_bi, n_uni, math.floor(avg * 1e6 + 0.5) / 1e6)


py = {doc_id: score(t) for doc_id, t in rows}

# ---- DuckDB mirror ----
SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws, 1) - 1 AS pos FROM (
    SELECT doc_id,
           list_transform(regexp_extract_all(text, '[A-Za-z]+'), x -> lower(x)) AS ws
    FROM documents
  )
),
uni_raw AS (SELECT w, count(*)::BIGINT AS c FROM tok GROUP BY w),
vocab AS (SELECT w FROM uni_raw ORDER BY c DESC, w ASC LIMIT {V_CAP}),
vtok AS (
  SELECT t.doc_id, t.pos,
         CASE WHEN v.w IS NULL THEN '<unk>' ELSE t.w END AS w
  FROM tok t LEFT JOIN vocab v USING (w)
),
uni AS (SELECT w, count(*)::BIGINT AS c FROM vtok GROUP BY w),
total AS (SELECT sum(c)::BIGINT AS tot FROM uni),
ctx AS (
  SELECT doc_id, pos, w,
         lag(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2,
         lag(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w1
  FROM vtok
),
bi AS (
  SELECT w2 AS a, w AS b, count(*)::BIGINT AS c FROM ctx WHERE w2 IS NOT NULL
  GROUP BY 1, 2 ORDER BY c DESC, a ASC, b ASC LIMIT {B_CAP}
),
tri AS (
  SELECT w1 AS a, w2 AS b, w AS cc, count(*)::BIGINT AS c FROM ctx WHERE w1 IS NOT NULL
  GROUP BY 1, 2, 3 ORDER BY c DESC, a ASC, b ASC, cc ASC LIMIT {T_CAP}
),
terms AS (
  SELECT c.doc_id, c.pos,
    CASE
      WHEN c.pos >= 2 AND t3.c IS NOT NULL AND b2.c IS NOT NULL
        THEN 0
      WHEN b3.c IS NOT NULL AND u2.c IS NOT NULL THEN 1
      ELSE 2 END AS leg,
    CASE
      WHEN c.pos >= 2 AND t3.c IS NOT NULL AND b2.c IS NOT NULL
        THEN ln(t3.c::DOUBLE / b2.c)
      WHEN b3.c IS NOT NULL AND u2.c IS NOT NULL
        THEN (CASE WHEN c.pos >= 2 THEN 1 ELSE 0 END) * ln(0.4)
             + ln(b3.c::DOUBLE / u2.c)
      ELSE least(c.pos, 2) * ln(0.4)
           + ln((coalesce(u3.c, 0) + 1)::DOUBLE / (tot + {V_CAP} + 1))
    END AS term
  FROM ctx c
  CROSS JOIN total
  LEFT JOIN tri t3 ON c.pos >= 2 AND t3.a = c.w1 AND t3.b = c.w2 AND t3.cc = c.w
  LEFT JOIN bi b2 ON c.pos >= 2 AND b2.a = c.w1 AND b2.b = c.w2
  LEFT JOIN bi b3 ON c.pos >= 1 AND b3.a = c.w2 AND b3.b = c.w
  LEFT JOIN uni u2 ON c.pos >= 1 AND u2.w = c.w2
  LEFT JOIN uni u3 ON u3.w = c.w
),
per_doc AS (
  SELECT doc_id,
         count(*)::BIGINT AS n_tokens,
         sum(CASE WHEN leg = 0 THEN 1 ELSE 0 END)::BIGINT AS n_tri,
         sum(CASE WHEN leg = 1 THEN 1 ELSE 0 END)::BIGINT AS n_bi,
         sum(CASE WHEN leg = 2 THEN 1 ELSE 0 END)::BIGINT AS n_uni,
         floor(list_reduce(list(term ORDER BY pos), (x, y) -> x + y)
               / count(*) * 1e6 + 0.5) / 1e6 AS avg_lp
  FROM terms GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(p.n_tokens, 0) AS n_tokens,
       coalesce(p.n_tri, 0) AS n_tri,
       coalesce(p.n_bi, 0) AS n_bi,
       coalesce(p.n_uni, 0) AS n_uni,
       p.avg_lp
FROM documents d LEFT JOIN per_doc p USING (doc_id) ORDER BY d.doc_id
"""
dk = {r[0]: tuple(r[1:]) for r in con.execute(SQL).fetchall()}

bad = 0
for doc_id, pv in py.items():
    dv = dk[doc_id]
    if pv != dv:
        bad += 1
        if bad <= 5:
            print("MISMATCH", doc_id, "py=", pv, "duck=", dv)
print(f"docs={len(py)} mismatches={bad}")
n_unk_path = sum(1 for v in py.values() if v[3] > 0)
print("docs using unigram/backoff floor:", n_unk_path,
      "| tri-hit tokens:", sum(v[1] for v in py.values()),
      "| bi:", sum(v[2] for v in py.values()),
      "| uni:", sum(v[3] for v in py.values()))
