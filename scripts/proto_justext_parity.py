#!/usr/bin/env python
"""Prototype: python-vs-DuckDB parity for a jusText-style per-block
boilerplate classifier BEFORE wiring Spark (the round-5 recipe: de-risk
regex/float oracles by prototyping engine parity first).

Design under test (context-lite jusText; Pomikalek 2011 thresholds):
- segment: regexp split on block-level tags (non-capturing, (?i) inline).
- per block: visible text = strip remaining tags; trim ASCII whitespace.
  link_chars = visible chars inside <a>...</a> (the proven
  ANCHOR_INNER_REGEX/TAG_STRIP_REGEX pair from functions/text.py).
- core class:
    empty (no visible chars)                  -> skip (not a block)
    link_density > 0.2                        -> bad
    n_chars < 70                              -> short
    stop_density >= 0.32 and n_chars > 200    -> good
    stop_density >= 0.30                      -> neargood
    else                                      -> bad
- context-lite pass: short/neargood promote to good iff an ADJACENT
  block's core class is good (one pass, not jusText's full propagation —
  documented simplification; block-sequence-local so it stays one Arrow
  pass / one window chain).
- extracted = '\n'.join(visible of final-good blocks).
"""
import math
import re
import sys

import duckdb

sys.path.insert(0, "/root/repo")
from dataqualitykit_spark import semantics as S

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

BLOCK_SPLIT_REGEX = (
    r"(?i)<(?:/?)(?:p|div|h[1-6]|ul|ol|li|table|thead|tbody|tr|td|th|"
    r"blockquote|article|section|header|footer|nav|aside|form|pre|br)"
    r"(?:\s[^>]*)?/?>"
)
ANCHOR_INNER = r"(?is)<a(?:\s[^>]*)?>(.*?)</a>"
TAG_STRIP = r"(?s)<[^>]*>"
WS_TRIM = r"^[ \t\n\r\x0b\f]+|[ \t\n\r\x0b\f]+$"
WS_SPLIT = r"[ \t\n\r\x0b\f]+"

_block_re = re.compile(BLOCK_SPLIT_REGEX)
_anchor_re = re.compile(ANCHOR_INNER)
_tag_re = re.compile(TAG_STRIP)
_trim_re = re.compile(WS_TRIM)
_ws_re = re.compile(WS_SPLIT)

STOP = S.STOPWORDS_EN


def py_blocks(html):
    out = []
    for seg in _block_re.split(html or ""):
        link_chars = sum(
            len(_tag_re.sub("", m)) for m in _anchor_re.findall(seg)
        )
        visible = _trim_re.sub("", _tag_re.sub("", seg))
        if not visible:
            continue
        n = len(visible)
        words = [w for w in _ws_re.split(visible) if w]
        stops = sum(1 for w in words if w.lower() in STOP)
        sd = stops / len(words) if words else 0.0
        ld = link_chars / n
        if ld > 0.2:
            core = "bad"
        elif n < 70:
            core = "short"
        elif sd >= 0.32 and n > 200:
            core = "good"
        elif sd >= 0.30:
            core = "neargood"
        else:
            core = "bad"
        out.append((visible, n, round(ld, 6), round(sd, 6), core))
    # context-lite promotion
    final = []
    for i, (v, n, ld, sd, core) in enumerate(out):
        if core in ("short", "neargood"):
            prev_g = i > 0 and out[i - 1][4] == "good"
            next_g = i + 1 < len(out) and out[i + 1][4] == "good"
            final.append("good" if (prev_g or next_g) else "bad")
        else:
            final.append(core)
    return [
        (v, n, ld, sd, core, fin)
        for (v, n, ld, sd, core), fin in zip(out, final)
    ]


def py_extract(html):
    bs = py_blocks(html)
    good = [v for (v, n, ld, sd, c, f) in bs if f == "good"]
    return (
        len(bs),
        sum(1 for b in bs if b[5] == "good"),
        "\n".join(good) if good else None,
    )


# ---- synthesize html from documents (deterministic; same recipe both
# engines: the SQL builds the identical string) ----
con = duckdb.connect()
con.execute(
    f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
)
stop_list = ", ".join("'" + w + "'" for w in sorted(STOP))

HTML_SQL = """
  '<div class="nav"><a href="/">home</a> <a href="/x">next page</a></div>'
  || '<h1>' || substr(text, 1, 40) || '</h1>'
  || '<p>' || text || '</p>'
  || '<p>short note</p>'
  || '<footer><a href="/about">about this site and the team</a></footer>'
"""


def py_html(text):
    return (
        '<div class="nav"><a href="/">home</a> <a href="/x">next page</a></div>'
        + "<h1>" + (text or "")[:40] + "</h1>"
        + "<p>" + (text or "") + "</p>"
        + "<p>short note</p>"
        + '<footer><a href="/about">about this site and the team</a></footer>'
    )


rows = con.execute("SELECT doc_id, text FROM documents ORDER BY doc_id").fetchall()
py = {}
for doc_id, text in rows:
    nb, ng, ext = py_extract(py_html(text))
    py[doc_id] = (nb, ng, ext)

SQL = f"""
WITH src AS (
  SELECT doc_id, {HTML_SQL} AS html FROM documents
),
segs AS (
  SELECT doc_id, unnest(regexp_split_to_array(html,
           '(?i)<(?:/?)(?:p|div|h[1-6]|ul|ol|li|table|thead|tbody|tr|td|th|blockquote|article|section|header|footer|nav|aside|form|pre|br)(?:\\s[^>]*)?/?>'
         )) AS seg,
         generate_subscripts(regexp_split_to_array(html,
           '(?i)<(?:/?)(?:p|div|h[1-6]|ul|ol|li|table|thead|tbody|tr|td|th|blockquote|article|section|header|footer|nav|aside|form|pre|br)(?:\\s[^>]*)?/?>'
         ), 1) AS pos
  FROM src
),
metrics AS (
  SELECT doc_id, pos,
    regexp_replace(regexp_replace(seg, '(?s)<[^>]*>', '', 'g'),
                   '^[ \\t\\n\\r\\x0b\\f]+|[ \\t\\n\\r\\x0b\\f]+$', '', 'g') AS visible,
    list_sum(list_transform(regexp_extract_all(seg, '(?is)<a(?:\\s[^>]*)?>(.*?)</a>', 1),
                            m -> length(regexp_replace(m, '(?s)<[^>]*>', '', 'g')))) AS link_chars
  FROM segs
),
blocks AS (
  SELECT doc_id, pos, visible,
         length(visible) AS n,
         coalesce(link_chars, 0) AS link_chars,
         list_filter(regexp_split_to_array(visible, '[ \\t\\n\\r\\x0b\\f]+'),
                     w -> w <> '') AS words
  FROM metrics WHERE length(visible) > 0
),
scored AS (
  SELECT doc_id, pos, visible, n,
    round(link_chars::DOUBLE / n, 6) AS ld,
    round(CASE WHEN len(words) = 0 THEN 0.0
          ELSE len(list_filter(words, w -> list_contains([{stop_list}], lower(w))))::DOUBLE
               / len(words) END, 6) AS sd
  FROM blocks
),
core AS (
  SELECT doc_id, pos, visible, n, ld, sd,
    CASE WHEN ld > 0.2 THEN 'bad'
         WHEN n < 70 THEN 'short'
         WHEN sd >= 0.32 AND n > 200 THEN 'good'
         WHEN sd >= 0.30 THEN 'neargood'
         ELSE 'bad' END AS core
  FROM scored
),
ctx AS (
  SELECT doc_id, pos, visible, core,
    lag(core) OVER (PARTITION BY doc_id ORDER BY pos) AS prev_c,
    lead(core) OVER (PARTITION BY doc_id ORDER BY pos) AS next_c
  FROM core
),
final AS (
  SELECT doc_id, pos, visible,
    CASE WHEN core IN ('short', 'neargood')
         THEN CASE WHEN prev_c = 'good' OR next_c = 'good' THEN 'good' ELSE 'bad' END
         ELSE core END AS fin
  FROM ctx
),
agg AS (
  SELECT doc_id, count(*)::BIGINT AS n_blocks,
         sum(CASE WHEN fin = 'good' THEN 1 ELSE 0 END)::BIGINT AS n_good,
         string_agg(CASE WHEN fin = 'good' THEN visible END, chr(10) ORDER BY pos) AS extracted
  FROM final GROUP BY doc_id
)
SELECT d.doc_id, coalesce(a.n_blocks, 0) AS n_blocks,
       coalesce(a.n_good, 0) AS n_good, a.extracted
FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id
"""
dk = {r[0]: (r[1], r[2], r[3]) for r in con.execute(SQL).fetchall()}

bad = 0
for doc_id, pv in py.items():
    dv = dk[doc_id]
    if pv != dv:
        bad += 1
        if bad <= 3:
            print("MISMATCH", doc_id)
            print("  py  =", repr(pv)[:300])
            print("  duck=", repr(dv)[:300])
print(f"docs={len(py)} mismatches={bad}")
from collections import Counter

print("n_good dist:", Counter(v[1] for v in py.values()).most_common(6))
