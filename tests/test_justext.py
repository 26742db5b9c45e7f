"""jusText-style block classifier (operators/justext.py): per-class
goldens, context-lite promotion, and Arrow/mirror parity."""

from __future__ import annotations

from dataqualitykit_spark.operators.justext import (
    JusTextParams,
    justext_extract,
    py_blocks,
    py_extract,
)

# corpus-tuned params used across these goldens: every class reachable
# with short hand-written text
P = JusTextParams(
    length_low=20,
    length_high=60,
    stopwords_low=0.20,
    stopwords_high=0.30,
    max_link_density=0.2,
)

GOOD_TEXT = (
    "the quick brown fox and the lazy dog are in the yard with all of "
    "them watching"
)  # 80 chars, stopword-rich -> good at P


def test_segmentation_and_tag_strip():
    html = "<div>alpha</div><p>beta <b>bold</b></p><br>gamma"
    bs = py_blocks(html, P)
    assert [b[0] for b in bs] == ["alpha", "beta bold", "gamma"]


def test_good_block():
    bs = py_blocks(f"<p>{GOOD_TEXT}</p>", P)
    assert len(bs) == 1
    v, n, ld, sd, core, fin = bs[0]
    assert n > P.length_high and sd >= P.stopwords_high and ld == 0.0
    assert core == "good" and fin == "good"


def test_link_density_bad():
    html = '<p><a href="/x">click here for more of everything</a> now</p>'
    (v, n, ld, sd, core, fin), = py_blocks(html, P)
    assert ld > P.max_link_density
    assert core == "bad" and fin == "bad"


def test_short_promoted_next_to_good():
    html = f"<h1>tiny headline</h1><p>{GOOD_TEXT}</p>"
    bs = py_blocks(html, P)
    assert [b[4] for b in bs] == ["short", "good"]
    assert [b[5] for b in bs] == ["good", "good"]


def test_short_not_promoted_in_isolation():
    bs = py_blocks("<h1>tiny headline</h1><p>nostops nostops nostops here okay fine</p>", P)
    assert [b[4] for b in bs] == ["short", "bad"]
    assert [b[5] for b in bs] == ["bad", "bad"]


def test_neargood_promotion_both_sides():
    near = "the cat and dog sat with zqx wvu"  # 32 chars, sd>=0.20, <60
    html = f"<p>{near}</p><p>{GOOD_TEXT}</p><p>{near}</p>"
    bs = py_blocks(html, P)
    assert [b[4] for b in bs] == ["neargood", "good", "neargood"]
    assert [b[5] for b in bs] == ["good", "good", "good"]


def test_extract_and_empty():
    nb, ng, ext = py_extract(f"<p>{GOOD_TEXT}</p><footer><a href='/'>home page link</a></footer>", P)
    assert (nb, ng, ext) == (2, 1, GOOD_TEXT)
    assert py_extract("", P) == (0, 0, None)
    assert py_extract(None, P) == (0, 0, None)
    assert py_extract("<p>  </p><br>", P) == (0, 0, None)


def test_spark_matches_mirror(spark):
    docs = [
        (0, f"<div><a href='/'>nav nav nav</a></div><p>{GOOD_TEXT}</p><p>tail bit</p>"),
        (1, "<p>plain unstopworded wording everywhere throughout</p>"),
        (2, None),
        (3, "<p></p>"),
        (4, f"<h1>head</h1><p>{GOOD_TEXT}</p><footer><a href='/a'>all of the links</a></footer>"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, html string")
    got = {
        r["doc_id"]: (r["n_blocks"], r["n_good"], r["justext_text"])
        for r in justext_extract(df, "html", P).collect()
    }
    for i, h in docs:
        assert got[i] == py_extract(h, P), f"doc {i}"
