"""Hand-computed goldens for the Gopher repetition metrics and the
C4-style line filter (training-data op family; driver oracles
`gopher_repetition` / `c4_line_filter` cross-check at sf0.01)."""

from __future__ import annotations

from dataqualitykit_spark.operators.c4_filter import c4_line_filter
from dataqualitykit_spark.operators.repetition import repetition_metrics


def _by_id(rows):
    return {r["id"]: r.asDict() for r in rows}


def test_repetition_metrics_goldens(spark):
    df = spark.createDataFrame(
        [
            (1, "a b\na b\nc d e\n\n"),
            (2, "x y z w v x y z w v"),
            (3, None),
            (4, "hi"),
        ],
        "doc_id long, text string",
    )
    out = _by_id(repetition_metrics(df).collect())
    assert len(out) == 4

    r1 = out[1]
    # lines: ['a b','a b','c d e'] -> 3 lines, 2 distinct
    assert r1["n_lines"] == 3
    assert r1["dup_line_frac"] == round(1 / 3, 6)
    # chars in duplicated lines: both 'a b' (3+3) over 3+3+5=11
    assert r1["dup_line_char_frac"] == round(6 / 11, 6)
    # 7 words -> 3 distinct 5-grams, no dup
    assert r1["dup_5gram_frac"] == 0.0
    # 'a b' 2-gram occurs twice: 2*3 chars over len(text)=15
    assert r1["top_2gram_char_frac"] == round(6 / 15, 6)

    r2 = out[2]
    assert r2["n_lines"] == 1
    assert r2["dup_line_frac"] == 0.0
    # 10 words -> 6 5-grams, 'x y z w v' repeats -> 5 distinct
    assert r2["dup_5gram_frac"] == round(1 / 6, 6)
    # best repeated 2-gram: count 2 * 3 chars over 19 chars
    assert r2["top_2gram_char_frac"] == round(6 / 19, 6)

    r3 = out[3]  # NULL text -> zeros
    assert (
        r3["n_lines"],
        r3["dup_line_frac"],
        r3["dup_line_char_frac"],
        r3["dup_5gram_frac"],
        r3["top_2gram_char_frac"],
    ) == (0, 0.0, 0.0, 0.0, 0.0)

    r4 = out[4]  # single word: whole-text grams, nothing repeats
    assert r4["dup_5gram_frac"] == 0.0
    assert r4["top_2gram_char_frac"] == 0.0


def test_c4_line_filter_goldens(spark):
    doc_a = (
        "This is a good sentence.\n"
        "short\n"
        "Bad javascript line here.\n"
        "Another fine line works!\n"
        "No punct line here"
    )
    doc_b = (
        "One fine sentence here.\n"
        "Two fine sentences here.\n"
        "Three fine sentences here."
    )
    doc_c = (
        "Lorem ipsum dolor sit amet.\n"
        "Good sentence number two here.\n"
        "Good sentence number three here."
    )
    doc_e = (
        "Code sample {x} found here.\n"
        "Another good sentence here.\n"
        "Third good sentence here."
    )
    df = spark.createDataFrame(
        [(1, doc_a), (2, doc_b), (3, doc_c), (4, None), (5, doc_e)],
        "doc_id long, text string",
    )
    out = _by_id(c4_line_filter(df).collect())

    a = out[1]
    assert a["cleaned_text"] == (
        "This is a good sentence.\nAnother fine line works!"
    )
    assert (a["n_lines_kept"], a["n_lines_dropped"]) == (2, 3)
    # only 2 sentence ends survive -> dropped
    assert (a["keep"], a["drop_reason"]) == (False, "too_few_sentences")

    b = out[2]
    assert b["cleaned_text"] == doc_b
    assert (b["keep"], b["drop_reason"]) == (True, None)
    assert (b["n_lines_kept"], b["n_lines_dropped"]) == (3, 0)

    c = out[3]  # every line survives, then the doc-level ban fires
    assert c["n_lines_kept"] == 3
    assert (c["keep"], c["drop_reason"]) == (False, "policy_phrase")

    d = out[4]
    assert d["cleaned_text"] is None
    assert (d["keep"], d["drop_reason"]) == (False, "missing_text")
    assert (d["n_lines_kept"], d["n_lines_dropped"]) == (0, 0)

    e = out[5]  # '{' marker -> source-code page
    assert (e["keep"], e["drop_reason"]) == (False, "policy_phrase")


def test_c4_quoted_line_end_kept(spark):
    df = spark.createDataFrame(
        [(1, 'She said "go home"\nAnd then a second sentence.\nAnd then a third one arrived.')],
        "doc_id long, text string",
    )
    r = _by_id(c4_line_filter(df).collect())[1]
    # quote counts as terminal punctuation -> the line survives
    assert r["n_lines_kept"] == 3


def _budget_oracle(rows, budget):
    """One-window mirror of sample_to_token_budget: per lang, order by
    (md5(id), id), keep while inclusive cumsum <= budget."""
    import hashlib
    import re
    from collections import defaultdict

    pat = re.compile(
        r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\r\x0b\f]+"
    )
    by_lang = defaultdict(list)
    for doc_id, lang, text in rows:
        ntok = len(pat.findall(text)) if text is not None else 0
        key = hashlib.md5(str(doc_id).encode()).hexdigest()
        by_lang[lang].append((key, doc_id, ntok))
    kept = {}
    for lang, docs in by_lang.items():
        run = 0
        for key, doc_id, ntok in sorted(docs):
            run += ntok  # prefix-CUT semantics: inclusive cumsum <= budget
            if run <= budget:
                kept[doc_id] = ntok
    return kept


def test_sample_to_token_budget_matches_one_window_oracle(spark):
    from dataqualitykit_spark.operators.sampling import sample_to_token_budget

    rows = [
        (i, ["en", "de", "fr"][i % 3], "word " * (5 + (i * 7) % 40))
        for i in range(120)
    ] + [(997, "en", None)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    for budget in (0, 50, 400, 10**9):
        got = {
            r["doc_id"]: r["n_tokens"]
            for r in sample_to_token_budget(df, budget).collect()
        }
        want = _budget_oracle(rows, budget)
        assert got == want, (budget, len(got), len(want))


def test_filter_blocked_domains(spark):
    from dataqualitykit_spark.operators.url_filter import filter_blocked_domains

    df = spark.createDataFrame(
        [
            (1, "https://spam.example.com/page"),      # subdomain of blocked
            (2, "https://example.com/else"),           # exact blocked
            (3, "https://fine.example.org/x"),         # unrelated
            (4, "https://notexample.com/x"),           # suffix must be label-wise
            (5, "https://Sub.BLOCKED.net/y"),          # case-insensitive
        ],
        "doc_id long, url string",
    )
    out = filter_blocked_domains(df, ["example.com", "blocked.net"])
    assert {r["doc_id"] for r in out.collect()} == {3, 4}

    labeled = filter_blocked_domains(
        df, ["example.com", "blocked.net"], label_only=True
    )
    got = {r["doc_id"]: r["blocked_domain"] for r in labeled.collect()}
    assert got == {1: True, 2: True, 3: False, 4: False, 5: True}
