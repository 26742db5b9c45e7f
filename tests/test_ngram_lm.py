"""Corpus-trained stupid-backoff trigram LM (operators/ngram_lm.py).

Covers: hand-computed scoring goldens (every backoff leg), Spark-vs-python
training parity under cap pressure and across partitionings, Arrow scoring
parity, the KenLM perplexity interface, and the pipeline ppl seam.
"""

from __future__ import annotations

import math

import pytest

from dataqualitykit_spark.operators import ngram_lm
from dataqualitykit_spark.operators.ngram_lm import (
    UNK,
    NgramLM,
    py_train,
    score_documents,
    tokens_of,
    train_ngram_lm,
)

LN04 = math.log(0.4)


def _r6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


# a corpus where caps bite: 'zz'/'qq' words are rare and fall out of a
# small vocab; repeated phrases give real trigram mass
CORPUS = [
    "the cat sat on the mat",
    "the cat sat on the hat",
    "the dog sat on the mat",
    "a cat and a dog",
    "zz qq zz qq unseen rare words here",
    "the cat sat on the mat again and again",
    "",
    "THE CAT SAT",  # case folds into the same counts
]


def test_tokens_of():
    assert tokens_of("Hello, World! 42 foo_bar") == ["hello", "world", "foo", "bar"]
    assert tokens_of(None) == []
    assert tokens_of("") == []
    assert tokens_of("1234 5678") == []


def test_scoring_goldens_all_legs():
    """Hand-built model; verify each backoff leg's exact term."""
    m = NgramLM(
        vocab={"a", "b", "c"},
        uni={"a": 10, "b": 5, "c": 3, UNK: 2},
        bi={("a", "b"): 4, ("b", "c"): 2},
        tri={("a", "b", "c"): 1},
        total=20,
        v_cap=3,
    )
    # doc 'a b c':
    #   pos0 'a': unigram leg, m=0: ln((10+1)/(20+3+1))
    #   pos1 'b': bigram (a,b) present, k=0: ln(4/10)
    #   pos2 'c': trigram (a,b,c) + ctx bigram (a,b): ln(1/4)
    n, n_tri, n_bi, n_uni, avg = m.score_details("a b c")
    assert (n, n_tri, n_bi, n_uni) == (3, 1, 1, 1)
    exp = (math.log(11 / 24) + math.log(4 / 10) + math.log(1 / 4)) / 3
    assert avg == _r6(exp)

    # doc 'b c a': pos2 'a' has no trigram and no bigram (c,a) ->
    # unigram leg with m=2 (two backoff penalties)
    n, n_tri, n_bi, n_uni, avg = m.score_details("b c a")
    assert (n, n_tri, n_bi, n_uni) == (3, 0, 1, 2)
    exp = (
        math.log((5 + 1) / 24)          # pos0 'b', m=0
        + math.log(2 / 5)               # pos1 (b,c), k=0
        + (2 * LN04 + math.log(11 / 24))  # pos2 'a', m=2
    ) / 3
    assert avg == _r6(exp)

    # OOV word 'x' -> <unk>; unk IS in uni (closed vocab training)
    n, n_tri, n_bi, n_uni, avg = m.score_details("x")
    assert (n, n_tri, n_bi, n_uni) == (1, 0, 0, 1)
    assert avg == _r6(math.log((2 + 1) / 24))

    # scoring-time word absent even from uni -> add-one floor
    m2 = NgramLM(vocab={"x"}, uni={"x": 1}, bi={}, tri={}, total=1, v_cap=1)
    n, _, _, _, avg = m2.score_details("x")
    assert avg == _r6(math.log(2 / 3))

    assert m.score_details("") == (0, 0, 0, 0, None)
    assert m.score_details(None) == (0, 0, 0, 0, None)


def test_bigram_leg_penalty_at_pos_ge_2():
    """pos>=2 falling to the bigram leg pays exactly one ln(0.4)."""
    m = NgramLM(
        vocab={"a", "b"},
        uni={"a": 4, "b": 4},
        bi={("a", "b"): 2, ("b", "a"): 2},
        tri={},
        total=8,
        v_cap=2,
    )
    n, n_tri, n_bi, n_uni, avg = m.score_details("a b a")
    assert (n_tri, n_bi, n_uni) == (0, 2, 1)
    exp = (
        math.log(5 / 11)                 # pos0 'a'
        + math.log(2 / 4)                # pos1 (a,b), k=0
        + (LN04 + math.log(2 / 4))       # pos2 (b,a), k=1
    ) / 3
    assert avg == _r6(exp)


def test_perplexity_interface():
    m = py_train(CORPUS, v_cap=100, b_cap=100, t_cap=100)
    avg = m.avg_logprob("the cat sat on the mat")
    assert avg is not None
    assert m.perplexity("the cat sat on the mat") == math.exp(-avg)
    # empty text -> finite worst-case floor, not an exception
    floor = m.perplexity("")
    assert math.isfinite(floor) and floor > 1.0


def test_py_train_cap_pressure_and_ties():
    m = py_train(CORPUS, v_cap=5, b_cap=6, t_cap=4)
    assert len(m.vocab) == 5
    assert len(m.bi) == 6 and len(m.tri) == 4
    # vocab is top-5 by (count desc, word asc); rare words excluded
    assert "zz" not in m.vocab and "qq" not in m.vocab
    assert "the" in m.vocab
    # totals include unk-substituted tokens
    assert m.total == sum(len(tokens_of(t)) for t in CORPUS)
    assert UNK in m.uni


@pytest.mark.parametrize("nparts", [1, 7])
def test_spark_training_matches_py_train(spark, nparts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    ).repartition(nparts)
    got = train_ngram_lm(df, v_cap=5, b_cap=6, t_cap=4)
    exp = py_train(CORPUS, v_cap=5, b_cap=6, t_cap=4)
    assert got.vocab == exp.vocab
    assert got.uni == exp.uni
    assert got.bi == exp.bi
    assert got.tri == exp.tri
    assert got.total == exp.total


def test_score_documents_matches_mirror(spark):
    m = py_train(CORPUS, v_cap=5, b_cap=6, t_cap=4)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: (
            r["n_tokens"], r["n_tri"], r["n_bi"], r["n_uni"], r["avg_logprob"]
        )
        for r in score_documents(df, m).collect()
    }
    for i, t in enumerate(CORPUS):
        assert rows[i] == m.score_details(t), f"doc {i}"


def test_ppl_seam_with_corpus_model(spark):
    """The trained model satisfies the KenLM seam: cfg.ppl_model_loader
    feeds lm_ppl through the fused scorer (udfs/scoring.py:166)."""
    from dataqualitykit_spark.udfs.scoring import scoring_udf

    m = py_train(CORPUS, v_cap=100, b_cap=100, t_cap=100)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS) if t], "doc_id long, text string"
    )
    udf = scoring_udf(ppl_model_loader=lambda: m)
    out = df.withColumn("_m", udf("text")).select("doc_id", "text", "_m.ppl")
    for r in out.collect():
        assert r["ppl"] == pytest.approx(m.perplexity(r["text"]), rel=1e-9)
