"""Column-algebra (functions/text.py) must agree with the Python mirrors
(semantics.py) on adversarial inputs — this parity is what makes the
oracle comparison meaningful."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dataqualitykit_spark import semantics as S
from dataqualitykit_spark.functions import text as T

ADVERSARIAL = [
    "",
    " ",
    "a",
    "the cat sat on the mat",
    "  leading and trailing  ",
    "tabs\tand\nnewlines\r\x0b\x0cmixed",
    "nbsp\xa0is not a separator",
    "line1\nline1\nline1\nline2",
    "\n\n\n",
    "sym!@#$%^&*()bols",
    "ünïcödé wörds hère",
    "a  double  spaces",
    "NA",
    "ALL CAPS THE AND OF",
    "x" * 500,
    "word " * 100,
]


@pytest.fixture(scope="module")
def metrics_rows(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(ADVERSARIAL)], "id int, t string")
    out = df.select(
        "id",
        T.char_count(F.col("t")).alias("n_chars"),
        T.word_count(F.col("t")).alias("n_words"),
        T.mean_word_length(F.col("t")).alias("mwl"),
        T.symbol_count(F.col("t")).alias("symbols"),
        T.line_count(F.col("t")).alias("n_lines"),
        T.distinct_line_ratio(F.col("t")).alias("dlr"),
        T.stopword_hits(F.col("t")).alias("sw"),
        T.boilerplate_hits(F.col("t")).alias("bp"),
        T.is_missing(F.col("t")).alias("missing"),
        T.content_hash(F.col("t")).alias("chash"),
    ).collect()
    return {r["id"]: r for r in out}


def test_parity(metrics_rows):
    for i, t in enumerate(ADVERSARIAL):
        r = metrics_rows[i]
        words = S.tokenize(t)
        assert r["n_chars"] == len(t), (i, t)
        assert r["n_words"] == len(words), (i, t)
        assert math.isclose(r["mwl"], S.mean_word_length(words), abs_tol=1e-9), (i, t)
        assert r["symbols"] == S.symbol_count(t), (i, t)
        n_lines, n_distinct = S.line_stats(t)
        assert r["n_lines"] == n_lines, (i, t)
        expected_dlr = 1.0 if n_lines == 0 else n_distinct / n_lines
        assert math.isclose(r["dlr"], expected_dlr, abs_tol=1e-9), (i, t)
        assert r["sw"] == S.stopword_hits(words), (i, t)
        assert r["bp"] == S.boilerplate_hits(t), (i, t)
        assert r["missing"] == S.is_missing(t), (i, t)
        assert r["chash"] == S.content_hash(t), (i, t)


def test_udf_parity(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ADVERSARIAL)], "id int, t string"
    )
    from dataqualitykit_spark.udfs import lang_ppl_udf, scrub_udf

    rows = df.select(
        "id", scrub_udf("t").alias("scrubbed"), lang_ppl_udf("t").alias("score")
    ).collect()
    for r in rows:
        t = ADVERSARIAL[r["id"]]
        assert r["scrubbed"] == S.scrub_text(t), r["id"]
        lang, conf = S.langid(t)
        assert r["score"]["lang"] == lang
        assert math.isclose(r["score"]["lang_conf"], conf, abs_tol=1e-12)
        assert math.isclose(r["score"]["ppl"], S.perplexity(t), rel_tol=1e-12)
