"""Goldens for chunk_documents and pack_offsets (training-sequence
preparation)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from dataqualitykit_spark.operators.packing import chunk_documents, pack_offsets


def test_chunk_documents_goldens(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e f g"),   # 7 tokens, max 3 -> 3/3/1
            (2, "one  two\nthree"), # whitespace normalizes to spaces
            (3, None),
            (4, "   "),
            (5, "solo"),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r["id"], r["chunk_id"]): (r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(df, 3).collect()
    }
    assert rows[(1, 0)] == ("a b c", 3)
    assert rows[(1, 1)] == ("d e f", 3)
    assert rows[(1, 2)] == ("g", 1)
    assert rows[(2, 0)] == ("one two three", 3)
    assert rows[(5, 0)] == ("solo", 1)
    # token-less docs emit nothing
    assert not any(i in (3, 4) for i, _ in rows)
    # round trip: joined chunks reproduce the token sequence
    assert " ".join(rows[(1, j)][0] for j in range(3)) == "a b c d e f g"


def test_chunk_documents_rejects_bad_max(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, 0)


def test_pack_offsets_matches_one_window_mirror(spark):
    rows = [(i, ["en", "de", None][i % 3], "w " * (i % 7 + 1)) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        r["doc_id"]: (r["offset"], r["seq_id"], r["seq_pos"], r["n_tokens"])
        for r in pack_offsets(df, 10, by="lang").collect()
    }
    # python mirror: per group, (md5(str(id)), id) order, exclusive cumsum
    from dataqualitykit_spark.semantics import tokenize

    by_g: dict = {}
    for i, g, t in rows:
        by_g.setdefault(g, []).append(i)
    for g, ids in by_g.items():
        ids.sort(key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        run = 0
        for i in ids:
            n = got[i][3]
            assert got[i] == (run, run // 10, run % 10, n), (i, got[i], run)
            run += n
    # offsets within a group are dense: max offset + its tokens == total
    for g, ids in by_g.items():
        total = sum(got[i][3] for i in ids)
        last = max(ids, key=lambda i: got[i][0])
        assert got[last][0] + got[last][3] == total


def test_pack_offsets_global_stream_and_buckets(spark):
    df = spark.range(0, 3000).select(
        F.col("id").alias("doc_id"), F.lit("t t t").alias("text")
    )
    out = pack_offsets(df, 7, by=None, bucket_chars=1)  # 16 buckets
    stats = out.agg(
        F.min("offset").alias("lo"),
        F.max(F.col("offset") + F.col("n_tokens")).alias("hi"),
        F.countDistinct("offset").alias("n"),
    ).collect()[0]
    # exclusive prefix sum over 3000 docs x 3 tokens: dense, no gaps
    assert (stats["lo"], stats["hi"], stats["n"]) == (0, 9000, 3000)
