"""IVF-PQ/ADC ANN tests: planted-copy recall, determinism of the
RNG-free codebook fit, encode shape/NULL handling."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataqualitykit_spark.operators.similarity import (
    _pq_lloyd_fit,
    ivfpq_topk,
    pq_encode,
    pq_fit,
)


def _corpus_with_planted(spark, n_queries=5):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < n_queries)
    planted = queries.select(
        F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("_j"),
        "vec_id",
        "embedding",
    ).select(
        (F.lit(100000) + F.col("vec_id") * 10 + F.col("_j")).alias("vec_id"),
        "embedding",
    )
    return emb.select("vec_id", "embedding").unionByName(planted), queries


def test_ivfpq_planted_copies_in_topk(spark):
    corpus, queries = _corpus_with_planted(spark)
    out = ivfpq_topk(corpus, queries, k=5).collect()
    got = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in out}
    for q in range(5):
        for j in range(3):
            key = (q, 100000 + q * 10 + j)
            assert key in got, key
            assert got[key] == 1.0


def test_ivfpq_deterministic(spark):
    corpus, queries = _corpus_with_planted(spark, n_queries=3)
    a = sorted(map(tuple, ivfpq_topk(corpus, queries, k=5).collect()))
    b = sorted(map(tuple, ivfpq_topk(corpus, queries, k=5).collect()))
    assert a == b


def test_pq_fit_and_encode(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cb = pq_fit(emb, m=8, k_codes=16)
    assert cb.shape == (8, 16, 8)
    # deterministic: same input, same codebooks
    cb2 = pq_fit(emb, m=8, k_codes=16)
    assert np.array_equal(cb, cb2)
    withnull = emb.limit(10).withColumn(
        "embedding",
        F.when(F.col("vec_id") % 2 == 0, F.col("embedding")).cast(
            "array<double>"
        ),
    )
    rows = pq_encode(withnull, cb, vec_col="embedding").collect()
    for r in rows:
        if r["vec_id"] % 2 == 0:
            assert len(r["pq_code"]) == 8
            assert all(0 <= c < 16 for c in r["pq_code"])
        else:
            assert r["pq_code"] is None


def test_pq_fit_rejects_bad_dim(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with pytest.raises(ValueError, match="not divisible"):
        pq_fit(emb, m=7)


def test_pq_lloyd_fit_no_rng():
    mat = np.arange(200, dtype=np.float64).reshape(25, 8) % 13
    a = _pq_lloyd_fit(mat, 4)
    b = _pq_lloyd_fit(mat, 4)
    assert np.array_equal(a, b)
    assert a.shape == (4, 8)
    # an exact training row's nearest center reconstructs it closely
    d = ((mat[:, None, :] - a[None, :, :]) ** 2).sum(axis=2)
    assert float(d.min(axis=1).mean()) < float(((mat - mat.mean(0)) ** 2).sum(1).mean())


def test_semantic_decontamination(spark):
    from dataqualitykit_spark.operators.similarity import (
        semantic_decontamination,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    bench = emb.filter(F.col("vec_id") < 5)
    corpus = emb.select("vec_id", "embedding").unionByName(
        # a NULL-vector row must carry NULL/False, not crash the matmul
        spark.createDataFrame(
            [(999999, None)], "vec_id long, embedding array<float>"
        )
    )
    out = {
        r["id"]: (r["max_bench_cosine"], r["contaminated"])
        for r in semantic_decontamination(
            corpus, bench, threshold=0.8
        ).collect()
    }
    # bench members match themselves at exactly 1.0 after rounding
    for q in range(5):
        assert out[q] == (1.0, True)
    assert out[999999] == (None, False)
    # the near-orthogonal rest stays uncontaminated
    flagged = [i for i, (_, c) in out.items() if c]
    assert sorted(flagged) == [0, 1, 2, 3, 4]


def test_semantic_decontamination_empty_bench(spark):
    from dataqualitykit_spark.operators.similarity import (
        semantic_decontamination,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    bench = emb.filter(F.col("vec_id") < 0)  # empty
    out = semantic_decontamination(emb.limit(5), bench).collect()
    assert all(r["max_bench_cosine"] is None and not r["contaminated"] for r in out)
