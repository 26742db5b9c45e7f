"""Compression-ratio signal: planted extreme classes, NULL/empty edges,
python-mirror parity, and partition-count determinism."""

from __future__ import annotations

from dataqualitykit_spark.operators.compression import (
    compression_ratio,
    compression_stats,
    py_compression,
)


def test_extreme_classes(spark):
    rows = [
        (0, "abcd" * 500),          # periodic -> tiny ratio
        (1, "x" * 2000),            # degenerate run -> even tinier
        (2, None),
        (3, ""),
        (4, "The quick brown fox jumps over the lazy dog. " * 10),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r for r in compression_ratio(df).collect()}
    assert got[0]["n_bytes"] == 2000 and got[0]["compress_ratio"] < 0.1
    assert got[1]["compress_ratio"] < got[0]["compress_ratio"]
    assert got[2]["n_bytes"] is None and got[2]["compress_ratio"] is None
    assert got[3]["n_bytes"] == 0 and got[3]["compress_ratio"] is None
    assert 0.05 < got[4]["compress_ratio"] < 0.6  # natural prose band


def test_hex_floor(spark):
    import hashlib

    s = "".join(
        hashlib.md5(str(i).encode()).hexdigest() for i in range(125)
    )[:2000]
    df = spark.createDataFrame([(0, s)], "doc_id int, text string")
    [r] = compression_ratio(df).collect()
    assert r["compress_ratio"] > 0.3  # 4-bit/char entropy floor


def test_python_mirror_parity(spark):
    rows = [(i, f"doc {i} body " * (i + 1)) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r for r in compression_ratio(df).collect()}
    for i, t in rows:
        nb, cb, ratio = py_compression(t)
        assert (got[i]["n_bytes"], got[i]["c_bytes"]) == (nb, cb)
        assert got[i]["compress_ratio"] == ratio  # same division, bitwise


def test_partition_independence(spark):
    rows = [(i, f"text body {i} " * 50) for i in range(40)]
    df1 = spark.createDataFrame(rows, "doc_id int, text string").repartition(1)
    df8 = spark.createDataFrame(rows, "doc_id int, text string").repartition(8)

    def key(df):
        return {
            (r["doc_id"], r["n_bytes"], r["c_bytes"], r["compress_ratio"])
            for r in compression_ratio(df).collect()
        }

    assert key(df1) == key(df8)


def test_stats(spark):
    rows = [(0, "en", "abcd" * 500), (1, "en", "wxyz" * 500), (2, "de", None)]
    df = spark.createDataFrame(rows, "doc_id int, lang string, text string")
    got = {r["lang"]: r for r in compression_stats(df, group_by="lang").collect()}
    assert got["en"]["n_docs"] == 2 and got["en"]["max_ratio"] < 0.1
    assert got["de"]["n_docs"] == 0
