"""Perceptual-hash media dedup: dHash determinism, the generic banded
hamming join's pigeonhole guarantee, and the byte-equality A/B twin."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataqualitykit_spark.operators.dedup import hamming_dup_pairs
from dataqualitykit_spark.operators.multimodal import (
    media_fixture,
    perceptual_hashes,
    phash64_bytes,
    phash_dup_pairs,
)


def test_phash64_deterministic_and_signed():
    a = phash64_bytes(b"payload-one")
    assert a == phash64_bytes(b"payload-one")
    assert a != phash64_bytes(b"payload-two")
    assert -(1 << 63) <= a < (1 << 63)
    assert phash64_bytes(None) is None


def test_hamming_dup_pairs_pigeonhole(spark):
    # planted codes at known hamming distances from a base code: the
    # banded join must find every pair within max_hamming and verify
    # the exact distance, and must NOT return pairs past the bound
    ubase = 0x8123456789ABCDEF  # bit 63 set -> exercises the sign bit

    def signed(u: int) -> int:
        return u - (1 << 64) if u >= (1 << 63) else u

    rows = [(0, signed(ubase))]
    # flip the k LOWEST bits -> hamming k from base (flips on the
    # UNSIGNED value; python XOR on the negative signed form widens)
    for k in (1, 4, 8, 9, 20):
        rows.append((k, signed(ubase ^ ((1 << k) - 1))))
    df = spark.createDataFrame(rows, "id long, code long")
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_dup_pairs(df, "code", "id", max_hamming=8).collect()
    }
    # base vs k-flip pairs within the bound
    assert pairs[(0, 1)] == 1
    assert pairs[(0, 4)] == 4
    assert pairs[(0, 8)] == 8
    assert (0, 9) not in pairs and (0, 20) not in pairs
    # flip-vs-flip: (1,4) differ in bits 1..3 -> hamming 3, etc.
    assert pairs[(1, 4)] == 3
    assert pairs[(4, 8)] == 4


def test_phash_dup_pairs_equals_byte_equality_twin(spark):
    fx = media_fixture(spark, 48).select("media_id", "payload")
    planted = fx.filter(F.col("media_id") % 5 == 0).select(
        (F.col("media_id") + 1000).alias("media_id"), "payload"
    )
    corpus = fx.unionByName(planted)
    ph = {
        (r["id_a"], r["id_b"])
        for r in phash_dup_pairs(corpus, max_hamming=8).collect()
    }
    keyed = corpus.select(
        F.col("media_id").alias("id"), F.md5("payload").alias("k")
    )
    eq = {
        (r["ia"], r["ib"])
        for r in keyed.alias("a")
        .join(keyed.alias("b"), "k")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("ia"), F.col("b.id").alias("ib"))
        .collect()
    }
    assert ph == eq and eq  # non-empty and identical


def test_perceptual_hashes_null_payload(spark):
    df = spark.createDataFrame(
        [(1, b"x"), (2, None)], "media_id long, payload binary"
    )
    got = {r["media_id"]: r["phash"] for r in perceptual_hashes(df).collect()}
    assert got[1] is not None and got[2] is None
