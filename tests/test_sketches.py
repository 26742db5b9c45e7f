"""Count-Min + HyperLogLog sketch family: overestimate / merge /
partition-invariance properties and bit-level DuckDB twin parity
(the md5-portable recipe means the oracle computes the IDENTICAL
sketch, so parity is equality, not tolerance)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dataqualitykit_spark.operators import sketches


def _freq_df(spark, pairs):
    """pairs: (value, count) -> long df with `count` copies of value."""
    rows = [(v,) for v, c in pairs for _ in range(c)]
    return spark.createDataFrame(rows, "val string")


ZIPF = [("a", 400), ("b", 200), ("c", 100), ("d", 50)] + [
    (f"t{i}", 3) for i in range(60)
]


class TestCMS:
    def test_never_undercounts_and_exact_when_wide(self, spark):
        df = _freq_df(spark, ZIPF)
        est = sketches.heavy_hitters(df, "val", k=64, width=4096, depth=3)
        rows = est.collect()
        exact = dict(ZIPF)
        assert len(rows) == 64
        for r in rows:
            assert r["cms_est"] >= r["exact_cnt"]
            assert r["exact_cnt"] == exact[r["value"]]
        # width 4096 over 64 distinct values: collisions essentially
        # impossible in all 3 rows at once -> min is exact
        assert all(r["cms_est"] == r["exact_cnt"] for r in rows)

    def test_narrow_width_overestimates_only(self, spark):
        df = _freq_df(spark, ZIPF)
        rows = sketches.heavy_hitters(df, "val", k=64, width=8, depth=2).collect()
        assert all(r["cms_est"] >= r["exact_cnt"] for r in rows)
        # error bound: est - exact <= 2N/width with high prob; assert the
        # deterministic consequence on THIS fixed hash/seed instead of luck
        n_total = sum(c for _, c in ZIPF)
        assert all(r["cms_est"] - r["exact_cnt"] <= n_total for r in rows)

    def test_sketch_partitioning_invariant(self, spark):
        df = _freq_df(spark, ZIPF)
        a = sorted(map(tuple, sketches.cms_sketch(df, "val", 64, 3).collect()))
        b = sorted(
            map(
                tuple,
                sketches.cms_sketch(df.repartition(13), "val", 64, 3).collect(),
            )
        )
        assert a == b

    def test_merge_is_union_regroup(self, spark):
        half1 = _freq_df(spark, ZIPF[:20])
        half2 = _freq_df(spark, ZIPF[20:])
        merged = (
            sketches.cms_sketch(half1, "val", 64, 3)
            .unionByName(sketches.cms_sketch(half2, "val", 64, 3))
            .groupBy("row", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
        )
        whole = sketches.cms_sketch(
            half1.unionByName(half2), "val", 64, 3
        )
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, whole.collect())
        )

    def test_estimate_zero_for_absent(self, spark):
        df = _freq_df(spark, [("x", 5)])
        sk = sketches.cms_sketch(df, "val", 1024, 3)
        probe = spark.createDataFrame([("zzz-absent",)], "value string")
        got = sketches.cms_estimate(sk, probe, "value", 1024, 3).collect()
        assert got[0]["cms_est"] == 0

    def test_duckdb_twin_identical(self, spark):
        duckdb = pytest.importorskip("duckdb")
        df = _freq_df(spark, ZIPF)
        pdf = df.toPandas()
        con = duckdb.connect()
        con.register("t", pdf)
        sql = sketches.cms_sketch_sql("t", "val", width=64, depth=3)
        oracle = sorted(map(tuple, con.execute(sql).fetchall()))
        got = sorted(map(tuple, sketches.cms_sketch(df, "val", 64, 3).collect()))
        assert got == oracle

    def test_param_validation(self, spark):
        df = _freq_df(spark, [("x", 1)])
        with pytest.raises(ValueError):
            sketches.cms_sketch(df, "val", width=1)
        with pytest.raises(ValueError):
            sketches.cms_sketch(df, "val", depth=0)


class TestBloom:
    def _vals(self, spark, items):
        return spark.createDataFrame([(v,) for v in items], "val string")

    def test_no_false_negatives_ever(self, spark):
        items = [f"gram-{i}" for i in range(300)]
        df = self._vals(spark, items)
        words = sketches.bloom_word_array(df, "val", n_bits=4096, k=3)
        probe = df.select(
            "val",
            sketches.bloom_contains_col(
                words, F.col("val"), 4096, 3
            ).alias("hit"),
        )
        assert all(r["hit"] for r in probe.collect())

    def test_absent_values_mostly_reject(self, spark):
        words = sketches.bloom_word_array(
            self._vals(spark, [f"in-{i}" for i in range(100)]),
            "val",
            n_bits=4096,
            k=3,
        )
        probe = self._vals(spark, [f"out-{i}" for i in range(500)]).select(
            sketches.bloom_contains_col(words, F.col("val"), 4096, 3).alias(
                "hit"
            )
        )
        fp = sum(1 for r in probe.collect() if r["hit"])
        # theoretical fp ~ (1-e^(-300/4096))^3 ~ 3.6e-4; deterministic
        # for these fixed strings — leave headroom, not luck
        assert fp <= 3

    def test_merge_is_union_rebitor(self, spark):
        a = self._vals(spark, [f"a{i}" for i in range(80)])
        b = self._vals(spark, [f"b{i}" for i in range(80)])
        merged = (
            sketches.bloom_build(a, "val", 512, 3)
            .unionByName(sketches.bloom_build(b, "val", 512, 3))
            .groupBy("word_idx")
            .agg(F.bit_or("bits").alias("bits"))
        )
        whole = sketches.bloom_build(a.unionByName(b), "val", 512, 3)
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, whole.collect())
        )

    def test_duckdb_twin_identical(self, spark):
        duckdb = pytest.importorskip("duckdb")
        df = self._vals(spark, [f"g{i}" for i in range(200)])
        con = duckdb.connect()
        con.register("t", df.toPandas())
        oracle = sorted(
            map(
                tuple,
                con.execute(
                    sketches.bloom_build_sql("t", "val", 1024, 3)
                ).fetchall(),
            )
        )
        got = sorted(
            map(tuple, sketches.bloom_build(df, "val", 1024, 3).collect())
        )
        assert got == oracle

    def test_contamination_flags_match_exact_join(self, spark):
        # 4096 bits / 3 hashes over a handful of grams: fp ~ 0, so the
        # bloom flags must equal the exact semi-join flags
        from dataqualitykit_spark.operators import dedup

        docs = spark.createDataFrame(
            [
                (0, "the quick brown fox jumps over the lazy dog"),
                (1, "quick brown fox jumps over a fence today ok"),
                (2, "completely unrelated text about spark planning"),
                (3, "the quick brown fox jumps again and again"),
                (4, ""),
            ],
            "doc_id long, text string",
        )
        bench = docs.filter(F.col("doc_id") == 0)
        bloom = {
            r["id"]: (r["n_bloom_hits"], r["flagged"])
            for r in sketches.bloom_contamination_flags(
                docs, bench, n=5, n_bits=4096, k=3
            ).collect()
        }
        exact = {
            r["id"]: (r["n_hits"], r["contaminated"])
            for r in dedup.contamination_flags(
                docs, bench, "text", "doc_id", n=5
            ).collect()
        }
        assert bloom == exact
        assert bloom[0][1] and bloom[3][1] and not bloom[2][1]

    def test_validation(self, spark):
        df = self._vals(spark, ["x"])
        with pytest.raises(ValueError):
            sketches.bloom_build(df, "val", n_bits=100)
        with pytest.raises(ValueError):
            sketches.bloom_build(df, "val", k=0)


class TestHLL:
    def _distinct_df(self, spark, n, prefix="k"):
        return spark.createDataFrame(
            [(f"{prefix}{i}",) for i in range(n)], "val string"
        )

    def test_accuracy_at_p12(self, spark):
        for n in (500, 5000):
            got = sketches.hll_distinct(
                self._distinct_df(spark, n), "val", p=12
            ).collect()[0]
            # std err 1.04/sqrt(4096) = 1.6%; 5x sigma guard
            assert abs(got["hll_estimate"] - n) / n < 0.08
            assert got["n_buckets"] == 4096

    def test_duplicates_do_not_inflate(self, spark):
        base = self._distinct_df(spark, 800)
        dup = base.unionByName(base).unionByName(base)
        a = sketches.hll_distinct(base, "val").collect()[0]["hll_estimate"]
        b = sketches.hll_distinct(dup, "val").collect()[0]["hll_estimate"]
        assert a == b  # same value set -> bit-identical sketch

    def test_partitioning_invariant_bitwise(self, spark):
        df = self._distinct_df(spark, 3000)
        a = sketches.hll_distinct(df, "val", p=10).collect()[0]
        b = sketches.hll_distinct(df.repartition(17), "val", p=10).collect()[0]
        assert a == b

    def test_merge_by_union(self, spark):
        a = self._distinct_df(spark, 1000, "a")
        b = self._distinct_df(spark, 1000, "b")
        whole = sketches.hll_distinct(a.unionByName(b), "val").collect()[0]
        assert abs(whole["hll_estimate"] - 2000) / 2000 < 0.08

    def test_linear_counting_small_range(self, spark):
        got = sketches.hll_distinct(
            self._distinct_df(spark, 50), "val", p=12
        ).collect()[0]
        # small n -> most buckets empty -> linear-counting branch,
        # which is near-exact here
        assert got["n_zero_buckets"] > 4000
        assert abs(got["hll_estimate"] - 50) < 3

    def test_duckdb_twin_identical(self, spark):
        duckdb = pytest.importorskip("duckdb")
        df = self._distinct_df(spark, 2500)
        con = duckdb.connect()
        con.register("t", df.toPandas())
        oracle = con.execute(
            sketches.hll_distinct_sql("t", "val", p=12)
        ).fetchall()[0]
        got = sketches.hll_distinct(df, "val", p=12).collect()[0]
        assert got["n_buckets"] == oracle[0]
        assert got["n_zero_buckets"] == oracle[1]
        # single float division / ln in the same order: tie-rule round(6)
        r6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
        assert r6(got["hll_estimate"]) == r6(oracle[2])

    def test_p_validation(self, spark):
        df = self._distinct_df(spark, 10)
        for bad in (3, 13):
            with pytest.raises(ValueError):
                sketches.hll_distinct(df, "val", p=bad)

    def test_empty_input_estimates_zero(self, spark):
        empty = spark.createDataFrame([], "val string")
        got = sketches.hll_distinct(empty, "val", p=8).collect()[0]
        assert got["n_zero_buckets"] == 256
        assert got["hll_estimate"] == 0.0


class TestStreamingSketch:
    def test_cms_over_readstream_equals_batch(self, spark, tmp_path):
        """cms_sketch is explode + groupBy(count) — a shape Structured
        Streaming supports natively, so the SAME operator runs over
        readStream (complete mode): the live sketch after two
        micro-batches equals the batch sketch over the union. This is
        the incremental-corpus profile story: counters update as shards
        arrive; no custom stateful code."""
        src = str(tmp_path / "in")
        b1 = [("a",)] * 5 + [("b",)] * 2
        b2 = [("a",)] * 1 + [("c",)] * 4
        spark.createDataFrame(b1, "val string").coalesce(1).write.parquet(
            f"{src}/b1"
        )
        spark.createDataFrame(b2, "val string").coalesce(1).write.parquet(
            f"{src}/b2"
        )
        stream = (
            spark.readStream.schema("val string")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/b*")
        )
        out = sketches.cms_sketch(stream, "val", width=32, depth=3)
        q = (
            out.writeStream.format("memory")
            .queryName("cms_stream_t")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "stream did not finish"
        got = sorted(
            map(
                tuple,
                spark.sql("SELECT * FROM cms_stream_t").collect(),
            )
        )
        batch = sorted(
            map(
                tuple,
                sketches.cms_sketch(
                    spark.createDataFrame(b1 + b2, "val string"),
                    "val",
                    width=32,
                    depth=3,
                ).collect(),
            )
        )
        assert got == batch


class TestBloomPersistence:
    def test_save_load_roundtrip_and_param_guard(self, spark, tmp_path):
        from dataqualitykit_spark.operators.sketches import (
            bloom_build,
            bloom_load,
            bloom_save,
        )

        df = spark.createDataFrame([(f"v{i}",) for i in range(50)], "v string")
        b = bloom_build(df, "v", n_bits=512, k=3, seed="s1")
        path = str(tmp_path / "bloom")
        bloom_save(b, path, 512, 3, "s1")
        words, n_bits, k, seed = bloom_load(spark, path)
        assert (n_bits, k, seed) == (512, 3, "s1")
        got = {r["word_idx"]: r["bits"] for r in words.collect()}
        exp = {r["word_idx"]: r["bits"] for r in b.collect()}
        assert got == exp
        import pytest as _pt

        with _pt.raises(ValueError, match="expected"):
            bloom_load(spark, path, expect=(512, 4, "s1"))

    def test_update_equals_union_build(self, spark, tmp_path):
        from dataqualitykit_spark.operators.sketches import (
            bloom_build,
            bloom_load,
            bloom_save,
            bloom_update,
        )

        a = spark.createDataFrame([(f"a{i}",) for i in range(40)], "v string")
        b = spark.createDataFrame([(f"b{i}",) for i in range(40)], "v string")
        path = str(tmp_path / "bloom")
        bloom_save(bloom_build(a, "v", 512, 3, "x"), path, 512, 3, "x")
        merged = bloom_update(spark, path, b, "v")
        union_build = bloom_build(a.unionByName(b), "v", 512, 3, "x")
        assert {(r["word_idx"], r["bits"]) for r in merged.collect()} == {
            (r["word_idx"], r["bits"]) for r in union_build.collect()
        }
        # the persisted copy reloads to the same words (read-after-write)
        words, *_ = bloom_load(spark, path)
        assert {(r["word_idx"], r["bits"]) for r in words.collect()} == {
            (r["word_idx"], r["bits"]) for r in union_build.collect()
        }

    def test_probe_after_two_updates_sees_all_shards(self, spark, tmp_path):
        from dataqualitykit_spark.operators.sketches import (
            bloom_build,
            bloom_contains_col,
            bloom_save,
            bloom_update,
        )
        from pyspark.sql import functions as F

        shard1 = spark.createDataFrame([("gram-one",), ("gram-two",)], "v string")
        shard2 = spark.createDataFrame([("gram-three",)], "v string")
        path = str(tmp_path / "bloom")
        bloom_save(bloom_build(shard1, "v", 1024, 3), path, 1024, 3, "")
        bloom_update(spark, path, shard2, "v")

        from dataqualitykit_spark.operators.sketches import bloom_load

        words_df, n_bits, k, seed = bloom_load(spark, path)
        words = [0] * (n_bits // 32)
        for r in words_df.collect():
            words[r["word_idx"]] = r["bits"]
        probe = spark.createDataFrame(
            [("gram-one",), ("gram-three",), ("never-seen-gram-xyz",)],
            "v string",
        )
        got = {
            r["v"]: r["hit"]
            for r in probe.select(
                "v",
                bloom_contains_col(words, F.col("v"), n_bits=n_bits, k=k, seed=seed).alias("hit"),
            ).collect()
        }
        assert got["gram-one"] and got["gram-three"]
