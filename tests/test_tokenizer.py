"""Corpus-trained BPE: analytic merge training, id round-trips, and the
reconstruction/compression/unknown invariants the driver oracle pins."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataqualitykit_spark.operators import tokenizer as tk


class TestTrainMerges:
    def test_analytic_two_merges(self):
        # pair counts: (a,a)=20, (a,b)=15 -> merge aa first; then
        # (a,b) = 10 (aaab) + 5 (ab) = 15 beats (aa,a) = 10
        merges = tk.train_merges({"aaab": 10, "ab": 5}, n_merges=2)
        assert merges == (("a", "a"), ("a", "b"))

    def test_tie_breaks_lexicographic(self):
        merges = tk.train_merges({"cd": 3, "ab": 3}, n_merges=1)
        assert merges == (("a", "b"),)

    def test_stops_when_nothing_repeats(self):
        # every pair occurs exactly once -> below the min count of 2
        merges = tk.train_merges({"abcd": 1}, n_merges=10)
        assert merges == ()

    def test_merge_consumes_left_to_right(self):
        # "aaa" x 5: (a,a) counted at both offsets -> 10; after the
        # merge the sequence is [aa, a] (left-to-right, non-overlapping)
        merges = tk.train_merges({"aaa": 5, "aab": 5}, n_merges=2)
        assert merges[0] == ("a", "a")
        assert merges[1] == ("aa", "a") or merges[1] == ("aa", "b")


class TestLearnAndEncode:
    def _corpus(self, spark):
        rows = [
            (0, "the cat sat on the mat"),
            (1, "the cat ate the rat"),
            (2, "cats and rats and mats"),
            (3, "THE CAT (loud) sat!"),
            (4, None),
            (5, ""),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_vocab_covers_corpus_units(self, spark):
        model = tk.learn_bpe(self._corpus(spark), n_merges=16)
        for ch in "thecatsonmrd()!":
            assert ch in model.vocab
        assert model.vocab[tk.UNK_TOKEN] == tk.UNK_ID
        # merge products are in the vocab at ids after the base units
        for a, b in model.merges:
            assert a + b in model.vocab

    def test_reconstruction_invariants_hold(self, spark):
        df = self._corpus(spark)
        model = tk.learn_bpe(df, n_merges=16)
        out = tk.bpe_reconstruction_check(df, model).collect()
        assert len(out) == 6
        for r in out:
            assert r["reconstruct_ok"], r
            assert not r["has_unk"], r
            assert r["compress_ok"], r
        by_id = {r["doc_id"]: r for r in out}
        assert by_id[4]["token_ids"] is None
        assert by_id[5]["token_ids"] == []

    def test_frequent_word_becomes_one_token(self, spark):
        df = self._corpus(spark)
        model = tk.learn_bpe(df, n_merges=32)
        enc = tk.bpe_encode(df, model).filter(F.col("doc_id") == 0).collect()[0]
        ids = enc["token_ids"]
        # "the" appears 5x (most frequent trigram-word) -> merged whole
        assert "the" in model.vocab
        inv = model.id_to_token()
        toks = [inv[i] for i in ids]
        assert toks[0] == "the"
        assert "".join(toks) == "thecatsatonthemat"

    def test_oov_unit_maps_to_unk(self, spark):
        train = self._corpus(spark)
        model = tk.learn_bpe(train, n_merges=8)
        probe = spark.createDataFrame(
            [(0, "the cat zzézz")], "doc_id long, text string"
        )
        out = tk.bpe_reconstruction_check(probe, model).collect()[0]
        assert out["has_unk"]  # é never seen in training
        assert not out["reconstruct_ok"]  # unk can't reconstruct

    def test_token_count_jvm_side(self, spark):
        df = self._corpus(spark).filter(F.col("text").isNotNull())
        model = tk.learn_bpe(df, n_merges=16)
        rows = (
            tk.bpe_encode(df, model)
            .select("doc_id", F.size("token_ids").alias("n"))
            .collect()
        )
        enc = tk._encoder(model)
        for r in rows:
            t = df.filter(F.col("doc_id") == r["doc_id"]).collect()[0]["text"]
            expect = sum(
                len(enc(w)) for w in tk._PRETOKEN_RE.findall(t.lower())
            )
            assert r["n"] == expect

    def test_deterministic_across_partitionings(self, spark):
        df = self._corpus(spark).filter(F.col("text").isNotNull())
        m1 = tk.learn_bpe(df.repartition(1), n_merges=16)
        m8 = tk.learn_bpe(df.repartition(8), n_merges=16)
        assert m1.merges == m8.merges
        assert m1.vocab == m8.vocab

    def test_max_words_bounds_driver_state_not_coverage(self, spark):
        df = self._corpus(spark)
        model = tk.learn_bpe(df, n_merges=8, max_words=2)
        # merges saw only 2 words, but every corpus char still encodes
        out = tk.bpe_reconstruction_check(df, model).collect()
        assert all(not r["has_unk"] for r in out)
