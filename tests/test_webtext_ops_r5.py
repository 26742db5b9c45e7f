"""Round-5 second-session webtext operators: mojibake repair, per-domain
boilerplate scrub, keep-best cluster representatives, CCNet score
bucketing."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dataqualitykit_spark.operators import dedup, sampling
from dataqualitykit_spark.operators.mojibake import (
    MOJIBAKE_PAIRS,
    fix_mojibake,
    fix_mojibake_py,
)


# ---------------------------------------------------------------------------
# mojibake
# ---------------------------------------------------------------------------


class TestMojibake:
    def test_pairs_generated_and_ordered(self):
        # longest-first so 3-char sequences are consumed before 2-char ones
        lens = [len(m) for m, _ in MOJIBAKE_PAIRS]
        assert lens == sorted(lens, reverse=True)
        assert ("â€™", "’") in MOJIBAKE_PAIRS  # â€™ -> '
        assert ("Ã©", "é") in MOJIBAKE_PAIRS  # Ã© -> é

    def test_spark_matches_python_mirror(self, spark):
        rows = [
            (1, "Itâ€™s a â€œtestâ€\x9d â€“ cafÃ© naÃ¯ve"),
            (2, "plain ascii stays"),
            (3, None),
            (4, "25Â°C â‚¬9 Â½ price Ã‰cole"),
            (5, "It’s already clean – café"),  # idempotent on clean text
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["text"], r["mojibake_fixed"])
            for r in fix_mojibake(df).collect()
        }
        for i, t in rows:
            want = fix_mojibake_py(t)
            assert got[i][0] == want, (i, got[i][0], want)
            assert got[i][1] == (want != t if t is not None else False)
        assert got[1][0] == "It’s a “test” – café naïve"
        assert got[4][0] == "25°C €9 ½ price École"
        assert got[5][1] is False

    def test_column_order_preserved(self, spark):
        df = spark.createDataFrame([(1, "a", "x")], "doc_id long, text string, z string")
        out = fix_mojibake(df)
        assert out.columns == ["doc_id", "text", "z", "mojibake_fixed"]


# ---------------------------------------------------------------------------
# domain boilerplate scrub
# ---------------------------------------------------------------------------


def _boiler_py(rows, min_docs=2, min_frac=0.5):
    """Pure-python mirror: rows = [(id, domain, text)]."""
    from collections import defaultdict

    docs_per_dom = defaultdict(set)
    line_docs = defaultdict(set)
    for i, d, t in rows:
        docs_per_dom[d].add(i)
        if t is None:
            continue
        for ln in t.split("\n"):
            if ln.strip() != "":
                line_docs[(d, ln)].add(i)
    bad = {
        (d, ln)
        for (d, ln), ids in line_docs.items()
        if len(ids) >= min_docs and len(ids) >= min_frac * len(docs_per_dom[d])
    }
    out = {}
    for i, d, t in rows:
        if t is None:
            out[i] = (None, 0)
            continue
        kept = [ln for ln in t.split("\n") if (d, ln) not in bad]
        out[i] = ("\n".join(kept), len(t.split("\n")) - len(kept))
    return out


class TestDomainBoilerplate:
    ROWS = [
        # site a: nav+footer on every page, one unique middle each
        (1, "a.com", "HOME | ABOUT\npage one body\n\n(c) 2020 a.com"),
        (2, "a.com", "HOME | ABOUT\npage two body\n(c) 2020 a.com"),
        (3, "a.com", "HOME | ABOUT\npage three body\n(c) 2020 a.com"),
        # site b: same literal line as a's nav but only 1/3 of b's docs -> kept
        (4, "b.com", "HOME | ABOUT\nunique b1"),
        (5, "b.com", "totally different\nunique b2"),
        (6, "b.com", "also different\nunique b3"),
        # singleton domain: nothing can reach min_docs
        (7, "c.com", "HOME | ABOUT\nsolo page"),
        (8, "a.com", None),
    ]

    def test_matches_python_mirror(self, spark):
        df = spark.createDataFrame(self.ROWS, "doc_id long, domain string, text string")
        got = {
            r["doc_id"]: (r["text"], r["n_boiler_lines"])
            for r in dedup.domain_boilerplate_scrub(df).collect()
        }
        want = _boiler_py(self.ROWS)
        assert got == want
        # the cross-site line survived on b.com and c.com, died on a.com
        assert got[1][0] == "page one body\n"
        assert got[1][1] == 2
        assert got[4][0] == "HOME | ABOUT\nunique b1"
        assert got[7][0] == "HOME | ABOUT\nsolo page"
        assert got[8] == (None, 0)

    def test_empty_lines_never_flagged(self, spark):
        rows = [(1, "d.com", "x\n\ny"), (2, "d.com", "z\n\nw")]
        df = spark.createDataFrame(rows, "doc_id long, domain string, text string")
        got = {
            r["doc_id"]: r["text"]
            for r in dedup.domain_boilerplate_scrub(df).collect()
        }
        assert got == {1: "x\n\ny", 2: "z\n\nw"}

    def test_all_columns_and_rows_preserved(self, spark):
        df = spark.createDataFrame(
            [(i, d, t, i * 10) for i, d, t in self.ROWS],
            "doc_id long, domain string, text string, extra long",
        )
        out = dedup.domain_boilerplate_scrub(df)
        assert out.columns == ["doc_id", "domain", "text", "extra", "n_boiler_lines"]
        assert out.count() == len(self.ROWS)
        assert {r["extra"] for r in out.collect()} == {i * 10 for i, _, _ in self.ROWS}


# ---------------------------------------------------------------------------
# cluster representatives / keep-best dedup
# ---------------------------------------------------------------------------


class TestKeepBest:
    def test_representatives_best_score_min_id_ties(self, spark):
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
        )
        scored = spark.createDataFrame(
            [(1, 0.5), (2, 0.9), (3, 0.9), (10, None), (11, None), (99, 1.0)],
            "doc_id long, score double",
        )
        comp = dedup.connected_components(pairs)
        reps = {
            r["component"]: (r["rep_id"], r["rep_score"], r["n_members"])
            for r in dedup.cluster_representatives(comp, scored).collect()
        }
        # cluster {1,2,3}: 2 and 3 tie at 0.9 -> min id 2
        assert reps[1] == (2, 0.9, 3)
        # all-NULL-score cluster degrades to keep-canonical (min id)
        assert reps[10] == (10, None, 2)

    def test_dedup_keep_best_filters(self, spark):
        pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
        df = spark.createDataFrame(
            [(1, 0.5, "a"), (2, 0.9, "b"), (3, 0.1, "c"), (7, 0.0, "solo")],
            "doc_id long, score double, text string",
        )
        kept = sorted(
            r["doc_id"] for r in dedup.dedup_keep_best(df, pairs).collect()
        )
        assert kept == [2, 7]  # best of {1,2,3} plus the non-participant


# ---------------------------------------------------------------------------
# score_buckets
# ---------------------------------------------------------------------------


def _buckets_py(rows, fractions, ascending=True):
    """rows = [(id, group, score)] -> {id: bucket} via the one-window form."""
    from collections import defaultdict
    from hashlib import md5

    names = [n for n, _ in fractions]
    fracs = [f for _, f in fractions]
    groups = defaultdict(list)
    for i, g, s in rows:
        groups[g].append((i, s))
    out = {}
    for g, members in groups.items():
        def key(t):
            i, s = t
            null = s is None
            sv = (s if not null else 0.0) * (1 if ascending else -1)
            return (null, sv, md5(str(i).encode()).hexdigest(), i)

        members.sort(key=key)
        n = len(members)
        cum, bounds = 0.0, []
        for f in fracs[:-1]:
            cum += f
            bounds.append(min(n, math.ceil(cum * n)))
        bounds.append(n)
        for rank, (i, _) in enumerate(members, start=1):
            out[i] = names[next(j for j, k in enumerate(bounds) if rank <= k or k == n)]
    return out


class TestScoreBuckets:
    FRACTIONS = (("head", 0.25), ("middle", 0.25), ("tail", 0.5))

    def _check(self, spark, rows, **kw):
        df = spark.createDataFrame(rows, "doc_id long, lang string, ppl double")
        out = sampling.score_buckets(df, self.FRACTIONS, "ppl", "doc_id", "lang", **kw)
        got = {r["doc_id"]: r["bucket"] for r in out.collect()}
        want = _buckets_py(rows, self.FRACTIONS, kw.get("ascending", True))
        assert got == want, {k: (got[k], want[k]) for k in got if got[k] != want[k]}
        assert len(got) == len(rows)  # exhaustive labeling
        return got

    def test_matches_window_mirror(self, spark):
        rows = [
            (i, lang, float((i * 37) % 100))
            for i in range(200)
            for lang in [("en" if i % 3 else "de")]
        ]
        got = self._check(spark, rows, lo=0.0, hi=100.0)
        # en group: 133 rows -> head ceil(.25*133)=34
        en = [k for k, v in got.items() if v == "head" and k % 3 != 0]
        assert len(en) == 34

    def test_null_scores_and_null_group(self, spark):
        rows = [(1, None, 5.0), (2, None, None), (3, None, 1.0), (4, "en", 2.0)]
        got = self._check(spark, rows, lo=0.0, hi=10.0)
        assert got[2] == "tail"  # NULL score ranks last
        assert got[4] == "head"  # singleton group: rank 1 <= ceil(.25*1)=1

    def test_descending(self, spark):
        rows = [(i, "en", float(i)) for i in range(40)] + [(100, "en", None)]
        got = self._check(spark, rows, ascending=False, lo=0.0, hi=40.0)
        assert got[39] == "head"  # highest score first under descending
        assert got[100] == "tail"  # NULL still last

    def test_scores_outside_bins_clamped(self, spark):
        # scores beyond [lo, hi] still rank correctly (clamping only
        # affects the BIN, the boundary-bin window uses the true score)
        rows = [(1, "en", -5.0), (2, "en", 0.5), (3, "en", 99.0), (4, "en", 1e6)]
        self._check(spark, rows, lo=0.0, hi=1.0, bins=4)

    def test_single_bin_forces_window_path(self, spark):
        rows = [(i, "en", float(i % 7)) for i in range(50)]
        self._check(spark, rows, lo=0.0, hi=7.0, bins=1)


# ---------------------------------------------------------------------------
# language consistency (code-switch detection) — r5 session 3
# ---------------------------------------------------------------------------


class TestLangConsistency:
    DOCS = [
        (0, "the cat and the dog were in the house and it was a good day "
            "for all of them\n"
            "they went to the park and the sun was out over the hills and "
            "the trees\n"
            "der hund und die katze sind im wald"),
        (1, "the cat sat on the mat with the dog and the sun was shining"),
        (2, None),
        (3, "the cat sat on the mat\n\n   \nok go\n"  # blank + short skipped
            "the dog ran in the park with the children"),
        (4, "zzz qqq vvv kkk www yyy"),  # no profile hits -> doc 'und'
    ]

    def _mirror(self, t):
        from dataqualitykit_spark.operators.paragraph_quality import (
            py_lang_consistency,
        )

        return py_lang_consistency(t)

    def test_spark_matches_python_mirror(self, spark):
        from dataqualitykit_spark.operators.paragraph_quality import (
            lang_consistency,
        )

        df = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        got = {
            r["id"]: (
                r["doc_lang"],
                r["n_paras_scored"],
                r["n_mismatch"],
                r["mismatch_frac"],
            )
            for r in lang_consistency(df).collect()
        }
        for i, t in self.DOCS:
            want = self._mirror(t)
            if want is None:
                assert got[i] == (None, None, None, None)
            else:
                assert got[i] == want, (i, got[i], want)

    def test_code_switch_detected(self, spark):
        from dataqualitykit_spark.operators.paragraph_quality import (
            lang_consistency,
        )

        df = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        got = {r["id"]: r for r in lang_consistency(df).collect()}
        # doc 0: two en paragraphs + one de paragraph -> en doc, 1 mismatch
        assert got[0]["doc_lang"] == "en"
        assert got[0]["n_paras_scored"] == 3
        assert got[0]["n_mismatch"] == 1
        assert got[0]["mismatch_frac"] == pytest.approx(1 / 3)
        # doc 1: monolingual -> zero mismatch
        assert got[1]["n_mismatch"] == 0 and got[1]["mismatch_frac"] == 0.0
        # doc 3: blank and <3-word paragraphs are not scored
        assert got[3]["n_paras_scored"] == 2

    def test_und_paragraphs_carry_no_signal(self, spark):
        from dataqualitykit_spark.operators.paragraph_quality import (
            lang_consistency,
        )

        rows = [(0, "the cat sat on the mat with the dog\nzzz qqq vvv kkk")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        r = lang_consistency(df).collect()[0]
        # the und paragraph is neither scored nor mismatched
        assert r["n_paras_scored"] == 1
        assert r["n_mismatch"] == 0


# ---------------------------------------------------------------------------
# corpus top-k n-grams — r5 session 3
# ---------------------------------------------------------------------------


class TestTopNgrams:
    ROWS = [
        (0, "the cat sat on the mat the cat sat"),
        (1, "the cat sat down"),
        (2, None),
        (3, "a b"),  # < n tokens -> contributes nothing
        (4, "The Cat Sat on it"),  # case folds into the same trigrams
    ]

    def test_matches_python_counter(self, spark):
        import hashlib
        from collections import Counter

        from dataqualitykit_spark.operators import corpus_stats

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        got = sorted(
            ((r["ngram"], r["cnt"]) for r in
             corpus_stats.top_ngrams(df, n=3, k=5).collect()),
            key=lambda x: (-x[1], x[0]),
        )
        want = Counter()
        for _, t in self.ROWS:
            if t is None:
                continue
            toks = t.lower().split()
            for i in range(len(toks) - 2):
                want[" ".join(toks[i : i + 3])] += 1

        def h(g):
            return int(hashlib.md5(g.encode()).hexdigest()[:13], 16)

        top = sorted(want.items(), key=lambda x: (-x[1], h(x[0])))[:5]
        assert got == sorted(top, key=lambda x: (-x[1], x[0]))
        assert got[0] == ("the cat sat", 4)

    def test_deterministic_at_tie_boundary(self, spark):
        from dataqualitykit_spark.operators import corpus_stats

        # every trigram appears exactly once -> k cut is all ties; the
        # (cnt, hash) order must give the same rows every run
        df = spark.createDataFrame(
            [(0, "q w e r t y u i o p a s d f g h j k l")],
            "doc_id long, text string",
        )
        a = sorted(r["ngram"] for r in corpus_stats.top_ngrams(df, 3, 7).collect())
        b = sorted(r["ngram"] for r in corpus_stats.top_ngrams(df, 3, 7).collect())
        assert a == b and len(a) == 7

    def test_empty_corpus_and_bad_k(self, spark):
        import pytest as _pt

        from dataqualitykit_spark.operators import corpus_stats

        df = spark.createDataFrame([(0, None)], "doc_id long, text string")
        assert corpus_stats.top_ngrams(df, 3, 5).count() == 0
        with _pt.raises(ValueError):
            corpus_stats.top_ngrams(df, 3, 0)

    def test_count_exchange_carries_only_hashes(self, spark):
        from dataqualitykit_spark.operators import corpus_stats
        from dataqualitykit_spark.operators.corpus_stats import (
            _ngram_hash,
            _with_ngrams,
        )

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        ng = _with_ngrams(df, "text", 3, True).select(F.explode("_ng").alias("_g"))
        counts = (
            ng.select(_ngram_hash(F.col("_g")).alias("_h"))
            .groupBy("_h")
            .count()
        )
        plan = counts._jdf.queryExecution().executedPlan().toString()
        # the shuffle is keyed on the 52-bit hash, and the exchange's own
        # row (not its subtree) carries no n-gram string column — the
        # shuffled rows are the partial-agg (hash, count) pairs
        ex_line = next(l for l in plan.splitlines() if "Exchange" in l)
        assert "hashpartitioning(_h" in ex_line
        assert "_g#" not in ex_line
