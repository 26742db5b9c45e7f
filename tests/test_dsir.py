"""DSIR importance resampling + hashed-ngram NB classifier: three-engine
parity (Spark literal plan / Arrow closure / python mirror), count
correctness, plan shape (scoring must not shuffle), tie determinism."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from dataqualitykit_spark.operators import dsir

ROWS = [
    (0, "the cat sat on the mat", "en"),
    (1, "der hund lief im wald heute", "de"),
    (2, "the dog ran in the park today", "en"),
    (3, "die katze sass auf der matte", "de"),
    (4, "", "en"),
    (5, None, None),
    (6, "cats and dogs play in the park", "en"),
    (7, "The CAT sat", "en"),  # case folding
]
B = 64


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string, lang string")


class TestFeatures:
    def test_python_mirror_goldens(self):
        assert dsir.py_features("The cat") == ["the", "cat", "the cat"]
        assert dsir.py_features("one") == ["one"]
        assert dsir.py_features("") == []
        assert dsir.py_features("A  b\tc") == ["a", "b", "c", "a b", "b c"]

    def test_bucket_range_and_stability(self):
        bs = [dsir.py_bucket(w, B) for w in ("the", "cat", "über", "")]
        assert all(0 <= b < B for b in bs)
        # md5 is stable across runs/platforms: md5('the')[:13] mod 4096
        assert dsir.py_bucket("the", 4096) == 2454

    def test_counts_match_python_counter(self, spark, df):
        got = {
            r["bucket"]: r["cnt"]
            for r in dsir.hashed_ngram_counts(df, n_buckets=B).collect()
        }
        want = Counter()
        for _, t, _ in ROWS:
            if t is None:
                continue
            for f in dsir.py_features(t):
                want[dsir.py_bucket(f, B)] += 1
        assert got == dict(want)


@pytest.fixture(scope="module")
def lr(spark, df):
    return dsir.dsir_log_ratio(
        dsir.hashed_ngram_counts(df.filter("lang = 'en'"), n_buckets=B),
        dsir.hashed_ngram_counts(df, n_buckets=B),
        n_buckets=B,
    )


class TestDsirScore:
    def test_three_engine_bit_parity(self, df, lr):
        lit = {
            r["doc_id"]: r["dsir_weight"]
            for r in dsir.dsir_score(df, lr).collect()
        }
        arr = {
            r["doc_id"]: r["dsir_weight"]
            for r in dsir.dsir_score(df, lr, method="arrow").collect()
        }
        for i, t, _ in ROWS:
            want = dsir.py_dsir_weight(t, lr)
            assert lit[i] == want, (i, lit[i], want)
            assert arr[i] == want, (i, arr[i], want)

    def test_direction_and_edges(self, df, lr):
        w = {r["doc_id"]: r["dsir_weight"] for r in dsir.dsir_score(df, lr).collect()}
        # English docs score above German docs against the en target
        assert min(w[0], w[2], w[6]) > max(w[1], w[3])
        assert w[4] == 0.0  # featureless
        assert w[5] is None  # NULL text

    def test_scoring_plan_has_no_exchange(self, df, lr):
        plan = (
            dsir.dsir_score(df, lr)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan

    def test_smoothing_unseen_bucket_constant(self, lr):
        # buckets unseen in BOTH corpora share one smoothed constant
        seen = set()
        for _, t, _ in ROWS:
            if t:
                seen.update(dsir.py_bucket(f, B) for f in dsir.py_features(t))
        unseen = [b for b in range(B) if b not in seen]
        if unseen:
            vals = {lr[b] for b in unseen}
            assert len(vals) == 1

    def test_select_matches_window_form(self, spark, df):
        raw = df.filter("text is not null")
        target = df.filter("lang = 'en'")
        kept = sorted(
            r["doc_id"] for r in dsir.dsir_select(raw, target, 0.5).collect()
        )
        lrv = dsir.dsir_log_ratio(
            dsir.hashed_ngram_counts(target, n_buckets=dsir.DEFAULT_BUCKETS),
            dsir.hashed_ngram_counts(raw, n_buckets=dsir.DEFAULT_BUCKETS),
            n_buckets=dsir.DEFAULT_BUCKETS,
        )
        ws = [
            (dsir.py_dsir_weight(t, lrv), i)
            for i, t, _ in ROWS
            if t is not None
        ]
        n_keep = math.ceil(0.5 * len(ws))
        want = sorted(
            i for _, i in sorted(ws, key=lambda x: (-x[0], x[1]))[:n_keep]
        )
        assert len(kept) == n_keep
        assert kept == want

    def test_select_degenerate_span(self, spark):
        """raw == target makes every smoothed log-ratio identical
        (span 0); the single-bin fallback must still keep exactly
        ceil(frac * n) rows instead of emitting NaN bins (ADVICE r5)."""
        same = spark.createDataFrame(
            [(i, "the cat sat on the mat") for i in range(8)],
            "doc_id long, text string",
        )
        kept = dsir.dsir_select(same, same, 0.5).collect()
        assert len(kept) == 4

    def test_select_max_features_invariant(self, df):
        """Shrinking max_features only widens the clamped extreme bin;
        the kept set is invariant (clamping is monotone and the
        threshold bin re-ranks by true score)."""
        raw = df.filter("text is not null")
        target = df.filter("lang = 'en'")
        base = sorted(
            r["doc_id"] for r in dsir.dsir_select(raw, target, 0.5).collect()
        )
        tight = sorted(
            r["doc_id"]
            for r in dsir.dsir_select(
                raw, target, 0.5, max_features=2
            ).collect()
        )
        assert base == tight


class TestNaiveBayes:
    @pytest.fixture(scope="class")
    def model(self, df):
        return dsir.nb_train(df, "lang", n_buckets=B)

    def test_model_shape(self, model):
        assert model["labels"] == ["de", "en"]
        assert len(model["log_cond"]) == 2
        assert all(len(v) == B for v in model["log_cond"])
        # priors: 2 de / 7 labeled docs, 5 en
        assert model["log_prior"][0] == math.log(2 / 7)
        assert model["log_prior"][1] == math.log(5 / 7)

    def test_label_recovery_and_parity(self, df, model):
        lit = {
            r["doc_id"]: (r["nb_pred"], r["nb_score"])
            for r in dsir.nb_predict(df, model).collect()
        }
        arr = {
            r["doc_id"]: (r["nb_pred"], r["nb_score"])
            for r in dsir.nb_predict(df, model, method="arrow").collect()
        }
        for i, t, lang in ROWS:
            want = dsir.py_nb_predict(t, model)
            assert lit[i] == want
            assert arr[i] == want
            if t:  # non-degenerate docs recover their language
                assert lit[i][0] == lang
        assert lit[5] == (None, None)
        # empty text falls back to the larger prior
        assert lit[4][0] == "en"
        assert lit[4][1] == model["log_prior"][1]

    def test_tie_breaks_to_first_sorted_label(self, spark):
        # two labels, perfectly symmetric corpora -> every score ties;
        # prediction must deterministically pick the first sorted label
        rows = [(0, "x y", "a"), (1, "x y", "b")]
        d = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        m = dsir.nb_train(d, "lang", n_buckets=16)
        out = dsir.nb_predict(d, m).collect()
        assert {r["nb_pred"] for r in out} == {"a"}

    def test_predict_plan_has_no_exchange(self, df, model):
        plan = (
            dsir.nb_predict(df, model)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan


class TestGumbelSample:
    """gumbel_weighted_sample lives in sampling.py but belongs to the
    DSIR family (the paper's resampling step)."""

    @pytest.fixture(scope="class")
    def wdf(self, spark):
        rows = [(i, float(i % 7)) for i in range(200)] + [(200, None)]
        return spark.createDataFrame(rows, "doc_id long, w double")

    def test_deterministic_and_exact_k(self, wdf):
        from dataqualitykit_spark.operators.sampling import (
            gumbel_weighted_sample,
        )

        a = [r["doc_id"] for r in gumbel_weighted_sample(wdf, 25, "w").collect()]
        b = [r["doc_id"] for r in gumbel_weighted_sample(wdf, 25, "w").collect()]
        assert a == b and len(a) == 25
        assert 200 not in a  # NULL weight excluded

    def test_matches_python_mirror(self, wdf):
        import hashlib

        from dataqualitykit_spark.operators.sampling import (
            gumbel_weighted_sample,
        )

        got = [
            (r["doc_id"], r["gk"])
            for r in gumbel_weighted_sample(wdf, 30, "w", key_col="gk").collect()
        ]

        def key(i, w):
            h = hashlib.md5(f"gumbel{i}".encode()).hexdigest()
            u = (int(h[:13], 16) + 0.5) / float(16**13)
            return w / 1.0 - math.log(-math.log(u))

        want = sorted(
            ((i, key(i, float(i % 7))) for i in range(200)),
            key=lambda x: (-x[1], x[0]),
        )[:30]
        assert [g[0] for g in got] == [w[0] for w in want]
        for (gi, gk), (wi, wk) in zip(got, want):
            # JVM Math.log differs from libm by <= 1 ulp
            assert gk == pytest.approx(wk, rel=1e-12)

    def test_salt_and_temperature_change_draw(self, wdf):
        from dataqualitykit_spark.operators.sampling import (
            gumbel_weighted_sample,
        )

        base = [r["doc_id"] for r in gumbel_weighted_sample(wdf, 25, "w").collect()]
        other = [
            r["doc_id"]
            for r in gumbel_weighted_sample(wdf, 25, "w", salt="s2").collect()
        ]
        cold = [
            r["doc_id"]
            for r in gumbel_weighted_sample(
                wdf, 25, "w", temperature=0.05
            ).collect()
        ]
        assert base != other
        # near-zero temperature degenerates to (weighted) top-k: only the
        # max-weight class (w=6.0) survives
        assert all(i % 7 == 6 for i in cold)

    def test_plan_is_take_ordered(self, wdf):
        from dataqualitykit_spark.operators.sampling import (
            gumbel_weighted_sample,
        )

        plan = (
            gumbel_weighted_sample(wdf, 10, "w")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan

    def test_bad_k_raises(self, wdf):
        from dataqualitykit_spark.operators.sampling import (
            gumbel_weighted_sample,
        )

        with pytest.raises(ValueError):
            gumbel_weighted_sample(wdf, 0, "w")
