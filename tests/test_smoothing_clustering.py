"""EWMA / linear-interpolation window smoothing + KMeans-distance outlier
flag (round 6: the reference *intends* ewma/linear_interpolate at
QualityControl.py:2888/2899 via nonexistent F.expr functions, and
substitutes BisectingKMeans for isolation_forest at :3001-3012 — all three
re-expressed as real Spark ops here)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dataqualitykit_spark.operators import anomaly


def _series_df(spark, xs, part="p"):
    rows = [(part, i, x) for i, x in enumerate(xs)]
    return spark.createDataFrame(rows, "grp string, pos long, x double")


class TestEwma:
    def test_py_mirror_goldens(self):
        # hand-computed recurrence, alpha = 0.5
        assert anomaly.py_ewma([2.0, 4.0, 8.0], 0.5) == [2.0, 3.0, 5.5]
        # NULLs carry, leading NULL stays None
        assert anomaly.py_ewma([None, 2.0, None, 4.0], 0.5) == [
            None,
            2.0,
            2.0,
            3.0,
        ]

    @pytest.mark.parametrize("alpha", [0.1, 0.5, 0.9])
    def test_matches_exact_recurrence(self, spark, alpha):
        xs = [float((i * 37) % 101) - 50.0 for i in range(120)]
        xs[5] = None
        xs[6] = None
        xs[0] = None  # leading NULL
        out = anomaly.ewma_smooth(
            _series_df(spark, xs), "x", "pos", alpha, partition_by=["grp"]
        )
        got = {
            r["pos"]: r["ewma_x"]
            for r in out.select("pos", "ewma_x").collect()
        }
        want = anomaly.py_ewma(xs, alpha)
        assert got[0] is None
        for i, w in enumerate(want):
            if w is None:
                assert got[i] is None
            else:
                assert got[i] == pytest.approx(w, abs=1e-9), i

    def test_multi_block_carry_exact(self, spark):
        """block_rows=16 forces many blocks on a 500-row partition; the
        single cross-block carry term must reproduce the exact recurrence
        (the whole point of the segmented scan)."""
        xs = [math.sin(i * 0.7) * 100.0 for i in range(500)]
        out = anomaly.ewma_smooth(
            _series_df(spark, xs),
            "x",
            "pos",
            0.3,
            partition_by=["grp"],
            block_rows=16,
        )
        got = [
            r["ewma_x"]
            for r in out.select("pos", "ewma_x").orderBy("pos").collect()
        ]
        want = anomaly.py_ewma(xs, 0.3)
        for i, (g, w) in enumerate(zip(got, want)):
            assert g == pytest.approx(w, abs=1e-9), i

    def test_default_block_sizing_overflow_free(self, spark):
        """alpha=0.5 naive separable form overflows past ~1074 rows; the
        auto block size must keep a 3000-row partition finite and exact."""
        xs = [float((i * 13) % 97) for i in range(3000)]
        out = anomaly.ewma_smooth(
            _series_df(spark, xs), "x", "pos", 0.5, partition_by=["grp"]
        )
        got = [
            r["ewma_x"]
            for r in out.select("ewma_x").orderBy("pos").collect()
        ]
        want = anomaly.py_ewma(xs, 0.5)
        assert all(math.isfinite(g) for g in got)
        for i, (g, w) in enumerate(zip(got, want)):
            assert g == pytest.approx(w, abs=1e-9), i

    def test_partitions_independent(self, spark):
        rows = [("a", 0, 10.0), ("a", 1, 20.0), ("b", 0, 100.0), ("b", 1, 0.0)]
        df = spark.createDataFrame(rows, "grp string, pos long, x double")
        got = {
            (r["grp"], r["pos"]): r["ewma_x"]
            for r in anomaly.ewma_smooth(
                df, "x", "pos", 0.5, partition_by=["grp"]
            ).collect()
        }
        assert got[("a", 0)] == 10.0 and got[("a", 1)] == 15.0
        assert got[("b", 0)] == 100.0 and got[("b", 1)] == 50.0

    def test_alpha_one_identity_and_validation(self, spark):
        df = _series_df(spark, [1.0, 2.0])
        out = anomaly.ewma_smooth(df, "x", "pos", 1.0, partition_by=["grp"])
        assert [r["ewma_x"] for r in out.orderBy("pos").collect()] == [1.0, 2.0]
        with pytest.raises(ValueError):
            anomaly.ewma_smooth(df, "x", "pos", 0.0, partition_by=["grp"])

    def test_single_exchange_family(self, spark):
        """Plan shape: exactly the two designed exchanges — hash(grp) and
        hash(grp, block) — and no cartesian/driver collect."""
        df = _series_df(spark, [float(i) for i in range(10)])
        plan = (
            anomaly.ewma_smooth(df, "x", "pos", 0.5, partition_by=["grp"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange hashpartitioning") <= 2, plan


class TestLinearInterpolate:
    def test_py_mirror_goldens(self):
        assert anomaly.py_linear_interpolate([1.0, None, 3.0]) == [1.0, 2.0, 3.0]
        assert anomaly.py_linear_interpolate([None, 1.0, None, None, 4.0, None]) == [
            None,
            1.0,
            2.0,
            3.0,
            4.0,
            None,
        ]

    def test_matches_python_mirror(self, spark):
        xs = [None, None, 5.0, None, None, None, 9.0, 1.0, None, 2.0, None]
        out = anomaly.linear_interpolate(
            _series_df(spark, xs), "x", "pos", partition_by=["grp"]
        )
        got = [
            r["x_interp"]
            for r in out.select("pos", "x_interp").orderBy("pos").collect()
        ]
        want = anomaly.py_linear_interpolate(xs)
        for i, (g, w) in enumerate(zip(got, want)):
            if w is None:
                assert g is None, i
            else:
                assert g == pytest.approx(w, abs=1e-12), i

    def test_all_null_partition(self, spark):
        out = anomaly.linear_interpolate(
            _series_df(spark, [None, None]), "x", "pos", partition_by=["grp"]
        )
        assert [r["x_interp"] for r in out.collect()] == [None, None]

    def test_partition_isolation(self, spark):
        """A neighbour value in another partition must never leak in."""
        rows = [("a", 0, 1.0), ("a", 1, None), ("b", 0, 100.0)]
        df = spark.createDataFrame(rows, "grp string, pos long, x double")
        got = {
            (r["grp"], r["pos"]): r["x_interp"]
            for r in anomaly.linear_interpolate(
                df, "x", "pos", partition_by=["grp"]
            ).collect()
        }
        assert got[("a", 1)] is None  # trailing NULL in its partition


class TestKmeansOutliers:
    def test_planted_outliers_flagged(self, spark):
        natural = spark.range(400).select(
            F.col("id").alias("row_id"),
            (F.col("id") % 7 * 10.0 + (F.col("id") % 3)).alias("v"),
        )
        planted = spark.createDataFrame(
            [(10_000 + i, 1.0e6 + i) for i in range(5)], "row_id long, v double"
        )
        out = anomaly.kmeans_distance_outliers(
            natural.unionByName(planted),
            ["v"],
            k=3,
            threshold=5000.0,
            fit_df=natural,
        )
        flagged = {r["row_id"] for r in out.filter("is_outlier").collect()}
        assert flagged == {10_000 + i for i in range(5)}
        # natural rows keep finite small distances
        mx = out.filter("row_id < 10000").agg(F.max("centroid_dist")).first()[0]
        assert mx < 100.0

    def test_adaptive_threshold_and_null_features(self, spark):
        inliers = [(i, 1.0 + (i % 10) * 0.01) for i in range(100)]
        df = spark.createDataFrame(
            inliers + [(200, None), (201, 500.0)], "row_id long, v double"
        )
        out = anomaly.kmeans_distance_outliers(
            df, ["v"], k=2, fit_df=df.filter("v < 100")
        )
        rows = {r["row_id"]: (r["centroid_dist"], r["is_outlier"]) for r in out.collect()}
        assert rows[200] == (None, False)  # NULL feature: no dist, no flag
        assert rows[201][1] is True
        assert all(not rows[i][1] for i, _ in inliers)


class TestSuggestBoundaries:
    def test_methods_and_domain(self, spark):
        from dataqualitykit_spark.operators.range_validity import (
            suggest_boundaries,
        )

        df = spark.createDataFrame(
            [(float(i),) for i in range(1, 101)], "v double"
        )
        # exact percentiles on 1..100: p = 1 + 99*q (linear interpolation)
        stat = suggest_boundaries(df, "v", approx=False)
        assert stat["v"]["min"] == pytest.approx(1.99)
        assert stat["v"]["max"] == pytest.approx(99.01)
        pct = suggest_boundaries(df, ["v"], method="percentile", approx=False)
        assert pct["v"]["min"] == pytest.approx(5.95)
        assert pct["v"]["max"] == pytest.approx(95.05)
        dom = suggest_boundaries(
            df, ["v", "w"], method="domain",
            domain_rules={"v": {"min": 0.0, "max": 10.0}},
        )
        assert dom == {"v": {"min": 0.0, "max": 10.0}}  # missing col skipped
        with pytest.raises(ValueError, match="method"):
            suggest_boundaries(df, "v", method="bogus")

    def test_single_job_multi_column(self, spark):
        """All columns must aggregate in ONE job (the reference loops one
        collect per column) — assert a single aggregate over both."""
        from dataqualitykit_spark.operators.range_validity import (
            suggest_boundaries,
        )

        df = spark.createDataFrame(
            [(float(i), float(i) * 2.0) for i in range(1, 101)],
            "a double, b double",
        )
        got = suggest_boundaries(df, ["a", "b"], approx=False)
        assert got["a"]["max"] == pytest.approx(99.01)
        assert got["b"]["max"] == pytest.approx(198.02)


class TestMergeRecords:
    def test_rules_golden(self, spark):
        """Reference merge_similar_records conflict rules
        (QualityControl.py:2085-2097) as distributed aggregates — golden
        cluster with every rule exercised, deterministic ties."""
        from dataqualitykit_spark.operators.dedup import merge_records

        rows = [
            # cluster, id, name, src, score, ts
            ("k1", 1, "alpha", "a", 10.0, 5),
            ("k1", 2, "alphabet", "b", 20.0, 9),
            ("k1", 3, "beta", "b", 30.0, 7),
            ("k2", 4, "solo", "z", 1.5, 1),
        ]
        df = spark.createDataFrame(
            rows, "cluster string, id long, name string, src string, score double, ts long"
        )
        out = {
            r["cluster"]: r.asDict()
            for r in merge_records(
                df,
                "cluster",
                {
                    "name": "longest",
                    "src": "most_frequent",
                    "score": "average",
                    "ts": "newest",
                },
                id_col="id",
            ).collect()
        }
        k1 = out["k1"]
        assert k1["n_members"] == 3
        assert k1["name"] == "alphabet"  # longest
        assert k1["src"] == "b"  # 2-vs-1 mode
        assert k1["score"] == pytest.approx(20.0)
        assert k1["ts"] == 9
        assert k1["id"] == 1  # canonical min id
        assert out["k2"]["name"] == "solo" and out["k2"]["n_members"] == 1

    def test_tie_determinism_and_bad_rule(self, spark):
        from dataqualitykit_spark.operators.dedup import merge_records

        df = spark.createDataFrame(
            [("k", 1, "aa", "x"), ("k", 2, "bb", "y")],
            "cluster string, id long, name string, src string",
        )
        got = merge_records(
            df, "cluster", {"name": "longest", "src": "most_frequent"}
        ).first()
        assert got["name"] == "bb"  # equal length -> larger value
        assert got["src"] == "y"  # equal count -> larger value
        with pytest.raises(ValueError, match="merge rule"):
            merge_records(df, "cluster", {"name": "bogus"})

    def test_unruled_from_canonical_row(self, spark):
        from dataqualitykit_spark.operators.dedup import merge_records

        df = spark.createDataFrame(
            [("k", 9, "late"), ("k", 2, "early")],
            "cluster string, id long, tag string",
        )
        got = merge_records(df, "cluster", {}, id_col="id").first()
        assert got["tag"] == "early" and got["id"] == 2


class TestFlagForInvestigation:
    def test_ensemble_weights_and_filter(self, spark):
        """Reference weights (statistical +0.5, pattern +0.3, forecast
        +0.2, clustering +0.1; QualityControl.py:3115-3238) over a series
        with one planted global outlier: the spike earns every leg's
        weight, flat rows earn none."""
        xs = [10.0] * 30 + [500.0] + [10.0] * 30
        df = spark.createDataFrame(
            [("p", i, x) for i, x in enumerate(xs)],
            "grp string, pos long, x double",
        )
        out = anomaly.flag_for_investigation(
            df,
            "x",
            "pos",
            methods=["statistical", "pattern", "forecast", "clustering"],
            thresholds={
                "statistical": 3.0,
                "pattern": 50.0,
                "forecast": 50.0,
                "clustering": 100.0,
            },
            partition_by=["grp"],
            min_confidence=0.8,
            k=2,
        )
        rows = out.select("pos", "investigation_confidence").collect()
        # spike at 31 trips stat+pattern+forecast (+clustering w/ k=2 the
        # spike is its own cluster at distance 0 — weight NOT earned, by
        # design: distance-based, not the ref's meaningless index==1);
        # its neighbors (30, 32) trip pattern+forecast but stay under 0.8
        got = {r["pos"]: r["investigation_confidence"] for r in rows}
        assert 30 in got and got[30] >= 0.8  # the spike row is flagged
        assert all(p in (29, 30, 31) for p in got), got

    def test_keep_all_scores(self, spark):
        df = spark.createDataFrame(
            [("p", i, float(i % 5)) for i in range(20)],
            "grp string, pos long, x double",
        )
        out = anomaly.flag_for_investigation(
            df,
            "x",
            "pos",
            methods=["pattern"],
            thresholds={"pattern": 100.0},
            partition_by=["grp"],
            keep_all=True,
        )
        rows = out.collect()
        assert len(rows) == 20
        assert all(r["investigation_confidence"] == 0.0 for r in rows)


def test_parse_datetime_components(spark):
    """parse_components datetime leg (the reference emits placeholder
    NULL columns; QualityControl.py:2527): real split, NULL on garbage."""
    from dataqualitykit_spark.operators.formats import parse_datetime

    df = spark.createDataFrame(
        [
            (1, "2024-06-01 13:45:09"),
            (2, "06/01/2024 13:45"),
            (3, "2024-06-01T07:02:03"),
            (4, "not a date"),
            (5, None),
        ],
        "id long, dt string",
    )
    got = {r["id"]: (r["date"], r["time"]) for r in parse_datetime(df, "dt").collect()}
    assert got[1] == ("2024-06-01", "13:45:09")
    assert got[2] == ("2024-06-01", "13:45:00")
    assert got[3] == ("2024-06-01", "07:02:03")
    assert got[4] == (None, None)
    assert got[5] == (None, None)


class TestPsiDrift:
    def test_identical_and_shifted(self, spark):
        from dataqualitykit_spark.operators.corpus_stats import psi_drift

        base = spark.range(2000).select(
            (F.col("id") % 100).cast("double").alias("v")
        )
        same = psi_drift(base, base, "v", n_bins=10).collect()
        assert len(same) == 10
        assert sum(r["psi_term"] for r in same) == pytest.approx(0.0, abs=1e-12)
        # shifted snapshot: mass moves to high bins -> clearly unstable
        shifted = spark.range(2000).select(
            (50.0 + (F.col("id") % 50)).cast("double").alias("v")
        )
        psi = sum(
            r["psi_term"]
            for r in psi_drift(base, shifted, "v", n_bins=10).collect()
        )
        assert psi > 0.25

    def test_empty_bins_and_fixed_grid(self, spark):
        from dataqualitykit_spark.operators.corpus_stats import psi_drift

        a = spark.createDataFrame([(1.0,), (2.0,), (None,)], "v double")
        b = spark.createDataFrame([(9.0,), (9.5,)], "v double")
        rows = psi_drift(a, b, "v", n_bins=5, lo=0.0, hi=10.0).collect()
        assert len(rows) == 5
        assert all(
            r["psi_term"] is not None and math.isfinite(r["psi_term"])
            for r in rows
        )  # eps smoothing keeps empty bins finite
        # b's mass lands in the top bin of the FIXED grid
        top = {r["bin"]: r["n_b"] for r in rows}
        assert top[4] == 2 and sum(top.values()) == 2


class TestMadOutliers:
    def test_robust_vs_classic(self, spark):
        """One huge spike inflates stddev enough to mask itself from the
        default 3-sigma z-score (the masking bound is max z <= (n-1)/
        sqrt(n) = 2.846 at n=10) but cannot escape the MAD flag — the
        reason the robust variant exists."""
        xs = [10.0, 11.0, 9.0, 10.5, 9.5, 10.0, 11.5, 9.8, 10.2, 1.0e6]
        df = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "id long, v double")
        robust = {r["id"]: r["is_outlier"] for r in anomaly.mad_outliers(df, "v").collect()}
        assert robust[9] is True
        assert all(not robust[i] for i in range(9))
        classic = {
            r["id"]: r["is_outlier"]
            for r in anomaly.zscore_flags(df, "v", 3.0).collect()
        }
        assert classic[9] is False  # the spike masks itself at 3 sigma

    def test_zero_mad_majority_constant(self, spark):
        df = spark.createDataFrame(
            [(i, 5.0) for i in range(9)] + [(9, 7.0)], "id long, v double"
        )
        got = {r["id"]: (r["is_outlier"], r["modified_zscore"]) for r in anomaly.mad_outliers(df, "v").collect()}
        assert got[9] == (True, None)  # MAD 0: different-from-median flags
        assert all(got[i] == (False, None) for i in range(9))

    def test_null_values_not_flagged(self, spark):
        df = spark.createDataFrame(
            [(0, 1.0), (1, None), (2, 1.2), (3, 0.8), (4, 99.0)],
            "id long, v double",
        )
        got = {r["id"]: r["is_outlier"] for r in anomaly.mad_outliers(df, "v").collect()}
        assert got[1] is False and got[4] is True


def test_psi_drift_categorical(spark):
    from dataqualitykit_spark.operators.corpus_stats import (
        psi_drift_categorical,
    )

    a = spark.createDataFrame(
        [("en",)] * 60 + [("de",)] * 30 + [("fr",)] * 8 + [(None,)] * 2,
        "lang string",
    )
    # b: de mass collapsed into en -> clear drift; fr/null stable-ish
    b = spark.createDataFrame(
        [("en",)] * 85 + [("de",)] * 5 + [("fr",)] * 8 + [("xx",)] * 2,
        "lang string",
    )
    rows = psi_drift_categorical(a, b, "lang", top_k=3).collect()
    cats = {r["category"]: r for r in rows}
    # top-3 of a = en, de, fr; __null__ and unseen 'xx' fold to __other__
    assert set(cats) == {"en", "de", "fr", "__other__"}
    assert cats["__other__"]["n_a"] == 2 and cats["__other__"]["n_b"] == 2
    psi = sum(r["psi_term"] for r in rows)
    assert psi > 0.25  # major shift reading
    # identical snapshots -> ~0
    same = psi_drift_categorical(a, a, "lang", top_k=3).collect()
    assert sum(r["psi_term"] for r in same) == pytest.approx(0.0, abs=1e-12)


def test_kmeans_outliers_multicolumn(spark):
    """Multi-feature distance: Euclidean over 2 columns; a point far in
    only ONE dimension must still be flagged."""
    natural = spark.range(300).select(
        F.col("id").alias("row_id"),
        (F.col("id") % 10 * 1.0).alias("a"),
        (F.col("id") % 7 * 1.0).alias("b"),
    )
    planted = spark.createDataFrame(
        [(9000, 5.0, 1.0e5), (9001, 1.0e5, 5.0)],
        "row_id long, a double, b double",
    )
    out = anomaly.kmeans_distance_outliers(
        natural.unionByName(planted),
        ["a", "b"],
        k=3,
        threshold=1000.0,
        fit_df=natural,
    )
    flagged = {r["row_id"] for r in out.filter("is_outlier").collect()}
    assert flagged == {9000, 9001}


class TestSavgol:
    def test_classic_coefficient_goldens(self):
        from fractions import Fraction

        from dataqualitykit_spark.operators.anomaly import savgol_coefficients

        got = savgol_coefficients(5, 2)
        want = [Fraction(n, 35) for n in (-3, 12, 17, 12, -3)]
        assert got == [float(f) for f in want]
        got7 = savgol_coefficients(7, 2)
        want7 = [Fraction(n, 21) for n in (-2, 3, 6, 7, 6, 3, -2)]
        assert got7 == [float(f) for f in want7]
        # moving-average degenerate case: polyorder 0 -> uniform weights
        assert savgol_coefficients(3, 0) == [1.0 / 3] * 3

    def test_validation(self):
        import pytest

        from dataqualitykit_spark.operators.anomaly import savgol_coefficients

        with pytest.raises(ValueError, match="window_length"):
            savgol_coefficients(4, 2)
        with pytest.raises(ValueError, match="polyorder"):
            savgol_coefficients(5, 5)

    def test_polynomial_reproduction_and_edges(self, spark):
        # THE Savitzky-Golay property: a degree<=polyorder signal passes
        # through untouched (interior); edge rows emit NULL
        from dataqualitykit_spark.operators.anomaly import savgol_smooth

        rows = [(i, 2.0 * i * i - 3.0 * i + 7.0) for i in range(20)]
        df = spark.createDataFrame(rows, "t long, x double")
        out = {
            r["t"]: r["savgol_x"]
            for r in savgol_smooth(df, "x", "t", 5, 2).collect()
        }
        for t, x in rows:
            if 2 <= t <= 17:
                assert out[t] is not None and abs(out[t] - x) < 1e-9, (t, out[t], x)
            else:
                assert out[t] is None, (t, out[t])

    def test_python_mirror_and_partitions(self, spark):
        from dataqualitykit_spark.operators.anomaly import (
            savgol_coefficients,
            savgol_smooth,
        )

        cs = savgol_coefficients(5, 2)
        rows = [
            (g, i, float(((i * 37 + g * 11) % 101) - 50))
            for g in range(3)
            for i in range(12)
        ]
        df = spark.createDataFrame(rows, "g int, t long, x double")
        out = {
            (r["g"], r["t"]): r["savgol_x"]
            for r in savgol_smooth(df, "x", "t", 5, 2, partition_by=["g"]).collect()
        }
        series = {g: [x for gg, _, x in rows if gg == g] for g in range(3)}
        for g in range(3):
            xs = series[g]
            for t in range(12):
                if t < 2 or t > 9:
                    assert out[(g, t)] is None
                else:
                    want = 0.0
                    for j, c in enumerate(cs):
                        want = want + xs[t - 2 + j] * c if j else xs[t - 2] * c
                    assert out[(g, t)] == want, (g, t)


class TestKalmanSteadyState:
    def test_gain_formula_and_dyadic_default(self):
        from dataqualitykit_spark.operators.anomaly import kalman_smooth  # noqa: F401
        import math

        # q=0.5 -> s=1 -> K=0.5 EXACT (every intermediate dyadic)
        q = 0.5
        s = (q + math.sqrt(q * q + 4 * q)) / 2
        assert s == 1.0 and s / (s + 1) == 0.5

    def test_equals_ewma_with_derived_alpha(self, spark):
        import math

        from dataqualitykit_spark.operators.anomaly import (
            ewma_smooth,
            kalman_smooth,
        )

        rows = [(i, float((i * 13) % 29)) for i in range(50)]
        df = spark.createDataFrame(rows, "t long, x double")
        q = 0.3
        s = (q + math.sqrt(q * q + 4 * q)) / 2
        want = {
            r["t"]: r["ewma_x"]
            for r in ewma_smooth(df, "x", "t", alpha=s / (s + 1)).collect()
        }
        got = {
            r["t"]: r["kalman_x"]
            for r in kalman_smooth(df, "x", "t", q_over_r=q).collect()
        }
        assert got == want

    def test_converges_to_full_kalman_recursion(self, spark):
        # after burn-in the steady-state filter tracks the full
        # time-varying-gain recursion (diffuse prior P0 >> R)
        from dataqualitykit_spark.operators.anomaly import kalman_smooth

        q_over_r = 0.5
        r_var = 1.0
        q_var = q_over_r * r_var
        rows = [(i, float(((i * 7) % 13) - 6)) for i in range(60)]
        lvl, p = rows[0][1], 1e6  # diffuse start
        full = [lvl]
        for _, y in rows[1:]:
            p = p + q_var
            k = p / (p + r_var)
            lvl = lvl + k * (y - lvl)
            p = (1 - k) * p
            full.append(lvl)
        df = spark.createDataFrame(rows, "t long, x double")
        got = {
            r["t"]: r["kalman_x"]
            for r in kalman_smooth(df, "x", "t", q_over_r=q_over_r).collect()
        }
        for t in range(40, 60):  # geometric gain convergence: burn-in passed
            assert abs(got[t] - full[t]) < 1e-6, (t, got[t], full[t])

    def test_validation(self, spark):
        import pytest

        from dataqualitykit_spark.operators.anomaly import kalman_smooth

        df = spark.createDataFrame([(0, 1.0)], "t long, x double")
        with pytest.raises(ValueError, match="q_over_r"):
            kalman_smooth(df, "x", "t", q_over_r=0.0)
