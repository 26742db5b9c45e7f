"""Shapiro-Francia normality (distributed global-rank Blom scores) +
LOWESS tricube kernel smoothing — the final two legs of the reference's
scipy U10 surface (QualityControl.py collects the column and calls
scipy.stats.shapiro / statsmodels lowess driver-side; here both are
distributed: bucketed prefix-sum ranks + fixed-point sums, and an
exact-rational centered FIR)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dataqualitykit_spark.functions.stats import (
    probit_py,
    probit_sql,
    P_LOW,
)
from dataqualitykit_spark.operators import anomaly
from dataqualitykit_spark.operators.corpus_stats import shapiro_francia


# ---------------------------------------------------------------- probit
class TestProbit:
    def test_known_quantiles(self):
        known = {
            0.5: 0.0,
            0.975: 1.959963984540054,
            0.025: -1.959963984540054,
            0.8413447460685429: 1.0,  # Phi(1)
            0.0001: -3.719016485455709,
            0.9999: 3.719016485455709,
        }
        for p, z in known.items():
            assert abs(probit_py(p) - z) <= max(1.3e-9, abs(z) * 1.3e-9)

    def test_duckdb_matches_python_bitwise(self):
        duckdb = pytest.importorskip("duckdb")
        con = duckdb.connect()
        con.execute(
            "create table g as "
            "select (i + 0.5) / 5000.0 as p from range(5000) t(i)"
        )
        rows = con.execute(f"select p, {probit_sql('p')} from g").fetchall()
        assert all(probit_py(p) == v for p, v in rows)

    def test_branch_boundaries_continuous(self):
        for edge in (P_LOW, 1.0 - P_LOW):
            lo = probit_py(edge - 1e-12)
            hi = probit_py(edge + 1e-12)
            assert abs(hi - lo) < 1e-6

    def test_spark_column_matches_python(self, spark):
        ps = [(i + 0.5) / 400.0 for i in range(400)]
        df = spark.createDataFrame([(p,) for p in ps], "p double")
        from dataqualitykit_spark.functions.stats import probit_col

        got = {
            r["p"]: r["z"]
            for r in df.select("p", probit_col(F.col("p")).alias("z")).collect()
        }
        # JVM libm ln/sqrt may differ from CPython by ulps in the tails
        for p in ps:
            assert abs(got[p] - probit_py(p)) < 1e-12


# ------------------------------------------------------- shapiro-francia
def py_shapiro_francia(xs: list[float]) -> float:
    """Plain-python mirror with the same Blom scores and the same
    fixed-point micro-unit accumulation."""
    order = sorted(range(len(xs)), key=lambda i: xs[i])
    n = len(xs)

    def micro(x):
        return math.floor(x * 1e6 + 0.5)

    s_mv = s_mm = s_v = s_vv = 0
    for rank0, idx in enumerate(order):
        m = probit_py((rank0 + 1 - 0.375) / (n + 0.25))
        v = xs[idx]
        s_mv += micro(m * v)
        s_mm += micro(m * m)
        s_v += micro(v)
        s_vv += micro(v * v)
    smv, smm, sv, svv = (s / 1e6 for s in (s_mv, s_mm, s_v, s_vv))
    ssq = svv - sv * sv / float(n)
    return (smv * smv) / (smm * ssq)


class TestShapiroFrancia:
    def _df(self, spark, xs):
        return spark.createDataFrame(
            [(i, float(x)) for i, x in enumerate(xs)], "id long, v double"
        )

    def test_matches_python_mirror(self, spark):
        xs = [math.sin(i * 0.7) * 40 + (i * 37 % 101) for i in range(300)]
        got = shapiro_francia(self._df(spark, xs), "v", "id").collect()[0]
        assert got["n_obs"] == 300
        assert abs(got["w_stat"] - py_shapiro_francia(xs)) < 1e-9

    def test_normal_scores_near_one_uniform_lower(self, spark):
        n = 500
        # perfectly normal-scored data: x_i = probit(i/(n+1))
        normal = [probit_py((i + 1) / (n + 1.0)) for i in range(n)]
        uniform = [float(i) for i in range(n)]
        w_norm = shapiro_francia(self._df(spark, normal), "v", "id").collect()[
            0
        ]["w_stat"]
        w_unif = shapiro_francia(self._df(spark, uniform), "v", "id").collect()[
            0
        ]["w_stat"]
        assert w_norm > 0.999
        assert w_unif < w_norm
        assert w_unif < 0.97

    def test_partitioning_invariant(self, spark):
        xs = [((i * 73) % 211) * 0.5 for i in range(400)]
        df = self._df(spark, xs)
        a = shapiro_francia(df, "v", "id").collect()[0]["w_stat"]
        b = shapiro_francia(df.repartition(17), "v", "id", n_buckets=7).collect()[
            0
        ]["w_stat"]
        assert a == b  # fixed-point sums: bit-identical across shapes

    def test_ties_and_errors(self, spark):
        xs = [1.0, 1.0, 1.0, 2.0, 2.0, 3.0, 4.0, 5.0]
        out = shapiro_francia(self._df(spark, xs), "v", "id").collect()[0]
        assert 0.0 < out["w_stat"] <= 1.0
        with pytest.raises(ValueError, match=">= 5"):
            shapiro_francia(self._df(spark, [1.0, 2.0]), "v", "id").collect()
        with pytest.raises(ValueError, match="no non-null"):
            empty = spark.createDataFrame([], "id long, v double")
            shapiro_francia(empty, "v", "id")


# ----------------------------------------------------------------- lowess
class TestLowess:
    def test_coefficients_exact_properties(self):
        for h in (1, 2, 5, 8):
            cs = anomaly.lowess_coefficients(h)
            assert len(cs) == 2 * h + 1
            assert abs(sum(cs) - 1.0) < 1e-15
            assert cs == cs[::-1]  # symmetric
            assert all(c > 0 for c in cs)
            # tricube: monotone decreasing from the center
            assert all(cs[i] >= cs[i + 1] for i in range(h, 2 * h))
        with pytest.raises(ValueError):
            anomaly.lowess_coefficients(0)

    def _series(self, spark, xs):
        rows = [("p", i, float(x)) for i, x in enumerate(xs)]
        return spark.createDataFrame(rows, "grp string, pos long, x double")

    def test_linear_reproduced_exactly_interior(self, spark):
        xs = [3.0 * i - 7.0 for i in range(40)]
        out = anomaly.lowess_smooth(
            self._series(spark, xs), "x", "pos", half_window=4,
            partition_by=["grp"],
        )
        rows = {r["pos"]: r["lowess_x"] for r in out.collect()}
        for i in range(4, 36):
            assert abs(rows[i] - xs[i]) < 1e-9
        for i in (0, 3, 36, 39):  # edges NULL
            assert rows[i] is None

    def test_smooths_noise_toward_trend(self, spark):
        xs = [
            10.0 + 0.5 * i + (7.0 if i % 2 == 0 else -7.0) for i in range(60)
        ]
        out = anomaly.lowess_smooth(
            self._series(spark, xs), "x", "pos", half_window=5,
            partition_by=["grp"],
        )
        rows = {r["pos"]: r["lowess_x"] for r in out.collect()}
        resid = [abs(rows[i] - (10.0 + 0.5 * i)) for i in range(5, 55)]
        assert max(resid) < 2.0  # raw noise amplitude is 7

    def test_partition_isolation(self, spark):
        rows = [("a", i, float(i)) for i in range(10)] + [
            ("b", i, 100.0 - i) for i in range(10)
        ]
        df = spark.createDataFrame(rows, "grp string, pos long, x double")
        out = anomaly.lowess_smooth(
            df, "x", "pos", half_window=2, partition_by=["grp"]
        )
        got = {(r["grp"], r["pos"]): r["lowess_x"] for r in out.collect()}
        assert abs(got[("a", 5)] - 5.0) < 1e-12
        assert abs(got[("b", 5)] - 95.0) < 1e-12
