"""W4/W5 corrected windows, A13 imputation, CUSUM, fuzzy correction."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dataqualitykit_spark import semantics as S
from dataqualitykit_spark.operators import anomaly, categorical


def test_weighted_moving_average(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(6)], "idx int, v double")
    out = anomaly.weighted_moving_average(df, "v", "idx", [1.0, 2.0, 3.0])
    rows = {r["idx"]: r["wma_3"] for r in out.collect()}
    # idx=2: (0*1 + 1*2 + 2*3)/6 = 8/6
    assert math.isclose(rows[2], 8 / 6)
    assert rows[0] is None and rows[1] is None  # frame not full


def test_centered_moving_average(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(5)], "idx int, v double")
    out = anomaly.centered_moving_average(df, "v", "idx", k=3)
    rows = {r["idx"]: r["cma_3"] for r in out.collect()}
    assert math.isclose(rows[2], 2.0)  # avg(1,2,3)
    assert math.isclose(rows[0], 0.5)  # avg(0,1) at the edge


def test_impute_mean(spark):
    df = spark.createDataFrame(
        [(1.0,), (2.0,), (3.0,), (None,)], "v double"
    )
    out = anomaly.impute(df, ["v"], "mean")
    vals = sorted(r["v"] for r in out.collect())
    assert math.isclose(vals[1], 2.0)  # the imputed value (mean of 1,2,3)
    assert None not in vals


def test_cusum_finds_level_shift():
    series = [1.0] * 20 + [5.0] * 20
    breaks = anomaly.cusum_changepoints(series, threshold=2.0)
    assert breaks, "level shift not detected"
    assert min(breaks) >= 20  # fires after the shift, not before
    assert not anomaly.cusum_changepoints([1.0] * 40, threshold=2.0)


def test_jaro_winkler_known_values():
    # classic textbook pair
    assert math.isclose(S.jaro_winkler("MARTHA", "MARHTA"), 0.9611, abs_tol=1e-4)
    assert math.isclose(S.jaro_winkler("DWAYNE", "DUANE"), 0.84, abs_tol=1e-2)
    assert S.jaro_winkler("same", "same") == 1.0
    assert S.jaro_winkler("abc", "xyz") == 0.0


def test_fuzzy_correct(spark):
    df = spark.createDataFrame(
        [("electronics",), ("electroncs",), ("elektronics",), ("garden",)],
        "cat string",
    )
    out = categorical.fuzzy_correct(df, "cat", ["electronics", "garden"], 0.85)
    vals = [r["cat"] for r in out.collect()]
    assert vals.count("electronics") == 3
    assert "garden" in vals
