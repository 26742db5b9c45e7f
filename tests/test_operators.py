"""Operator unit tests pinned to the REFERENCE's own golden values
(SURVEY.md §5.1 table) — the semantics we inherit, on the fixtures the
reference tests use."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dataqualitykit_spark.operators import (
    anomaly,
    categorical,
    dedup,
    dtype,
    encoding,
    formats,
    missing,
    range_validity,
)


@pytest.fixture(scope="module")
def range_df(spark):
    # reference fixture tests/test_range_validity.py:10-21
    rows = [(i, 25 + 10 * i, 1000.0 * (i + 1)) for i in range(10)]
    return spark.createDataFrame(rows, "id int, age int, salary double")


def test_range_flag_golden(spark, range_df):
    # boundaries {20,100}: below_min=0, above_max=2 (:32-33)
    out = range_validity.flag(range_df, "age", 20, 100)
    agg = out.agg(
        F.sum("age_below_min").alias("b"), F.sum("age_above_max").alias("a")
    ).first()
    assert agg["b"] == 0 and agg["a"] == 2


def test_range_cap_golden(spark, range_df):
    # cap -> first=25, last=100 (:39-40)
    vals = [
        r["age"]
        for r in range_validity.cap(range_df, "age", 20, 100).orderBy("id").collect()
    ]
    assert vals[0] == 25 and vals[-1] == 100


def test_range_remove_golden(spark, range_df):
    # remove -> count 8 (:46)
    assert range_validity.remove(range_df, "age", 20, 100).count() == 8


def test_log_transform_golden(spark, range_df):
    # log(1000) = 6.907755 (:52)
    v = (
        range_df.select(range_validity.log_transform("salary").alias("l"))
        .orderBy("salary")
        .first()["l"]
    )
    assert math.isclose(v, 6.907755, abs_tol=1e-6)


@pytest.fixture(scope="module")
def dup_df(spark):
    # reference fixture tests/test_duplicate_values.py:10-16 (2 dup pairs)
    rows = [
        (1, "john", "2023-01-01", 100.0),
        (2, "john", "2023-01-01", 100.0),
        (3, "jane", "2023-01-02", 200.0),
        (4, "jane", "2023-01-02", 200.0),
        (5, "alice", "2023-01-03", 300.0),
    ]
    return spark.createDataFrame(rows, "id int, name string, date string, amount double")


def test_duplicate_stats_golden(spark, dup_df):
    # duplicate_count=2, affected_rows=4 — ALL rows in dup groups (:25-26)
    r = dedup.duplicate_stats(dup_df, ["name", "date", "amount"]).first()
    assert r["duplicate_count"] == 2
    assert r["affected_rows"] == 4


def test_dedup_keep_first_golden(spark, dup_df):
    # keep-first -> 3 rows (:38)
    out = dedup.dedup_exact(dup_df, ["name", "date", "amount"], order_by=[F.col("id")])
    assert out.count() == 3
    assert {r["id"] for r in out.collect()} == {1, 3, 5}


def test_encoding_goldens(spark):
    # reference tests/test_encoding_conformity.py:10,44,51,57-58
    df = spark.createDataFrame(
        [("normal text",), ("text with special char é",), ("invalid \x80 text",)],
        "text string",
    )
    rm = [r["text"] for r in encoding.remove_invalid(df, "text").collect()]
    assert "invalid  text" in rm
    # printable non-ASCII SURVIVES remove (reference golden :44-45)
    assert "text with special char é" in rm
    rp = [r["text"] for r in encoding.replace_invalid(df, "text").collect()]
    assert "invalid ? text" in rp
    # ... and survives replace too (reference golden :50-51)
    assert "text with special char é" in rp
    enc = [r["text"] for r in encoding.encode_xmlcharref(df, "text").collect()]
    assert "text with special char &#233;" in enc
    assert "invalid &#128; text" in enc
    det = encoding.detect_encoding_profile(
        spark.createDataFrame([("plain",), ("ascii only",)], "text string"), "text"
    ).first()
    assert det["detected_encoding"] == "ascii"


def test_format_phone_goldens(spark):
    # reference tests/test_format_consistency.py:36,41-42,51-52
    df = spark.createDataFrame(
        [("123-456-7890",), ("(123) 456-7890",), ("123.456.7890",), ("invalid_phone",)],
        "phone string",
    )
    chk = formats.check(df, "phone", "phone").first()
    assert chk["total_count"] == 4 and chk["invalid_format_count"] == 1
    std = [r["phone"] for r in formats.standardize_phone(df, "phone").collect()]
    assert std.count("+1-123-456-7890") == 3
    assert None in std  # invalid_phone -> NULL
    scrubbed = formats.scrub_invalid(df, "phone", "phone")
    assert scrubbed.count() == 3


def test_format_date_golden(spark):
    # date: total=4, invalid_format=3 under ISO expectation (:22-23)
    df = spark.createDataFrame(
        [("2023-01-01",), ("01/15/2023",), ("15-01-2023",), ("not_a_date",)],
        "birth_date string",
    )
    chk = formats.check(df, "birth_date", "date").first()
    assert chk["total_count"] == 4 and chk["invalid_format_count"] == 3
    std = [r["birth_date"] for r in formats.standardize_date(df, "birth_date").collect()]
    assert std.count("2023-01-01") == 1 and std.count("2023-01-15") == 2
    assert None in std


def test_format_address_golden(spark):
    # street/city/state/zip parse (:64-67)
    df = spark.createDataFrame(
        [("123 Main St, Springfield, IL 62704",)], "addr string"
    )
    r = formats.parse_address(df, "addr").first()
    assert r["street"] == "123 Main St"
    assert r["city"] == "Springfield"
    assert r["state"] == "IL"
    assert r["zip"] == "62704"


def test_zscore_golden(spark):
    # [1,2,3,100,5..10] zscore k=2 removes 100 (tests/test_statistical_anomaly.py:44-46)
    df = spark.createDataFrame(
        [(v,) for v in [1, 2, 3, 100, 5, 6, 7, 8, 9, 10]], "value int"
    )
    out = anomaly.remove_outliers_zscore(df, "value", 2.0)
    vals = {r["value"] for r in out.collect()}
    assert 100 not in vals and len(vals) == 9


def test_moving_average_golden(spark):
    # ma_3/ma_5 columns exist (:50-52)
    df = spark.createDataFrame([(i, float(i)) for i in range(10)], "idx int, value double")
    out = anomaly.moving_average(df, "value", "idx", windows=[3, 5])
    assert "ma_3" in out.columns and "ma_5" in out.columns
    rows = out.orderBy("idx").collect()
    assert math.isclose(rows[2]["ma_3"], 1.0)  # avg(0,1,2)
    assert math.isclose(rows[9]["ma_5"], 7.0)  # avg(5..9)


def test_missing_fill_and_counts(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("",), ("  ",), ("NA",), ("x",)], "v string"
    )
    counts = missing.missing_counts(df, ["v"]).first()
    assert counts["v_missing"] == 4 and counts["total_rows"] == 6
    filled = missing.fill_missing(df, {"v": "filled"})
    assert filled.filter(F.col("v") == "filled").count() == 4
    assert missing.drop_missing(df, ["v"]).count() == 2


def test_dtype_conformity(spark):
    # reference tests/test_data_type_conformity.py:16-30 semantics (corrected
    # P9: genuine NULLs are not violations)
    df = spark.createDataFrame(
        [("1.5",), ("2.0",), ("invalid_double",), (None,)], "value string"
    )
    r = dtype.cast_violations(df, "value", "double").first()
    assert r["violations"] == 1
    assert r["violation_percentage"] > 0
    coerced = dtype.coerce(df, "value", "double", flag=True)
    assert coerced.filter(F.col("value").isNull()).count() == 2  # NULL + failed cast
    assert coerced.filter(F.col("value_cast_failed") == 1).count() == 1


def test_categorical_ops(spark):
    df = spark.createDataFrame(
        [("A",)] * 50 + [("B",)] * 30 + [("C",)] * 19 + [("rare",)], "cat string"
    )
    m = categorical.mode_value(df, "cat").first()
    assert m["cat"] == "A" and m["frequency"] == 50
    rare = categorical.rare_categories(df, "cat", 0.02).collect()
    assert [r["cat"] for r in rare] == ["rare"]
    grouped = categorical.group_rare_as_other(df, "cat", 0.02)
    assert grouped.filter(F.col("cat") == "Other").count() == 1
    inv = categorical.invalid_categories(df, "cat", ["A", "B", "C"]).first()
    assert inv["invalid_count"] == 1


def test_spelling_variant_report(spark):
    # reference check_spelling_variants (:1182-1283): pairs >= threshold,
    # identity matches included, refs default to top-frequency values
    rows = (
        [("MACHINERY",)] * 20
        + [("MACHINRY",)] * 2
        + [("BUILDING",)] * 15
        + [("HOUSE",)] * 5
    )
    df = spark.createDataFrame(rows, "seg string")
    out = {
        (r["value"], r["reference"]): r["similarity"]
        for r in categorical.spelling_variant_report(df, "seg", threshold=0.85).collect()
    }
    assert out[("MACHINERY", "MACHINERY")] == 1.0
    assert ("MACHINRY", "MACHINERY") in out and out[("MACHINRY", "MACHINERY")] > 0.95
    assert ("HOUSE", "BUILDING") not in out
    # explicit reference list narrows the ref side
    out2 = {
        (r["value"], r["reference"])
        for r in categorical.spelling_variant_report(
            df, "seg", reference_values=["MACHINERY"], threshold=0.85
        ).collect()
    }
    assert out2 == {("MACHINERY", "MACHINERY"), ("MACHINRY", "MACHINERY")}


def test_map_categories_reference_legs(spark):
    # map_to_standard_categories (:1286-1354): case-insensitive matching,
    # keep/null/'Other' unknown handling
    df = spark.createDataFrame(
        [("Red",), ("BLUE",), ("green",), ("mauve",)], "c string"
    )
    def vals(out):
        return [r["c"] for r in out.orderBy("c").collect()]

    m = {"red": "R", "blue": "B"}
    assert sorted(vals(categorical.map_categories(df, "c", m, case_sensitive=False))) \
        == sorted(["R", "B", "green", "mauve"])
    assert sorted(
        vals(categorical.map_categories(df, "c", m, case_sensitive=False,
                                        unknown_value="Other")),
    ) == sorted(["R", "B", "Other", "Other"])
    out = categorical.map_categories(df, "c", m, keep_unknown=False,
                                     case_sensitive=False)
    assert sorted(v for v in vals(out) if v is not None) == ["B", "R"]
    # case-sensitive default: only exact keys map
    assert sorted(vals(categorical.map_categories(df, "c", {"Red": "R"}))) \
        == sorted(["R", "BLUE", "green", "mauve"])
