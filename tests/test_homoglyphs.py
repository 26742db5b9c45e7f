"""Homoglyph folding: Cyrillic/Greek/fullwidth confusables back to ASCII,
the fold count as a spam signal, DuckDB twin parity on the shared
constants, and the dedup-evasion closure it exists for."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from dataqualitykit_spark.operators.encoding import (
    HOMOGLYPH_DST,
    HOMOGLYPH_SRC,
    fold_homoglyphs,
)


def test_fold_and_count(spark):
    rows = [
        (0, "рaу оnline сasinо"),  # Cyrillic evasion (р о с у о)
        (1, "plain ascii text"),
        (2, "ｉｎｓｔａｎｔ ＤＥＡＬ"),  # fullwidth
        (3, "Οmega νiew"),  # Greek capital omicron, nu
        (4, None),
        (5, "café naïve"),  # accents are NOT confusables
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {r["id"]: r for r in fold_homoglyphs(df).collect()}
    assert got[0]["text_folded"] == "pay online casino"
    assert got[0]["homoglyph_count"] == 5
    assert got[1]["text_folded"] == "plain ascii text"
    assert got[1]["homoglyph_count"] == 0
    assert got[2]["text_folded"] == "instant DEAL"
    assert got[3]["text_folded"] == "Omega view"
    assert got[4]["text_folded"] is None and got[4]["homoglyph_count"] is None
    assert got[5]["text_folded"] == "café naïve"
    assert got[5]["homoglyph_count"] == 0


def test_duckdb_twin(spark):
    samples = ["русо mixed", "ａｂｃ fullwidth", "Ον greek", "plain"]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "id int, text string"
    )
    got = {r["id"]: r for r in fold_homoglyphs(df).collect()}
    con = duckdb.connect()
    for i, s in enumerate(samples):
        folded, cnt = con.execute(
            "SELECT translate(?, ?, ?), length(?) - length(translate(?, ?, ''))",
            [s, HOMOGLYPH_SRC, HOMOGLYPH_DST, s, s, HOMOGLYPH_SRC],
        ).fetchone()
        assert got[i]["text_folded"] == folded, i
        assert got[i]["homoglyph_count"] == cnt, i


def test_fold_closes_dedup_evasion(spark):
    base = "free crypto now click here"
    evaded = base.replace("o", "о").replace("e", "е")
    assert evaded != base
    df = spark.createDataFrame([(0, base), (1, evaded)], "id int, text string")
    out = fold_homoglyphs(df).select(
        F.md5(F.col("text_folded")).alias("hf"),
        F.md5(F.col("text")).alias("hr"),
    ).collect()
    assert out[0]["hf"] == out[1]["hf"]  # folded keys collide
    assert out[0]["hr"] != out[1]["hr"]  # raw keys evade


def test_zero_shuffle(spark):
    df = spark.createDataFrame([(1, "x")], "id int, text string")
    plan = fold_homoglyphs(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
