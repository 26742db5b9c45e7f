"""Luhn-validated credit-card scrubbing (operators/pii.py)."""

from __future__ import annotations

from dataqualitykit_spark.operators.pii import (
    luhn_valid,
    py_scrub_credit_cards,
    scrub_credit_cards,
)

VALID = "4532015112830366"       # classic Visa test number (Luhn-valid)
INVALID = "4532015112830367"     # last digit bumped


def test_luhn_known_numbers():
    assert luhn_valid(VALID)
    assert not luhn_valid(INVALID)
    assert luhn_valid("79927398713")  # the canonical Luhn example
    assert not luhn_valid("79927398710")


def test_scrub_valid_only():
    s, nc, nv = py_scrub_credit_cards(f"pay {VALID} or {INVALID} now")
    assert (nc, nv) == (2, 1)
    assert s == f"pay <CC> or {INVALID} now"


def test_scrub_with_separators():
    dashed = "4532-0151-1283-0366"
    spaced = "4532 0151 1283 0366"
    s, nc, nv = py_scrub_credit_cards(f"a {dashed} b {spaced} c")
    assert (nc, nv) == (2, 2)
    assert s == "a <CC> b <CC> c"


def test_length_bounds():
    # 12 digits: below the 13-digit minimum -> not a candidate
    assert py_scrub_credit_cards("x 123456789012 y")[1] == 0
    # 20+ digit runs never match (trailing \b can't land mid-run)
    assert py_scrub_credit_cards("x 45320151128303660000 y")[1] == 0


def test_empty_and_none():
    assert py_scrub_credit_cards("") == ("", 0, 0)
    assert py_scrub_credit_cards(None) == ("", 0, 0)
    assert py_scrub_credit_cards("no digits here") == ("no digits here", 0, 0)


def test_adjacent_to_punctuation():
    s, nc, nv = py_scrub_credit_cards(f"({VALID}).")
    assert (nc, nv) == (1, 1)
    assert s == "(<CC>)."


def test_spark_matches_mirror(spark):
    docs = [
        (0, f"card {VALID} end"),
        (1, f"bad {INVALID} end"),
        (2, None),
        (3, "plain text"),
        (4, f"two: 4532-0151-1283-0366 and {INVALID}"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["cc_scrubbed"], r["n_cc_candidates"], r["n_cc_valid"])
        for r in scrub_credit_cards(df).collect()
    }
    for i, t in docs:
        assert got[i] == py_scrub_credit_cards(t), f"doc {i}"
