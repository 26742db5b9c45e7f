"""Property-based tests over the shared semantics (no Spark — fast).

These pin invariants the pipeline depends on: determinism, priority
ordering, scrub masking completeness, tokenizer ASCII-ws discipline.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from dataqualitykit_spark import semantics as S
from dataqualitykit_spark.config import DEFAULT_CONFIG, DROP_REASON_ORDER
from dataqualitykit_spark.oracle import run_oracle

text_strategy = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400
)


@given(text_strategy)
@settings(max_examples=200, deadline=None)
def test_scrub_deterministic_and_masks_pii(t):
    a, b = S.scrub_text(t), S.scrub_text(t)
    assert a == b
    # an email injected anywhere never survives the bank
    assert "bob@example.com" not in S.scrub_text(f"{t} bob@example.com")


@given(text_strategy)
@settings(max_examples=200, deadline=None)
def test_doc_reasons_ordered_and_deterministic(t):
    reasons, scrubbed = S.doc_reasons(t, DEFAULT_CONFIG)
    reasons2, scrubbed2 = S.doc_reasons(t, DEFAULT_CONFIG)
    assert reasons == reasons2 and scrubbed == scrubbed2
    order = {r: i for i, r in enumerate(DROP_REASON_ORDER)}
    idx = [order[r] for r in reasons]
    assert idx == sorted(idx), reasons


@given(text_strategy)
@settings(max_examples=200, deadline=None)
def test_tokenize_never_produces_empty_or_ascii_ws_tokens(t):
    for w in S.tokenize(t):
        assert w != ""
        assert not any(c in " \t\n\r\x0b\x0c" for c in w)


@given(text_strategy)
@settings(max_examples=100, deadline=None)
def test_langid_confidence_bounds(t):
    lang, conf = S.langid(t)
    assert 0.0 <= conf <= 1.0
    script_codes = {c for c, _r, _t in S.SCRIPT_RANGES}
    assert lang in set(S.LANG_PROFILES) | script_codes | {"und"}


@given(st.lists(st.integers(0, 2**31), min_size=1, max_size=30), st.integers(0, 5))
@settings(max_examples=50, deadline=None)
def test_oracle_row_count_preserved(seeds, extra):
    # oracle never loses or invents rows, regardless of dup structure
    from datetime import datetime, timedelta

    rows = [
        {
            "url": f"https://x/{v % 7}",
            "warc_ts": datetime(2024, 1, 1) + timedelta(minutes=i),
            "text": f"text {v % 5}",
        }
        for i, v in enumerate(seeds)
    ]
    out = run_oracle(rows)
    assert len(out) == len(rows)
    for r in out:
        assert r.keep == (r.drop_reason is None)


_series = st.lists(
    st.one_of(st.none(), st.floats(-1e6, 1e6, allow_nan=False)),
    max_size=60,
)


@given(_series, st.floats(0.01, 1.0, allow_nan=False))
@settings(max_examples=200, deadline=None)
def test_py_ewma_invariants(xs, alpha):
    from dataqualitykit_spark.operators.anomaly import py_ewma

    out = py_ewma(xs, alpha)
    assert len(out) == len(xs)
    seen: list[float] = []
    for x, y in zip(xs, out):
        if x is not None:
            seen.append(x)
        if not seen:
            assert y is None  # leading NULLs stay None
        else:
            # a convex recurrence can never leave the hull of its inputs
            assert min(seen) - 1e-9 <= y <= max(seen) + 1e-9
    # constant series is a fixed point — up to 1 ulp per step:
    # alpha*x + (1-alpha)*x lands off x when alpha + (1-alpha) rounds
    # away from 1 in float (e.g. alpha=0.01953663697760049)
    const = py_ewma([5.0] * max(len(xs), 1), alpha)
    assert all(abs(v - 5.0) <= 5.0 * 1e-13 for v in const)


@given(_series)
@settings(max_examples=200, deadline=None)
def test_py_linear_interpolate_invariants(xs):
    from dataqualitykit_spark.operators.anomaly import py_linear_interpolate

    out = py_linear_interpolate(xs)
    assert len(out) == len(xs)
    known = [i for i, x in enumerate(xs) if x is not None]
    for i, (x, y) in enumerate(zip(xs, out)):
        if x is not None:
            assert y == x  # non-null inputs never change
        elif not known or i < known[0] or i > known[-1]:
            assert y is None  # leading/trailing runs stay NULL
        else:
            lo = max(j for j in known if j < i)
            hi = min(j for j in known if j > i)
            a, b = sorted((xs[lo], xs[hi]))
            assert a - 1e-9 <= y <= b + 1e-9  # fill stays between neighbors
    # idempotence: a fully-interpolated interior has no NULLs left to fill
    assert py_linear_interpolate(out) == out
