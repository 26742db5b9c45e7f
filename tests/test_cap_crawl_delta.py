"""Goldens for cap_per_group (FineWeb per-domain output cap) and
crawl_delta (re-crawl corpus diff)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from dataqualitykit_spark.operators.crawl import crawl_delta
from dataqualitykit_spark.operators.sampling import cap_per_group


def test_cap_per_group_matches_one_window_oracle(spark):
    """Row-identical to the naive row_number-per-group form, including
    the NULL group; groups under the cap pass wholesale."""
    rows = [(i, ["a", "b", None][i % 3]) for i in range(90)] + [
        (1000, "tiny"), (1001, "tiny")
    ]
    df = spark.createDataFrame(rows, "id long, grp string")
    got = {
        (r["id"], r["grp"])
        for r in cap_per_group(df, 10, by="grp", id_col="id").collect()
    }
    # python mirror: same (md5(str(id)), id) order per group
    by_grp: dict = {}
    for i, g in rows:
        by_grp.setdefault(g, []).append(i)
    expect = set()
    for g, ids in by_grp.items():
        ids.sort(key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        expect |= {(i, g) for i in ids[:10]}
    assert got == expect
    # the under-cap group survives whole
    assert (1000, "tiny") in got and (1001, "tiny") in got
    # every over-cap group is cut to exactly 10
    for g in ("a", "b", None):
        assert sum(1 for _, gg in got if gg == g) == 10


def test_crawl_delta_statuses(spark):
    old = spark.createDataFrame(
        [("u1", "same"), ("u2", "before"), ("u3", "gone"), ("u4", None)],
        "url string, text string",
    )
    new = spark.createDataFrame(
        [("u1", "same"), ("u2", "after"), ("u5", "fresh"), ("u4", "")],
        "url string, text string",
    )
    got = {r["url"]: r["status"] for r in crawl_delta(old, new).collect()}
    assert got == {
        "u1": "unchanged",
        "u2": "changed",
        "u3": "removed",
        "u5": "new",
        # NULL and '' share the content-hash convention: NOT a change
        "u4": "unchanged",
    }


def test_cap_per_group_no_whole_group_window(spark):
    """Plan shape: the cut windows only the cutoff bucket — the sort
    inside the Window covers a filtered fraction, never the full input
    (inherited from sample_to_token_budget; pinned here so a future
    rewrite to a naive per-group window fails loudly)."""
    df = spark.range(0, 2000).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("grp")
    )
    plan = (
        cap_per_group(df, 100, by="grp", id_col="id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the bucket machinery is in the plan: the window partitions on
    # (_g, _bkt) — the boundary bucket — not on the bare group
    assert "_bkt" in plan, plan[:2000]
    out = cap_per_group(df, 100, by="grp", id_col="id")
    counts = {
        r["grp"]: r["count"]
        for r in out.groupBy("grp").count().collect()
    }
    assert counts == {"0": 100, "1": 100, "2": 100}


def test_sample_to_mixture_proportions(spark):
    """Mixture quotas: the binding group is taken whole, the others cut
    to proportion; groups absent from the target mix drop entirely; kept
    token mass per group never exceeds quota and the next doc in order
    would cross it."""
    import hashlib
    import math

    from dataqualitykit_spark.operators.sampling import sample_to_mixture

    rows = []
    for i in range(300):
        g = ["en", "de", "fr", "es"][i % 4]
        rows.append((i, g, "tok " * (i % 9 + 1)))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    props = {"en": 0.5, "de": 0.25, "fr": 0.25}
    out = sample_to_mixture(df, props, by="lang", id_col="doc_id").collect()
    assert all(r["lang"] in props for r in out)

    # python mirror of the quota math + prefix cut
    from dataqualitykit_spark.semantics import tokenize

    n_of = {i: len(tokenize(t)) for i, g, t in rows}
    avail = {}
    for i, g, _ in rows:
        if g in props:
            avail[g] = avail.get(g, 0) + n_of[i]
    t_total = min(avail[g] / f for g, f in props.items())
    quotas = {g: int(math.floor(f * t_total)) for g, f in props.items()}
    expect = set()
    for g in props:
        ids = [i for i, gg, _ in rows if gg == g]
        ids.sort(key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        run = 0
        for i in ids:
            run += n_of[i]
            if run > quotas[g]:
                break
            expect.add(i)
    assert {r["doc_id"] for r in out} == expect
    # the binding group is kept whole
    binding = min(props, key=lambda g: avail[g] / props[g])
    kept_binding = sum(1 for r in out if r["lang"] == binding)
    assert kept_binding == sum(1 for i, g, _ in rows if g == binding)


def test_sample_to_token_budget_dict_budgets(spark):
    from dataqualitykit_spark.operators.sampling import sample_to_token_budget

    df = spark.createDataFrame(
        [(i, ["a", "b", None][i % 3], "t t t") for i in range(90)],
        "doc_id long, g string, text string",
    )
    out = sample_to_token_budget(
        df, {"a": 9, None: 3}, by="g", id_col="doc_id"
    ).collect()
    by_g: dict = {}
    for r in out:
        by_g[r["g"]] = by_g.get(r["g"], 0) + r["n_tokens"]
    # 'a' capped at 9 tokens (3 docs), NULL group at 3, 'b' absent -> dropped
    assert by_g == {"a": 9, None: 3}


def test_sample_to_mixture_missing_group_raises(spark):
    """A requested group with frac > 0 but no rows (typo'd key) must
    raise, not silently recompute T from the remaining groups (ADVICE
    round 5)."""
    import pytest

    from dataqualitykit_spark.operators.sampling import sample_to_mixture

    df = spark.createDataFrame(
        [(i, ["en", "de"][i % 2], "tok tok tok") for i in range(40)],
        "doc_id long, lang string, text string",
    )
    with pytest.raises(ValueError, match="engl"):
        sample_to_mixture(
            df, {"en": 0.5, "engl": 0.5}, by="lang", id_col="doc_id"
        )
    # explicit total_tokens bypasses feasibility (quota just goes unfilled)
    out = sample_to_mixture(
        df,
        {"en": 0.5, "engl": 0.5},
        by="lang",
        id_col="doc_id",
        total_tokens=12,
    ).collect()
    assert {r["lang"] for r in out} == {"en"}
    assert sum(r["n_tokens"] for r in out) <= 6


def test_sample_to_token_budget_bool_group_keys(spark):
    """Boolean dict keys must render Spark-style ('true') so the group
    budget actually applies (ADVICE round 5: str(True)='True' used to
    hash to a different sentinel and silently budget the group 0)."""
    from dataqualitykit_spark.operators.sampling import sample_to_token_budget

    df = spark.createDataFrame(
        [(i, i % 2 == 0, "t t t") for i in range(60)],
        "doc_id long, flag boolean, text string",
    )
    out = sample_to_token_budget(
        df, {True: 9, False: 6}, by="flag", id_col="doc_id"
    ).collect()
    by_g: dict = {}
    for r in out:
        by_g[r["flag"]] = by_g.get(r["flag"], 0) + r["n_tokens"]
    assert by_g == {True: 9, False: 6}


def test_sample_to_token_budget_bad_key_type(spark):
    import pytest

    from dataqualitykit_spark.operators.sampling import sample_to_token_budget

    df = spark.createDataFrame(
        [(1, "a", "t")], "doc_id long, g string, text string"
    )
    with pytest.raises(TypeError, match="unsupported type"):
        sample_to_token_budget(df, {("a",): 5}, by="g", id_col="doc_id")
