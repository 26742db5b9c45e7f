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
