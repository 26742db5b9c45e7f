"""Domain link graph: outlink extraction, edge aggregation, fixed-point
PageRank (operators/linkgraph.py)."""

from pyspark.sql import functions as F

from dataqualitykit_spark.operators import linkgraph


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


def test_extract_outlinks_absolute_double_quoted_only(spark):
    html = (
        '<p>x</p><a href="https://a.example/1">one</a>'
        '<A CLASS="z" HREF="HTTPS://b.example/2">two</A>'  # case-insensitive
        "<a href='https://sq.example/3'>single-quoted: skipped</a>"
        '<a href="/relative">skipped</a>'
        '<a href="ftp://f.example/4">non-http: skipped</a>'
        '<a\nhref="https://c.example/5">tag spans lines</a>'
        '<a href="https://a.example/1">repeat</a>'
    )
    out = linkgraph.extract_outlinks(
        _pages(spark, [("https://src.example/p", html)])
    )
    got = sorted(r["out_url"] for r in out.collect())
    assert got == [
        "HTTPS://b.example/2",
        "https://a.example/1",
        "https://c.example/5",
    ]
    # multiplicity kept when distinct_per_page=False
    raw = linkgraph.extract_outlinks(
        _pages(spark, [("https://src.example/p", html)]),
        distinct_per_page=False,
    )
    assert sorted(r["out_url"] for r in raw.collect()).count("https://a.example/1") == 2


def test_extract_outlinks_binary_html(spark):
    df = spark.createDataFrame(
        [("https://s.example/p", '<a href="https://t.example/x">y</a>'.encode())],
        "url string, html binary",
    )
    out = linkgraph.extract_outlinks(df).collect()
    assert [(r["url"], r["out_url"]) for r in out] == [
        ("https://s.example/p", "https://t.example/x")
    ]


def test_domain_link_graph_drops_self_and_counts(spark):
    links = spark.createDataFrame(
        [
            ("https://a.example/1", "https://b.example/x"),
            ("https://a.example/2", "https://b.example/y"),
            ("https://a.example/3", "https://a.example/nav"),  # self: dropped
            ("https://b.example/1", "https://a.example/z"),
            ("not a url", "https://b.example/q"),  # no host: dropped
        ],
        "url string, out_url string",
    )
    got = {
        (r["src_domain"], r["dst_domain"]): r["n_links"]
        for r in linkgraph.domain_link_graph(links).collect()
    }
    assert got == {("a.example", "b.example"): 2, ("b.example", "a.example"): 1}
    with_self = {
        (r["src_domain"], r["dst_domain"]): r["n_links"]
        for r in linkgraph.domain_link_graph(links, drop_self=False).collect()
    }
    assert with_self[("a.example", "a.example")] == 1


def _py_pagerank(edges, n_iter=5, damping_pct=85):
    """Sequential mirror of the fixed-point update — exact equality is
    the point of the bigint design (python // == Spark div for the
    all-positive values here)."""
    from collections import defaultdict

    out_w = defaultdict(int)
    for s, _, w in edges:
        out_w[s] += w
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    rank = {v: 1_000_000 for v in nodes}
    base = (100 - damping_pct) * 10_000
    for _ in range(n_iter):
        acc = defaultdict(int)
        for s, d, w in edges:
            acc[d] += rank[s] * w // out_w[s]
        rank = {v: base + damping_pct * acc[v] // 100 for v in nodes}
    return rank


def test_domain_pagerank_matches_python_mirror_exactly(spark):
    # deterministic 9-node graph with a hub, a dangling sink, weights > 1
    edges = []
    for i in range(9):
        edges.append((f"d{i}", "hub.example", 1 + i % 3))
        if i % 2 == 0:
            edges.append((f"d{i}", f"d{(i + 3) % 9}", 2))
    edges.append(("hub.example", "sink.example", 5))  # sink has no outlinks
    df = spark.createDataFrame(edges, "src_domain string, dst_domain string, n_links long")

    got = {
        r["domain"]: (r["rank_micro"], r["rank"])
        for r in linkgraph.domain_pagerank(df).collect()
    }
    want = _py_pagerank(edges)
    assert {k: v[0] for k, v in got.items()} == want
    # derived double column is exactly micro / 1e6
    for k, (micro, rank) in got.items():
        assert rank == micro / 1e6
    # authority ordering: the hub out-ranks every spoke, the sink
    # (fed only by the hub) out-ranks nothing it doesn't deserve
    assert want["hub.example"] == max(want.values())
    # partitioning invariance (bigint sums are order-independent)
    again = {
        r["domain"]: r["rank_micro"]
        for r in linkgraph.domain_pagerank(df.repartition(7)).collect()
    }
    assert again == want


def test_domain_pagerank_no_inlinks_floor_and_validation(spark):
    df = spark.createDataFrame(
        [("a.example", "b.example", 1)],
        "src_domain string, dst_domain string, n_links long",
    )
    got = {r["domain"]: r["rank_micro"] for r in linkgraph.domain_pagerank(df).collect()}
    # a has no inlinks: rank = (1-d) floor every iteration
    assert got["a.example"] == 150_000
    # b receives all of a's rank: 150000 + 85*150000//100 after convergence
    assert got["b.example"] == 150_000 + 85 * 150_000 // 100
    import pytest

    with pytest.raises(ValueError, match="n_iter"):
        linkgraph.domain_pagerank(df, n_iter=0)
    with pytest.raises(ValueError, match="damping_pct"):
        linkgraph.domain_pagerank(df, damping_pct=101)


def test_pagerank_end_to_end_from_html(spark):
    pages = _pages(
        spark,
        [
            (
                f"https://site{i}.example/p",
                f'<a href="https://central.example/x?src={i}">c</a>'
                '<a href="https://site0.example/peer">p</a>',
            )
            for i in range(6)
        ],
    )
    graph = linkgraph.domain_link_graph(linkgraph.extract_outlinks(pages))
    ranks = {
        r["domain"]: r["rank_micro"]
        for r in linkgraph.domain_pagerank(graph).collect()
    }
    # every site links to central -> central is the top authority
    assert max(ranks, key=ranks.get) == "central.example"
    # site0 collects the 5 peer links, beating the other spokes
    spokes = [f"site{i}.example" for i in range(1, 6)]
    assert all(ranks["site0.example"] > ranks[s] for s in spokes)
