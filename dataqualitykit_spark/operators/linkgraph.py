"""Domain link graph — outlink extraction, domain-level edge
aggregation, and a PageRank-style domain-authority score.

No reference analog (QualityControl.py is single-table); task-brief
training-data op family: web-scale quality pipelines use host/domain
authority as a *prior* for keep/drop decisions (a page on a domain
nothing links to is far more likely to be spam than its on-page
heuristics alone reveal — the idiom behind Common-Crawl host-level
ranking releases). The three steps compose:

    pages (url, html)
      -> extract_outlinks        (url, out_url)         one regex pass
      -> domain_link_graph       (src_domain, dst_domain, n_links)
      -> domain_pagerank         (domain, rank_micro, rank)

100 TB shape: extraction is a zero-shuffle projection over the page
bytes; the FIRST aggregation collapses 10^12 page-level links to
domain-level edges (10^7-ish rows — the graph a power iteration can
afford), and every PageRank iteration shuffles only (domain, bigint)
pairs with map-side partial aggregation. Page text/html never enters
an exchange.

DETERMINISM: ranks are computed in FIXED-POINT micro-units (bigint,
1e6 = 1.0). Integer sums are order-independent, so the result is
bit-identical across partitionings, engines, and summation orders —
float PageRank is not (per-dst contribution sums would differ at 1 ulp
between Spark's partial aggregation and any oracle's accumulation
order). The `rank` double column is derived (rank_micro / 1e6) and
therefore equally portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import domain_of

# double-quoted absolute http(s) hrefs inside <a ...> tags. (?is) and the
# lazy [^>]*? carry identical semantics in Java regex and RE2, so a DuckDB
# oracle runs the SAME pattern text (the ANCHOR_INNER_REGEX convention,
# functions/text.py). Single-quoted/unquoted hrefs and relative links are
# out of scope by design — resolving relative links needs the base url and
# buys ~nothing for cross-DOMAIN graphs (relative links are same-domain).
HREF_REGEX = r'(?is)<a\s[^>]*?href\s*=\s*"(https?://[^"]+)"'


def extract_outlinks(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    distinct_per_page: bool = True,
) -> DataFrame:
    """(url, out_url) — one row per absolute http(s) outlink on the page.

    `html_col` may be string or binary (cast = UTF-8 decode, the input
    contract's html:binary). With distinct_per_page (default) a link
    repeated on one page counts once — the domain graph then weights
    edges by *linking pages*, not by nav-bar repetition; pass False to
    keep raw multiplicity. Zero shuffle either way (distinct is applied
    per page inside the projection via array_distinct, not a groupBy).
    """
    links = F.regexp_extract_all(
        F.col(html_col).cast("string"), F.lit(HREF_REGEX), F.lit(1)
    )
    if distinct_per_page:
        links = F.array_distinct(links)
    return df.select(
        F.col(url_col).alias("url"), F.explode(links).alias("out_url")
    )


def domain_link_graph(
    links: DataFrame,
    url_col: str = "url",
    out_col: str = "out_url",
    drop_self: bool = True,
) -> DataFrame:
    """Collapse page-level links to weighted domain-level edges:
    (src_domain, dst_domain, n_links). Self-edges (intra-domain nav)
    are dropped by default — they dominate raw link counts and carry no
    cross-domain authority signal; pass drop_self=False to keep them.
    Rows whose url or out_url has no parseable host are dropped.

    This is THE scale step: the one exchange that turns 10^12 page
    links into a graph of ~10^7 domain edges; everything downstream is
    cheap. Map-side partial aggregation applies (plain groupBy-count).
    """
    e = links.select(
        domain_of(F.col(url_col)).alias("src_domain"),
        domain_of(F.col(out_col)).alias("dst_domain"),
    ).filter((F.col("src_domain") != "") & (F.col("dst_domain") != ""))
    if drop_self:
        e = e.filter(F.col("src_domain") != F.col("dst_domain"))
    return e.groupBy("src_domain", "dst_domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_links")
    )


def domain_pagerank(
    edges: DataFrame,
    src_col: str = "src_domain",
    dst_col: str = "dst_domain",
    weight_col: str = "n_links",
    n_iter: int = 5,
    damping_pct: int = 85,
) -> DataFrame:
    """Weighted PageRank over the domain graph, FIXED-POINT:
    (domain, rank_micro bigint, rank double).

    Update rule per iteration (Brin & Page 1998's unnormalized form,
    damping d = damping_pct/100, all arithmetic in bigint micro-units):

        contrib(e) = (rank(src) * weight(e)) div out_weight(src)
        rank'(v)   = (100 - damping_pct) * 10_000
                     + (damping_pct * sum_in(contrib)) div 100

    Every node starts at 1_000_000 (= 1.0). `div` is exact long
    division on both Spark and any SQL oracle, and bigint sums are
    order-independent — so the output is bit-identical regardless of
    partitioning or engine (a float implementation is not; see module
    docstring). Deliberate simplifications, both standard and
    documented: dangling domains (no outlinks) leak their damped mass
    rather than redistributing it, and ranks are therefore scores for
    ORDERING domains, not a probability distribution.

    Scale: the edge list and per-src out-weights are computed once and
    lazily localCheckpoint-ed (materialized inside the first iteration's
    job, reused by all); each iteration is one equi-join + one groupBy
    shuffling (domain, bigint) pairs, and each rank frame is lazily
    checkpointed so plans do not grow with n_iter (the
    connected_components recipe, dedup.py).
    """
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    if not 0 <= damping_pct <= 100:
        raise ValueError(f"damping_pct must be in [0, 100], got {damping_pct}")

    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        F.col(weight_col).cast("long").alias("wt"),
    )
    out_w = e.groupBy("src").agg(F.sum("wt").alias("out_w"))
    # weight share precomputed per edge frame: (src, dst, wt, out_w)
    ew = e.join(out_w, "src").localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("domain"))
        .union(e.select(F.col("dst").alias("domain")))
        .distinct()
        .localCheckpoint(eager=False)
    )

    base = (100 - damping_pct) * 10_000  # (1-d) in micro-units
    ranks = nodes.withColumn("rank_micro", F.lit(1_000_000).cast("long"))
    for _ in range(n_iter):
        contrib = (
            ew.join(
                ranks.select(F.col("domain").alias("src"), "rank_micro"), "src"
            )
            .select(
                F.col("dst").alias("domain"),
                F.expr("rank_micro * wt div out_w").alias("c"),
            )
            .groupBy("domain")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, "domain", "left")
            .select(
                "domain",
                (
                    F.lit(base).cast("long")
                    + F.expr(
                        f"{damping_pct} * coalesce(s, 0L) div 100"
                    ).cast("long")
                ).alias("rank_micro"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.withColumn(
        "rank", F.col("rank_micro").cast("double") / F.lit(1e6)
    )
