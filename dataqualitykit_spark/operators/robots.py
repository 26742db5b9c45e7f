"""robots.txt politeness: parse per-domain exclusion rules and flag URLs.

A crawl-derived corpus should be able to answer "would this page's host
even allow the fetch?" — retroactive politeness filtering and takedown
audits both need it. Two pieces:

- ``parse_robots``: (domain, robots_txt) -> (domain, rules array<string>)
  for one user agent. The parse is PURE COLUMN ALGEBRA — split lines,
  posexplode, a gaps-and-islands window to group consecutive
  ``User-agent`` lines with the directive block that follows them, one
  aggregation per (domain, block), one per domain. No Python in the
  path; the exchange carries (domain, block, short strings) only.
- ``flag_disallowed``: left-broadcast-join the (small, per-domain) rule
  table onto a URL frame and evaluate longest-prefix semantics with an
  array ``exists`` — URLs never shuffle.

Semantics follow the REP (RFC 9309) subset that matters at corpus scale:
grouped User-agent lines share one block; ``#`` comments stripped;
matching is case-insensitive on directive names and agent tokens; an
agent uses its MOST SPECIFIC group — the ``*`` groups apply only when no
group names the agent; an empty ``Disallow:`` contributes no rule (allow
all); ``Allow:`` precedence and ``*``/``$`` wildcards are out of scope
(documented — rules are plain path prefixes).

Reference parity: none (the reference has no web-ingest surface at all);
this belongs to the engine's crawl family beside url_filter/crawl_delta.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "parse_robots",
    "py_parse_robots",
    "flag_disallowed",
    "url_host_col",
    "url_path_col",
]

_UA_RE = r"(?i)^user-agent\s*:\s*(\S+)"
_DIS_RE = r"(?i)^disallow\s*:\s*(\S*)"
_WS = " \t\r\n\f\v"


def parse_robots(
    df: DataFrame,
    agent: str = "*",
    domain_col: str = "domain",
    robots_col: str = "robots_txt",
) -> DataFrame:
    """(domain, robots_txt) -> (domain, rules array<string>) of disallow
    path-prefixes binding for `agent`. Zero Python; two partial-agged
    exchanges on (domain[, block]). A file with NO User-agent groups
    emits no row at all (allow-all by absence — keeps the broadcast rule
    table minimal; flag_disallowed's left join already treats a missing
    domain as allowed)."""
    agent_lc = agent.lower()
    lines = df.select(
        F.col(domain_col).alias("domain"),
        F.posexplode(
            F.split(F.coalesce(F.col(robots_col), F.lit("")), "\n")
        ).alias("ln", "raw"),
    )
    # explicit whitespace set: default btrim strips spaces only, which
    # would leave a tab-indented directive unrecognized
    txt = F.btrim(F.regexp_replace(F.col("raw"), "#.*$", ""), F.lit(_WS))
    ua = F.nullif(F.lower(F.regexp_extract(txt, _UA_RE, 1)), F.lit(""))
    is_dis = txt.rlike(_DIS_RE)
    dis = F.nullif(F.regexp_extract(txt, _DIS_RE, 1), F.lit(""))
    w = Window.partitionBy("domain").orderBy("ln")
    # gaps-and-islands: a block starts at a User-agent line not preceded
    # by another User-agent line (grouped UA lines share the block)
    is_ua = ua.isNotNull()
    starts = is_ua & ~F.coalesce(F.lag(is_ua).over(w), F.lit(False))
    tagged = lines.select(
        "domain",
        "ln",
        ua.alias("ua"),
        F.when(is_dis, F.coalesce(dis, F.lit(""))).alias("dis"),
        F.sum(starts.cast("int")).over(w).alias("block"),
    ).filter(F.col("block") > 0)

    blocks = tagged.groupBy("domain", "block").agg(
        F.max((F.col("ua") == agent_lc).cast("int")).alias("named"),
        F.max((F.col("ua") == "*").cast("int")).alias("star"),
        F.collect_list(F.nullif(F.col("dis"), F.lit(""))).alias("rules"),
    )
    per_domain = blocks.groupBy("domain").agg(
        F.max("named").alias("has_named"),
        F.flatten(
            F.collect_list(F.when(F.col("named") == 1, F.col("rules")))
        ).alias("named_rules"),
        F.flatten(
            F.collect_list(F.when(F.col("star") == 1, F.col("rules")))
        ).alias("star_rules"),
    )
    # RFC 9309 group selection: the most specific group wins outright —
    # '*' groups bind only agents no group names
    rules = (
        F.col("star_rules")
        if agent_lc == "*"
        else F.when(
            F.col("has_named") == 1, F.col("named_rules")
        ).otherwise(F.col("star_rules"))
    )
    # array_sort: collect_list order is task-order-dependent; sorting makes
    # the rule array deterministic across partitionings (oracle-grade)
    return per_domain.select("domain", F.array_sort(rules).alias("rules"))


def py_parse_robots(robots_txt: str | None, agent: str = "*") -> list[str]:
    """Pure-python mirror of parse_robots for one file — shared by the
    fuzz tests (the semantics.py discipline). Replicates the column
    algebra exactly, including the lag-based block rule: a comment or
    blank line BETWEEN two User-agent lines starts a new block (only
    directly consecutive UA lines share one)."""
    agent_lc = agent.lower()
    blocks: list[tuple[set, list]] = []
    cur: tuple[set, list] | None = None
    prev_was_ua = False
    for rawline in (robots_txt or "").split("\n"):
        line = re.sub(r"#.*$", "", rawline).strip(_WS)
        m_ua = re.match(_UA_RE, line)
        if m_ua:
            if not prev_was_ua:
                cur = (set(), [])
                blocks.append(cur)
            cur[0].add(m_ua.group(1).lower())
            prev_was_ua = True
            continue
        prev_was_ua = False
        m_dis = re.match(_DIS_RE, line)
        if m_dis and cur is not None and m_dis.group(1):
            cur[1].append(m_dis.group(1))
    named = [b for b in blocks if agent_lc in b[0]]
    star = [b for b in blocks if "*" in b[0]]
    chosen = named if (agent_lc != "*" and named) else star
    return sorted(r for _, rules in chosen for r in rules)


def url_host_col(url_col: str = "url") -> Column:
    return F.lower(
        F.regexp_extract(F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    )


def url_path_col(url_col: str = "url") -> Column:
    """Path + query ('' -> '/'), the REP match target."""
    return F.coalesce(
        F.nullif(
            F.regexp_extract(
                F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)", 1
            ),
            F.lit(""),
        ),
        F.lit("/"),
    )


def flag_disallowed(
    df: DataFrame,
    rules_df: DataFrame,
    url_col: str = "url",
    flag_col: str = "robots_disallowed",
) -> DataFrame:
    """Adds `flag_col`: true when the URL's host has a binding disallow
    prefix covering its path. rules_df is broadcast (one row per domain
    — bounded by the crawl's host count); the URL frame never shuffles.
    Hosts with no robots row are allowed (coalesce false)."""
    host = url_host_col(url_col)
    path = url_path_col(url_col)
    joined = df.withColumn("_host", host).join(
        F.broadcast(rules_df.withColumnRenamed("domain", "_host")),
        "_host",
        "left",
    )
    hit = F.exists(
        F.col("rules"), lambda r: path.startswith(r)
    )
    return joined.withColumn(
        flag_col, F.coalesce(hit, F.lit(False))
    ).drop("_host", "rules")
