"""robots.txt parsing + URL flagging: grouped UA lines, comments, empty
Disallow, case folds, most-specific-group selection, and the broadcast
flag join."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataqualitykit_spark.operators.robots import (
    flag_disallowed,
    parse_robots,
    url_host_col,
    url_path_col,
)

ROBOTS_A = """# comment line
User-agent: *
Disallow: /private
Disallow:
disallow: /tmp   # trailing comment

USER-AGENT: goodbot
User-agent: otherbot
Disallow: /good-only
"""

ROBOTS_B = """User-agent: goodbot
Disallow: /g1

User-agent: *
Disallow: /star
"""

ROBOTS_C = "Disallow: /orphan\nUser-agent: *\n"  # orphan directive ignored


def _rules(spark, agent):
    df = spark.createDataFrame(
        [("a.example", ROBOTS_A), ("b.example", ROBOTS_B), ("c.example", ROBOTS_C)],
        "domain string, robots_txt string",
    )
    return {
        r["domain"]: list(r["rules"])
        for r in parse_robots(df, agent=agent).collect()
    }


def test_star_agent(spark):
    rules = _rules(spark, "*")
    assert rules["a.example"] == ["/private", "/tmp"]  # empty Disallow dropped
    assert rules["b.example"] == ["/star"]
    assert rules["c.example"] == []  # orphan Disallow before any UA ignored


def test_most_specific_group_wins(spark):
    rules = _rules(spark, "goodbot")
    # goodbot has named groups on both domains -> '*' groups do NOT apply
    assert rules["a.example"] == ["/good-only"]
    assert rules["b.example"] == ["/g1"]
    assert rules["c.example"] == []  # no named group -> falls back to '*'


def test_unknown_agent_falls_back_to_star(spark):
    rules = _rules(spark, "randombot")
    assert rules["a.example"] == ["/private", "/tmp"]
    assert rules["b.example"] == ["/star"]


def test_grouped_ua_lines_share_block(spark):
    rules = _rules(spark, "otherbot")
    assert rules["a.example"] == ["/good-only"]


def test_url_host_path_cols(spark):
    df = spark.createDataFrame(
        [
            ("https://A.Example:8080/Private/x?q=1#frag",),
            ("http://b.example",),
            ("not a url",),
        ],
        "url string",
    )
    got = df.select(
        url_host_col().alias("h"), url_path_col().alias("p")
    ).collect()
    assert (got[0]["h"], got[0]["p"]) == ("a.example:8080", "/Private/x?q=1")
    assert (got[1]["h"], got[1]["p"]) == ("b.example", "/")
    assert (got[2]["h"], got[2]["p"]) == ("", "/")


def test_flag_disallowed(spark):
    robots = spark.createDataFrame(
        [("a.example", ROBOTS_A), ("b.example", ROBOTS_B)],
        "domain string, robots_txt string",
    )
    rules = parse_robots(robots, agent="*")
    urls = spark.createDataFrame(
        [
            (1, "https://a.example/private/doc.html"),   # hit /private
            (2, "https://a.example/public/doc.html"),    # miss
            (3, "https://a.example/tmpfile"),             # prefix hit /tmp
            (4, "https://b.example/star/x"),              # hit /star
            (5, "https://unknown.example/private/x"),     # no robots -> allowed
            (6, None),                                    # NULL url -> allowed
        ],
        "id int, url string",
    )
    out = {
        r["id"]: r["robots_disallowed"]
        for r in flag_disallowed(urls, rules).collect()
    }
    assert out == {1: True, 2: False, 3: True, 4: True, 5: False, 6: False}


def test_flag_join_is_broadcast(spark):
    robots = spark.createDataFrame(
        [("a.example", ROBOTS_A)], "domain string, robots_txt string"
    )
    urls = spark.createDataFrame([(1, "https://a.example/x")], "id int, url string")
    plan = (
        flag_disallowed(urls, parse_robots(robots))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan


def _random_robots(rng) -> str:
    agents = ["*", "goodbot", "BadBot", "CrawlerX"]
    lines = []
    for _ in range(rng.randrange(0, 14)):
        kind = rng.randrange(7)
        if kind <= 1:
            lines.append(
                f"{rng.choice(['User-agent', 'USER-AGENT', 'user-agent'])}:"
                f"{' ' * rng.randrange(0, 3)}{rng.choice(agents)}"
            )
        elif kind <= 3:
            path = rng.choice(["/a", "/b/c", "/tmp", "/", ""])
            lines.append(
                f"{' ' * rng.randrange(0, 2)}"
                f"{rng.choice(['Disallow', 'disallow'])}: {path}"
                f"{rng.choice(['', '  # c'])}"
            )
        elif kind == 4:
            lines.append("# a comment")
        elif kind == 5:
            lines.append("")
        else:
            lines.append("Crawl-delay: 5")  # unknown directive ignored
    return "\n".join(lines)


def test_fuzz_spark_matches_python_mirror(spark):
    """200 grammar-random robots files x 3 agents: the column-algebra
    parser and py_parse_robots must agree exactly."""
    import random

    from dataqualitykit_spark.operators.robots import py_parse_robots

    rng = random.Random(20260818)
    files = [(i, _random_robots(rng)) for i in range(200)]
    df = spark.createDataFrame(
        [(f"d{i}", t) for i, t in files], "domain string, robots_txt string"
    )
    for agent in ("*", "goodbot", "crawlerx"):
        got = {
            r["domain"]: list(r["rules"])
            for r in parse_robots(df, agent=agent).collect()
        }
        for i, t in files:
            # a group-less file emits no row (allow-all by absence)
            assert got.get(f"d{i}", []) == py_parse_robots(t, agent), (
                agent, i, t,
            )


def test_mirror_properties():
    import random

    from dataqualitykit_spark.operators.robots import py_parse_robots

    rng = random.Random(7)
    for i in range(500):
        t = _random_robots(rng)
        rules = py_parse_robots(t, "goodbot")
        assert rules == py_parse_robots(t, "goodbot")  # deterministic
        # every rule literally appears as a Disallow value in the text
        for r in rules:
            assert r in t
        # an agent nobody names and no '*' group -> no rules
        if "*" not in t:
            assert py_parse_robots(t, "nobody-names-me") == []
