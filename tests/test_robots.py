"""robots.txt REP subset (datapipe/robots.py) — hand-written policies,
hand-derived decisions."""

from __future__ import annotations

from graphiti_spark.datapipe.robots import (
    apply_robots,
    filter_robots_disallowed,
    robots_rules,
)

_H0 = "\n".join(
    [
        "# corp policy",
        "User-agent: *",
        "Disallow: /private",
        "Allow: /private/pub   # carve-out",
        "",
        "User-agent: badbot",
        "Disallow: /",
    ]
)
_H1 = "\n".join(
    [
        "User-Agent: somebot",
        "Disallow: /",
        "user-agent: *",
        "Disallow:",  # empty = allow everything (dropped at parse)
    ]
)


def _robots(spark):
    return spark.createDataFrame(
        [("h0.example.com", _H0), ("h1.example.com", _H1)],
        "host string, robots_txt string",
    )


def _pages(spark):
    urls = [
        "https://h0.example.com/private/x",       # disallowed (/private)
        "https://h0.example.com/private/pub/x",   # allowed (longer Allow wins)
        "https://h0.example.com/open",            # allowed (no match)
        "https://h1.example.com/anything",        # allowed (empty Disallow)
        "https://h2.example.com/no/robots",       # allowed (no policy)
    ]
    return spark.createDataFrame([(u,) for u in urls], "url string")


def test_rules_wildcard_group_only_comments_and_empty(spark):
    rules = {
        (r["rule_type"], r["path_prefix"]): r["rule_len"]
        for r in robots_rules(_robots(spark)).collect()
    }
    # badbot group and the empty Disallow are excluded; comment stripped
    assert rules == {("disallow", "/private"): 8, ("allow", "/private/pub"): 12}


def test_apply_robots_longest_match_and_defaults(spark):
    got = {
        r["url"]: r["robots_allowed"]
        for r in apply_robots(_pages(spark), robots_rules(_robots(spark))).collect()
    }
    assert got == {
        "https://h0.example.com/private/x": False,
        "https://h0.example.com/private/pub/x": True,
        "https://h0.example.com/open": True,
        "https://h1.example.com/anything": True,
        "https://h2.example.com/no/robots": True,
    }


def test_allow_wins_length_tie(spark):
    robots = spark.createDataFrame(
        [("h.example.com", "User-agent: *\nDisallow: /a/\nAllow: /a/x\nDisallow: /a/x")],
        "host string, robots_txt string",
    )
    pages = spark.createDataFrame(
        [("https://h.example.com/a/x/y",)], "url string"
    )
    got = apply_robots(pages, robots_rules(robots)).collect()[0]
    assert got["robots_allowed"] is True


def test_filter_gate(spark):
    kept = filter_robots_disallowed(_pages(spark), robots_rules(_robots(spark)))
    assert kept.count() == 4
    assert "robots_allowed" not in kept.columns
