"""Redirect pointer-jumping (webgraph.resolve_redirects) and anchor-text
alias pairs (webgraph.anchor_alias_pairs): hand fixtures."""

from __future__ import annotations

import pytest

from graphiti_spark.datapipe.webgraph import anchor_alias_pairs, resolve_redirects


def test_chain_collapses_to_final(spark):
    r = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")],
        ["src_url", "dst_url"],
    )
    got = {r_["url"]: (r_["final_url"], r_["is_cycle"]) for r_ in resolve_redirects(r).collect()}
    assert got["a"] == ("d", False)
    assert got["b"] == ("d", False)
    assert got["c"] == ("d", False)
    assert got["x"] == ("y", False)


def test_cycle_flagged(spark):
    r = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("c", "a"), ("ok", "end")],
        ["src_url", "dst_url"],
    )
    got = {r_["url"]: r_["is_cycle"] for r_ in resolve_redirects(r).collect()}
    assert got["a"] and got["b"] and got["c"]
    assert got["ok"] is False


def test_long_chain_within_doubling_budget(spark):
    n = 40  # 2^6 = 64 > 40
    r = spark.createDataFrame(
        [(f"u{i}", f"u{i+1}") for i in range(n)], ["src_url", "dst_url"]
    )
    got = {x["url"]: x["final_url"] for x in resolve_redirects(r, max_iter=6).collect()}
    assert all(v == f"u{n}" for v in got.values())


def test_duplicate_source_min_dst_wins(spark):
    r = spark.createDataFrame(
        [("a", "z"), ("a", "b")], ["src_url", "dst_url"]
    )
    (row,) = resolve_redirects(r).collect()
    assert (row["url"], row["final_url"]) == ("a", "b")


def test_anchor_alias_pairs(spark):
    anchors = spark.createDataFrame(
        [
            ("t1.com", "IBM", 5),
            ("t1.com", "International Business Machines", 3),
            ("t1.com", "typo-ibm", 1),          # below min_count
            ("t2.com", "IBM", 4),
            ("t2.com", "International Business Machines", 2),
            ("t3.com", "Acme", 9),
        ],
        ["dst_host", "anchor", "n"],
    )
    got = {
        (r["alias_a"], r["alias_b"]): r["n_targets"]
        for r in anchor_alias_pairs(anchors).collect()
    }
    assert got == {("IBM", "International Business Machines"): 2}


def test_anchor_cap_limits_fanout(spark):
    rows = [("hub.com", f"anchor{i:03d}", 100 - i) for i in range(60)]
    anchors = spark.createDataFrame(rows, ["dst_host", "anchor", "n"])
    out = anchor_alias_pairs(anchors, per_target_cap=10)
    # 10 kept anchors -> C(10,2) = 45 pairs, never C(60,2)
    assert out.count() == 45
