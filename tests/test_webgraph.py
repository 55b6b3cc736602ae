"""Hand-computed expectations for the web link graph (datapipe/webgraph.py):
href extraction + resolution, URL/host edge tables, host degree accounting,
host PageRank reuse, and the synth contract (links live in the stripped nav,
so extracted text is unchanged)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphiti_spark.datapipe.webgraph import (
    extract_links,
    host_graph,
    host_link_stats,
    host_pagerank,
    link_graph,
)

# Three pages, hand-written html. Hand-derived below:
#  p1 (https://a.example.com/1):
#    href="https://b.example.com/x"  -> absolute, kept        (dst host b)
#    href="/local"                   -> https://a.example.com/local (self-host)
#    href="#frag"                    -> dropped (fragment)
#    href="mailto:x@y.z"             -> dropped (non-http scheme, not root-relative)
#    href="https://b.example.com/x"  -> duplicate absolute (n_links=2 on that edge)
#  p2 (https://b.example.com/2):
#    href="https://a.example.com/1"  -> kept (dst host a)
#    href="//proto.example.com/p"    -> dropped (protocol-relative is out of contract)
#  p3 (https://c.example.com/3): no hrefs -> contributes nothing (but host c
#    still appears in host_link_stats as a pure DESTINATION? no — nothing
#    links to c either; c has no row, which is also asserted)
_P1 = (
    '<html><body><a href="https://b.example.com/x">x</a>'
    '<a href="/local">l</a><a href="#frag">f</a>'
    '<a href="mailto:x@y.z">m</a>'
    '<a href="https://b.example.com/x">x2</a></body></html>'
)
_P2 = (
    '<html><body><a href="https://a.example.com/1">back</a>'
    '<a href="//proto.example.com/p">pr</a></body></html>'
)
_P3 = "<html><body>no links</body></html>"


@pytest.fixture(scope="module")
def pages(spark):
    rows = [
        ("https://a.example.com/1", bytearray(_P1.encode())),
        ("https://b.example.com/2", bytearray(_P2.encode())),
        ("https://c.example.com/3", bytearray(_P3.encode())),
    ]
    return spark.createDataFrame(rows, "url string, html binary")


def test_extract_links_hand_computed(pages):
    got = sorted(
        (r["src_url"], r["dst_url"], r["dst_host"])
        for r in extract_links(pages).collect()
    )
    assert got == [
        ("https://a.example.com/1", "https://a.example.com/local", "a.example.com"),
        ("https://a.example.com/1", "https://b.example.com/x", "b.example.com"),
        ("https://a.example.com/1", "https://b.example.com/x", "b.example.com"),
        ("https://b.example.com/2", "https://a.example.com/1", "a.example.com"),
    ]


def test_link_and_host_graph_hand_computed(pages):
    links = extract_links(pages)
    lg = {(r["src_url"], r["dst_url"]): r["n_links"] for r in link_graph(links).collect()}
    assert lg == {
        ("https://a.example.com/1", "https://b.example.com/x"): 2,
        ("https://a.example.com/1", "https://a.example.com/local"): 1,
        ("https://b.example.com/2", "https://a.example.com/1"): 1,
    }
    hg = {
        (r["src_host"], r["dst_host"]): (r["n_links"], r["n_src_pages"])
        for r in host_graph(links).collect()
    }
    # a->b has 2 link occurrences from 1 distinct page; a->a is the resolved
    # root-relative self-host link.
    assert hg == {
        ("a.example.com", "b.example.com"): (2, 1),
        ("a.example.com", "a.example.com"): (1, 1),
        ("b.example.com", "a.example.com"): (1, 1),
    }


def test_host_link_stats_hand_computed(pages):
    stats = {r["host"]: r for r in host_link_stats(extract_links(pages)).collect()}
    # host a: out = 3 occurrences (2x a->b + 1x a->a) over 2 distinct dst
    # hosts, 1 self-link; in = 1 occurrence (b->a) + the a->a self link = 2
    # from 2 distinct src hosts.
    a = stats["a.example.com"]
    assert (a["out_links"], a["out_hosts"], a["self_links"]) == (3, 2, 1)
    assert (a["in_links"], a["in_hosts"]) == (2, 2)
    b = stats["b.example.com"]
    assert (b["out_links"], b["out_hosts"], b["self_links"]) == (1, 1, 0)
    assert (b["in_links"], b["in_hosts"]) == (2, 1)
    # c never appears on either side of a link -> no row at all.
    assert "c.example.com" not in stats


def test_host_pagerank_symmetric_pair(pages):
    """a<->b with self-links dropped is a symmetric 2-cycle: equal rank 0.5
    each (PageRank over {a->b, b->a} sums to 1 and is symmetric)."""
    ranks = {r["uuid"]: r["pagerank"] for r in host_pagerank(extract_links(pages)).collect()}
    assert set(ranks) == {"a.example.com", "b.example.com"}
    assert abs(ranks["a.example.com"] - 0.5) < 1e-6
    assert abs(ranks["b.example.com"] - 0.5) < 1e-6


def test_synth_links_in_nav_only(spark):
    """The synthetic corpus contract: pages carry a deterministic link block
    INSIDE <nav>, so (a) the link graph is non-empty with the hub-host skew
    shape, and (b) extracted text is byte-identical to the pre-link synth
    (nav subtrees are dropped whole) — all text-derived goldens stay valid."""
    from graphiti_spark.operators.extract_text import extract_text_py
    from graphiti_spark.synth import _build_html, _build_links, pages_from_documents

    pages = pages_from_documents(spark, "/root/testdata/sf0.001").limit(50)
    links = extract_links(pages)
    hosts = {r["dst_host"] for r in links.select("dst_host").distinct().collect()}
    assert any(h.startswith("hub") and h.endswith(".example.net") for h in hosts)
    assert any(h.endswith(".example.com") for h in hosts)  # root-relative resolved

    # byte-identity of extracted text vs the linkless variant
    for doc_id, text in [(0, "alpha beta gamma"), (11, "one two three four five six")]:
        with_links = _build_html(doc_id, text)
        without = with_links.decode().replace(_build_links(doc_id), "").encode()
        assert extract_text_py(with_links) == extract_text_py(without)


def test_extract_links_plan_is_map_only(pages):
    """extract_links must not shuffle: the physical plan has no Exchange."""
    plan = extract_links(pages)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
