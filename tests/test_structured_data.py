"""Structured-data harvest (operators/structured_data.py): OpenGraph meta,
rel=canonical dedup, JSON-LD islands -> schema.org triples. All fixtures
hand-written html; expectations hand-derived."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphiti_spark.operators.structured_data import (
    canonical_dedup,
    canonical_link_col,
    jsonld_blocks,
    jsonld_entities,
    jsonld_triples,
    og_meta,
)


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode("utf-8")) for u, h in rows], "url string, html binary"
    )


def test_og_meta_attribute_orders_case_quotes(spark):
    pages = _pages(
        spark,
        [
            (
                "u1",
                '<head><meta property="og:title" content="Hello World">'
                '<meta property="og:type" content="article"></head>',
            ),
            # content-first order + upper case tag
            ("u2", "<head><META CONTENT='My Site' PROPERTY='og:site_name'></head>"),
            # property-first wins over a later content-first duplicate
            (
                "u3",
                '<head><meta property="og:title" content="A">'
                '<meta content="B" property="og:title"></head>',
            ),
            ("u4", "<head><title>no og here</title></head>"),
        ],
    )
    got = {
        r["url"]: r
        for r in og_meta(pages)
        .select("url", "og_title", "og_type", "og_site_name", "og_url")
        .collect()
    }
    assert got["u1"]["og_title"] == "Hello World"
    assert got["u1"]["og_type"] == "article"
    assert got["u2"]["og_site_name"] == "My Site"
    assert got["u3"]["og_title"] == "A"
    assert got["u4"]["og_title"] == ""
    assert got["u4"]["og_url"] == ""


def test_og_meta_is_map_only(spark):
    pages = _pages(spark, [("u", "<head></head>")])
    plan = og_meta(pages)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_canonical_link_both_orders(spark):
    pages = _pages(
        spark,
        [
            ("u1", '<link rel="canonical" href="https://a.example/x">'),
            ("u2", "<LINK HREF='https://b.example/y' REL='canonical'>"),
            ("u3", '<link rel="stylesheet" href="https://c.example/z.css">'),
        ],
    )
    got = {
        r["url"]: r["c"]
        for r in pages.select("url", canonical_link_col("html").alias("c")).collect()
    }
    assert got["u1"] == "https://a.example/x"
    assert got["u2"] == "https://b.example/y"
    assert got["u3"] == ""


def test_canonical_dedup_collapses_declared_duplicates(spark):
    canon = '<link rel="canonical" href="https://Origin.example.com/story?utm_source=rss">'
    pages = _pages(
        spark,
        [
            # three syndicated copies on unrelated hosts, same declared canonical
            ("https://mirror-a.example.net/1", canon),
            ("https://mirror-b.example.org/2", canon),
            ("https://origin.example.com/story", canon),
            # relative canonical is NOT honored -> keyed by own url
            ("https://solo.example.com/p", '<link rel="canonical" href="/p">'),
            # no canonical at all
            ("https://plain.example.com/q", "<html></html>"),
        ],
    )
    got = {r["canonical_url"]: r for r in canonical_dedup(pages).collect()}
    # tracking param stripped + host lowercased by canonical_url_col
    grp = got["https://origin.example.com/story"]
    assert grp["n_dups"] == 3
    assert grp["keep_url"] == "https://mirror-a.example.net/1"
    assert got["https://solo.example.com/p"]["n_dups"] == 1
    assert got["https://plain.example.com/q"]["n_dups"] == 1


def test_jsonld_blocks_and_entities(spark):
    html = (
        "<html><head>"
        '<script type="application/ld+json">'
        '{"@type":"Person","name":"Ada Lovelace",'
        '"sameAs":["https://wd.example.org/Q7259","https://x.example.com/ada"],'
        '"worksFor":{"name":"Analytical Engines"}}'
        "</script>"
        '<script type="application/ld+json">{"name": oops}</script>'
        '<script type="application/ld+json">{"@type":"Organization","url":"https://ae.example.com"}</script>'
        "</head><body>x</body></html>"
    )
    pages = _pages(spark, [("u1", html), ("u2", "<html><body>none</body></html>")])
    blocks = jsonld_blocks(pages)
    assert blocks.count() == 3  # u2 contributes none
    ents = jsonld_entities(blocks).collect()
    # malformed island -> null name -> dropped; org without name -> dropped
    assert len(ents) == 1
    e = ents[0]
    assert e["etype"] == "Person"
    assert e["name"] == "Ada Lovelace"
    assert e["works_for"] == "Analytical Engines"
    assert e["same_as"] == [
        "https://wd.example.org/Q7259",
        "https://x.example.com/ada",
    ]
    assert e["block_idx"] == 0


def test_jsonld_triples_fanout(spark):
    html = (
        '<script type="application/ld+json">'
        '{"@type":"Person","name":"N","url":"https://n.example/p",'
        '"sameAs":["s1","s2"],"worksFor":{"name":"W"}}'
        "</script>"
    )
    pages = _pages(spark, [("u", html)])
    t = jsonld_triples(jsonld_entities(jsonld_blocks(pages)))
    got = {(r["pred"], r["obj"]) for r in t.collect()}
    assert got == {
        ("isA", "Person"),
        ("url", "https://n.example/p"),
        ("sameAs", "s1"),
        ("sameAs", "s2"),
        ("worksFor", "W"),
    }
    assert t.filter((F.col("subj") != "N") | (F.col("url") != "u")).count() == 0


def test_jsonld_blocks_plan_no_exchange(spark):
    pages = _pages(spark, [("u", "<html></html>")])
    plan = jsonld_blocks(pages)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
