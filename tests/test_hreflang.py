"""hreflang alternates + translation clusters
(operators/structured_data.py): attribute orders, case, clustering."""

from __future__ import annotations

import pytest

from graphiti_spark.operators.structured_data import (
    hreflang_links,
    translation_clusters,
)


def _page(url, links):
    head = "".join(links)
    return (url, bytearray(f"<html><head>{head}</head><body>x</body></html>", "utf8"))


@pytest.fixture(scope="module")
def pages(spark):
    rows = [
        _page(
            "https://a.com/en",
            [
                '<link rel="alternate" hreflang="en" href="https://a.com/en">',
                '<link rel="alternate" hreflang="de" href="https://a.com/de">',
                # href-first order, single quotes, mixed case lang
                "<LINK href='https://a.com/fr' rel='alternate' hreflang='FR'>",
            ],
        ),
        _page(
            "https://a.com/de",
            ['<link rel="alternate" hreflang="en" href="https://a.com/en">'],
        ),
        _page("https://b.com/solo", []),
        _page("https://a.com/fr", []),
    ]
    return spark.createDataFrame(rows, ["url", "html"])


def test_hreflang_extraction_both_orders(pages):
    got = {
        (r["url"], r["hreflang"], r["href"])
        for r in hreflang_links(pages).collect()
    }
    assert ("https://a.com/en", "en", "https://a.com/en") in got
    assert ("https://a.com/en", "de", "https://a.com/de") in got
    assert ("https://a.com/en", "fr", "https://a.com/fr") in got  # lowercased
    assert ("https://a.com/de", "en", "https://a.com/en") in got
    assert len(got) == 4


def test_translation_clusters(pages):
    got = {
        r["url"]: (r["cluster_id"], r["n_langs"])
        for r in translation_clusters(pages).collect()
    }
    # en/de/fr pages all land in one cluster, canonical = min url
    cid = "https://a.com/de"  # lexicographic min of the three members
    assert got["https://a.com/en"][0] == cid
    assert got["https://a.com/de"][0] == cid
    assert got["https://a.com/fr"][0] == cid
    # 3 distinct languages declared across the cluster
    assert got["https://a.com/en"][1] == 3
    # the solo page is its own singleton with no declared languages
    assert got["https://b.com/solo"] == ("https://b.com/solo", 0)
    # exactly one keeper per cluster under the url = cluster_id policy
    keepers = [u for u, (c, _) in got.items() if u == c]
    assert sorted(keepers) == ["https://a.com/de", "https://b.com/solo"]


def test_translation_clusters_off_corpus_canonical(spark):
    """A declared href that is lexicographically smallest but absent from
    the crawled corpus must NOT become cluster_id — the canonical is the
    min IN-CORPUS member, so `keep = (url = cluster_id)` keeps exactly one
    page per cluster."""
    rows = [
        _page(
            "https://z.com/en",
            [
                # off-corpus alternate sorts before every crawled url
                '<link rel="alternate" hreflang="aa" href="https://0aa.com/x">',
                '<link rel="alternate" hreflang="de" href="https://z.com/de">',
            ],
        ),
        _page("https://z.com/de", []),
    ]
    pages = spark.createDataFrame(rows, ["url", "html"])
    got = {
        r["url"]: (r["cluster_id"], r["n_langs"])
        for r in translation_clusters(pages).collect()
    }
    assert got["https://z.com/en"][0] == "https://z.com/de"
    assert got["https://z.com/de"][0] == "https://z.com/de"
    assert got["https://z.com/en"][1] == 2  # aa + de declared in-cluster
    keepers = [u for u, (c, _) in got.items() if u == c]
    assert keepers == ["https://z.com/de"]
