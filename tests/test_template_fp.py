"""DOM template fingerprinting (structured_data.template_fingerprint /
template_stats): same-template detection across different content."""

from __future__ import annotations

import hashlib

import pytest

from graphiti_spark.operators.structured_data import (
    template_fingerprint,
    template_stats,
)


def _p(url, body):
    return (url, bytearray(f"<html><head><title>T</title></head><body><div class='a'><p>{body}</p></div></body></html>", "utf8"))


@pytest.fixture(scope="module")
def pages(spark):
    rows = [
        _p("https://a.com/1", "alpha beta"),
        _p("https://a.com/2", "totally different words here"),
        ("https://a.com/3", bytearray("<html><body><ul><li>x</li></ul></body></html>", "utf8")),
        ("https://b.com/1", bytearray("<html><body><ul><li>y</li></ul></body></html>", "utf8")),
    ]
    return spark.createDataFrame(rows, ["url", "html"])


def test_same_template_different_content(pages):
    got = {r["url"]: (r["template_fp"], r["n_tags"]) for r in template_fingerprint(pages).collect()}
    assert got["https://a.com/1"] == got["https://a.com/2"]
    assert got["https://a.com/1"] != got["https://a.com/3"]
    # hand value: tag sequence of page 3
    seq = "html>body>ul>li>li>ul>body>html"
    assert got["https://a.com/3"][0] == hashlib.md5(seq.encode()).hexdigest()
    assert got["https://a.com/3"][1] == 8


def test_template_stats_cross_host_template(pages):
    got = {
        (r["host"], r["template_fp"]): r["n_pages"]
        for r in template_stats(pages).collect()
    }
    fps = {r["url"]: r["template_fp"] for r in template_fingerprint(pages).collect()}
    assert got[("a.com", fps["https://a.com/1"])] == 2
    # the list template appears on both hosts (mirror signal)
    assert got[("a.com", fps["https://a.com/3"])] == 1
    assert got[("b.com", fps["https://b.com/1"])] == 1
    assert fps["https://a.com/3"] == fps["https://b.com/1"]
