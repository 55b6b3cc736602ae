"""S1 byte-identity gate (BASELINE.json input_hint): extracted text must be a
pure deterministic function of the html bytes."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from graphiti_spark.fixtures import FIXTURE_PAGES, fixture_pages_df
from graphiti_spark.operators.extract_text import extract_text_py, extract_text_stage


def test_boilerplate_stripped():
    html = (
        b"<html><head><title>T</title><script>var x = '<p>trap</p>';</script></head>"
        b"<body><nav><ul><li>Home</li></ul></nav>"
        b"<div>Alice likes Bob.</div><p>More &amp; stuff.</p>"
        b"<footer>copyright</footer></body></html>"
    )
    text = extract_text_py(html)
    assert "Alice likes Bob." in text
    assert "More & stuff." in text
    for junk in ("Home", "copyright", "var x", "trap", "<"):
        assert junk not in text


def test_nested_boilerplate_and_comments():
    html = b"<body><!-- hidden --><nav><div><script>x</script>menu</div></nav>ok</body>"
    assert extract_text_py(html) == "ok"


def test_byte_identity_per_url():
    # Recomputing from the same html bytes is byte-identical — the per-row
    # invariant the driver checks (input_hint).
    for p in FIXTURE_PAGES:
        a = extract_text_py(p["html"])
        b = extract_text_py(p["html"])
        assert a == b
        assert hashlib.sha256(a.encode()).digest() == hashlib.sha256(b.encode()).digest()


def test_byte_identity_across_partitionings(spark):
    pages = fixture_pages_df(spark)
    one = extract_text_stage(pages.repartition(1)).select("url", "text")
    many = extract_text_stage(pages.repartition(7)).select("url", "text")
    a = {r["url"]: r["text"] for r in one.collect()}
    b = {r["url"]: r["text"] for r in many.collect()}
    assert a == b
    # Spark UDF output == local python output (no executor-env dependence).
    local = {
        p["url"]: (p["text"] if p["text"] is not None else extract_text_py(p["html"]))
        for p in FIXTURE_PAGES
    }
    assert a == local


def test_pre_extracted_text_bypasses(spark):
    pages = fixture_pages_df(spark)
    out = extract_text_stage(pages)
    row = out.filter(F.col("url") == "https://example.com/pretext").collect()[0]
    assert row["text"] == "Helix Labs funded Nova Robotics."
