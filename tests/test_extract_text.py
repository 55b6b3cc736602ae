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


def test_page_meta_hand_computed(spark):
    from graphiti_spark.operators.extract_text import filter_noindex, page_meta

    pages = [
        # name-first, mixed case + quotes, both directives
        (1, b'<html lang="en-US"><head>'
            b'<META NAME=\'ROBOTS\' Content="NoIndex, nofollow">'
            b"<title>A  Page</title></head><body>x</body></html>"),
        # content-first attribute order, noindex only
        (2, b'<html lang=de><head><meta content="noindex" name="robots">'
            b"<title>B</title></head></html>"),
        # no robots meta, no lang
        (3, b"<html><head><title>C</title></head></html>"),
        # robots meta naming a DIFFERENT bot-list value: kept
        (4, b'<html lang="fr"><head><meta name="robots" content="all">'
            b"</head></html>"),
    ]
    df = spark.createDataFrame(pages, "doc_id long, html binary")
    got = {r["doc_id"]: r for r in page_meta(df).collect()}
    assert got[1]["robots"] == "noindex, nofollow"
    assert got[1]["noindex"] and got[1]["nofollow"]
    assert got[1]["html_lang"] == "en-us"
    assert got[1]["title"] == "A Page"  # whitespace collapsed
    assert got[2]["robots"] == "noindex" and got[2]["noindex"]
    assert got[2]["html_lang"] == "de"
    assert not got[2]["nofollow"]
    assert got[3]["robots"] == "" and not got[3]["noindex"]
    assert got[3]["html_lang"] == ""
    assert got[4]["robots"] == "all" and not got[4]["noindex"]

    kept = sorted(r["doc_id"] for r in filter_noindex(df).collect())
    assert kept == [3, 4]


def test_filter_noindex_is_map_only(spark):
    from graphiti_spark.operators.extract_text import filter_noindex

    df = spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.encode(F.lit("<html><head></head></html>"), "UTF-8").alias("html"),
    )
    plan = filter_noindex(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
