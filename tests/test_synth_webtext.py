"""Guards for the webtext-shaped bench corpus (synth.webtext_documents /
webtext_pages): the bench's curation families measure real keep AND drop
work only while these properties hold, so pin them against silent drift."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark):
    from graphiti_spark.synth import webtext_documents

    return webtext_documents(spark, "/root/testdata/sf0.001")


def _content_hash(df, cols):
    return df.select(
        F.sum(F.crc32(F.concat_ws("|", *cols))).alias("h")
    ).collect()[0]["h"]


def test_webtext_documents_deterministic_across_parallelism(spark):
    """Pure function of the input rows at any partitioning — the contract
    the scaling/bench comparisons rely on (the near-dup lookback stays
    inside an atomic 64-id bucket)."""
    cols = ["doc_id", "text", "lang", "source"]
    a = _content_hash(_docs(spark), cols)
    b = _content_hash(_docs(spark).repartition(13), cols)
    assert a == b


def test_every_gopher_rule_fires_both_ways(spark):
    """Each per-rule boolean must have keeps AND drops on the bench corpus
    (BENCH_r03's gap: several keep-paths never fired on the raw docs)."""
    from graphiti_spark.datapipe.quality import gopher_quality_flags

    g = gopher_quality_flags(_docs(spark))
    n = g.count()
    flags = [f.name for f in g.schema.fields if f.dataType.simpleString() == "boolean"]
    counts = g.select(
        [F.sum(F.col(c).cast("int")).alias(c) for c in flags]
    ).collect()[0]
    for c in flags:
        assert 0 < counts[c] < n, f"rule {c} fires only one way ({counts[c]}/{n})"


def test_c4_gate_keeps_most_and_drops_some(spark):
    from graphiti_spark.datapipe.quality import c4_clean_and_flags

    c4 = c4_clean_and_flags(_docs(spark))
    n = c4.count()
    kept = c4.filter("c4_kept").count()
    assert 0.7 * n < kept < n  # most pages survive, a real minority drops
    chars = c4.select(F.sum(F.length("clean_text"))).collect()[0][0]
    assert chars > 0  # the r3 degenerate case: every character stripped


def test_planted_near_duplicates_are_findable(spark):
    """~1/15 docs are one-token variants of an earlier doc: MinHash-LSH
    must surface a nonempty verified pair set on the fixture slice."""
    from graphiti_spark.datapipe.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(_docs(spark), jaccard_threshold=0.8)
    assert pairs.count() > 0


def test_webtext_pages_long_tail_entities(spark):
    """The KG path extracts a zipf head + long tail: many distinct entities,
    with the hottest entity on a large-but-minority share of pages (the
    realistic incremental-delta shape, vs the old ~31-token vocabulary)."""
    from graphiti_spark.operators.extract_text import extract_text_stage
    from graphiti_spark.operators.ner import mentions_stage
    from graphiti_spark.operators.episodes import episodes_stage
    from graphiti_spark.synth import webtext_pages

    pages = webtext_pages(spark, "/root/testdata/sf0.001")
    eps = episodes_stage(extract_text_stage(pages))
    m = mentions_stage(eps)
    by_name = m.groupBy("name").count().collect()
    n_pages = pages.count()
    assert len(by_name) > 300  # long tail: hundreds of distinct entities on 500 pages
    hottest = max(r["count"] for r in by_name)
    assert hottest > 20  # a real zipf head exists...
    assert hottest < 3 * n_pages  # ...but no entity dominates every sentence


def test_webtext_pages_structured_tier(spark):
    """The webtext corpus carries the structured-data tier in <head>:
    og meta on every page, a JSON-LD island naming the page's LEAD body
    entity on a majority, and rel=canonical syndication blocks that
    canonical_dedup collapses — while the extracted TEXT (and thus every
    text-derived golden) is unchanged by the head block."""
    from pyspark.sql import functions as F

    from graphiti_spark.operators.extract_text import extract_text_stage
    from graphiti_spark.operators.structured_data import (
        canonical_dedup,
        jsonld_entities,
        jsonld_blocks,
        og_meta,
    )
    from graphiti_spark.synth import webtext_pages

    pages = webtext_pages(spark, "/root/testdata/sf0.001")
    n = pages.count()

    og = og_meta(pages)
    assert og.filter(F.col("og_title").startswith("Page ")).count() == n

    ents = jsonld_entities(jsonld_blocks(pages))
    n_islands = ents.count()
    assert 0.5 * n < n_islands < 0.7 * n  # ~60% plant rate
    # every island names a real extracted entity from ITS OWN page's text
    text = extract_text_stage(pages).select("url", "text")
    joined = ents.join(text, "url")
    mismatches = joined.filter(~F.col("text").contains(F.col("name"))).count()
    assert mismatches == 0

    groups = canonical_dedup(pages)
    collapsed = groups.filter(F.col("n_dups") > 1)
    assert collapsed.count() > 0  # syndication blocks collapse
    assert groups.agg(F.sum("n_dups")).collect()[0][0] == n  # partition of pages


def test_entity_pool_tags_tail_keeps_head(spark):
    """webtext_pages(pool=...) gives a batch its own tail-entity
    vocabulary: pool='' output is byte-identical to before (golden
    stability), zipf-head names (rank <= 100) stay shared across pools,
    tail names are pool-private — the realistic incremental-delta corpus
    shape (a new crawl batch re-mentions hot entities but brings its own
    long tail)."""
    from graphiti_spark.synth import (
        _POOL_SHARED_HEAD,
        _entity_name,
        webtext_pages,
    )

    # pure-function level: head shared, tail tagged, default unchanged
    assert _entity_name(5, "fresh") == _entity_name(5)
    assert _entity_name(_POOL_SHARED_HEAD, "fresh") == _entity_name(_POOL_SHARED_HEAD)
    tail = _entity_name(_POOL_SHARED_HEAD + 1, "fresh")
    assert tail != _entity_name(_POOL_SHARED_HEAD + 1)
    assert "fresh" in tail.lower()
    # two-token shape preserved (NER recognizability)
    assert len(tail.split()) == len(_entity_name(_POOL_SHARED_HEAD + 1).split())

    # page level: default pool is bit-identical; tagged pool shares the
    # head but diverges on the tail
    base = webtext_pages(spark, "/root/testdata/sf0.001")
    fresh = webtext_pages(spark, "/root/testdata/sf0.001", pool="fresh")
    b = {r["url"]: bytes(r["html"]) for r in base.limit(200).collect()}
    f = {r["url"]: bytes(r["html"]) for r in fresh.limit(200).collect()}
    assert set(b) == set(f)
    assert any(b[u] != f[u] for u in b)  # tail entities diverge somewhere
    # hot-head names occur verbatim in BOTH corpora (shared clusters)
    head_name = _entity_name(1).encode()
    assert any(head_name in h for h in b.values())
    assert any(head_name in h for h in f.values())
