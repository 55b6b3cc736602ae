"""Plan-shape regression tests: the physical plans we rely on at 100 TB.

Catalyst behaviors asserted here are load-bearing for scale:
 - parquet filter pushdown + column pruning (episode as-of scans),
 - broadcast hash join for the uuid_map pointer rewrite (no shuffle of the
   big triples table),
 - TakeOrderedAndProject for top-k (no global sort materialization).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def parquet_events(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("plans") / "events")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").write.parquet(p)
    return spark.read.parquet(p)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_and_column_pruning(parquet_events):
    df = parquet_events.filter(F.col("event_type") == "purchase").select("event_id", "ts")
    plan = _plan(df)
    assert "PushedFilters: [" in plan and "event_type" in plan.split("PushedFilters")[1][:200]
    read_schema = plan.split("ReadSchema:")[1][:200]
    assert "value" not in read_schema  # unused column pruned from the scan


def test_asof_scan_is_take_ordered(parquet_events):
    from graphiti_spark.operators.episodes import retrieve_episodes

    df = parquet_events.select(
        F.col("event_id").alias("uuid"),
        F.col("ts").alias("valid_at"),
        F.lit("g").alias("group_id"),
        F.lit("text").alias("source"),
    )
    out = retrieve_episodes(df, "2024-06-01", last_n=5)
    assert "TakeOrderedAndProject" in _plan(out)


def test_pointer_rewrite_uses_broadcast_join(spark):
    from graphiti_spark.operators.edge_merge import resolve_edge_pointers

    triples = spark.createDataFrame(
        [("t1", "g", "a", "b")],
        "episode_uuid string, group_id string, source_entity_uuid string, target_entity_uuid string",
    )
    umap = spark.createDataFrame([("a", "a0")], "uuid string, canonical_uuid string")
    plan = _plan(resolve_edge_pointers(triples, umap))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_similarity_topk_is_take_ordered(spark):
    from graphiti_spark.analytics.search import similarity_search

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id int, embedding array<double>"
    )
    out = similarity_search(df, "vec_id", "embedding", [1.0, 0.0], min_score=0.0, limit=5)
    assert "TakeOrderedAndProject" in _plan(out)


def test_mentions_stage_is_shuffle_free(spark):
    from graphiti_spark.fixtures import fixture_pages_df
    from graphiti_spark.operators.episodes import episodes_stage
    from graphiti_spark.operators.extract_text import extract_text_stage
    from graphiti_spark.operators.ner import mentions_stage

    eps = episodes_stage(extract_text_stage(fixture_pages_df(spark)))
    plan = _plan(mentions_stage(eps))
    assert "Exchange" not in plan  # pure map stages: no shuffle boundary


def test_plan_width_env_override_pins_widths_across_levels(spark, monkeypatch):
    from graphiti_spark.session import plan_width

    par = spark.sparkContext.defaultParallelism
    monkeypatch.delenv("SPARK_GRAFT_PLAN_WIDTH", raising=False)
    assert plan_width(spark) == par
    # pinned: the scaling bench sets ONE width for both cluster sizes so the
    # two legs execute the identical plan
    monkeypatch.setenv("SPARK_GRAFT_PLAN_WIDTH", "24")
    assert plan_width(spark) == 24


def test_input_width_guard_widens_narrow_scans(spark):
    from graphiti_spark.plans.pipeline import ensure_scan_width

    par = spark.sparkContext.defaultParallelism
    narrow = spark.range(100).select(F.concat(F.lit("u"), "id").alias("url")).coalesce(1)
    widened = ensure_scan_width(spark, narrow)
    assert widened.rdd.getNumPartitions() == par
    # already-wide inputs (warehouse scans) pass through untouched: no shuffle
    wide = spark.range(1000).select(F.concat(F.lit("u"), "id").alias("url")).repartition(4 * par)
    assert ensure_scan_width(spark, wide) is wide


# ---------------------------------------------------------------------------
# plan shapes of the corpus-curation ops (scale claims pinned)
# ---------------------------------------------------------------------------


def _curation_docs(spark):
    return spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w"), F.col("id").cast("string"), F.lit(" x y z the of")).alias("text"),
        F.concat(F.lit("https://www.s"), (F.col("id") % 5).cast("string"), F.lit(".com/doc/"), F.col("id").cast("string")).alias("url"),
    )


def test_plan_pii_and_urlfeatures_are_map_only(spark):
    from graphiti_spark.datapipe.pii import mask_pii, pii_stats
    from graphiti_spark.datapipe.webstats import url_features

    docs = _curation_docs(spark)
    for df in (mask_pii(docs), pii_stats(docs), url_features(docs)):
        assert "Exchange" not in _plan(df)  # fuses into the scan at 100 TB


def test_plan_blocklist_filter_is_broadcast_anti(spark):
    from graphiti_spark.datapipe.webstats import filter_blocked_domains

    plan = _plan(filter_blocked_domains(_curation_docs(spark), ["spam.biz"]))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # the corpus side must not shuffle on the domain key
    assert "hashpartitioning(_blk_domain" not in plan


def test_plan_pack_sequences_no_corpus_wide_single_partition(spark):
    from graphiti_spark.datapipe.sampling import pack_sequences

    plan = _plan(pack_sequences(_curation_docs(spark)))
    # exactly one SinglePartition exchange — the one-row-per-bucket summary;
    # the corpus itself reaches the result through a broadcast join
    assert plan.count("SinglePartition") == 1
    assert "BroadcastHashJoin" in plan


def test_plan_paragraph_dedup_has_no_window(spark):
    from graphiti_spark.datapipe.decontam import paragraph_dedup

    plan = _plan(paragraph_dedup(_curation_docs(spark)))
    # the skew-safety claim: no Window over the paragraph key anywhere —
    # the winner is a map-side-combining groupBy min(struct)
    assert "Window" not in plan


def test_plan_contamination_broadcasts_eval_grams(spark):
    from graphiti_spark.datapipe.decontam import contamination_report

    docs = _curation_docs(spark)
    plan = _plan(contamination_report(docs, docs.limit(3), n=2))
    assert "BroadcastHashJoin" in plan


def test_plan_span_dedup_shapes(spark):
    from graphiti_spark.datapipe.spandedup import repeated_span_dedup

    plan = _plan(repeated_span_dedup(_curation_docs(spark), k=3))
    # gram stats must combine map-side (hot boilerplate grams collapse
    # before the exchange) and nothing may degenerate to a cross product
    assert "partial_count" in plan and "CartesianProduct" not in plan
    # the coverage window is per-document, never a corpus-wide sort:
    # every Window operator's partition spec carries doc_id
    for frag in plan.split("Window [")[1:]:
        assert "doc_id" in frag.split("\n")[0]


def test_plan_bpe_segment_broadcasts_vocab(spark):
    from graphiti_spark.datapipe.bpe import bpe_segment_stats, learn_bpe

    docs = _curation_docs(spark)
    _, seqs = learn_bpe(docs, n_merges=2)
    plan = _plan(bpe_segment_stats(docs, seqs))
    # the corpus joins the broadcast vocab table; it must not shuffle on
    # the word key
    assert "BroadcastHashJoin" in plan
    assert "hashpartitioning(word" not in plan


def test_plan_adamic_adar_enumerates_without_self_join(spark):
    from graphiti_spark.analytics.graph_metrics import adamic_adar

    e = _curation_docs(spark).select(
        (F.col("doc_id") % 11).cast("string").alias("src"),
        (F.col("doc_id") % 7).cast("string").alias("dst"),
    )
    plan = _plan(adamic_adar(e, top_k=10))
    # wedge pairs come from two chained generators over the collected
    # neighbor arrays (the er._bucket_pairs shape) — no adj-on-adj join,
    # no cross product; the only join is the final anti vs existing edges
    assert plan.count("Generate explode") >= 2
    assert "CartesianProduct" not in plan
    assert "LeftAnti" in plan


def test_plan_triangle_counts_equi_joins_only(spark):
    from graphiti_spark.analytics.graph_metrics import triangle_counts

    e = _curation_docs(spark).select(
        (F.col("doc_id") % 13).cast("string").alias("src"),
        (F.col("doc_id") % 5).cast("string").alias("dst"),
    )
    plan = _plan(triangle_counts(e))
    # wedge closing is an equi-join on (x, y); orientation guarantees one
    # probe direction, so no cross product may appear anywhere
    assert "CartesianProduct" not in plan


def test_plan_url_canonicalize_is_map_only(spark):
    from graphiti_spark.datapipe.webstats import canonicalize_urls

    plan = _plan(canonicalize_urls(_curation_docs(spark)))
    assert "Exchange" not in plan  # pure column expressions, fusable with the scan


def test_plan_url_dedup_single_agg_no_window(spark):
    from graphiti_spark.datapipe.webstats import url_dedup

    plan = _plan(url_dedup(_curation_docs(spark)))
    assert plan.count("Exchange") == 1  # one hash agg on the canonical key
    assert "Window" not in plan
    # partial (map-side) aggregation must appear below the exchange
    assert "partial_min" in plan or "partial" in plan.lower()


def test_plan_winnow_fingerprints_map_only(spark):
    from graphiti_spark.datapipe.winnowing import winnow_fingerprints

    plan = _plan(winnow_fingerprints(_curation_docs(spark)))
    assert "Exchange" not in plan  # extraction fuses into the scan


def test_plan_weighted_sample_keys_are_codegen_no_python(spark):
    from graphiti_spark.datapipe.sampling import weighted_sample_k

    df = _curation_docs(spark).withColumn("w", F.length("text").cast("double"))
    plan = _plan(weighted_sample_k(df, k=5, weight_col="w", strata_col="url"))
    assert "PythonUDF" not in plan and "ArrowEval" not in plan


def test_plan_hearst_and_quotes_are_map_only(spark):
    from graphiti_spark.operators.hearst import extract_hypernyms

    d = spark.createDataFrame([(1, "companies such as Acme win.")], ["doc_id", "text"])
    plan = _plan(extract_hypernyms(d))
    assert "Exchange" not in plan  # fused into the scan wave
    assert "BatchEvalPython" not in plan  # JVM regexps, no Python


def test_plan_cms_estimate_broadcasts_sketch(spark):
    from graphiti_spark.datapipe.sketches import cms_build, cms_estimate

    df = spark.createDataFrame([("a",), ("b",)], ["k"])
    sketch = cms_build(df, "k", depth=2, width=8)
    plan = _plan(cms_estimate(sketch, df, "k", depth=2, width=8))
    assert "BroadcastHashJoin" in plan  # the tiny sketch ships, keys don't shuffle


def test_plan_pq_topk_is_take_ordered_no_python(spark):
    from graphiti_spark.datapipe.simsearch import pq_topk

    books = [[[0.0, 0.0], [1.0, 1.0]], [[2.0, 2.0], [0.0, 0.0]]]
    df = spark.createDataFrame([(1, [0.1, 0.1, 1.9, 2.0])], ["vec_id", "embedding"])
    plan = _plan(pq_topk(df, books, [0.0, 0.0, 1.0, 1.0], k=5))
    assert "TakeOrderedAndProject" in plan  # per-partition heaps, no global sort
    assert "BatchEvalPython" not in plan  # codebook LUTs fold into codegen


def test_plan_pattern_constant_predicate_pushdown(spark, tmp_path):
    from graphiti_spark.operators.pattern import match_pattern

    p = str(tmp_path / "edges")
    spark.createDataFrame(
        [("a", "R1", "b"), ("b", "R2", "c")],
        ["source_node_uuid", "name", "target_node_uuid"],
    ).write.parquet(p)
    edges = spark.read.parquet(p)
    plan = _plan(match_pattern(edges, [("?x", "R1", "?y"), ("?y", "R2", "?z")]))
    # the relation constants reach the parquet scan as pushed filters
    assert "PushedFilters: [IsNotNull(name), EqualTo(name,R1)" in plan


def test_plan_neo4j_csv_and_template_fp_map_only(spark):
    from graphiti_spark.operators.structured_data import template_fingerprint

    pages = spark.createDataFrame(
        [("u", bytearray(b"<html><body>x</body></html>"))], ["url", "html"]
    )
    assert "Exchange" not in _plan(template_fingerprint(pages))
