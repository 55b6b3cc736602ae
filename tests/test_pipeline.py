"""End-to-end gates: triple P/R >= 0.95 on the golden fixture corpus
(the deterministic replacement for the reference's LLM-judged e2e eval,
tests/evals/eval_e2e_graph_building.py), dedup same/apart assertions,
episodes-union merge, and stage checkpoint/resume."""

from __future__ import annotations

import json
import os

import pytest

from graphiti_spark.fixtures import (
    EXPECTED_DIFFERENT,
    EXPECTED_SAME,
    EXPECTED_TRIPLES,
    fixture_pages_df,
)
from graphiti_spark.functions.ids import entity_uuid_py
from graphiti_spark.plans.pipeline import run_pipeline


@pytest.fixture(scope="module")
def result(spark):
    return run_pipeline(spark, fixture_pages_df(spark))


def _canon(umap, name, group="example.com"):
    u = entity_uuid_py(name, group)
    return umap.get(u, u)


def test_triple_precision_recall(result):
    umap = {r["uuid"]: r["canonical_uuid"] for r in result["uuid_map"].collect()}
    expected = {(_canon(umap, s), p, _canon(umap, o)) for s, p, o in EXPECTED_TRIPLES}
    produced = {
        (r["source_node_uuid"], r["name"], r["target_node_uuid"])
        for r in result["edges"].collect()
    }
    tp = len(expected & produced)
    precision = tp / len(produced) if produced else 0.0
    recall = tp / len(expected) if expected else 0.0
    assert precision >= 0.95, f"precision {precision}: extra={produced - expected}"
    assert recall >= 0.95, f"recall {recall}: missing={expected - produced}"


def test_dedup_same_and_different(result):
    umap = {r["uuid"]: r["canonical_uuid"] for r in result["uuid_map"].collect()}
    for a, b in EXPECTED_SAME:
        assert _canon(umap, a) == _canon(umap, b), f"{a} and {b} should canonicalize together"
    for a, b in EXPECTED_DIFFERENT:
        assert _canon(umap, a) != _canon(umap, b), f"{a} and {b} must stay distinct"


def test_merged_edge_unions_episodes(result):
    # "Google employs Sundar Pichai." appears on 5 pages -> one canonical edge
    # with a 5-episode provenance union (merge_edge_properties parity).
    rows = [r for r in result["edges"].collect() if r["name"] == "EMPLOYS"]
    assert len(rows) == 1
    assert len(rows[0]["episodes"]) == 5
    assert rows[0]["episodes"] == sorted(rows[0]["episodes"])


def test_temporal_contradiction_end_to_end(result):
    owns = {r["fact"]: r for r in result["edges"].collect() if r["name"] == "OWNS"}
    nestly = owns["Bluebird Corp owns Nestly."]
    firmly = owns["Bluebird Corp owns Firmly."]
    assert nestly["invalid_at"] is not None and nestly["expired_at"] is not None
    assert firmly["invalid_at"] is None


def test_audit_edges_match_uuid_map(result):
    n_map = result["uuid_map"].count()
    audit = result["audit_edges"].collect()
    assert len(audit) == n_map
    assert all(r["name"] == "IS_DUPLICATE_OF" for r in audit)


def test_mentions_are_canonical(result):
    node_uuids = {r["uuid"] for r in result["nodes"].collect()}
    for r in result["mentions"].collect():
        assert r["entity_uuid"] in node_uuids


def test_checkpoint_resume(spark, tmp_path):
    out_dir = str(tmp_path / "run1")
    pages = fixture_pages_df(spark)
    r1 = run_pipeline(spark, pages, output_dir=out_dir)
    ledger1 = r1["_ledger"]
    assert ledger1.stages_resumed == []
    edges1 = {
        (r["source_node_uuid"], r["name"], r["target_node_uuid"])
        for r in r1["edges"].collect()
    }
    # Kill-and-resume: drop the manifests of the last stages, re-run — the
    # committed prefix is skipped, the tail recomputes, results identical
    # (AtomicCentralityStorage resume_transaction analog,
    # tests/utils/maintenance/test_atomic_centrality_storage.py:192).
    for stage in ("s8_edges_final", "s9_mentions_final", "s9_audit_edges"):
        os.remove(os.path.join(out_dir, stage, "_manifest.json"))
    r2 = run_pipeline(spark, pages, output_dir=out_dir)
    ledger2 = r2["_ledger"]
    assert "s2_episodes" in ledger2.stages_resumed
    assert "s8_edges_final" in ledger2.stages_run
    edges2 = {
        (r["source_node_uuid"], r["name"], r["target_node_uuid"])
        for r in r2["edges"].collect()
    }
    assert edges1 == edges2
    # Lineage rows exist per stage (north rule: per-partition lineage).
    lineage = spark.read.parquet(os.path.join(out_dir, "s2_episodes", "lineage"))
    assert lineage.count() >= 1
    with open(os.path.join(out_dir, "s2_episodes", "_manifest.json")) as f:
        manifest = json.load(f)
    assert manifest["row_count"] == r1["episodes"].count()


def test_empty_input_commits_and_resumes(spark, tmp_path):
    """0-page input must run, commit every stage, and resume — an empty
    stage writes no parquet part files, so read-back relies on the
    manifest-pinned schema (pipeline.py materialize)."""
    out_dir = str(tmp_path / "empty")
    pages = fixture_pages_df(spark).filter("1=0")
    r1 = run_pipeline(spark, pages, output_dir=out_dir)
    assert r1["edges"].count() == 0
    assert r1["nodes"].count() == 0
    r2 = run_pipeline(spark, pages, output_dir=out_dir)
    assert r2["_ledger"].stages_run == []
    assert len(r2["_ledger"].stages_resumed) >= 10
    assert r2["edges"].count() == 0
    # schema survives the empty round-trip
    assert r2["edges"].schema == r1["edges"].schema


def test_episode_entity_edges_backfill(spark):
    """episode.entity_edges carries the final edge uuids whose provenance
    includes the episode (graphiti.py:524-528)."""
    from pyspark.sql import functions as F

    from graphiti_spark.plans.pipeline import run_pipeline
    from graphiti_spark.synth import pages_from_documents

    pages = pages_from_documents(spark, "/root/testdata/sf0.001").limit(30)
    out = run_pipeline(spark, pages)
    eps = out["episodes"]
    assert "entity_edges" in eps.columns
    # cross-check one episode against the edge table's provenance
    expected = (
        out["edges"]
        .select(F.col("uuid").alias("e"), F.explode("episodes").alias("ep"))
        .groupBy("ep")
        .agg(F.array_sort(F.collect_set("e")).alias("want"))
    )
    j = eps.join(expected, eps["uuid"] == expected["ep"], "inner")
    bad = j.filter(F.col("entity_edges") != F.col("want")).count()
    assert bad == 0
    # episodes with no edges -> empty list, not null
    assert eps.filter(F.col("entity_edges").isNull()).count() == 0
