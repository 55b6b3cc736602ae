from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from graphiti_spark.analytics.centrality import betweenness_centrality
from graphiti_spark.operators.edge_merge import dedupe_edges_by_fact


def _edges(spark):
    rows = [
        # same endpoints, predicate paraphrases, near-identical facts -> merge
        ("e1", "g", "a", "b", "WORKS_AT", "Alice works at Acme Corp.", ["ep1"], datetime(2024, 1, 1), datetime(2024, 1, 1), None, 1),
        ("e2", "g", "a", "b", "EMPLOYED_AT", "Alice works at Acme Corp", ["ep2"], datetime(2024, 1, 2), datetime(2024, 1, 2), None, 1),
        # same endpoints, unrelated fact -> stays separate
        ("e3", "g", "a", "b", "VISITED", "Alice visited the downtown office of Bob yesterday evening.", ["ep3"], datetime(2024, 1, 3), datetime(2024, 1, 3), None, 1),
        # different endpoints -> untouched
        ("e4", "g", "a", "c", "WORKS_AT", "Alice works at Acme Corp.", ["ep4"], datetime(2024, 1, 4), datetime(2024, 1, 4), None, 1),
    ]
    return spark.createDataFrame(
        rows,
        "uuid string, group_id string, source_node_uuid string, target_node_uuid string, "
        "name string, fact string, episodes array<string>, created_at timestamp, "
        "valid_at timestamp, invalid_at timestamp, mention_count long",
    )


def test_fact_paraphrase_edges_merge(spark):
    out = dedupe_edges_by_fact(_edges(spark), fact_cosine_threshold=0.6)
    rows = {r["uuid"]: r for r in out.collect()}
    assert len(rows) == 3  # e1+e2 merged; e3, e4 standalone
    merged = rows["e1"]  # canonical = min uuid of the pair
    assert merged["episodes"] == ["ep1", "ep2"]
    assert merged["created_at"] == datetime(2024, 1, 1)
    assert merged["name"] == "WORKS_AT"  # min_by uuid keeps e1's predicate
    assert merged["mention_count"] == 2
    assert "e3" in rows and "e4" in rows


def test_betweenness_path_graph(spark):
    # path a-b-c-d: interior nodes b, c mediate shortest paths
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")],
        "source_node_uuid string, target_node_uuid string",
    )
    out = {r["uuid"]: r["betweenness"] for r in betweenness_centrality(e, sample_size=4, max_depth=5).collect()}
    assert out["b"] > 0 and out["c"] > 0
    assert out["b"] > out["a"] and out["c"] > out["d"]
