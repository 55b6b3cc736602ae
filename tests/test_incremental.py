"""Incremental ingest ≡ full rebuild (plans/incremental.py).

The reference's live flow is repeated add_episode calls against an existing
graph (graphiti.py:358-564): skip existing episodes, resolve new entities
against the graph, physically merge duplicates (merge_node_into), re-run
temporal invalidation on related edges. The batch-Spark restatement must
produce, after ingesting batch A then batch B, EXACTLY the tables a full
run over A ∪ B produces — including cross-batch entity merges (a batch-B
name variant pulling a batch-A entity into its cluster) and cross-batch
temporal invalidation (a batch-B fact expiring a batch-A edge).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphiti_spark.fixtures import _page, fixture_pages_df
from graphiti_spark.plans.incremental import read_graph, run_pipeline_incremental
from graphiti_spark.plans.pipeline import run_pipeline

# Batch-A page whose sole entity "Graphitti" (a typo) lives alone until
# batch B delivers the /graphiti page, whose Graphiti↔Graphitti fuzzy pair
# merges the batch-A entity into the new cluster — so batch B must rewrite
# a batch-A node AND its edge (the merge_node_into analog).
_TYPO_PAGE = _page(
    "https://example.com/typo",
    "2024-01-02T06:00:00",
    "Typo",
    ["Graphitti acquired Zeppo."],
)

_A_URLS = {
    "https://example.com/alice",
    "https://example.com/acme",
    "https://example.com/own1",  # Bluebird owns Nestly (invalidated by B's own2)
    "https://example.com/google0",
    "https://example.com/google1",
    "https://example.com/google2",
    "https://example.com/typo",
    "https://example.de/bericht",
}


def _pages(spark):
    df = fixture_pages_df(spark)
    extra = spark.createDataFrame(
        [(
            _TYPO_PAGE["url"],
            _TYPO_PAGE["warc_ts"],
            _TYPO_PAGE["html"],
            _TYPO_PAGE["text"],
            _TYPO_PAGE["lang"],
        )],
        df.schema,
    )
    return df.unionByName(extra)


def _rows(df, sort_key="uuid"):
    cols = sorted(df.columns)
    return [
        tuple(r[c] for c in cols)
        for r in df.select(*cols).orderBy(sort_key).collect()
    ]


def _assert_tables_equal(full_df, inc_df, name):
    fc, ic = sorted(full_df.columns), sorted(inc_df.columns)
    assert fc == ic, f"{name}: column mismatch {fc} vs {ic}"
    f_rows, i_rows = _rows(full_df), _rows(inc_df)
    assert f_rows == i_rows, (
        f"{name}: {len(f_rows)} full vs {len(i_rows)} incremental rows; "
        f"first diff: {next(((a, b) for a, b in zip(f_rows, i_rows) if a != b), None)}"
    )


@pytest.fixture(scope="module")
def graphs(spark, tmp_path_factory):
    pages = _pages(spark).localCheckpoint()
    batch_a = pages.filter(F.col("url").isin(list(_A_URLS)))
    batch_b = pages.filter(~F.col("url").isin(list(_A_URLS)))
    assert batch_a.count() == len(_A_URLS) and batch_b.count() > 0

    full = run_pipeline(spark, pages)

    state = str(tmp_path_factory.mktemp("inc") / "state")
    s1 = run_pipeline_incremental(spark, batch_a, state)
    s2 = run_pipeline_incremental(spark, batch_b, state)
    return full, read_graph(spark, state), s1, s2, state, batch_b


def test_incremental_matches_full_rebuild(graphs):
    full, inc, _, _, _, _ = graphs
    _assert_tables_equal(full["nodes"], inc["nodes"], "nodes")
    _assert_tables_equal(full["edges"], inc["edges"], "edges")
    _assert_tables_equal(full["mentions"], inc["mentions"], "mentions")
    _assert_tables_equal(full["episodes_raw"], inc["episodes"].drop("entity_edges"), "episodes")


def test_cross_batch_merge_rewrites_prior_batch(graphs):
    """Batch B's Graphiti↔Graphitti pair must remap batch A's Graphitti
    entity: its old canonical node disappears, its ACQUIRED edge points at
    the merged canonical, and the stats surface the rewrite."""
    full, inc, s1, s2, _, _ = graphs
    assert s1.get("bootstrap") is True
    assert s2["changed_entities"] >= 1
    assert s2["affected_clusters"] >= 1
    nodes = {r["name_norm"]: r for r in inc["nodes"].collect()}
    # exactly ONE canonical node survives for the graphiti/graphitti pair —
    # its display fields come from the min-uuid member (could be either
    # surface form; uuid parity with the full run is pinned by the equality
    # test above)
    assert len({n for n in ("graphiti", "graphitti") if n in nodes}) == 1
    acq = inc["edges"].filter(F.col("name") == "ACQUIRED")
    canon_by_edge = {
        (r["source_node_uuid"], r["target_node_uuid"]) for r in acq.collect()
    }
    node_uuids = {r["uuid"] for r in inc["nodes"].collect()}
    for s, t in canon_by_edge:
        assert s in node_uuids and t in node_uuids  # no dangling pointers


def test_cross_batch_temporal_invalidation(graphs):
    """own1 (batch A: Bluebird owns Nestly) must be invalidated by own2
    (batch B: Bluebird owns Firmly) exactly as in the full run."""
    _, inc, _, _, _, _ = graphs
    owns = {
        r["target_node_uuid"]: r
        for r in inc["edges"].filter(F.col("name") == "OWNS").collect()
    }
    assert len(owns) == 2
    invalids = sorted(
        (r["invalid_at"] is not None) for r in owns.values()
    )
    assert invalids == [False, True]  # earlier fact closed, later stays open


def test_reingest_is_idempotent(graphs, spark):
    full, inc, _, _, state, batch_b = graphs
    before = inc["edges"].count(), inc["nodes"].count(), inc["mentions"].count()
    s3 = run_pipeline_incremental(spark, batch_b, state)
    assert s3 == {"new_episodes": 0, "skipped": True}
    after_g = read_graph(spark, state)
    after = after_g["edges"].count(), after_g["nodes"].count(), after_g["mentions"].count()
    assert before == after


# ---------------------------------------------------------------------------
# compaction (plans/incremental.py compact_state)
# ---------------------------------------------------------------------------


def _batch_dirs(state, table):
    import os

    p = os.path.join(state, table)
    return sorted(d for d in os.listdir(p) if d.startswith("batch_"))


def test_compaction_folds_dirs_and_preserves_graph(graphs, spark):
    """After two increments each append table holds 2 batch dirs; compaction
    folds them into one batch_compact dir and read_graph is unchanged."""
    import json
    import os

    from graphiti_spark.plans.incremental import _APPEND_TABLES, compact_state

    full, _, _, _, state, _ = graphs
    for t in _APPEND_TABLES:
        assert len(_batch_dirs(state, t)) == 2, t
    stats = compact_state(spark, state)
    for t in _APPEND_TABLES:
        assert _batch_dirs(state, t) == ["batch_compact_000001"], t
        assert stats[t]["folded"] == 2
        assert stats[t]["rows_out"] <= stats[t]["rows_in"]
    with open(os.path.join(state, "_state.json")) as f:
        assert json.load(f)["batches"] == ["compact_000001"]
    after = read_graph(spark, state)
    _assert_tables_equal(full["nodes"], after["nodes"], "nodes")
    _assert_tables_equal(full["edges"], after["edges"], "edges")
    _assert_tables_equal(full["mentions"], after["mentions"], "mentions")


def test_increment_after_compaction_matches_full(spark, tmp_path):
    """ingest A -> compact -> ingest B  ==  full run over A ∪ B. The next
    increment sees exactly the state it would have seen uncompacted (the
    contract that makes compaction a safe background maintenance slot)."""
    from graphiti_spark.plans.incremental import compact_state

    pages = _pages(spark).localCheckpoint()
    batch_a = pages.filter(F.col("url").isin(list(_A_URLS)))
    batch_b = pages.filter(~F.col("url").isin(list(_A_URLS)))
    full = run_pipeline(spark, pages)
    state = str(tmp_path / "state")
    run_pipeline_incremental(spark, batch_a, state)
    compact_state(spark, state)
    s2 = run_pipeline_incremental(spark, batch_b, state)
    assert s2["new_episodes"] > 0
    inc = read_graph(spark, state)
    _assert_tables_equal(full["nodes"], inc["nodes"], "nodes")
    _assert_tables_equal(full["edges"], inc["edges"], "edges")
    _assert_tables_equal(full["mentions"], inc["mentions"], "mentions")


def test_compaction_preserves_pending_batch(spark, tmp_path):
    """A batch dir NOT in the marker (crashed, uncommitted increment) must
    survive compaction byte-for-byte so its replay stays idempotent."""
    import os

    from graphiti_spark.plans.incremental import compact_state

    pages = _pages(spark)
    batch_a = pages.filter(F.col("url").isin(list(_A_URLS)))
    state = str(tmp_path / "state")
    run_pipeline_incremental(spark, batch_a, state)
    # simulate a crashed increment: a batch dir present on disk, absent
    # from the marker
    pend = os.path.join(state, "mentions_raw", "batch_deadbeef0000")
    os.makedirs(pend)
    with open(os.path.join(pend, "part-0.parquet"), "wb") as f:
        f.write(b"\x00sentinel-bytes")
    stats = compact_state(spark, state)
    assert stats["mentions_raw"]["kept_pending"] == 1
    assert stats["mentions_raw"]["folded"] == 1
    with open(os.path.join(pend, "part-0.parquet"), "rb") as f:
        assert f.read() == b"\x00sentinel-bytes"
    assert _batch_dirs(state, "mentions_raw") == [
        "batch_compact_000001",
        "batch_deadbeef0000",
    ]


# ---------------------------------------------------------------------------
# episode removal (plans/incremental.py remove_episodes)
# ---------------------------------------------------------------------------


def test_remove_episodes_reverts_ingest(spark, tmp_path):
    """ingest(A); ingest(B); remove(B) == ingest(A) table-for-table —
    including UN-merging the Graphiti<-Graphitti cluster whose duplicate
    evidence came only from batch B (the reference's remove_episode
    orphan-cleanup, graphiti.py:1087-1120, made exact by recomputation)."""
    from graphiti_spark.operators.episodes import episodes_stage
    from graphiti_spark.operators.extract_text import extract_text_stage
    from graphiti_spark.plans.incremental import remove_episodes

    pages = _pages(spark).localCheckpoint()
    batch_a = pages.filter(F.col("url").isin(list(_A_URLS)))
    batch_b = pages.filter(~F.col("url").isin(list(_A_URLS)))

    ref_state = str(tmp_path / "ref")
    run_pipeline_incremental(spark, batch_a, ref_state)
    ref = read_graph(spark, ref_state)

    state = str(tmp_path / "rm")
    run_pipeline_incremental(spark, batch_a, state)
    run_pipeline_incremental(spark, batch_b, state)
    b_uuids = [
        r["uuid"]
        for r in episodes_stage(extract_text_stage(batch_b)).select("uuid").collect()
    ]
    stats = remove_episodes(spark, state, b_uuids)
    assert stats["removed_episodes"] == len(b_uuids)
    assert stats["dead_entities"] >= 1

    got = read_graph(spark, state)
    _assert_tables_equal(ref["nodes"], got["nodes"], "nodes")
    _assert_tables_equal(ref["edges"], got["edges"], "edges")
    _assert_tables_equal(ref["mentions"], got["mentions"], "mentions")
    _assert_tables_equal(
        ref["episodes"].drop("entity_edges"), got["episodes"].drop("entity_edges"), "episodes"
    )
    # and the graph remains ingestable: re-adding B reproduces the full graph
    run_pipeline_incremental(spark, batch_b, state)
    full = run_pipeline(spark, pages)
    again = read_graph(spark, state)
    _assert_tables_equal(full["nodes"], again["nodes"], "nodes-again")
    _assert_tables_equal(full["edges"], again["edges"], "edges-again")


def test_remove_episodes_unknown_uuid_noop(graphs, spark):
    from graphiti_spark.plans.incremental import remove_episodes

    _, _, _, _, state, _ = graphs
    assert remove_episodes(spark, state, ["no-such-uuid"]) == {
        "removed_episodes": 0,
        "skipped": True,
    }
