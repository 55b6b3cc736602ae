from __future__ import annotations

import os

from graphiti_spark.fixtures import fixture_pages_df
from graphiti_spark.operators.attributes import hydrate_attributes, mention_contexts
from graphiti_spark.streaming.ingest import start_ingest


def test_streaming_ingest_available_now(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    fixture_pages_df(spark).write.parquet(pages_dir)
    q = start_ingest(spark, pages_dir, out_dir)
    q.awaitTermination(300)
    episodes = spark.read.parquet(os.path.join(out_dir, "episodes"))
    mentions = spark.read.parquet(os.path.join(out_dir, "mentions"))
    triples = spark.read.parquet(os.path.join(out_dir, "triples"))
    assert episodes.count() == 14
    assert mentions.count() > 20
    assert triples.count() >= 15
    # restart with no new files: checkpoint prevents re-ingestion
    q2 = start_ingest(spark, pages_dir, out_dir)
    q2.awaitTermination(300)
    assert spark.read.parquet(os.path.join(out_dir, "episodes")).count() == 14


def test_streaming_resume_picks_up_new_files(spark, tmp_path):
    pages_dir = str(tmp_path / "pages2")
    out_dir = str(tmp_path / "out2")
    df = fixture_pages_df(spark)
    df.limit(5).write.parquet(pages_dir)
    q = start_ingest(spark, pages_dir, out_dir)
    q.awaitTermination(300)
    n1 = spark.read.parquet(os.path.join(out_dir, "episodes")).count()
    assert n1 == 5
    # new files land -> only the delta is processed
    df.write.mode("append").parquet(pages_dir)
    q2 = start_ingest(spark, pages_dir, out_dir)
    q2.awaitTermination(300)
    n2 = spark.read.parquet(os.path.join(out_dir, "episodes")).count()
    assert n2 == 5 + 14


def test_hydrate_attributes(spark):
    from graphiti_spark.plans.pipeline import run_pipeline

    out = run_pipeline(spark, fixture_pages_df(spark))
    ctx = mention_contexts(out["mentions_raw"], out["episodes"])
    hydrated = hydrate_attributes(out["nodes"], ctx, out["uuid_map"])
    rows = {r["name"]: r for r in hydrated.collect()}
    google = rows["Google"]
    assert google["attributes"]["episode_count"] == "6"
    assert "Google" in google["summary"]
    assert int(google["attributes"]["mention_count"]) >= 6
    # summary ordering: newest episode first -> google4 (2024-02-05) evidence leads
    assert "Product4" in google["summary"].split("|")[0]


def test_live_ingest_matches_full_rebuild(spark, tmp_path):
    """start_live_ingest: N micro-batches through run_pipeline_incremental
    (with a mid-stream compaction) converge to EXACTLY the full-rebuild
    graph; a checkpointed restart with no new files changes nothing."""
    import json
    import os

    from pyspark.sql import functions as F

    from graphiti_spark.fixtures import fixture_pages_df
    from graphiti_spark.plans.incremental import read_graph
    from graphiti_spark.plans.pipeline import run_pipeline
    from graphiti_spark.streaming.ingest import start_live_ingest

    pages_dir = str(tmp_path / "pages_live")
    state_dir = str(tmp_path / "state_live")
    pages = fixture_pages_df(spark).localCheckpoint()
    pages.repartition(3, "url").write.parquet(pages_dir)

    q = start_live_ingest(
        spark, pages_dir, state_dir, max_files_per_trigger=1, compact_every=2
    )
    q.awaitTermination(300)

    full = run_pipeline(spark, pages)
    live = read_graph(spark, state_dir)
    for name in ("nodes", "edges", "mentions"):
        cols = sorted(full[name].columns)
        f_rows = [tuple(r) for r in full[name].select(*cols).orderBy("uuid").collect()]
        l_rows = [tuple(r) for r in live[name].select(*cols).orderBy("uuid").collect()]
        assert f_rows == l_rows, name

    with open(os.path.join(state_dir, "_ingest_log.jsonl")) as f:
        log = [json.loads(l) for l in f]
    assert sum(s["new_episodes"] for s in log) == pages.count()
    assert any("compaction" in s for s in log)

    # restart: file source checkpoint says nothing new; graph unchanged
    n_edges = live["edges"].count()
    q2 = start_live_ingest(spark, pages_dir, state_dir, max_files_per_trigger=1)
    q2.awaitTermination(120)
    assert read_graph(spark, state_dir)["edges"].count() == n_edges
