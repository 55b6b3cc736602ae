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
