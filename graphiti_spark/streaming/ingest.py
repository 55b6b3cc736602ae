"""Incremental ingestion as Structured Streaming over a pages directory.

The reference ingests through an at-least-once work queue (worker poll loop
/root/reference/worker/worker.py:263-307, visibility timeout :273,
exponential backoff :744, DLQ :755-774). The Spark-native restatement is a
file-source stream: new page files landing under a directory are the queue;
checkpointLocation gives exactly the at-least-once + resume semantics the
queue's visibility timeout provides; the DLQ becomes a quarantine sink for
rows that fail extraction.

Each micro-batch runs the S1-S4 map stages (text, episodes, mentions,
triples — all shuffle-free) and APPENDS to the raw tables; the global
ER/CC/merge stages (S5-S9) are periodic batch compactions over the
accumulated raw tables — the same split the reference uses (per-episode
ingest vs background `dedup every 10 episodes`, worker.py:232-233,397-401).

Late data: pages carry event time `warc_ts`; a watermark bounds state if a
windowed aggregation is attached downstream. The default DAG keeps
micro-batches stateless (pure maps), so there is no state store to grow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from graphiti_spark.config import DEFAULT_CONFIG, PipelineConfig
from graphiti_spark.operators.episodes import episodes_stage
from graphiti_spark.operators.extract_text import extract_text_stage
from graphiti_spark.operators.ner import mentions_stage
from graphiti_spark.operators.triples import triples_stage

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def read_pages_stream(spark: SparkSession, pages_dir: str, max_files_per_trigger: int = 64) -> DataFrame:
    """File-source stream of page parquet drops. maxFilesPerTrigger bounds
    micro-batch size (the queue's batch-lease twin)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(pages_dir)
    )


def read_warc_stream(
    spark: SparkSession,
    warc_dir: str,
    gzip_per_record: bool = False,
    max_files_per_trigger: int = 8,
) -> DataFrame:
    """Stream Common-Crawl-style WARC shards landing in a directory into the
    pages table: ``binaryFile`` source (one row per shard, never split — a
    WARC shard is a record-concatenated unit) -> map-only parse
    (sources/warc.py). A live crawl's shard drops ARE the ingest queue; this
    is the front door for feeding `start_ingest`/`start_live_ingest` from
    raw crawl output instead of pre-parsed parquet. maxFilesPerTrigger
    bounds a micro-batch to N shards (~N GB at CC shard sizing)."""
    from graphiti_spark.sources.warc import parse_warc_files

    # binaryFile's schema is FIXED by the source, but the streaming reader
    # requires it stated explicitly (no inference on streams).
    shards = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, length long, content binary"
        )
        .option("pathGlobFilter", "*.warc*")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .load(warc_dir)
    )
    pages = parse_warc_files(
        shards.select(F.col("content").alias("warc")), gzip_per_record=gzip_per_record
    )
    # text is null pre-extraction; S1 fills it per micro-batch.
    return pages.withColumn("text", F.lit(None).cast("string")).select(
        "url", "warc_ts", "html", "text", "lang"
    )


def incremental_extract(pages_stream: DataFrame, config: PipelineConfig = DEFAULT_CONFIG) -> tuple[DataFrame, DataFrame, DataFrame]:
    """S1-S4 on a stream: (episodes, mentions, triples) streaming frames.
    All map-only — no watermark/state needed."""
    episodes = episodes_stage(extract_text_stage(pages_stream), config)
    return episodes, mentions_stage(episodes), triples_stage(episodes)


def start_ingest(
    spark: SparkSession,
    pages_dir: str,
    output_dir: str,
    config: PipelineConfig = DEFAULT_CONFIG,
    trigger_available_now: bool = True,
):
    """Start the incremental ingest: writes episodes/mentions/triples
    parquet under output_dir with a checkpoint (resume-safe).

    Delivery: at-least-once from the file source, made IDEMPOTENT by layout —
    each output is partitioned by ``_epoch`` and written with dynamic
    partition overwrite, so a replayed epoch (restart between the three
    writes) rewrites exactly its own partitions instead of appending
    duplicates. The three tables therefore converge to one copy per epoch —
    the effectively-once analog of the reference's transactional bulk save
    (bulk_utils.py:88-230) without requiring an atomic multi-table commit.
    """
    pages = read_pages_stream(spark, pages_dir)

    def _write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        episodes = episodes_stage(extract_text_stage(batch_df), config).persist()
        mentions = mentions_stage(episodes)
        triples = triples_stage(episodes)
        for name, df in (("episodes", episodes), ("mentions", mentions), ("triples", triples)):
            (
                df.withColumn("_epoch", F.lit(epoch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_epoch")
                .parquet(f"{output_dir}/{name}")
            )
        episodes.unpersist()

    writer = (
        pages.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", f"{output_dir}/_checkpoint")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_live_ingest(
    spark: SparkSession,
    pages_dir: str,
    state_dir: str,
    config: PipelineConfig = DEFAULT_CONFIG,
    registry=None,
    max_files_per_trigger: int = 64,
    compact_every: int = 0,
    trigger_available_now: bool = True,
):
    """Maintain a LIVE graph: each micro-batch runs the full incremental
    pipeline (plans/incremental.py) against ``state_dir``, so the canonical
    nodes/edges/mentions tables are current after every trigger — the
    streaming twin of the reference worker's per-task add_episode loop
    (worker.py:263-307) rather than the raw-append tier above.

    Delivery: the file source is at-least-once; run_pipeline_incremental
    makes replay a no-op (existing episode uuids are anti-joined out and a
    re-submitted batch overwrites its own content-addressed batch dirs), so
    the graph state converges effectively-once without a transactional sink.

    ``compact_every``: if >0, fold the append-only state tables every N
    micro-batches (compact_state) — the background `dedup every N episodes`
    maintenance slot the reference's worker schedules (worker.py:232-233,
    397-401). Safe mid-stream: compaction preserves read results and
    uncommitted batch dirs exactly (tests/test_incremental.py).

    Returns the StreamingQuery; per-batch stats land as JSON lines in
    ``<state_dir>/_ingest_log.jsonl``.
    """
    import json
    import os

    from graphiti_spark.plans.incremental import compact_state, run_pipeline_incremental

    pages = read_pages_stream(spark, pages_dir, max_files_per_trigger)
    seen = {"batches": 0}

    def _ingest_batch(batch_df: DataFrame, epoch_id: int) -> None:
        stats = run_pipeline_incremental(spark, batch_df, state_dir, config, registry=registry)
        stats["epoch_id"] = epoch_id
        seen["batches"] += 1
        if compact_every and seen["batches"] % compact_every == 0:
            stats["compaction"] = compact_state(spark, state_dir)
        with open(os.path.join(state_dir, "_ingest_log.jsonl"), "a") as f:
            f.write(json.dumps(stats) + "\n")

    writer = (
        pages.writeStream.foreachBatch(_ingest_batch)
        .option("checkpointLocation", f"{state_dir}/_checkpoint")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def episode_counts_by_window(
    episodes_stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Windowed ingest metrics with late-data handling: counts per
    (group_id, event-time window), watermarked on valid_at — the streaming-
    native twin of the worker's rate metrics (worker.py:134-200)."""
    return (
        episodes_stream.withWatermark("valid_at", watermark)
        .groupBy(F.window("valid_at", window).alias("w"), "group_id")
        .agg(F.count(F.lit(1)).alias("n_episodes"))
        .select(F.col("w.start").alias("window_start"), "group_id", "n_episodes")
    )
