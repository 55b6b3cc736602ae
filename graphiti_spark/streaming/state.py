"""Custom stateful streaming operator: per-entity running state.

The reference's worker keeps per-group sequential state across queue
batches — dedup counters, "episodes since last maintenance", rate metrics
(worker/worker.py:134-200, 232-233: `dedup every 10 episodes`). In
Structured Streaming the native form of that is `applyInPandasWithState`:
a user-defined state per group key, updated once per micro-batch with the
key's new rows, surviving across batches in the state store (and across
restarts via the checkpoint).

`entity_state` tracks, per canonical entity uuid, a running
(mention_count, episode_count, first_seen, last_seen) — the incremental
twin of the batch `episode_mentions_reranker` statistics
(graphiti_core/search/search_helpers.py mention counting), maintained
online instead of recomputed per query.

Scale shape: state is O(distinct entities), hash-partitioned by the group
key across executors by the state store; each micro-batch shuffles only its
own rows (one Exchange on entity_uuid). Arrow-batched in/out — no per-row
Python. Timestamps are carried as epoch microseconds (long) inside the
state tuple: the state store round-trips plain longs losslessly, which
keeps resume-after-checkpoint bit-exact.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

ENTITY_STATE_SCHEMA = StructType(
    [
        StructField("entity_uuid", StringType()),
        StructField("name_norm", StringType()),
        StructField("mention_count", LongType()),
        StructField("episode_count", LongType()),
        StructField("first_seen", TimestampType()),
        StructField("last_seen", TimestampType()),
        StructField("is_new", BooleanType()),
    ]
)

# state tuple: (name_norm, mention_count, episode_count,
#               first_seen_us, last_seen_us)  — timestamps as epoch micros
_STATE_SCHEMA = StructType(
    [
        StructField("name_norm", StringType()),
        StructField("mention_count", LongType()),
        StructField("episode_count", LongType()),
        StructField("first_seen_us", LongType()),
        StructField("last_seen_us", LongType()),
    ]
)


def _update_entity_state(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    uuid = key[0]
    name_norm = None
    mentions = 0
    episodes: set = set()
    first_us = None
    last_us = None
    for pdf in pdfs:
        mentions += len(pdf)
        episodes.update(pdf["episode_uuid"].dropna().tolist())
        nn = pdf["name_norm"].dropna()
        if len(nn):
            # MIN, not first-seen: keeps the accumulated state invariant to
            # how the file source happens to split rows into micro-batches
            m = nn.min()
            name_norm = m if name_norm is None else min(name_norm, m)
        ts = pd.to_datetime(pdf["valid_at"].dropna())
        if len(ts):
            lo = int(ts.min().value // 1000)  # ns -> us
            hi = int(ts.max().value // 1000)
            first_us = lo if first_us is None else min(first_us, lo)
            last_us = hi if last_us is None else max(last_us, hi)

    if state.exists:
        p_name, p_mentions, p_episodes, p_first, p_last = state.get
        is_new = False
        if p_name is not None:
            name_norm = p_name if name_norm is None else min(name_norm, p_name)
        mentions += p_mentions
        n_episodes = p_episodes + len(episodes)
        if p_first is not None:
            first_us = p_first if first_us is None else min(first_us, p_first)
        if p_last is not None:
            last_us = p_last if last_us is None else max(last_us, p_last)
    else:
        is_new = True
        n_episodes = len(episodes)

    state.update((name_norm, mentions, n_episodes, first_us, last_us))

    def _ts(us):
        return pd.NaT if us is None else pd.Timestamp(us * 1000)  # us -> ns

    yield pd.DataFrame(
        {
            "entity_uuid": [uuid],
            "name_norm": [name_norm],
            "mention_count": [mentions],
            "episode_count": [n_episodes],
            "first_seen": [_ts(first_us)],
            "last_seen": [_ts(last_us)],
            "is_new": [is_new],
        }
    )


def entity_state_stream(mentions_stream: DataFrame) -> DataFrame:
    """mentions stream -> per-entity running state (update-mode output).

    Each micro-batch emits one row per entity SEEN IN THAT BATCH with its
    cumulative totals; entities absent from the batch emit nothing (their
    state persists untouched). `is_new` marks the entity's first appearance
    ever — the streaming analog of the batch pipeline's "new node" set.

    episode_count counts (batch, episode) pairs exactly once within a batch
    via a set, and accumulates across batches; an episode replayed in a
    LATER batch recounts (the file source never replays within one
    checkpoint lineage, so this matches at-least-once delivery).
    """
    return mentions_stream.groupBy("entity_uuid").applyInPandasWithState(
        _update_entity_state,
        outputStructType=ENTITY_STATE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_entity_state(
    spark,
    pages_dir: str,
    output_dir: str,
    trigger_available_now: bool = True,
    max_files_per_trigger: int = 64,
):
    """Wire the stateful operator end-to-end: pages stream -> S1-S3 maps ->
    per-entity running state, upserted to parquet per micro-batch.

    foreachBatch upsert (update-mode sinkable to files): each batch's
    emitted rows REPLACE that entity's previous row — dynamic partition
    overwrite on a bucket of the uuid keeps the rewrite bounded to touched
    buckets, the sinks/tables.py partition-pruned upsert idea applied to
    streaming state snapshots.
    """
    from graphiti_spark.operators.extract_text import extract_text_stage
    from graphiti_spark.operators.episodes import episodes_stage
    from graphiti_spark.operators.ner import mentions_stage
    from graphiti_spark.streaming.ingest import read_pages_stream

    pages = read_pages_stream(spark, pages_dir, max_files_per_trigger)
    mentions = mentions_stage(episodes_stage(extract_text_stage(pages)))
    states = entity_state_stream(mentions)

    out_path = f"{output_dir}/entity_state"

    def _upsert_batch(batch_df: DataFrame, epoch_id: int) -> None:
        from graphiti_spark.sinks.tables import upsert_table

        snap = batch_df.withColumn(
            "_bucket", F.pmod(F.crc32("entity_uuid"), F.lit(16)).cast("int")
        )
        upsert_table(
            snap.sparkSession,
            snap,
            out_path,
            key="entity_uuid",
            partition_by=["_bucket"],
        )

    writer = (
        states.writeStream.outputMode("update")
        .foreachBatch(_upsert_batch)
        .option("checkpointLocation", f"{output_dir}/_state_checkpoint")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
