"""Streaming exact dedup: first-occurrence pass-through over a document
stream, keyed by content hash — the ingest-time twin of the batch
`datapipe.dedup.exact_dedup` (keep min id per md5 group). A live crawl
wants duplicates dropped BEFORE the expensive extraction tier, across
micro-batches and restarts; the reference's worker dedups per queue batch
only (worker/worker.py dedup cadence), this keeps the seen-set durable.

Scale shape: state is one tuple per DISTINCT content hash (the dedup'd
corpus cardinality, not the stream volume), hash-partitioned across
executors by the state store; each micro-batch shuffles only its own rows
(one Exchange on the hash). Arrow-batched in/out; within-batch duplicates
collapse deterministically to the minimum id. Checkpoint recovery resumes
the seen-set exactly (state tuple is plain (string, long)).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

DEDUP_OUT_SCHEMA = StructType(
    [
        StructField("content_md5", StringType()),
        StructField("keeper_id", StringType()),
        StructField("dup_count", LongType()),
    ]
)

# state: (keeper_id, total occurrences seen)
_STATE_SCHEMA = StructType(
    [StructField("keeper_id", StringType()), StructField("seen", LongType())]
)


def _update_dedup_state(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    content_md5 = key[0]
    ids: list[str] = []
    for pdf in pdfs:
        ids.extend(pdf["_dedup_id"].astype(str).tolist())
    if not ids:
        return
    batch_min = min(ids)
    if state.exists:
        keeper, seen = state.get
        state.update((keeper, seen + len(ids)))
        # keeper already emitted in an earlier batch — emit nothing
        return
    state.update((batch_min, len(ids)))
    yield pd.DataFrame(
        {
            "content_md5": [content_md5],
            "keeper_id": [batch_min],
            "dup_count": [len(ids) - 1],
        }
    )


def dedup_stream(
    docs_stream: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Streaming first-occurrence filter: one output row per NEWLY-seen
    content hash, carrying the keeper id (the minimum id inside the first
    batch that saw the hash — deterministic within a batch; across batches,
    arrival order decides, which is the streaming contract). Re-seeing a
    hash in later batches emits nothing and bumps the state's seen count."""
    keyed = docs_stream.select(
        F.md5(F.encode(F.col(text_col).cast("string"), "UTF-8")).alias("content_md5"),
        F.col(id_col).cast("string").alias("_dedup_id"),
    )
    return keyed.groupBy("content_md5").applyInPandasWithState(
        _update_dedup_state,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
