"""S8 — bi-temporal contradiction invalidation as a window operation.

Parity target: ``resolve_edge_contradictions``
(/root/reference/graphiti_core/utils/maintenance/edge_operations.py:425-455)
plus the new-edge self-expiry rule (:552-566):
 - facts with the same (group, subject, predicate) but different objects
   contradict each other in time,
 - an edge whose valid_at precedes a contradicting edge's valid_at gets
   invalid_at = that later valid_at and expired_at = ingestion time,
 - intervals already closed before the contradiction (invalid_at <= the
   contradicting valid_at) keep their earlier bound (min),
 - the latest edge in the partition stays open (the reference's "new edge
   expired only if a later candidate exists" — symmetric under batch).

After S7's merge, rows within a (group, src, pred) partition have distinct
objects, so `lead(valid_at)` over valid_at order IS the next contradiction.
One window shuffle, no iteration. The reference does this row-at-a-time with
per-edge candidate fetches; batch semantics are identical for a corpus load.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphiti_spark.config import DEFAULT_CONFIG, PipelineConfig


def invalidate_contradictions(
    edges: DataFrame, config: PipelineConfig = DEFAULT_CONFIG
) -> DataFrame:
    w = Window.partitionBy("group_id", "source_node_uuid", "name").orderBy(
        F.asc("valid_at"), F.asc("target_node_uuid")
    )
    nxt = F.lead("valid_at").over(w)
    contradiction = nxt.isNotNull() & (nxt > F.col("valid_at"))
    new_invalid = F.when(
        contradiction,
        F.when(F.col("invalid_at").isNotNull(), F.least("invalid_at", nxt)).otherwise(nxt),
    ).otherwise(F.col("invalid_at"))
    expired = F.when(
        contradiction & (F.col("invalid_at").isNull() | (nxt < F.col("invalid_at"))),
        F.to_timestamp(F.lit(config.created_at_iso)),
    ).otherwise(F.lit(None).cast("timestamp"))
    return edges.withColumn("expired_at", expired).withColumn("invalid_at", new_invalid)


def graph_at(
    edges: DataFrame,
    valid_time: str,
    tx_time: str | None = None,
) -> DataFrame:
    """Bi-temporal point-in-time slice of the edge table.

    Returns the edges that were TRUE at ``valid_time`` (valid-time axis:
    valid_at <= t < invalid_at, open interval when invalid_at is null) and,
    if ``tx_time`` is given, that the system BELIEVED at ``tx_time``
    (transaction-time axis: created_at <= t' and not expired before t').
    This is the batch restatement of the reference's bi-temporal EntityEdge
    model (edges.py valid_at/invalid_at + created_at/expired_at) — the
    query behind "what did the graph say about X as of last Tuesday".

    Pure predicate over the table: pushes down to the parquet/Iceberg scan
    (min/max pruning on valid_at-partitioned layouts), no shuffle.
    """
    t = F.to_timestamp(F.lit(valid_time))
    out = edges.filter(
        (F.col("valid_at") <= t)
        & (F.col("invalid_at").isNull() | (F.col("invalid_at") > t))
    )
    if tx_time is not None:
        tt = F.to_timestamp(F.lit(tx_time))
        cols = set(edges.columns)
        if "created_at" in cols:
            out = out.filter(F.col("created_at") <= tt)
        if "expired_at" in cols:
            out = out.filter(F.col("expired_at").isNull() | (F.col("expired_at") > tt))
    return out
