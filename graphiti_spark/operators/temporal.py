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
