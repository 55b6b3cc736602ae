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


def snapshot_churn(
    edges: DataFrame,
    t_from: str,
    t_to: str,
    rel_col: str = "name",
    key_col: str = "uuid",
) -> DataFrame:
    """Edge churn between two bi-temporal snapshots: per relation, how
    many facts were added, removed (invalidated), and retained between
    `graph_at(t_from)` and `graph_at(t_to)` — the monitoring view over an
    incrementally-ingested graph ("what changed in the KG this week"),
    the batch analogue of diffing the reference's live store between two
    points on its valid-time axis (edges.py valid_at/invalid_at).

    Returns (rel, n_from, n_to, added, removed, retained), where
    n_from = retained + removed and n_to = retained + added.

    Scale shape: two pushed-down point-in-time predicates over the same
    scan, one full-outer hash join on the fact key, one keyed agg. The
    join key is the edge uuid — uniformly distributed by construction, so
    no skew; at 10^12-document scale both slices prune to the partitions
    whose [min(valid_at), max(invalid_at)] straddle the timestamps.
    """
    a = graph_at(edges, t_from).select(
        F.col(key_col).alias("k"), F.col(rel_col).alias("rel_a")
    )
    b = graph_at(edges, t_to).select(
        F.col(key_col).alias("k"), F.col(rel_col).alias("rel_b")
    )
    j = a.join(b, "k", "full_outer").select(
        F.coalesce("rel_a", "rel_b").alias("rel"),
        F.col("rel_a").isNotNull().alias("in_a"),
        F.col("rel_b").isNotNull().alias("in_b"),
    )
    return j.groupBy("rel").agg(
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).alias("n_from"),
        F.sum(F.when(F.col("in_b"), 1).otherwise(0)).alias("n_to"),
        F.sum(F.when(F.col("in_b") & ~F.col("in_a"), 1).otherwise(0)).alias("added"),
        F.sum(F.when(F.col("in_a") & ~F.col("in_b"), 1).otherwise(0)).alias("removed"),
        F.sum(F.when(F.col("in_a") & F.col("in_b"), 1).otherwise(0)).alias("retained"),
    )


def fact_confidence(
    edges: DataFrame,
    as_of: str,
    half_life_days: float = 90.0,
    round_dp: int = 6,
) -> DataFrame:
    """Recency-decayed fact confidence: score each edge STILL TRUE at
    ``as_of`` by exponential decay of its age,

        confidence = 0.5 ^ (age_days / half_life_days)

    with age measured from ``valid_at``. The deterministic batch analogue
    of the reference's recency term in RelevanceScorer (rust services,
    relevance feedback ranks memories by recency + usage): downstream
    consumers rank or prune stale facts without mutating the bi-temporal
    record. Pure map over the point-in-time slice (graph_at) — predicate
    pushdown plus one codegen'd pow(); zero shuffles.

    Returns the surviving edges with an added ``confidence`` column.
    """
    t = F.to_timestamp(F.lit(as_of))
    live = graph_at(edges, as_of)
    age_days = (
        F.unix_micros(t) - F.unix_micros(F.col("valid_at"))
    ).cast("double") / F.lit(86400.0 * 1e6)
    return live.withColumn(
        "confidence",
        F.round(F.pow(F.lit(0.5), age_days / F.lit(half_life_days)), round_dp),
    )
