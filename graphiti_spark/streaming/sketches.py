"""Streaming Count-Min sketch: the batch `datapipe.sketches.cms_build`
counter table maintained live over a document/key stream.

CMS cells merge by addition, which makes the sketch EXACTLY a streaming
aggregation: explode each incoming key into its ``depth`` (row, bucket)
cells and let a stateful groupBy-sum own the counters. The state store
holds at most ``depth * width`` rows TOTAL regardless of stream volume or
key cardinality — the rare stateful operator whose state cannot grow —
and update-mode output emits only cells a micro-batch touched.

Hot-key monitoring over a live crawl (which hosts/entities/shingles are
exploding right now) reads the sink table and probes it exactly like the
batch sketch (`cms_estimate` works unchanged on the materialized cells).

Determinism: same md5-derived cells as the batch build, so after any
prefix of the stream the materialized state equals `cms_build` over the
same rows — asserted by the equivalence test, restarts included
(checkpointed aggregation state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphiti_spark.datapipe.sketches import _bucket


def cms_stream(
    stream: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Streaming (row, bucket, cnt) cells for ``stream``; write with
    ``outputMode("update")`` (or "complete" for a tiny full-table sink).
    Null keys are skipped, matching the batch build."""
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    base = stream.filter(F.col(key_col).isNotNull()).select(
        F.col(key_col).cast("string").alias("k"), w.alias("w")
    )
    cells = base.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(d).alias("row"), _bucket("k", d, width))
                    for d in range(depth)
                ]
            )
        ).alias("c"),
        "w",
    ).select(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"), "w")
    return cells.groupBy("row", "bucket").agg(F.sum("w").alias("cnt"))
