"""Watermarked tumbling-window streaming aggregation over the event stream —
the standard Structured Streaming late-data shape (watermark + window + append
mode) that complements the custom-stateful ops in `streaming/state.py` and
`streaming/dedup.py`.

Reference analog: the ingestion tier processes episodes in arrival order with
no event-time accounting (ingestion/queue_client.py poll loop); a live crawl
needs per-event-time-window rollups that tolerate out-of-order arrival up to
a bound. This is exactly Spark's built-in watermark contract, so the operator
is a pure declarative composition — no custom state:

 - `withWatermark(ts, delay)`: rows later than (max event time seen - delay)
   are dropped; window state older than the watermark is evicted;
 - tumbling `window(ts, width)` + groupBy: one shuffle on (window, key) with
   map-side partial aggregation;
 - append output: a window emits exactly once, when the watermark passes its
   end — the emitted row is final (safe to upsert downstream).

Scale shape: state per live (window, key) pair only — bounded by
(watermark delay / window width + 1) × |active keys|, independent of stream
volume; eviction is built into the state store. The window start surfaces as
epoch seconds (cross-engine timestamp repr hygiene, same as kg_pages).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events_stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    window_width: str = "1 hour",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """(window_start_epoch, key, n_events, total_value) — tumbling-window
    per-key rollup with late-data tolerance ``watermark_delay``. Works on a
    batch DataFrame too (window semantics identical; watermark is a no-op),
    which is how the DuckDB oracle twins it."""
    w = F.window(F.col(ts_col), window_width)
    df = events_stream
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark_delay)
    return (
        df.groupBy(w.alias("w"), F.col(key_col).alias("key"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_epoch"),
            "key",
            "n_events",
            "total_value",
        )
    )
