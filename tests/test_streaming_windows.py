"""Watermarked tumbling-window aggregation: hand-derived late-data
expectations across three micro-batches with checkpoint restarts
(streaming/windows.py).

Timeline (window = 1 hour, watermark delay = 30 minutes):
  batch 1: u1@10:05, u1@10:50          → max ET 10:50, wm 10:20; nothing emits
  batch 2: u1@10:55 (late but window    → accepted (window [10,11) end 11:00 >
           [10,11) still open), u2@12:00  wm 10:20); new wm 11:30 → [10,11)
                                           finalizes: (u1, n=3)
  batch 3: u1@10:15 (window end 11:00   → DROPPED (evicted window);
           < wm 11:30), u2@13:30          new wm 13:00 → [12,13) finalizes:
                                           (u2, n=1); [13,14) never emits
Final emitted set: {(10:00 u1 3), (12:00 u2 1)} — the dropped 10:15 must not
resurrect [10,11), and [13,14) must stay open.
"""

from __future__ import annotations

import os
from datetime import datetime

EVENTS_SCHEMA = "ts timestamp, user_id string, value double"


def _t(h: int, m: int) -> datetime:
    return datetime(2024, 3, 1, h, m, 0)


def _write(spark, path: str, rows: list) -> None:
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _run(spark, src: str, ckpt: str, out: list) -> None:
    from graphiti_spark.streaming.windows import windowed_event_counts

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA).option("maxFilesPerTrigger", "1").parquet(src)
    )
    q = (
        windowed_event_counts(stream, ts_col="ts", key_col="user_id")
        .writeStream.outputMode("append")
        .foreachBatch(lambda b, e: out.extend(b.collect()))
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_watermark_late_data_semantics(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    out: list = []

    _write(spark, src, [(_t(10, 5), "u1", 1.0), (_t(10, 50), "u1", 2.0)])
    _run(spark, src, ckpt, out)
    assert out == []  # watermark 10:20 has not passed window end 11:00

    _write(spark, src, [(_t(10, 55), "u1", 4.0), (_t(12, 0), "u2", 8.0)])
    _run(spark, src, ckpt, out)
    got = {(r["window_start_epoch"], r["key"]): (r["n_events"], r["total_value"]) for r in out}
    ep10 = int(_t(10, 0).timestamp())
    # the within-watermark late row 10:55 IS counted before finalization
    assert got == {(ep10, "u1"): (3, 7.0)}

    _write(spark, src, [(_t(10, 15), "u1", 100.0), (_t(13, 30), "u2", 16.0)])
    _run(spark, src, ckpt, out)
    got = {(r["window_start_epoch"], r["key"]): (r["n_events"], r["total_value"]) for r in out}
    ep12 = int(_t(12, 0).timestamp())
    # 10:15 dropped (its window was finalized); [13,14) still open, no row
    assert got == {(ep10, "u1"): (3, 7.0), (ep12, "u2"): (1, 8.0)}


def test_batch_mode_twin(spark):
    """The same operator over a batch DataFrame = plain window groupBy —
    the shape the DuckDB oracle twins."""
    from graphiti_spark.streaming.windows import windowed_event_counts

    df = spark.createDataFrame(
        [(_t(10, 5), "u1", 1.0), (_t(10, 50), "u1", 2.0), (_t(12, 0), "u2", 8.0)],
        EVENTS_SCHEMA,
    )
    got = {(r["window_start_epoch"], r["key"]): (r["n_events"], r["total_value"])
           for r in windowed_event_counts(df, ts_col="ts", key_col="user_id").collect()}
    assert got == {
        (int(_t(10, 0).timestamp()), "u1"): (2, 3.0),
        (int(_t(12, 0).timestamp()), "u2"): (1, 8.0),
    }
