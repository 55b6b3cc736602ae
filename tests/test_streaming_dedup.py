"""Streaming exact-dedup: hand-derived two-batch + restart expectations
(streaming/dedup.py)."""

from __future__ import annotations

import os

DOCS_SCHEMA = "doc_id string, text string"


def _write_batch(spark, path: str, rows: list) -> None:
    spark.createDataFrame(rows, DOCS_SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _run(spark, src: str, ckpt: str, out: list) -> None:
    from graphiti_spark.streaming.dedup import dedup_stream

    stream = (
        spark.readStream.schema(DOCS_SCHEMA).option("maxFilesPerTrigger", "1").parquet(src)
    )
    q = (
        dedup_stream(stream)
        .writeStream.outputMode("append")
        .foreachBatch(lambda b, e: out.extend(b.collect()))
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_streaming_dedup_two_batches_and_restart(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    # batch 1: texts A (ids 1,3 — within-batch dup, keeper=min id "1"), B (id 2)
    _write_batch(spark, src, [("3", "A"), ("1", "A"), ("2", "B")])
    out: list = []
    _run(spark, src, ckpt, out)
    got = {r["content_md5"]: (r["keeper_id"], r["dup_count"]) for r in out}
    assert len(got) == 2
    keepers = {r["keeper_id"] for r in out}
    assert keepers == {"1", "2"}
    a_hash = next(r["content_md5"] for r in out if r["keeper_id"] == "1")
    assert got[a_hash] == ("1", 1)  # one within-batch duplicate

    # batch 2 AFTER RESTART (same checkpoint): A again (dropped — state
    # survived the restart), new text C (id 5 emitted)
    _write_batch(spark, src, [("4", "A"), ("5", "C")])
    out2: list = []
    _run(spark, src, ckpt, out2)
    assert [r["keeper_id"] for r in out2] == ["5"]
    assert out2[0]["dup_count"] == 0
