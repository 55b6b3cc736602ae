"""Streaming Count-Min sketch (streaming/sketches.cms_stream): the
materialized aggregation state equals the batch cms_build over the same
rows, across micro-batches and a checkpointed restart."""

from __future__ import annotations

import os

KEYS_SCHEMA = "k string"
D, W = 3, 16


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, KEYS_SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _final_state(spark, src, ckpt):
    from graphiti_spark.streaming.sketches import cms_stream

    stream = (
        spark.readStream.schema(KEYS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    state: dict = {}

    def _sink(b, _):
        for r in b.collect():
            state[(r["row"], r["bucket"])] = r["cnt"]

    q = (
        cms_stream(stream, "k", depth=D, width=W)
        .writeStream.outputMode("update")
        .foreachBatch(_sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return state


def test_stream_state_equals_batch_sketch_with_restart(spark, tmp_path):
    from graphiti_spark.datapipe.sketches import cms_build

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    b1 = [("hot",)] * 6 + [("a",), ("b",), (None,)]
    b2 = [("hot",)] * 4 + [("c",)]
    _write_batch(spark, src, b1)
    state = _final_state(spark, src, ckpt)
    # restart the query on new data only — checkpoint carries the counters
    _write_batch(spark, src, b2)
    state.update(_final_state(spark, src, ckpt))
    batch = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_build(
            spark.createDataFrame(b1 + b2, KEYS_SCHEMA), "k", depth=D, width=W
        ).collect()
    }
    assert state == batch
    # probing the materialized state with the batch estimator works
    from graphiti_spark.datapipe.sketches import cms_estimate

    cells = spark.createDataFrame(
        [(r, b, c) for (r, b), c in state.items()], "row int, bucket long, cnt long"
    )
    keys = spark.createDataFrame([("hot",), ("c",)], KEYS_SCHEMA)
    est = {r["key"]: r["est"] for r in cms_estimate(cells, keys, "k", depth=D, width=W).collect()}
    assert est["hot"] >= 10 and est["c"] >= 1
