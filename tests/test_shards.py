"""Hand-derived cases for datapipe/shards (deterministic training-shard
layout): assignment/order are pure functions of (ids, salt, n_shards),
positions are dense per shard, the manifest hash is order-independent, and
the written shards read back in pos order."""

from __future__ import annotations

import hashlib
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from graphiti_spark.datapipe.shards import shard_manifest, shard_plan, write_training_shards


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _docs(spark, rows, n_parts=1):
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(n_parts)


_ROWS = [(i, f"word{i} alpha beta " * (1 + i % 3)) for i in range(40)]


def test_assignment_and_order_match_hand_formula(spark):
    out = {r["doc_id"]: r for r in shard_plan(_docs(spark, _ROWS), 4).collect()}
    # shard: first 15 md5 hex chars of 'shards:<id>' mod 4 — hand-checked
    for i, text in _ROWS:
        assert out[i]["shard"] == _md5_long(f"shards:{i}") % 4
        assert out[i]["n_tokens"] == len(text.split())
    # pos: rank of md5('ord:shards:<id>') within the shard, dense from 0
    by_shard: dict[int, list[int]] = {}
    for i, _ in _ROWS:
        by_shard.setdefault(out[i]["shard"], []).append(i)
    for s, members in by_shard.items():
        want = sorted(members, key=lambda i: (_md5_long(f"ord:shards:{i}"), i))
        got = sorted(members, key=lambda i: out[i]["pos"])
        assert got == want
        assert sorted(out[i]["pos"] for i in members) == list(range(len(members)))


def test_layout_independent_of_partitioning_and_salt_sensitive(spark):
    a = sorted(map(tuple, shard_plan(_docs(spark, _ROWS, 1), 4).collect()))
    b = sorted(map(tuple, shard_plan(_docs(spark, _ROWS, 7), 4).collect()))
    assert a == b
    c = sorted(map(tuple, shard_plan(_docs(spark, _ROWS, 7), 4, salt="other").collect()))
    assert a != c  # the salt reshuffles


def test_manifest_hash_is_order_independent_and_detects_change(spark):
    m1 = {r["shard"]: r for r in shard_manifest(_docs(spark, _ROWS, 1), 4).collect()}
    m2 = {r["shard"]: r for r in shard_manifest(_docs(spark, list(reversed(_ROWS)), 5), 4).collect()}
    assert {s: (r["n_docs"], r["n_tokens"], r["content_hash"]) for s, r in m1.items()} == {
        s: (r["n_docs"], r["n_tokens"], r["content_hash"]) for s, r in m2.items()
    }
    # one changed text flips exactly that doc's shard hash
    mutated = [(i, t if i != 7 else t + " tampered") for i, t in _ROWS]
    m3 = {r["shard"]: r for r in shard_manifest(_docs(spark, mutated, 1), 4).collect()}
    touched = _md5_long("shards:7") % 4
    for s in m1:
        if s == touched:
            assert m3[s]["content_hash"] != m1[s]["content_hash"]
        else:
            assert m3[s]["content_hash"] == m1[s]["content_hash"]


def test_write_roundtrip_pos_order_and_manifest(spark):
    out_dir = tempfile.mkdtemp(prefix="shards_")
    try:
        manifest = write_training_shards(_docs(spark, _ROWS, 3), out_dir, 4)
        assert manifest.count() == 4
        back = spark.read.parquet(out_dir)
        assert back.count() == len(_ROWS)
        plan = {r["doc_id"]: r for r in shard_plan(_docs(spark, _ROWS), 4).collect()}
        # parquet preserves within-file row order: reading one shard's file
        # directly yields the pseudo-shuffled order
        import glob as _glob

        for s in range(4):
            files = _glob.glob(f"{out_dir}/shard={s}/*.parquet")
            assert len(files) == 1  # one writer task per shard
            got = [r["doc_id"] for r in spark.read.parquet(files[0]).collect()]
            want = sorted(
                (i for i in plan if plan[i]["shard"] == s), key=lambda i: plan[i]["pos"]
            )
            assert got == want
        # the written manifest matches the returned one
        disk = {r["shard"]: r for r in spark.read.parquet(f"{out_dir}/_manifest").collect()}
        for r in manifest.collect():
            assert disk[r["shard"]]["content_hash"] == r["content_hash"]
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def test_n_shards_validation(spark):
    with pytest.raises(ValueError):
        shard_plan(_docs(spark, _ROWS), 0)
