"""Round-3 operators: generic as-of join, stateful streaming entity state,
near-dup keep-canonical. Expectations are HAND-DERIVED (in comments) —
never regenerated from engine output."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

UTC = dt.timezone.utc


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s).replace(tzinfo=None)


# ---------------------------------------------------------------------------
# asof_join
# ---------------------------------------------------------------------------


def test_asof_join_hand_cases(spark):
    """Backward-inclusive semantics, tie-break, unmatched-left NULLs.

    right (key k1): t=10 v=a, t=20 v=b, t=20 v=c (tie -> max tie_break wins:
    'c' has tb 2 > 'b' tb 1), t=30 v=d
    left  (key k1): t=5  -> no match (NULL)
                    t=10 -> 'a'   (inclusive at equality)
                    t=25 -> 'c'   (latest <= 25 is the t=20 pair; tie -> c)
                    t=59 -> 'd'
    left  (key k2): t=50 -> NULL  (no right rows for k2 at all)
    """
    from graphiti_spark.operators.asof import asof_join

    right = spark.createDataFrame(
        [
            Row(k="k1", rt=_ts("2024-01-01 00:00:10"), v="a", tb=1),
            Row(k="k1", rt=_ts("2024-01-01 00:00:20"), v="b", tb=1),
            Row(k="k1", rt=_ts("2024-01-01 00:00:20"), v="c", tb=2),
            Row(k="k1", rt=_ts("2024-01-01 00:00:30"), v="d", tb=1),
        ]
    )
    left = spark.createDataFrame(
        [
            Row(id=1, k="k1", lt=_ts("2024-01-01 00:00:05")),
            Row(id=2, k="k1", lt=_ts("2024-01-01 00:00:10")),
            Row(id=3, k="k1", lt=_ts("2024-01-01 00:00:25")),
            Row(id=4, k="k1", lt=_ts("2024-01-01 00:00:59")),
            Row(id=5, k="k2", lt=_ts("2024-01-01 00:00:50")),
        ]
    )
    out = asof_join(
        left, right, on="k", left_time="lt", right_time="rt",
        right_cols=["v"], tie_break="tb",
    )
    got = {r["id"]: r["v"] for r in out.collect()}
    assert got == {1: None, 2: "a", 3: "c", 4: "d", 5: None}
    assert out.count() == 5  # every left row preserved exactly once


def test_asof_join_tolerance(spark):
    """tolerance_sec nulls out matches older than the window: left t=100
    with right t=10 and tolerance 30 -> stale -> NULL."""
    from graphiti_spark.operators.asof import asof_join

    right = spark.createDataFrame([Row(k="a", rt=_ts("2024-01-01 00:00:10"), v="x")])
    left = spark.createDataFrame(
        [
            Row(id=1, k="a", lt=_ts("2024-01-01 00:00:20")),   # age 10 <= 30: keep
            Row(id=2, k="a", lt=_ts("2024-01-01 00:01:40")),   # age 90 > 30: stale
        ]
    )
    out = asof_join(
        left, right, on="k", left_time="lt", right_time="rt",
        right_cols=["v"], tolerance_sec=30,
    )
    got = {r["id"]: r["v"] for r in out.collect()}
    assert got == {1: "x", 2: None}


def test_asof_join_matches_duckdb_native(spark):
    """Cross-engine: our union-window as-of == DuckDB's native ASOF LEFT
    JOIN on the sf0.001 events/orders tables (same dedup pre-step)."""
    duckdb = pytest.importorskip("duckdb")
    from graphiti_spark.operators.asof import asof_join

    sf = "/root/testdata/sf0.001"
    events = (
        spark.read.parquet(f"{sf}/events.parquet")
        .select("event_id", "ts", "user_id")
    )
    orders = spark.read.parquet(f"{sf}/orders.parquet").select(
        F.col("o_custkey").alias("user_id"), "o_orderdate", "o_orderkey"
    )
    out = asof_join(
        events, orders, on="user_id", left_time="ts", right_time="o_orderdate",
        right_cols=["o_orderkey"], tie_break="o_orderkey",
    )
    got = {
        r["event_id"]: r["o_orderkey"]
        for r in out.select("event_id", "o_orderkey").collect()
    }
    want_rows = duckdb.sql(
        f"""
        WITH rd AS (
          SELECT user_id, o_orderdate, o_orderkey FROM (
            SELECT o_custkey AS user_id, o_orderdate, o_orderkey,
                   row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                      ORDER BY o_orderkey DESC) AS rn
            FROM '{sf}/orders.parquet') WHERE rn = 1)
        SELECT e.event_id, rd.o_orderkey
        FROM '{sf}/events.parquet' e
        ASOF LEFT JOIN rd ON e.user_id = rd.user_id AND e.ts >= rd.o_orderdate
        """
    ).fetchall()
    want = {eid: ok for eid, ok in want_rows}
    assert got == want and len(got) > 0


def test_asof_join_plan_single_exchange(spark):
    """Scale shape: ONE hash Exchange on the key (plus the window sort) —
    no range-join fan-out, no cartesian."""
    from graphiti_spark.operators.asof import asof_join

    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet").select("event_id", "ts", "user_id")
    orders = spark.read.parquet(f"{sf}/orders.parquet").select(
        F.col("o_custkey").alias("user_id"), "o_orderdate", "o_orderkey"
    )
    out = asof_join(
        events, orders, on="user_id", left_time="ts", right_time="o_orderdate",
        right_cols=["o_orderkey"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # union-window formulation: hashpartitioning on the key, no join operator
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# keep_canonical
# ---------------------------------------------------------------------------


def test_keep_canonical_hand_case(spark):
    """pairs (2,3),(3,4),(5,6): component {2,3,4} -> canonical '2'; {5,6} ->
    '5'; 1 untouched. Pair (9,10) pins the LEXICOGRAPHIC rule ('10' < '9'
    as strings — same as the entity uuid_map, bulk_utils.py:464-468)."""
    from graphiti_spark.datapipe.dedup import keep_canonical

    docs = spark.createDataFrame([Row(doc_id=i) for i in (1, 2, 3, 4, 5, 6, 9, 10)])
    pairs = spark.createDataFrame(
        [Row(id_a=2, id_b=3), Row(id_a=3, id_b=4), Row(id_a=5, id_b=6), Row(id_a=9, id_b=10)]
    )
    out = keep_canonical(docs, pairs)
    got = {r["doc_id"]: (r["canonical_id"], r["is_kept"]) for r in out.collect()}
    assert got == {
        "1": ("1", True),
        "2": ("2", True),
        "3": ("2", False),
        "4": ("2", False),
        "5": ("5", True),
        "6": ("5", False),
        "9": ("10", False),
        "10": ("10", True),
    }
    # exactly one survivor per component, all docs covered
    assert len(got) == 8


# ---------------------------------------------------------------------------
# stateful streaming entity state
# ---------------------------------------------------------------------------

MENTIONS_SCHEMA = (
    "episode_uuid string, entity_uuid string, name_norm string, valid_at timestamp"
)


def _write_mentions(spark, path: str, rows: list) -> None:
    spark.createDataFrame(rows, MENTIONS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _run_state_stream(spark, src: str, ckpt: str, out: list) -> None:
    from graphiti_spark.streaming.state import entity_state_stream

    stream = (
        spark.readStream.schema(MENTIONS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    states = entity_state_stream(stream)

    def _sink(batch_df, epoch_id):
        out.extend(batch_df.collect())

    q = (
        states.writeStream.outputMode("update")
        .foreachBatch(_sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_entity_state_accumulates_across_restart(spark, tmp_path):
    """Hand-derivation. Phase 1 (one file):
      ep1/A@2024-01-01, ep1/A@2024-01-02, ep2/B@2024-01-03
      -> A: 2 mentions, 1 episode, first 01-01, last 01-02, is_new
         B: 1 mention,  1 episode, 01-03/01-03, is_new
    Phase 2 (new file, SAME checkpoint -> state restored from store):
      ep3/A@2023-12-31 (earlier: first_seen moves back), ep3/B@2024-01-05
      -> A: 3 mentions, 2 episodes, first 2023-12-31, last 2024-01-02, NOT new
         B: 2 mentions, 2 episodes, first 2024-01-03, last 2024-01-05, NOT new
    """
    src = str(tmp_path / "mentions")
    ckpt = str(tmp_path / "ckpt")
    _write_mentions(
        spark,
        src,
        [
            ("ep1", "A", "apple", _ts("2024-01-01 00:00:00")),
            ("ep1", "A", "apple", _ts("2024-01-02 00:00:00")),
            ("ep2", "B", "banana", _ts("2024-01-03 00:00:00")),
        ],
    )
    phase1: list = []
    _run_state_stream(spark, src, ckpt, phase1)
    p1 = {r["entity_uuid"]: r for r in phase1}
    assert p1["A"]["mention_count"] == 2 and p1["A"]["episode_count"] == 1
    assert p1["A"]["first_seen"] == _ts("2024-01-01 00:00:00")
    assert p1["A"]["last_seen"] == _ts("2024-01-02 00:00:00")
    assert p1["A"]["is_new"] and p1["B"]["is_new"]
    assert p1["B"]["mention_count"] == 1

    _write_mentions(
        spark,
        src,
        [
            ("ep3", "A", "apple", _ts("2023-12-31 00:00:00")),
            ("ep3", "B", "banana", _ts("2024-01-05 00:00:00")),
        ],
    )
    phase2: list = []
    _run_state_stream(spark, src, ckpt, phase2)  # same checkpoint: resume
    p2 = {r["entity_uuid"]: r for r in phase2}
    assert p2["A"]["mention_count"] == 3 and p2["A"]["episode_count"] == 2
    assert p2["A"]["first_seen"] == _ts("2023-12-31 00:00:00")
    assert p2["A"]["last_seen"] == _ts("2024-01-02 00:00:00")
    assert p2["B"]["mention_count"] == 2 and p2["B"]["episode_count"] == 2
    assert p2["B"]["last_seen"] == _ts("2024-01-05 00:00:00")
    assert not p2["A"]["is_new"] and not p2["B"]["is_new"]


def test_entity_state_e2e_equals_batch_aggregate(spark, tmp_path):
    """Cross-path oracle: the stateful streaming pipeline (pages stream ->
    S1-S3 -> applyInPandasWithState -> per-batch upsert), run in MULTIPLE
    micro-batches, must equal the plain batch groupBy over mentions_stage on
    the same corpus — two independent aggregation code paths."""
    from graphiti_spark.operators.episodes import episodes_stage
    from graphiti_spark.operators.extract_text import extract_text_stage
    from graphiti_spark.operators.ner import mentions_stage
    from graphiti_spark.streaming.state import start_entity_state
    from graphiti_spark.synth import pages_from_documents

    sf = "/root/testdata/sf0.001"
    pages = pages_from_documents(spark, sf)
    pages_dir = str(tmp_path / "pages")
    pages.repartition(4).write.mode("overwrite").parquet(pages_dir)

    out_dir = str(tmp_path / "out")
    q = start_entity_state(spark, pages_dir, out_dir, max_files_per_trigger=1)
    q.awaitTermination()
    got = {
        r["entity_uuid"]: r
        for r in spark.read.parquet(f"{out_dir}/entity_state").collect()
    }

    batch = (
        mentions_stage(episodes_stage(extract_text_stage(spark.read.parquet(pages_dir))))
        .groupBy("entity_uuid")
        .agg(
            F.min("name_norm").alias("name_norm"),
            F.count(F.lit(1)).alias("mention_count"),
            F.countDistinct("episode_uuid").alias("episode_count"),
            F.min("valid_at").alias("first_seen"),
            F.max("valid_at").alias("last_seen"),
        )
    )
    want = {r["entity_uuid"]: r for r in batch.collect()}
    assert set(got) == set(want) and len(got) > 10
    for k, w in want.items():
        g = got[k]
        assert (
            g["mention_count"],
            g["episode_count"],
            g["name_norm"],
            g["first_seen"],
            g["last_seen"],
        ) == (
            w["mention_count"],
            w["episode_count"],
            w["name_norm"],
            w["first_seen"],
            w["last_seen"],
        ), k
