"""Executed MERGE-by-rewrite upsert + incremental community update tests
(VERDICT r1 #9/#10)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from graphiti_spark.analytics.community import label_propagation, update_communities
from graphiti_spark.sinks.tables import upsert_table


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], "source_node_uuid string, target_node_uuid string"
    )


def test_upsert_table_merge_semantics(tmp_path, spark):
    """WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT, executed end-to-end on
    the parquet path (the Iceberg MERGE INTO twin, exercised for real)."""
    target = str(tmp_path / "nodes")
    first = spark.createDataFrame(
        [("a", "Alice", 1), ("b", "Bob", 1)], "uuid string, name string, v int"
    )
    upsert_table(spark, first, target)
    # second batch: updates 'b', inserts 'c'
    second = spark.createDataFrame(
        [("b", "Bobby", 2), ("c", "Cara", 2)], "uuid string, name string, v int"
    )
    upsert_table(spark, second, target)
    rows = {r["uuid"]: r for r in spark.read.parquet(target).collect()}
    assert set(rows) == {"a", "b", "c"}
    assert rows["a"]["name"] == "Alice" and rows["a"]["v"] == 1  # untouched survives
    assert rows["b"]["name"] == "Bobby" and rows["b"]["v"] == 2  # matched updated
    assert rows["c"]["name"] == "Cara"  # unmatched inserted
    # no leftover staging dirs
    assert not [d for d in os.listdir(tmp_path) if "_staged_" in d or "_old_" in d]


def test_upsert_partition_pruned_rewrite(tmp_path, spark):
    """VERDICT r2 #9: with a partition column, an upsert rewrites ONLY the
    partitions that receive rows or contain matched keys; untouched
    partition files are hard-linked into the staged table — same inode and
    mtime, no data copy — while the atomic two-rename swap is preserved."""
    target = str(tmp_path / "nodes")
    first = spark.createDataFrame(
        [("a", "g1", 1), ("b", "g2", 1), ("c", "g3", 1)],
        "uuid string, group_id string, v int",
    )
    upsert_table(spark, first, target, partition_by=["group_id"])

    def part_files(g):
        d = os.path.join(target, f"group_id={g}")
        return {
            f: os.stat(os.path.join(d, f)).st_ino
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    before_g1, before_g3 = part_files("g1"), part_files("g3")
    # touch only g2 (update b) and add a new partition g4 (insert d)
    second = spark.createDataFrame(
        [("b", "g2", 2), ("d", "g4", 2)], "uuid string, group_id string, v int"
    )
    upsert_table(spark, second, target, partition_by=["group_id"])
    rows = {r["uuid"]: r for r in spark.read.parquet(target).collect()}
    assert {u: rows[u]["v"] for u in rows} == {"a": 1, "b": 2, "c": 1, "d": 2}
    # untouched partitions: identical inodes = hard-linked, never rewritten
    assert part_files("g1") == before_g1
    assert part_files("g3") == before_g3

    # a matched key that MOVES partition: old partition is touched via the
    # key probe (row removed there), new partition receives it — no stale
    # duplicate survives in g1
    third = spark.createDataFrame([("a", "g5", 3)], "uuid string, group_id string, v int")
    g3_before = part_files("g3")
    upsert_table(spark, third, target, partition_by=["group_id"])
    moved = spark.read.parquet(target).filter("uuid = 'a'").collect()
    assert len(moved) == 1 and moved[0]["group_id"] == "g5" and moved[0]["v"] == 3
    assert part_files("g3") == g3_before  # still untouched
    assert not [d for d in os.listdir(tmp_path) if "_staged_" in d or "_old_" in d]


def test_upsert_delete_keys(tmp_path, spark):
    """delete_keys removes matched rows in the same atomic swap (the
    WHEN MATCHED DELETE branch of MERGE INTO): a deleted key's partition is
    touched even when no incoming row lands there, untouched partitions stay
    hard-linked, and a key present in BOTH delete_keys and the source is
    replaced (delete-then-insert)."""
    target = str(tmp_path / "t")
    first = spark.createDataFrame(
        [("a", "g1", 1), ("b", "g2", 1), ("c", "g3", 1)],
        "uuid string, group_id string, v int",
    )
    upsert_table(spark, first, target, partition_by=["group_id"])
    g3_ino = {
        f: os.stat(os.path.join(target, "group_id=g3", f)).st_ino
        for f in os.listdir(os.path.join(target, "group_id=g3"))
        if f.endswith(".parquet")
    }
    incoming = spark.createDataFrame([("b", "g2", 2)], "uuid string, group_id string, v int")
    dels = spark.createDataFrame([("a",), ("b",)], "uuid string")
    upsert_table(spark, incoming, target, partition_by=["group_id"], delete_keys=dels)
    rows = {r["uuid"]: r["v"] for r in spark.read.parquet(target).collect()}
    assert rows == {"b": 2, "c": 1}  # a deleted; b replaced; c untouched
    assert not os.path.isdir(os.path.join(target, "group_id=g1"))
    g3_after = {
        f: os.stat(os.path.join(target, "group_id=g3", f)).st_ino
        for f in os.listdir(os.path.join(target, "group_id=g3"))
        if f.endswith(".parquet")
    }
    assert g3_after == g3_ino  # untouched partition still hard-linked


def test_upsert_table_preserves_target_only_columns(tmp_path, spark):
    """MERGE INTO updates only the listed (source) columns — a column the
    incoming batch lacks must survive on ALL rows: matched rows keep their
    prior value, inserted rows get NULL (ADVICE r2)."""
    target = str(tmp_path / "t")
    first = spark.createDataFrame(
        [("a", "Alice", 0.9), ("b", "Bob", 0.1)], "uuid string, name string, score double"
    )
    upsert_table(spark, first, target)
    second = spark.createDataFrame([("b", "Bobby"), ("c", "Cara")], "uuid string, name string")
    upsert_table(spark, second, target)
    rows = {r["uuid"]: r for r in spark.read.parquet(target).collect()}
    assert rows["a"]["score"] == 0.9  # untouched row keeps it
    assert rows["b"]["score"] == 0.1 and rows["b"]["name"] == "Bobby"  # matched keeps it
    assert rows["c"]["score"] is None  # inserted gets NULL


def test_upsert_table_sweeps_stranded_staged_dirs(tmp_path, spark):
    """A crash during the staged write (before any rename) strands a
    ._staged_<hex> sibling; the next upsert must sweep it (ADVICE r2)."""
    import os

    target = str(tmp_path / "t")
    upsert_table(spark, spark.createDataFrame([("a", 1)], "uuid string, v int"), target)
    os.makedirs(target + "._staged_deadbeef")
    upsert_table(spark, spark.createDataFrame([("b", 2)], "uuid string, v int"), target)
    assert not [d for d in os.listdir(tmp_path) if "_staged_" in d]
    assert {r["uuid"] for r in spark.read.parquet(target).collect()} == {"a", "b"}


def test_upsert_table_resume_idempotent(tmp_path, spark):
    """Replaying the same batch converges (AtomicCentralityStorage resume
    analog, atomic_centrality_storage.py:192)."""
    target = str(tmp_path / "t")
    batch = spark.createDataFrame([("a", 1.0)], "uuid string, score double")
    upsert_table(spark, batch, target)
    upsert_table(spark, batch, target)
    out = spark.read.parquet(target).collect()
    assert len(out) == 1 and out[0]["score"] == 1.0


def _partition(assign: dict[str, str]) -> set[frozenset[str]]:
    groups: dict[str, set[str]] = {}
    for uuid, comm in assign.items():
        groups.setdefault(comm, set()).add(uuid)
    return {frozenset(g) for g in groups.values()}


def test_update_communities_matches_recompute(spark):
    """Delta attach yields the SAME PARTITION as a full recompute
    (update_community, community_operations.py:229-308). Community ids may
    differ — a recompute relabels from scratch, the delta op preserves the
    persisted ids — so the invariant is the grouping, not the label string."""
    base = [("a", "b"), ("b", "c"), ("a", "c"), ("d", "e"), ("e", "f"), ("d", "f")]
    labels0 = label_propagation(_edges(spark, base))
    # new node g attaches to the a-b-c triangle
    delta = base + [("g", "a"), ("g", "b"), ("g", "c")]
    updated = {r["uuid"]: r["community"] for r in update_communities(labels0, _edges(spark, delta)).collect()}
    recomputed = {r["uuid"]: r["community"] for r in label_propagation(_edges(spark, delta)).collect()}
    assert _partition(updated) == _partition(recomputed)
    # the delta op attaches g to the existing community WITHOUT relabeling it
    base_assign = {r["uuid"]: r["community"] for r in labels0.collect()}
    assert updated["g"] == base_assign["a"]
    for k, v in base_assign.items():
        assert updated[k] == v


def test_update_communities_isolated_island_merges(spark):
    """A disconnected new pair resolves by LPA over the residual subgraph:
    with the reference's weak-plurality fallback (max(candidate, current)
    when top vote weight <= 1, community_operations.py:101-106) a weight-1
    two-node island converges to ONE community at the max label — same as a
    full recompute — instead of oscillating into parity-dependent
    singletons."""
    base = [("a", "b")]
    labels0 = label_propagation(_edges(spark, base))
    delta = base + [("x", "y")]  # x-y island: no labeled neighbors
    updated = {r["uuid"]: r["community"] for r in update_communities(labels0, _edges(spark, delta)).collect()}
    assert updated["x"] == updated["y"] == "y"
    # and it matches what the recompute does with the same island
    recomputed = {r["uuid"]: r["community"] for r in label_propagation(_edges(spark, delta)).collect()}
    assert _partition(updated) == _partition(recomputed)


def test_lpa_weight1_island_converges_to_max_label(spark):
    """Direct LPA pin of the weak-plurality rule: a<->b (weight 1 each way)
    must merge to max(a, b), not depend on max_iterations parity."""
    for max_iter in (3, 4):  # both parities — oscillation would flip these
        labels = {
            r["uuid"]: r["community"]
            for r in label_propagation(_edges(spark, [("a", "b")]), max_iterations=max_iter).collect()
        }
        assert labels == {"a": "b", "b": "b"}
