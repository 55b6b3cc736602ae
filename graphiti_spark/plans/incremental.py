"""Incremental ingest: new pages against an EXISTING graph.

The reference's dominant usage is not the bulk load but repeated
``Graphiti.add_episode`` calls against a live graph
(/root/reference/graphiti_core/graphiti.py:358-564): skip already-ingested
episodes, extract, resolve new entities against the existing graph
(node_operations.py:385-617), remap edge pointers, merge duplicate nodes
physically (merge_node_into, node_operations.py:760-1169), and re-run
temporal invalidation only against related edges
(edge_operations.py:327-455). This module is that flow as a batch Spark
job whose cost scales with the NEW batch + its affected neighborhood, not
with the corpus:

 - S1-S4 (text/episodes/mentions/triples) run on the new pages only,
 - ER candidates are generated ONLY for pairs touching a new-batch entity
   (blocking buckets with no new member are never enumerated),
 - connected components re-runs over the cumulative duplicate-PAIR list
   (O(pairs), a small fraction of entities — never over the corpus),
 - nodes/edges/mentions are rebuilt ONLY for affected canonical clusters
   and affected invalidation partitions, then upserted with the
   partition-pruned `upsert_table` (superseded canonical uuids deleted —
   the Spark restatement of execute_merge_operations),
 - cumulative state (mentions_raw, triples_raw, duplicate_pairs) is
   append-only under content-addressed batch dirs, so a re-submitted or
   crashed batch is idempotent (at-least-once queue semantics,
   ingestion/queue_client.py, without the queue).

Equivalence contract: incremental(A); incremental(B) produces the SAME
nodes/edges/mentions/episodes tables as run_pipeline(A ∪ B), verified by
tests/test_incremental.py and by the `kg_incremental_*` driver oracles
(which replay the sf corpus in two batches against the full-batch golden).
One documented exception: blocking document-frequency caps are evaluated
at ingest time, so a bucket that crosses `blocking_token_max_df` only
after later batches arrive keeps the pairs it discovered earlier — recall
never decreases over time, while a full rebuild would drop that bucket
entirely. (The caps never bind on the test corpora.)

100-TB notes: the per-increment scans of cumulative state are either
key-semi-joined (mentions_raw, triples_raw — partition/bloom-prunable under
a real table format) or O(pairs)/O(affected) joins; the only full-width
pass is the blocking-key map over the entity CATALOG (rows ∝ distinct
entities, not pages), which on Iceberg would instead persist band postings
and turn into an equi-join. Every uuid_map/affected-set join is broadcast.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphiti_spark.config import DEFAULT_CONFIG, PipelineConfig
from graphiti_spark.operators.components import connected_components
from graphiti_spark.operators.edge_merge import (
    canonical_nodes,
    merge_edges,
    remap_mentions,
    resolve_edge_pointers,
)
from graphiti_spark.operators.episodes import episodes_stage
from graphiti_spark.operators.er import (
    _char_ngrams_col,
    entity_catalog,
    score_and_filter_pairs,
)
from graphiti_spark.operators.extract_text import extract_text_stage
from graphiti_spark.operators.ner import mentions_stage
from graphiti_spark.operators.postings import (
    candidate_pairs_from_postings,
    entity_postings,
)
from graphiti_spark.operators.temporal import invalidate_contradictions
from graphiti_spark.operators.triples import triples_stage
from graphiti_spark.functions.hashing import minhash_cols
from graphiti_spark.session import plan_width
from graphiti_spark.sinks.tables import upsert_table

_STATE_MARKER = "_state.json"
# cumulative append-only inputs (batch dirs) vs upserted outputs
_APPEND_TABLES = ("mentions_raw", "triples_raw", "duplicate_pairs", "postings")


def _p(state_dir: str, name: str) -> str:
    return os.path.join(state_dir, name)


def _read(spark: SparkSession, state_dir: str, name: str) -> DataFrame:
    reader = spark.read
    if name in _APPEND_TABLES:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.parquet(_p(state_dir, name))


def _append_batch(df: DataFrame, state_dir: str, name: str, batch_id: str) -> None:
    """Idempotent append: each increment lands in a content-addressed batch
    dir; a crashed/re-submitted batch overwrites its own dir only."""
    df.write.mode("overwrite").parquet(os.path.join(_p(state_dir, name), f"batch_{batch_id}"))


def _atomic_overwrite(df: DataFrame, target: str) -> None:
    tmp, old = f"{target}._staged_inc", f"{target}._old_inc"
    shutil.rmtree(tmp, ignore_errors=True)
    df.write.mode("overwrite").parquet(tmp)
    if os.path.isdir(target):
        os.rename(target, old)
    os.rename(tmp, target)
    shutil.rmtree(old, ignore_errors=True)


def _batch_id(episodes_new: DataFrame) -> str:
    """Deterministic content address of the batch (no driver collect of the
    uuid list): count + lexicographic min/max + order-free crc fold."""
    row = episodes_new.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("uuid").alias("lo"),
        F.max("uuid").alias("hi"),
        F.sum(F.crc32(F.col("uuid"))).alias("fold"),
    ).collect()[0]
    return hashlib.md5(f"{row['n']}:{row['lo']}:{row['hi']}:{row['fold']}".encode()).hexdigest()[:12]


def _incremental_candidate_pairs(
    entities_all: DataFrame, new_ids: DataFrame, config: PipelineConfig
) -> DataFrame:
    """Candidate pairs where AT LEAST ONE side is a new-batch entity.

    Same two blockers as the full run (token block ∪ banded MinHash-LSH,
    er.candidate_pairs) and the same bucket df cap, but buckets with no new
    member are never enumerated and old×old pairs are never re-emitted —
    per-increment work ∝ new entities × bucket sizes, not the catalog."""
    base = entities_all.join(
        F.broadcast(new_ids.select("entity_uuid").withColumn("_is_new", F.lit(True))),
        "entity_uuid",
        "left",
    ).select(
        "group_id",
        "entity_uuid",
        "name_norm",
        F.coalesce("_is_new", F.lit(False)).alias("_is_new"),
        F.split("name_norm", "_").alias("toks"),
    )
    tok = base.select(
        "group_id", "entity_uuid", "_is_new", F.explode("toks").alias("tok")
    ).filter(F.length("tok") >= 2)
    n_hashes = config.lsh_num_hash_tables
    grams = base.select(
        "group_id",
        "entity_uuid",
        "_is_new",
        *minhash_cols(_char_ngrams_col(F.col("name_norm"), config.lsh_ngram_size), n_hashes),
    )
    banded = grams.select(
        "group_id",
        "entity_uuid",
        "_is_new",
        F.posexplode(F.array(*[F.col(f"mh{i}") for i in range(n_hashes)])).alias(
            "band", "band_hash"
        ),
    ).filter(F.col("band_hash").isNotNull())

    def bucket_new_pairs(rows: DataFrame, key_cols: list[str]) -> DataFrame:
        g = (
            rows.groupBy(*key_cols)
            .agg(
                F.count(F.lit(1)).alias("df"),
                F.sort_array(F.collect_set("entity_uuid")).alias("us"),
                F.sort_array(
                    F.collect_set(F.when(F.col("_is_new"), F.col("entity_uuid")))
                ).alias("new_us"),
            )
            .filter(
                (F.col("df") <= config.blocking_token_max_df)
                & (F.size("us") >= 2)
                & (F.size("new_us") >= 1)
            )
        )
        g = g.repartition(plan_width(rows.sparkSession), *key_cols)
        return (
            g.select("group_id", "us", F.explode("new_us").alias("a"))
            .select("group_id", "a", F.explode("us").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .select(
                "group_id",
                F.least("a", "b").alias("uuid_a"),
                F.greatest("a", "b").alias("uuid_b"),
            )
        )

    return (
        bucket_new_pairs(tok, ["group_id", "tok"])
        .unionByName(bucket_new_pairs(banded, ["group_id", "band", "band_hash"]))
        .dropDuplicates(["group_id", "uuid_a", "uuid_b"])
    )


def _bootstrap(
    spark: SparkSession,
    pages: DataFrame,
    state_dir: str,
    config: PipelineConfig,
    registry,
) -> dict:
    """First batch: run the full DAG, persist it as incremental state."""
    from graphiti_spark.plans.pipeline import run_pipeline

    out = run_pipeline(spark, pages, config, registry=registry)
    episodes = out["episodes_raw"]
    bid = _batch_id(episodes)
    os.makedirs(state_dir, exist_ok=True)
    _append_batch(out["mentions_raw"], state_dir, "mentions_raw", bid)
    _append_batch(out["triples_raw"], state_dir, "triples_raw", bid)
    _append_batch(out["duplicate_pairs"], state_dir, "duplicate_pairs", bid)
    _atomic_overwrite(out["uuid_map"], _p(state_dir, "uuid_map"))
    # episodes WITHOUT the entity_edges backfill: the backfill is a view over
    # (episodes, edges) and goes stale across batches — read_graph recomputes it.
    upsert_table(spark, out["episodes_raw"], _p(state_dir, "episodes"), partition_by=["group_id"])
    # entity catalog state: keyed by entity_uuid (pre-canonical)
    ents = _read(spark, state_dir, "mentions_raw")
    catalog = entity_catalog(ents).localCheckpoint()
    upsert_table(spark, catalog, _p(state_dir, "entities"), key="entity_uuid")
    # blocking-key postings for the full catalog (operators/postings.py):
    # later increments look up candidate buckets by equi-join instead of
    # re-tokenizing/re-minhashing the whole catalog.
    _append_batch(entity_postings(catalog, config), state_dir, "postings", bid)
    upsert_table(spark, out["nodes"], _p(state_dir, "nodes"), partition_by=["group_id"])
    upsert_table(spark, out["edges"], _p(state_dir, "edges"), partition_by=["group_id"])
    upsert_table(spark, out["mentions"], _p(state_dir, "mentions"), partition_by=["group_id"])
    with open(_p(state_dir, _STATE_MARKER), "w") as f:
        json.dump({"batches": [bid]}, f)
    return {
        "batch_id": bid,
        "new_episodes": episodes.count(),
        "bootstrap": True,
    }


def run_pipeline_incremental(
    spark: SparkSession,
    pages: DataFrame,
    state_dir: str,
    config: PipelineConfig = DEFAULT_CONFIG,
    registry=None,
) -> dict:
    """Ingest ``pages`` into the graph state at ``state_dir``; returns stats.

    State layout: episodes / entities / nodes / edges / mentions (upserted,
    group_id-partitioned) + mentions_raw / triples_raw / duplicate_pairs
    (append-only batch dirs) + uuid_map (atomic overwrite; O(duplicates)).
    """
    if not os.path.exists(_p(state_dir, _STATE_MARKER)):
        return _bootstrap(spark, pages, state_dir, config, registry)

    timings: dict[str, float] = {}
    _t0 = time.time()

    def _mark(phase: str) -> None:
        nonlocal _t0
        now = time.time()
        timings[phase] = round(now - _t0, 2)
        _t0 = now

    # ---- S1-S2 on the new batch; skip already-ingested episodes ----------
    episodes_all = episodes_stage(extract_text_stage(pages), config)
    existing_eps = _read(spark, state_dir, "episodes").select("uuid")
    episodes_new = episodes_all.join(existing_eps, "uuid", "left_anti").localCheckpoint()
    n_new = episodes_new.count()
    if n_new == 0:
        return {"new_episodes": 0, "skipped": True}
    bid = _batch_id(episodes_new)
    _mark("s1_s2_episodes")

    # ---- S3-S4 on the new batch only --------------------------------------
    mentions_new = mentions_stage(episodes_new).localCheckpoint()
    triples_new = triples_stage(episodes_new).localCheckpoint()
    _append_batch(mentions_new, state_dir, "mentions_raw", bid)
    _append_batch(triples_new, state_dir, "triples_raw", bid)
    _mark("s3_s4_extract")

    # ---- catalog refresh for entities seen in this batch ------------------
    # (re-seen old entities get their mention_count / deterministic
    # representative-name recomputed over ALL their mentions — exactly what
    # the full run's groupBy would produce)
    new_ids = mentions_new.select("group_id", "entity_uuid").distinct().localCheckpoint()
    mentions_cum = _read(spark, state_dir, "mentions_raw")
    touched_mentions = mentions_cum.join(
        F.broadcast(new_ids), ["group_id", "entity_uuid"], "left_semi"
    )
    entities_touched = entity_catalog(touched_mentions).localCheckpoint()
    upsert_table(spark, entities_touched, _p(state_dir, "entities"), key="entity_uuid")
    entities_all = _read(spark, state_dir, "entities")
    _mark("catalog_refresh")

    # ---- ER: pairs touching a new entity; CC over cumulative pairs --------
    # Preferred path: persisted blocking postings (operators/postings.py) —
    # per-increment key computation is O(touched), and the bucket lookup is
    # a broadcast semi-join over the postings scan instead of re-deriving
    # keys for the whole catalog. Falls back to the inline recompute for
    # state dirs created before the postings table existed.
    if os.path.isdir(_p(state_dir, "postings")):
        post_touched = entity_postings(entities_touched, config).localCheckpoint()
        _append_batch(post_touched, state_dir, "postings", bid)
        cands = candidate_pairs_from_postings(
            _read(spark, state_dir, "postings"),
            entities_all,
            post_touched,
            new_ids,
            config,
        )
    else:
        cands = _incremental_candidate_pairs(entities_all, new_ids, config)
    pairs_new = score_and_filter_pairs(entities_all, cands, config)
    _append_batch(pairs_new, state_dir, "duplicate_pairs", bid)
    pairs_cum = (
        _read(spark, state_dir, "duplicate_pairs")
        .dropDuplicates(["group_id", "uuid_a", "uuid_b"])
        .localCheckpoint()
    )
    _mark("er_pairs")
    map_old = _read(spark, state_dir, "uuid_map")
    map_new = connected_components(pairs_cum, config).localCheckpoint()
    _mark("connected_components")

    stats = _rebuild_affected(
        spark,
        state_dir,
        map_old=map_old,
        map_new=map_new,
        touched_ids=new_ids,
        triples_extra=triples_new,
        mentions_cum=mentions_cum,
        registry=registry,
        config=config,
        mark=_mark,
    )

    # ---- episodes + map state ---------------------------------------------
    upsert_table(spark, episodes_new, _p(state_dir, "episodes"), partition_by=["group_id"])
    _atomic_overwrite(map_new, _p(state_dir, "uuid_map"))
    with open(_p(state_dir, _STATE_MARKER)) as f:
        marker = json.load(f)
    if bid not in marker["batches"]:
        marker["batches"].append(bid)
    with open(_p(state_dir, _STATE_MARKER), "w") as f:
        json.dump(marker, f)
    _mark("episodes_map_state")

    return {"batch_id": bid, "new_episodes": n_new, **stats, "timings": timings}


def _rebuild_affected(
    spark: SparkSession,
    state_dir: str,
    map_old: DataFrame,
    map_new: DataFrame,
    touched_ids: DataFrame,
    triples_extra: DataFrame | None,
    mentions_cum: DataFrame,
    registry,
    config: PipelineConfig = DEFAULT_CONFIG,
    mark=lambda phase: None,
) -> dict:
    """Rebuild the canonical nodes/edges/mentions tables for every cluster
    affected by a uuid-map change — the shared core of incremental ingest
    and episode removal.

    ``touched_ids``: (group_id, entity_uuid) of entities whose mention set
    changed this operation (new-batch entities on ingest; entities of the
    removed episodes on removal — including ones that no longer exist, so
    their emptied clusters get rebuilt-to-nothing and deleted).
    ``triples_extra``: raw-form triples whose (group, canonical-src, name)
    invalidation partitions must rebuild even if no endpoint moved (the
    new batch's triples on ingest; the REMOVED triples on removal).
    ``mentions_cum``: the current (post-change) raw mention set.
    """
    # changed = entities whose canonical assignment differs between maps
    # (including rows appearing/disappearing: an absent row canonicalizes to
    # itself). affected canonicals = old + new canonicals of changed entities
    # + canonicals of every touched entity.
    mo = map_old.select("uuid", F.col("canonical_uuid").alias("c_old"))
    mn = map_new.select("uuid", F.col("canonical_uuid").alias("c_new"))
    ch = (
        mo.join(mn, "uuid", "full")
        .withColumn("c_old", F.coalesce("c_old", "uuid"))
        .withColumn("c_new", F.coalesce("c_new", "uuid"))
        .filter(F.col("c_old") != F.col("c_new"))
        .localCheckpoint()
    )
    changed_uuids = ch.select("uuid")
    new_canon = touched_ids.join(
        mn, touched_ids["entity_uuid"] == mn["uuid"], "left"
    ).select(F.coalesce("c_new", "entity_uuid").alias("canon"))
    affected_canon = (
        ch.select(F.col("c_old").alias("canon"))
        .unionByName(ch.select(F.col("c_new").alias("canon")))
        .unionByName(new_canon)
        .distinct()
        .localCheckpoint()
    )

    # The three table rebuilds below (nodes / edges / mentions) are mutually
    # independent — each reads shared checkpointed inputs (map_new,
    # affected_canon, ch) plus its OWN state table and writes its OWN target
    # — so they run as concurrent Spark jobs from a thread pool (the same
    # overlap pattern as run_pipeline's s4‖ER chain). Resume safety is
    # unchanged: a crash before the final episodes/marker phase re-runs the
    # whole batch and every upsert is idempotent by key.

    # ---- nodes: rebuild affected clusters, delete superseded canonicals ---
    def _nodes_job():
        entities_all = _read(spark, state_dir, "entities")
        ents_c = entities_all.join(
            F.broadcast(map_new.select(F.col("uuid").alias("entity_uuid"), "canonical_uuid")),
            "entity_uuid",
            "left",
        ).withColumn("canon", F.coalesce("canonical_uuid", "entity_uuid"))
        members = ents_c.join(F.broadcast(affected_canon), "canon", "left_semi").drop(
            "canonical_uuid", "canon"
        )
        nodes_updated = canonical_nodes(members, map_new, config.created_at_iso)
        if registry is not None:
            from graphiti_spark.operators.typed_schemas import apply_entity_types

            nodes_updated = apply_entity_types(nodes_updated, registry)
        nodes_updated = nodes_updated.localCheckpoint()
        nodes_old = _read(spark, state_dir, "nodes")
        del_nodes = (
            nodes_old.select("uuid")
            .join(F.broadcast(affected_canon.withColumnRenamed("canon", "uuid")), "uuid", "left_semi")
            .join(nodes_updated.select("uuid"), "uuid", "left_anti")
        )
        upsert_table(
            spark, nodes_updated, _p(state_dir, "nodes"), partition_by=["group_id"], delete_keys=del_nodes
        )
        return nodes_updated

    # ---- edges: recompute affected invalidation partitions completely -----
    # A partition is (group_id, canonical source, predicate) — the window key
    # of invalidate_contradictions. Any partition receiving a new triple,
    # losing a row (endpoint remapped away), or gaining a row (endpoint
    # remapped in) is rebuilt from the CUMULATIVE triples so the lead()
    # window sees its complete row set.
    mns = F.broadcast(map_new.select(F.col("uuid").alias("k"), "canonical_uuid"))

    def with_canon(t: DataFrame) -> DataFrame:
        return (
            t.join(mns.withColumnRenamed("k", "source_entity_uuid").withColumnRenamed("canonical_uuid", "_cs"), "source_entity_uuid", "left")
            .join(mns.withColumnRenamed("k", "target_entity_uuid").withColumnRenamed("canonical_uuid", "_ct"), "target_entity_uuid", "left")
            .withColumn("_cs", F.coalesce("_cs", "source_entity_uuid"))
            .withColumn("_ct", F.coalesce("_ct", "target_entity_uuid"))
        )

    def _edges_job():
        triples_cum = _read(spark, state_dir, "triples_raw")
        tc = with_canon(triples_cum)
        aff = F.broadcast(affected_canon)
        part_moved = tc.join(
            aff, (tc["_cs"] == aff["canon"]) | (tc["_ct"] == aff["canon"]), "left_semi"
        ).select("group_id", F.col("_cs").alias("src"), "name")
        edges_old = _read(spark, state_dir, "edges")
        part_old = edges_old.join(
            aff,
            (edges_old["source_node_uuid"] == aff["canon"]) | (edges_old["target_node_uuid"] == aff["canon"]),
            "left_semi",
        ).select("group_id", F.col("source_node_uuid").alias("src"), "name")
        parts = part_moved.unionByName(part_old)
        if triples_extra is not None:
            parts = parts.unionByName(
                with_canon(triples_extra).select("group_id", F.col("_cs").alias("src"), "name")
            )
        # fresh attribute ids: parts' first union branch derives from tc, so
        # the joins below would otherwise be ambiguous self-joins
        parts = parts.distinct().localCheckpoint().toDF("p_group_id", "p_src", "p_name")

        rebuild_triples = tc.join(
            F.broadcast(parts),
            (tc["group_id"] == parts["p_group_id"]) & (tc["_cs"] == parts["p_src"]) & (tc["name"] == parts["p_name"]),
            "left_semi",
        ).drop("_cs", "_ct")
        edges_updated = invalidate_contradictions(
            merge_edges(resolve_edge_pointers(rebuild_triples, map_new)), config
        )
        if registry is not None:
            from graphiti_spark.operators.typed_schemas import apply_edge_types

            edges_updated = apply_edge_types(edges_updated, registry)
        edges_updated = edges_updated.localCheckpoint()
        del_edges = (
            edges_old.join(
                F.broadcast(parts),
                (edges_old["group_id"] == parts["p_group_id"])
                & (edges_old["source_node_uuid"] == parts["p_src"])
                & (edges_old["name"] == parts["p_name"]),
                "left_semi",
            )
            .select("uuid")
            .join(edges_updated.select("uuid"), "uuid", "left_anti")
        )
        upsert_table(
            spark, edges_updated, _p(state_dir, "edges"), partition_by=["group_id"], delete_keys=del_edges
        )
        return edges_updated, parts

    # ---- mentions: rebuild rows of affected clusters + the new batch ------
    def _mentions_job():
        raw_c = mentions_cum.join(
            F.broadcast(map_new.select(F.col("uuid").alias("entity_uuid"), "canonical_uuid")),
            "entity_uuid",
            "left",
        ).withColumn("canon", F.coalesce("canonical_uuid", "entity_uuid"))
        raw_affected = raw_c.join(F.broadcast(affected_canon), "canon", "left_semi").drop(
            "canonical_uuid", "canon"
        )
        mentions_updated = remap_mentions(raw_affected, map_new).localCheckpoint()
        mentions_old_tbl = _read(spark, state_dir, "mentions")
        old_canon_all = (
            ch.select(F.col("c_old").alias("entity_uuid"))
            .unionByName(affected_canon.withColumnRenamed("canon", "entity_uuid"))
            .distinct()
        )
        del_mentions = (
            mentions_old_tbl.join(F.broadcast(old_canon_all), "entity_uuid", "left_semi")
            .select("uuid")
            .join(mentions_updated.select("uuid"), "uuid", "left_anti")
        )
        upsert_table(
            spark,
            mentions_updated,
            _p(state_dir, "mentions"),
            partition_by=["group_id"],
            delete_keys=del_mentions,
        )
        return mentions_updated

    from concurrent.futures import ThreadPoolExecutor

    # Pin the PRE-delta canonical set before the upsert jobs rewrite the
    # nodes table (localCheckpoint materializes the read now) — used below
    # for the affected_existing_clusters stat.
    nodes_before = (
        _read(spark, state_dir, "nodes")
        .select(F.col("uuid").alias("canon"))
        .localCheckpoint()
    )

    with ThreadPoolExecutor(max_workers=3) as pool:
        f_nodes = pool.submit(_nodes_job)
        f_edges = pool.submit(_edges_job)
        f_mentions = pool.submit(_mentions_job)
        nodes_updated = f_nodes.result()
        edges_updated, parts = f_edges.result()
        f_mentions.result()
    mark("rebuild_upserts")

    # affected_clusters counts NEW singleton clusters too (every touched
    # entity's canonical); the cost-model number a deployment watches is
    # how many PRE-EXISTING clusters the delta disturbed — the realistic-
    # delta bench leg (disjoint tail vocab) collapses this one while the
    # adversarial shared-vocab leg does not.
    return {
        "changed_entities": changed_uuids.count(),
        "affected_clusters": affected_canon.count(),
        "affected_existing_clusters": affected_canon.join(
            nodes_before, "canon", "left_semi"
        ).count(),
        "rebuilt_edge_partitions": parts.count(),
        "nodes_upserted": nodes_updated.count(),
        "edges_upserted": edges_updated.count(),
    }


def compact_state(spark: SparkSession, state_dir: str) -> dict:
    """Compact the append-only state tables into one batch dir per table.

    The Spark-parquet restatement of Iceberg's ``rewrite_data_files`` +
    equality-delete compaction: per-increment batch dirs accumulate
    forever (every increment appends one dir to mentions_raw, triples_raw,
    duplicate_pairs and postings), and the postings table additionally
    carries stale rows for renamed entities that every read filters out
    (operators/postings.py read-time invalidation). Compaction rewrites
    each table to a single ``batch_compact_<n>`` dir holding exactly the
    rows the read path would yield:

      - mentions_raw / triples_raw: the union of committed batch dirs
        (rows are disjoint across batches — appended only for new
        episodes; a replayed batch overwrites its own dir),
      - duplicate_pairs: deduped on (group_id, uuid_a, uuid_b) — the same
        dropDuplicates every consumer applies,
      - postings: rows validated against the CURRENT entity catalog on
        (entity_uuid, name_sig) — stale postings of renamed entities are
        physically dropped — then deduped on the read path's key
        (group_id, kind, key, pos, entity_uuid).

    Crash-consistent: each table is rewritten via the staged-dir + two-
    rename swap (same protocol as upsert_table), with the same recovery
    preamble — a stranded ``._old_inc`` with no live table is restored, a
    stranded ``._staged_inc`` is swept. The marker is rewritten only after
    every table swapped; a crash mid-loop leaves already-swapped tables
    holding a ``batch_compact_<n>`` dir the old marker calls pending —
    the retry recomputes the SAME cid (marker unchanged), re-folds the
    not-yet-swapped tables, preserves the swapped ones' compact dir
    verbatim via the pending path, and commits the marker once. Batch
    dirs whose id is NOT in the state marker (a crashed, not-yet-
    committed increment) are preserved byte-for-byte by hard-linking them
    into the staged dir, so the crashed batch's replay stays idempotent
    (it overwrites its own dir; its rows were never folded).

    Semantics contract: read_graph and the next increment produce
    IDENTICAL results before and after compaction (tests/test_incremental
    .py::test_compaction_*). Run it when the state is quiescent — it is
    the background `dedup every N episodes` maintenance slot the
    reference's worker schedules (worker.py:232-233,397-401).
    """
    entities_cur = _read(spark, state_dir, "entities")
    from graphiti_spark.operators.postings import name_sig_col

    cat_sigs = entities_cur.select(
        "entity_uuid", name_sig_col(F.col("name_norm")).alias("name_sig")
    )

    def transform(name: str, df: DataFrame) -> DataFrame:
        if name == "duplicate_pairs":
            return df.dropDuplicates(["group_id", "uuid_a", "uuid_b"])
        if name == "postings":
            df = df.join(cat_sigs, ["entity_uuid", "name_sig"], "left_semi")
            return df.dropDuplicates(["group_id", "kind", "key", "pos", "entity_uuid"])
        return df

    return _rewrite_append_tables(spark, state_dir, "compactions", "compact", transform)


def _rewrite_append_tables(
    spark: SparkSession,
    state_dir: str,
    counter_key: str,
    cid_prefix: str,
    transform,
) -> dict:
    """Fold every committed batch dir of each append table into ONE
    ``batch_<cid_prefix>_<n>`` dir holding transform(name, union-of-dirs),
    with the crash protocol documented on compact_state. Shared by
    compact_state (dedupe/stale-reclaim transforms) and remove_episodes
    (removal filters composed with the same transforms)."""
    with open(_p(state_dir, _STATE_MARKER)) as f:
        marker = json.load(f)
    committed = set(marker["batches"])
    seq_n = marker.get(counter_key, 0) + 1
    cid = f"{cid_prefix}_{seq_n:06d}"
    stats: dict[str, dict] = {}
    for name in _APPEND_TABLES:
        table = _p(state_dir, name)
        tmp, old = f"{table}._staged_inc", f"{table}._old_inc"
        # recovery preamble (upsert_table pattern): restore a committed
        # table stranded under ._old_inc by a crash in the rename gap;
        # sweep a half-written staging dir.
        if not os.path.isdir(table) and os.path.isdir(old):
            os.rename(old, table)
        shutil.rmtree(tmp, ignore_errors=True)
        if not os.path.isdir(table):
            continue
        batch_dirs = sorted(d for d in os.listdir(table) if d.startswith("batch_"))
        pending = [d for d in batch_dirs if d[len("batch_"):] not in committed]
        fold = [d for d in batch_dirs if d[len("batch_"):] in committed]
        # Fold whenever ANY committed dir exists (even one): the marker is
        # rewritten to [cid] for ALL tables at once, so a skipped table's
        # old batch ids would fall out of the committed set and its dirs
        # would be stranded as forever-pending. A crash-retry hits the
        # fold-empty skip below: the already-swapped table's compact dir is
        # pending under the OLD marker and committed by the same cid.
        if not fold:
            stats[name] = {"folded": 0, "kept_pending": len(pending)}
            continue
        df = spark.read.option("recursiveFileLookup", "true").parquet(
            *[os.path.join(table, d) for d in fold]
        )
        rows_in = df.count()
        df = transform(name, df)
        os.makedirs(tmp)
        compact_dir = os.path.join(tmp, f"batch_{cid}")
        df.write.mode("overwrite").parquet(compact_dir)
        rows_out = spark.read.parquet(compact_dir).count()
        for d in pending:  # uncommitted (crashed) batches survive verbatim
            shutil.copytree(
                os.path.join(table, d), os.path.join(tmp, d), copy_function=os.link
            )
        os.rename(table, old)
        os.rename(tmp, table)
        shutil.rmtree(old, ignore_errors=True)
        stats[name] = {
            "folded": len(fold),
            "kept_pending": len(pending),
            "rows_in": rows_in,
            "rows_out": rows_out,
        }
    marker["batches"] = [cid]
    marker[counter_key] = seq_n
    with open(_p(state_dir, _STATE_MARKER), "w") as f:
        json.dump(marker, f)
    return stats


def remove_episodes(
    spark: SparkSession,
    state_dir: str,
    episode_uuids: list[str],
    config: PipelineConfig = DEFAULT_CONFIG,
    registry=None,
) -> dict:
    """Delete episodes and everything only they support — the batch-exact
    restatement of the reference's ``remove_episode``
    (graphiti.py:1087-1120: delete the episode, edges it created, and nodes
    mentioned nowhere else). The reference approximates this with driver-
    side heuristics (episodes[0] == uuid, mention count == 1); here the
    affected neighborhood is RECOMPUTED from the surviving raw state, so
    the contract is exact:

        ingest(A); ingest(B); remove_episodes(B.uuids)  ==  ingest(A)

    table-for-table (tests/test_incremental.py::test_remove_episodes_*) —
    including un-merging an entity cluster whose duplicate evidence came
    only from the removed episodes (duplicate pairs with a dead endpoint
    are dropped, connected components re-runs over the survivors).

    Mechanics: filter the removed episodes' rows out of mentions_raw /
    triples_raw (staged-swap rewrite, same crash protocol as
    compact_state), delete entities left with zero mentions (and their
    pairs/postings), re-run CC over the surviving pair list, then rebuild
    exactly the affected canonical clusters and invalidation partitions
    through the shared _rebuild_affected core. Cost ∝ removed episodes +
    affected neighborhood + one pass over the raw state (the equality-
    delete rewrite — an Iceberg DELETE in the catalog deployment). Run on
    quiescent state (like compact_state): a concurrent in-flight batch
    containing a removed episode would re-add it on replay.
    """
    eps_tbl = _read(spark, state_dir, "episodes")
    rm = spark.createDataFrame([(u,) for u in episode_uuids], "uuid string")
    present = eps_tbl.join(F.broadcast(rm), "uuid", "left_semi").select("uuid").localCheckpoint()
    n_rm = present.count()
    if n_rm == 0:
        return {"removed_episodes": 0, "skipped": True}
    rm_ep = F.broadcast(present.withColumnRenamed("uuid", "episode_uuid"))

    mentions_all = _read(spark, state_dir, "mentions_raw")
    touched = (
        mentions_all.join(rm_ep, "episode_uuid", "left_semi")
        .select("group_id", "entity_uuid")
        .distinct()
        .localCheckpoint()
    )
    removed_triples = (
        _read(spark, state_dir, "triples_raw")
        .join(rm_ep, "episode_uuid", "left_semi")
        .localCheckpoint()
    )
    # dead = touched entities with NO surviving mention anywhere
    alive_touched = (
        mentions_all.join(rm_ep, "episode_uuid", "left_anti")
        .join(F.broadcast(touched), ["group_id", "entity_uuid"], "left_semi")
        .select("entity_uuid")
        .distinct()
    )
    dead = (
        touched.select("entity_uuid")
        .join(alive_touched, "entity_uuid", "left_anti")
        .localCheckpoint()
    )
    dead_b = F.broadcast(dead)

    def transform(name: str, df: DataFrame) -> DataFrame:
        if name in ("mentions_raw", "triples_raw"):
            return df.join(rm_ep, "episode_uuid", "left_anti")
        if name == "duplicate_pairs":
            df = df.join(dead_b.withColumnRenamed("entity_uuid", "uuid_a"), "uuid_a", "left_anti")
            df = df.join(dead_b.withColumnRenamed("entity_uuid", "uuid_b"), "uuid_b", "left_anti")
            return df.dropDuplicates(["group_id", "uuid_a", "uuid_b"])
        if name == "postings":
            return df.join(dead_b, "entity_uuid", "left_anti")
        return df

    raw_stats = _rewrite_append_tables(spark, state_dir, "removals", "rm", transform)

    mentions_cum = _read(spark, state_dir, "mentions_raw")
    entities_touched = entity_catalog(
        mentions_cum.join(F.broadcast(touched), ["group_id", "entity_uuid"], "left_semi")
    ).localCheckpoint()
    upsert_table(
        spark, entities_touched, _p(state_dir, "entities"), key="entity_uuid", delete_keys=dead
    )

    pairs_cum = (
        _read(spark, state_dir, "duplicate_pairs")
        .dropDuplicates(["group_id", "uuid_a", "uuid_b"])
        .localCheckpoint()
    )
    map_old = _read(spark, state_dir, "uuid_map")
    map_new = connected_components(pairs_cum, config).localCheckpoint()

    stats = _rebuild_affected(
        spark,
        state_dir,
        map_old=map_old,
        map_new=map_new,
        touched_ids=touched,
        triples_extra=removed_triples,
        mentions_cum=mentions_cum,
        registry=registry,
        config=config,
    )

    empty_eps = spark.createDataFrame([], eps_tbl.schema)
    upsert_table(
        spark, empty_eps, _p(state_dir, "episodes"), partition_by=["group_id"], delete_keys=present
    )
    _atomic_overwrite(map_new, _p(state_dir, "uuid_map"))
    return {
        "removed_episodes": n_rm,
        "dead_entities": dead.count(),
        "raw_rewrite": raw_stats,
        **stats,
    }


def read_graph(spark: SparkSession, state_dir: str) -> dict[str, DataFrame]:
    """The current graph tables (episodes backfilled like run_pipeline)."""
    from graphiti_spark.operators.episodes import backfill_entity_edges

    episodes = _read(spark, state_dir, "episodes")
    edges = _read(spark, state_dir, "edges")
    return {
        "episodes": backfill_entity_edges(episodes, edges),
        "nodes": _read(spark, state_dir, "nodes"),
        "edges": edges,
        "mentions": _read(spark, state_dir, "mentions"),
        "uuid_map": _read(spark, state_dir, "uuid_map"),
    }
