"""The S1-S9 batch DAG: pages -> (episodes, nodes, edges, mentions, audit).

Spark restatement of ``Graphiti.add_episode_bulk``
(/root/reference/graphiti.py:567-896): one declarative lineage of DataFrame
transformations instead of asyncio fan-out; Iceberg-style snapshot commits
instead of a work queue.

Checkpoint/resume (north rule; reference analog: episodes saved first as the
resumability anchor, graphiti.py:664-672, and AtomicCentralityStorage
checkpoints, atomic_centrality_storage.py:349-354):
 - each stage writes a parquet table + a manifest {stage, config_hash,
   input_fingerprint, row_count} under <output_dir>/<stage>/,
 - a stage whose manifest matches the current config is SKIPPED on resume
   and its table is read back,
 - per-partition lineage rows (stage, partition_id, row_count) accompany
   every commit.
The writer is parquet in this sandbox; on a cluster with an Iceberg catalog
the same layout maps to `MERGE INTO`/snapshots (sinks/tables.py).
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import asdict
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphiti_spark.config import DEFAULT_CONFIG, PipelineConfig
from graphiti_spark.operators.components import connected_components
from graphiti_spark.session import plan_width
from graphiti_spark.operators.edge_merge import (
    build_duplicate_of_edges,
    canonical_nodes,
    merge_edges,
    remap_mentions,
    resolve_edge_pointers,
)
from graphiti_spark.operators.episodes import episodes_stage
from graphiti_spark.operators.extract_text import extract_text_stage
from graphiti_spark.operators.ner import mentions_stage
from graphiti_spark.operators.temporal import invalidate_contradictions
from graphiti_spark.operators.triples import triples_stage


def _config_hash(config: PipelineConfig) -> str:
    payload = json.dumps(asdict(config), sort_keys=True, default=str)
    return hashlib.md5(payload.encode()).hexdigest()[:16]


class StageLedger:
    """Parquet-staged commit/resume. None output_dir => fully in-memory."""

    def __init__(
        self,
        spark: SparkSession,
        output_dir: str | None,
        config: PipelineConfig,
        extra_hash: str = "",
    ):
        self.spark = spark
        self.output_dir = output_dir
        # extra_hash folds non-config run inputs (e.g. the type registry)
        # into the resume key so a changed registry invalidates committed
        # stages instead of resuming stale tables.
        self.cfg_hash = _config_hash(config) + (
            hashlib.md5(extra_hash.encode()).hexdigest()[:8] if extra_hash else ""
        )
        self.stages_run: list[str] = []
        self.stages_resumed: list[str] = []
        self.timings: dict[str, float] = {}

    def _paths(self, stage: str) -> tuple[str, str]:
        base = os.path.join(self.output_dir, stage)
        return base, os.path.join(base, "_manifest.json")

    def materialize(
        self,
        stage: str,
        build: Callable[[], DataFrame],
        partition_by: list[str] | None = None,
        salt_on: str | None = None,
        salt_buckets: int = 16,
        lazy_ok: bool = False,
    ) -> DataFrame:
        """``lazy_ok``: the stage has exactly ONE downstream consumer, so in
        in-memory mode its compute can fold into that consumer's job instead
        of paying a localCheckpoint barrier (each barrier is serial wall
        time under Amdahl — the scaling gate's enemy). Parquet mode still
        commits it (resume granularity unchanged)."""
        """``salt_on``: repartition the write on (column, salt) so a
        high-degree key (a hot entity mentioned on millions of pages) spreads
        over `salt_buckets` shuffle partitions instead of one straggler task
        — the north rule's salted materialization. File layout/partition_by
        are unchanged; only task balance shifts."""
        if self.output_dir is None:
            # In-memory mode: localCheckpoint each stage. Two effects, both
            # load-bearing: (1) multi-consumer stages (mentions feed S5/S7/S9)
            # compute once, like the parquet commit below; (2) the logical
            # plan TRUNCATES to a LogicalRDD — without that, every downstream
            # action re-analyzes the full upstream tree and driver-side
            # planning becomes the serial bottleneck (measured ~60% of wall
            # at SF=0.1; Amdahl kills multi-core scaling).
            import time as _time

            t0 = _time.time()
            df = build() if lazy_ok else build().localCheckpoint(eager=True)
            self.timings[stage] = _time.time() - t0
            self.stages_run.append(stage)
            return df
        base, manifest_path = self._paths(stage)
        if os.path.exists(manifest_path):
            with open(manifest_path) as f:
                manifest = json.load(f)
            if manifest.get("config_hash") == self.cfg_hash:
                self.stages_resumed.append(stage)
                reader = self.spark.read
                # Manifest-pinned schema: an EMPTY committed stage leaves no
                # part files, and schema inference on such a directory throws
                # UNABLE_TO_INFER_SCHEMA. The pin also freezes column order /
                # types across resume. Older manifests without the key fall
                # back to inference.
                if manifest.get("schema"):
                    from pyspark.sql.types import StructType

                    reader = reader.schema(
                        StructType.fromJson(json.loads(manifest["schema"]))
                    )
                return reader.parquet(os.path.join(base, "data"))
        import time as _time

        _t0 = _time.time()
        df = build()
        if salt_on is not None:
            df = df.repartition(
                F.concat(
                    F.col(salt_on),
                    F.lit("#"),
                    F.pmod(F.crc32(F.coalesce(F.col("uuid"), F.lit(""))), F.lit(salt_buckets)),
                )
            )
        data_path = os.path.join(base, "data")
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(data_path)
        # Read back with the writer's schema pinned — a 0-row stage writes
        # no part files and inference would throw (empty-input pipelines
        # must still commit + resume cleanly).
        out = self.spark.read.schema(df.schema).parquet(data_path)
        # Per-partition lineage (north rule): rows per scan partition.
        lineage = (
            out.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count(F.lit(1)).alias("row_count"))
            .withColumn("stage", F.lit(stage))
            .withColumn("config_hash", F.lit(self.cfg_hash))
        )
        lineage.write.mode("overwrite").parquet(os.path.join(base, "lineage"))
        n = out.count()
        self.timings[stage] = _time.time() - _t0
        # Manifest = commit record + metrics (north rule: per-partition
        # lineage + metrics per committed stage).
        with open(manifest_path, "w") as f:
            json.dump(
                {
                    "stage": stage,
                    "config_hash": self.cfg_hash,
                    "row_count": n,
                    "wall_sec": round(self.timings[stage], 3),
                    "schema": df.schema.json(),
                },
                f,
            )
        self.stages_run.append(stage)
        return out


def _materialize_parallel(ledger: StageLedger, *specs) -> list[DataFrame]:
    """Materialize independent stages concurrently. Each spec is
    (stage, build, kwargs). Concurrent actions on one SparkSession are
    supported (jobs from different threads share the scheduler); exceptions
    propagate. Falls back to sequential for a single spec."""
    if len(specs) == 1:
        stage, build, kw = specs[0]
        return [ledger.materialize(stage, build, **kw)]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(specs)) as pool:
        futs = [pool.submit(ledger.materialize, stage, build, **kw) for stage, build, kw in specs]
        return [f.result() for f in futs]


def ensure_scan_width(spark: SparkSession, pages: DataFrame, key: str = "url") -> DataFrame:
    """Input width guard: a small corpus can arrive as ONE parquet split
    (sf0.1 documents.parquet is a single 594 KB file — far below
    files.maxPartitionBytes), which would run the S1-S3 Arrow-UDF chain on
    one core at ANY parallelism level. Hash-repartition on ``key``
    (deterministic row placement) to plan_width. At warehouse scale
    the scan already has >> cores splits and this is a no-op."""
    par = spark.sparkContext.defaultParallelism
    if pages.rdd.getNumPartitions() < par:
        return pages.repartition(plan_width(spark), key)
    return pages


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    config: PipelineConfig = DEFAULT_CONFIG,
    output_dir: str | None = None,
    registry=None,
    embed_fn=None,
    embed_tag: str = "",
) -> dict[str, DataFrame]:
    """Execute the full DAG; returns the output tables as DataFrames.

    With ``output_dir`` set, every stage is committed and the run is
    resumable: re-invoking with the same config skips committed stages.

    ``registry``: optional ``typed_schemas.TypeRegistry`` — caller-supplied
    entity/edge type schemas applied to the final node/edge tables
    (labels + typed attributes + fact_type; the reference's Pydantic
    entity_types/edge_types hooks, node_operations.py:680-688,
    edge_operations.py:522-540).

    ``embed_fn``: optional real-model embedding for the ER cosine gate
    (see operators/er.make_score_pair_udf — batch ``list[str] -> (n, d)``
    L2-normalized ndarray; examples/real_models.py wires a
    sentence-transformer). When injecting one on a resumable run, set
    ``embed_tag`` to a model identifier — it folds into the resume key so
    stages committed under a different embedding are recomputed, not
    silently reused.
    """
    ledger = StageLedger(
        spark,
        output_dir,
        config,
        extra_hash=(repr(registry) if registry is not None else "")
        + (f"|embed:{embed_tag}" if embed_tag else ""),
    )

    pages = ensure_scan_width(spark, pages)

    # s1 has exactly one consumer (s2): in-memory mode folds it into the s2
    # job instead of paying a barrier.
    with_text = ledger.materialize("s1_text", lambda: extract_text_stage(pages), lazy_ok=True)
    episodes = ledger.materialize(
        "s2_episodes", lambda: episodes_stage(with_text, config), partition_by=["group_id"]
    )
    from graphiti_spark.operators.er import (
        candidate_pairs,
        entity_catalog,
        score_and_filter_pairs,
    )

    # S4 (triples) is consumed only by S7, while the ER chain
    # (S3 mentions -> S5 entities -> S5 pairs -> S6 components) is a strict
    # sequence — so run S4 on a side thread and OVERLAP it with the entire
    # ER chain instead of barriering after s3||s4. Both job groups share the
    # scheduler; the long triple-extraction UDF scan hides under ER's
    # planning gaps, UDF scoring, and CC iterations (serial-time cut for the
    # scaling gate).
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=1) as _pool:
        _triples_fut = _pool.submit(
            ledger.materialize, "s4_triples", lambda: triples_stage(episodes)
        )
        mentions_raw = ledger.materialize("s3_mentions", lambda: mentions_stage(episodes))
        # Entity catalog is its own committed stage: it feeds BOTH the S5
        # candidate join and the S7 canonical-node fold — one embedding-UDF
        # pass, not two.
        entities = ledger.materialize("s5_entities", lambda: entity_catalog(mentions_raw))
        # ER's internal persist() handles (token/band blocks, scored pairs)
        # are released as soon as s5 commits: left cached they inflate the
        # JVM live set for the rest of the run and every GC re-copies them.
        er_caches: list = []
        dup_pairs = ledger.materialize(
            "s5_duplicate_pairs",
            lambda: score_and_filter_pairs(
                entities, candidate_pairs(entities, config, caches=er_caches), config,
                caches=er_caches, embed_fn=embed_fn,
            ),
        )
        for _c in er_caches:
            _c.unpersist(blocking=False)
        uuid_map = ledger.materialize(
            "s6_uuid_map", lambda: connected_components(dup_pairs, config)
        )
        triples_raw = _triples_fut.result()
    def _build_nodes():
        n = canonical_nodes(entities, uuid_map, config.created_at_iso)
        if registry is not None:
            from graphiti_spark.operators.typed_schemas import apply_entity_types

            n = apply_entity_types(n, registry)
        return n

    # s7_edges has exactly one consumer (s8): lazy in-memory, committed on disk.
    edges_merged = ledger.materialize(
        "s7_edges",
        lambda: merge_edges(resolve_edge_pointers(triples_raw, uuid_map)),
        partition_by=["group_id"],
        lazy_ok=True,
    )

    def _build_edges_final():
        e = invalidate_contradictions(edges_merged, config)
        if registry is not None:
            from graphiti_spark.operators.typed_schemas import apply_edge_types

            e = apply_edge_types(e, registry)
        return e

    # After uuid_map, the four output stages fan out from (entities,
    # triples_raw, mentions_raw, uuid_map) with no cross-dependencies —
    # materialize them CONCURRENTLY (overlaps planning gaps + task tails).
    # Salting note (s9_mentions): canonicalization concentrates a hot
    # entity's mention rows on one key (the "google" problem at corpus
    # scale); salting spreads the write across salt_buckets tasks.
    nodes, edges, mentions, audit = _materialize_parallel(
        ledger,
        ("s7_nodes", _build_nodes, {"partition_by": ["group_id"]}),
        ("s8_edges_final", _build_edges_final, {"partition_by": ["group_id"]}),
        (
            "s9_mentions_final",
            lambda: remap_mentions(mentions_raw, uuid_map),
            {"salt_on": "entity_uuid", "salt_buckets": config.salt_buckets},
        ),
        ("s9_audit_edges", lambda: build_duplicate_of_edges(uuid_map, config.created_at_iso), {}),
    )

    # episode.entity_edges backfill (graphiti.py:524-528): lazy view over the
    # committed episodes anchor + final edge provenance.
    from graphiti_spark.operators.episodes import backfill_entity_edges

    return {
        "episodes": backfill_entity_edges(episodes, edges),
        "episodes_raw": episodes,
        "mentions_raw": mentions_raw,
        "triples_raw": triples_raw,
        "duplicate_pairs": dup_pairs,
        "uuid_map": uuid_map,
        "nodes": nodes,
        "edges": edges,
        "mentions": mentions,
        "audit_edges": audit,
        "_ledger": ledger,  # type: ignore[dict-item]
    }
