"""Table sinks: snapshot-committed parquet now, Iceberg MERGE INTO on a
cluster with a catalog.

The reference persists through Cypher ``MERGE (n {uuid}) SET n = props``
upserts (/root/reference/graphiti_core/models/nodes/node_db_queries.py:17-51,
models/edges/edge_db_queries.py:17-56). The Spark restatement is a MERGE
INTO keyed on uuid against an Iceberg table; in this sandbox (no Iceberg
runtime jar) the same call lands on overwrite-by-path parquet with the
identical layout, so the pipeline code is sink-agnostic.

Upsert merge policy mirrors add_nodes_and_edges_bulk's in-batch dedup
(bulk_utils.py:181-213): rows are uuid-deduped with episodes unioned,
earliest created_at, latest non-null fact before the write.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is configured on this session."""
    try:
        for key in ("spark.sql.catalog.spark_catalog", "spark.sql.catalog.local"):
            impl = spark.conf.get(key, None)
            if impl and "iceberg" in impl.lower():
                return True
    except Exception:  # pragma: no cover - conf access quirks
        pass
    return False


def dedupe_for_upsert(df: DataFrame, key: str = "uuid") -> DataFrame:
    """In-batch uuid dedup before the write (bulk_utils.py:181-213):
    episodes = distinct sorted union, created_at = min, first non-null fact."""
    aggs = []
    if "episodes" in df.columns:
        aggs.append(F.array_sort(F.array_distinct(F.flatten(F.collect_list("episodes")))).alias("episodes"))
    if "created_at" in df.columns:
        aggs.append(F.min("created_at").alias("created_at"))
    if "fact" in df.columns:
        aggs.append(F.first("fact", ignorenulls=True).alias("fact"))
    other = [c for c in df.columns if c not in {key, "episodes", "created_at", "fact"}]
    aggs.extend(F.first(c, ignorenulls=True).alias(c) for c in other)
    if not aggs:
        return df.dropDuplicates([key])
    return df.groupBy(key).agg(*aggs)


def merge_into_sql(target: str, source_view: str, columns: list[str], key: str = "uuid") -> str:
    """The Iceberg MERGE INTO statement for an upsert keyed on `key` —
    the Cypher `MERGE ... SET n = props` twin."""
    sets = ", ".join(f"t.{c} = s.{c}" for c in columns if c != key)
    cols = ", ".join(columns)
    vals = ", ".join(f"s.{c}" for c in columns)
    return (
        f"MERGE INTO {target} t USING {source_view} s ON t.{key} = s.{key} "
        f"WHEN MATCHED THEN UPDATE SET {sets} "
        f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})"
    )


def upsert_table(
    spark: SparkSession,
    df: DataFrame,
    target: str,
    key: str = "uuid",
    partition_by: list[str] | None = None,
    delete_keys: DataFrame | None = None,
) -> None:
    """Upsert `df` into `target`.

    ``delete_keys``: optional single-column DataFrame of `key` values to
    REMOVE from the target in the same atomic swap — the `WHEN MATCHED AND
    s._op = 'delete' THEN DELETE` branch of Iceberg MERGE INTO. Needed by
    incremental ingest: a canonical entity that merges into another cluster
    vanishes (its node/edge uuids are superseded by rows under the new
    canonical), so the superseded keys must be deleted, not just updated.

    - Iceberg catalog configured and `target` is a table name: snapshot-
      isolated MERGE INTO (atomic; concurrent-safe — the AtomicCentrality-
      Storage guarantees come from the table format, atomic_centrality_
      storage.py:349-354 analog).
    - otherwise `target` is a path: EXECUTED merge-by-rewrite with the same
      WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT semantics — existing
      rows whose key appears in the source are replaced, all other existing
      rows survive; a column present only in the target is preserved (NULL
      for inserted rows), matching MERGE INTO's update-only-listed-columns
      semantics. The rewrite stages to a sibling temp dir and swaps via
      two renames. A reader never sees a HALF-WRITTEN table, but POSIX dirs
      cannot make the two renames one atom: a concurrent read in the gap
      sees a missing path, and a crash in the gap strands the previous data
      under `._old_` — the next upsert_table call RECOVERS it before
      merging. True snapshot isolation needs the real catalog.
    """
    import shutil
    import uuid as _uuid

    deduped = dedupe_for_upsert(df, key)
    if delete_keys is not None:
        delete_keys = delete_keys.select(F.col(delete_keys.columns[0]).alias(key)).distinct()
    if iceberg_available(spark) and "/" not in target:
        # Per-call unique temp-view names: upsert_table is invoked from a
        # ThreadPoolExecutor (plans/incremental.py _rebuild_affected), and
        # session-scoped views are shared across threads — a fixed name
        # would let concurrent upserts merge each other's source rows.
        vid = _uuid.uuid4().hex
        dk_view, src_view = f"_delete_keys_{vid}", f"_upsert_source_{vid}"
        try:
            if delete_keys is not None:
                delete_keys.createOrReplaceTempView(dk_view)
                spark.sql(
                    f"DELETE FROM {target} WHERE {key} IN (SELECT {key} FROM {dk_view})"
                )
            deduped.createOrReplaceTempView(src_view)
            spark.sql(merge_into_sql(target, src_view, deduped.columns, key))
        finally:
            spark.catalog.dropTempView(src_view)
            if delete_keys is not None:
                spark.catalog.dropTempView(dk_view)
        return
    # Crash recovery: a prior run killed between rename(target, old) and
    # rename(tmp, target) leaves no target but a stranded ._old_ — restore
    # the last committed table so its rows are not silently dropped. A crash
    # DURING the staged write (before any rename) instead strands a
    # ._staged_<hex> dir: the target is still the committed table, so the
    # orphan is garbage — sweep it here so retries don't accumulate dirs.
    parent = os.path.dirname(target) or "."
    base = os.path.basename(target)
    if os.path.isdir(parent):
        if not os.path.isdir(target):
            stranded = sorted(d for d in os.listdir(parent) if d.startswith(base + "._old_"))
            if stranded:
                os.rename(os.path.join(parent, stranded[-1]), target)
        for d in os.listdir(parent):
            if d.startswith(base + "._staged_"):
                shutil.rmtree(os.path.join(parent, d), ignore_errors=True)
    merged = deduped
    untouched_dirs: list[str] = []
    if os.path.isdir(target):
        existing = spark.read.parquet(target)
        # --- partition-pruned rewrite (VERDICT r2 #9) --------------------
        # The naive path rewrites the WHOLE table per upsert — O(table) per
        # incremental batch. With a single partition column, only the
        # partitions that either receive incoming rows or CONTAIN a matched
        # key need recomputation (a matched key whose partition value
        # changed is handled: its old partition is touched via the key
        # probe, its new one via the incoming values). Untouched partition
        # dirs are HARD-LINKED into the staged table — O(#files), no data
        # copy, mtimes/inodes preserved — keeping the atomic two-rename
        # swap. The key probe is a column-pruned (key, partition) scan,
        # far cheaper than a full-width rewrite.
        pc = partition_by[0] if partition_by and len(partition_by) == 1 else None
        if pc and pc in deduped.columns and pc in existing.columns:
            from urllib.parse import unquote

            probe_keys = deduped.select(key)
            if delete_keys is not None:
                probe_keys = probe_keys.unionByName(delete_keys).distinct()
            inc_parts = {r[0] for r in deduped.select(pc).distinct().collect()}
            matched_parts = {
                r[0]
                for r in existing.select(pc, key)
                .join(probe_keys, key, "left_semi")
                .select(pc)
                .distinct()
                .collect()
            }
            touched = inc_parts | matched_parts
            if None not in touched:
                touched_strs = {str(v) for v in touched}
                untouched_dirs = [
                    d
                    for d in os.listdir(target)
                    if d.startswith(pc + "=")
                    and unquote(d[len(pc) + 1 :]) not in touched_strs
                ]
                if untouched_dirs:
                    existing = existing.filter(F.col(pc).isin(list(touched)))
        tgt_only = [c for c in existing.columns if c not in deduped.columns]
        # Schema = UNION of both sides (Iceberg MERGE INTO alignment): a
        # column the source lacks is NOT dropped — existing rows keep it,
        # matched rows inherit their prior value (UPDATE SET touches only
        # source columns), inserted rows get NULL. (With pruning, matched
        # keys live in touched partitions by construction, so the filtered
        # `existing` still carries every prior value the inherit join needs.)
        for c in deduped.columns:
            if c not in existing.columns:
                existing = existing.withColumn(c, F.lit(None).cast(deduped.schema[c].dataType))
        out_cols = existing.columns
        incoming = deduped
        if tgt_only:
            incoming = deduped.join(existing.select(key, *tgt_only), key, "left")
        survivors = existing.join(deduped.select(key), key, "left_anti").select(out_cols)
        if delete_keys is not None:
            survivors = survivors.join(delete_keys, key, "left_anti")
        merged = survivors.unionByName(incoming.select(out_cols))
    tmp = f"{target}._staged_{_uuid.uuid4().hex[:8]}"
    writer = merged.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    for d in untouched_dirs:
        # hard-link the untouched partition's files into the staged table
        shutil.copytree(
            os.path.join(target, d), os.path.join(tmp, d), copy_function=os.link
        )
    old = f"{target}._old_{_uuid.uuid4().hex[:8]}"
    if os.path.isdir(target):
        os.rename(target, old)
    os.rename(tmp, target)
    if os.path.isdir(old):
        shutil.rmtree(old, ignore_errors=True)


def write_salted(
    df: DataFrame,
    path: str,
    hot_key_col: str,
    salt_buckets: int = 16,
    partition_by: list[str] | None = None,
    unique_id_col: str | None = None,
) -> None:
    """Materialize with salted repartitioning on a high-degree key column
    (north rule: defeat skew on hot entities). The salt spreads a hot key's
    rows over `salt_buckets` shuffle partitions; file layout is unchanged.

    The salt MUST be a deterministic function of row content: a salt derived
    from monotonically_increasing_id/rand changes on task retry, which can
    duplicate or drop rows when a shuffle-map task is recomputed (the
    SPARK-23207 round-robin-repartition hazard). Salt on ``unique_id_col``
    when the table has one (matches StageLedger.materialize); otherwise on a
    crc32 of the whole row."""
    if unique_id_col is not None:
        salt = F.pmod(F.crc32(F.col(unique_id_col).cast("string")), F.lit(salt_buckets))
    else:
        salt = F.pmod(
            F.crc32(F.to_json(F.struct(*[F.col(c) for c in df.columns]))),
            F.lit(salt_buckets),
        )
    salted = df.repartition(F.concat(F.col(hot_key_col), F.lit("#"), salt))
    writer = salted.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
