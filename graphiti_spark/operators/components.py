"""S6 — canonicalization: large-star/small-star connected components.

The distributed replacement for the reference's in-memory union-find
(``UnionFind`` + ``compress_uuid_map``,
/root/reference/graphiti_core/utils/bulk_utils.py:449-486). Parity rule: the
canonical representative of a component is the **lexicographically smallest
uuid** (bulk_utils.py:464-468) — exactly what min-label propagation converges
to, since uuids are strings and Spark's min() on strings is lexicographic.

Algorithm (Kiveris et al., "Connected Components in MapReduce and Beyond"):
alternate Large-Star and Small-Star rounds until the edge set reaches a
fixpoint; the result is a star forest (child -> root) = the uuid_map.

Scale design:
 - converges in O(log² n) rounds; each round is one groupBy shuffle,
 - per-round ``localCheckpoint`` truncates lineage (iterative plans otherwise
   blow up the optimizer),
 - high-degree roots are exactly what the algorithm produces — the star
   center accumulates the component, which is fine because the final map is
   only ever used as the build side of remap joins,
 - convergence test = count + order-insensitive checksum, computed in the
   same action that materializes the checkpoint (no extra pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphiti_spark.config import DEFAULT_CONFIG, PipelineConfig
from graphiti_spark.functions.hashing import md5_long_col


def _canonical_edges(pairs: DataFrame) -> DataFrame:
    """(u, v) with u != v, deduped, both columns string uuids."""
    return (
        pairs.select(F.col("uuid_a").alias("u"), F.col("uuid_b").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: m = min(N(u) ∪ {u}); emit (v, m) for v in N(u), v > u."""
    bidir = edges.unionByName(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    grouped = bidir.groupBy("u").agg(
        F.collect_set("v").alias("nbrs"), F.least(F.min("v"), F.first("u")).alias("m")
    )
    out = grouped.select(
        F.explode("nbrs").alias("v"), F.col("m"), F.col("u")
    ).filter(F.col("v") > F.col("u"))
    return out.select(F.col("v").alias("u"), F.col("m").alias("v")).filter(
        F.col("u") != F.col("v")
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient to (bigger -> smaller); for each u: m = min(N(u)); emit
    (v, m) for v in N(u) ∪ {u}."""
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    grouped = oriented.groupBy("u").agg(
        F.collect_set("v").alias("nbrs"), F.min("v").alias("m")
    )
    out = grouped.select(
        F.explode(F.array_union("nbrs", F.array("u"))).alias("node"), F.col("m")
    )
    return (
        out.select(F.col("node").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
    )


def _checksum(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(md5_long_col(F.concat_ws("|", "u", "v"))), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def _driver_union_find(rows) -> list[tuple[str, str]]:
    """In-memory union-find with the reference's tie-break: canonical =
    lexicographically smallest uuid in the component (bulk_utils.py:449-486).
    Takes any iterable of (u, v)-indexable rows; returns non-identity
    (uuid, canonical) rows."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        ra, rb = find(r[0]), find(r[1])
        if ra != rb:
            # union toward the smaller root — keeps roots = component minimum
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return [(x, find(x)) for x in list(parent) if find(x) != x]


def connected_components(
    pairs: DataFrame, config: PipelineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """duplicate pairs (uuid_a, uuid_b) -> uuid_map (uuid, canonical_uuid).

    Only non-identity rows are returned (nodes absent from the map are their
    own canonical — remaps use coalesce), keeping the map small enough to
    broadcast in the S7 joins.

    Hybrid execution: below ``cc_driver_threshold`` edges the pair list is
    collected and solved with the reference's own union-find (identical
    min-uuid semantics, zero iteration overhead); above it, the
    large-star/small-star loop runs distributed. Duplicate pairs are a small
    fraction of entities, but at 10^12 documents they still exceed any
    driver's memory — the threshold keeps the driver path an optimization,
    never a requirement. Both paths are parity-tested against each other.
    """
    edges = _canonical_edges(pairs).localCheckpoint(eager=True)
    n_edges = edges.count()
    if n_edges <= config.cc_driver_threshold:
        # Arrow both ways: toPandas() avoids materializing O(edges) Row
        # objects and createDataFrame(pandas) avoids per-row pickling —
        # at the threshold (10^6 edges) the Row-object path cost tens of
        # driver-serial seconds, a direct bite out of the Amdahl floor
        # the scaling campaign measures.
        import pandas as pd

        pdf = edges.select("u", "v").toPandas()
        mapping = _driver_union_find(zip(pdf["u"].tolist(), pdf["v"].tolist()))
        spark = pairs.sparkSession
        if not mapping:
            return spark.createDataFrame([], "uuid string, canonical_uuid string")
        out = pd.DataFrame(mapping, columns=["uuid", "canonical_uuid"])
        return spark.createDataFrame(out)
    prev = (n_edges, _checksum(edges)[1])
    for _ in range(config.cc_max_iterations):
        # lazy checkpoint: the checksum action below materializes it, so each
        # round costs ONE job instead of checkpoint-then-checksum two.
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=False)
        cur = _checksum(edges)
        if cur == prev:
            break
        prev = cur
    # Fixpoint is a star forest: every edge is (child, root).
    uuid_map = edges.select(F.col("u").alias("uuid"), F.col("v").alias("canonical_uuid"))
    return uuid_map.filter(F.col("uuid") != F.col("canonical_uuid")).dropDuplicates(["uuid"])


def compress_uuid_map(pairs: DataFrame, config: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Alias matching the reference's name (bulk_utils.py:478-486)."""
    return connected_components(pairs, config)
