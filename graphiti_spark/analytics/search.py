"""Hybrid search layer as batch DataFrame computations.

Spark restatement of the reference's search stack
(/root/reference/graphiti_core/search/search_utils.py and
graphiti-search-rs/src/search/*): BM25 fulltext (the DB fulltext indices,
search_utils.py:154-205/337-395), embedding-cosine similarity search
(:208-280), breadth-first graph expansion (:283-334), reciprocal-rank fusion
(:930-942), and the rerankers (:945-1054).

Scale design:
 - BM25 is computed from a postings DataFrame: tokenize -> explode ->
   (term, doc) tf. Query terms are filtered BEFORE the df/tf aggregation, so
   the shuffle carries only postings of the queried terms — at 100 TB the
   scan prunes to a ~|q| x N_docs_with_term slice, not the whole corpus.
 - cosine scoring is a JVM-side higher-order-function expression (zip_with +
   aggregate) over the stored embedding column; top-k compiles to
   TakeOrderedAndProject (no global sort materialization).
 - BFS is a driver loop of frontier joins (3 hops max in the reference,
   search_utils.py:299) — each hop one equi-join on the edge table, frontier
   broadcast when small.
 - RRF/rerankers are groupBy aggregations over (method, rank) rows.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphiti_spark.config import DEFAULT_CONFIG, PipelineConfig
from graphiti_spark.functions.embeddings import cosine_col
from graphiti_spark.functions.textstats import tokens_col

# ---------------------------------------------------------------------------
# BM25 fulltext (edge/node/episode_fulltext_search parity)
# ---------------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """BM25 over a document table for a fixed bag of query terms.

    Returns (id_col, score) for documents matching >=1 term, higher = better.
    Twin of the Neo4j/FalkorDB fulltext indices the reference queries
    (search_utils.py:154-205; graph_queries.py:68-95) — scored explicitly
    since Spark has no fulltext index. idf = ln(1 + (N-df+0.5)/(df+0.5))
    (Robertson-Sparck Jones, the Lucene formula).
    """
    terms = [t.lower() for t in query_terms]
    base = docs.select(F.col(id_col).alias("_doc"), tokens_col(text_col).alias("_toks"))
    base = base.withColumn("_dl", F.size("_toks"))
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("_dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(stats["n_docs"]), float(stats["avgdl"] or 1.0)

    # Explode only matching terms: the lateral filter prunes the postings
    # shuffle to query vocabulary before any aggregation.
    posting = (
        base.select("_doc", "_dl", F.explode("_toks").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("_doc", "_dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_by_term = posting.groupBy("term").agg(F.countDistinct("_doc").alias("df"))
    idf = F.log(F.lit(1.0) + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    scored = (
        posting.join(F.broadcast(df_by_term), "term")
        .withColumn(
            "_term_score",
            idf
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("_dl") / F.lit(avgdl))),
        )
        .groupBy("_doc")
        .agg(F.sum("_term_score").alias("score"))
    )
    return scored.select(F.col("_doc").alias(id_col), "score")


def fulltext_search(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query: str,
    limit: int = DEFAULT_CONFIG.default_search_limit,
    group_ids: list[str] | None = None,
    index_path: str | None = None,
) -> DataFrame:
    """ORDER BY bm25 DESC LIMIT k with optional group filter
    (edge/node/episode_fulltext_search shape, search_utils.py:154-205).
    Queries longer than 128 words return empty (search_utils.py:60-82).

    ``index_path``: a postings index written by indices.build_text_index.
    When given (and no group filter narrows the corpus), scoring reads ONLY
    the query terms' bucket partitions instead of scanning the table —
    value-identical scores (same formula, same corpus stats snapshot), a
    partition-pruned scan at 100 TB. The index is a snapshot: rebuild it
    when the table changes. A group_ids filter falls back to the direct
    scan, because BM25 df/N are defined over the FILTERED corpus there."""
    terms = [t for t in query.lower().split() if t]
    if len(terms) > 128:  # MAX_QUERY_LENGTH guard, search_utils.py:60
        return docs.select(F.col(id_col), F.lit(0.0).alias("score")).limit(0)
    filtered = bool(group_ids) and "group_id" in docs.columns
    if filtered:
        docs = docs.filter(F.col("group_id").isin(group_ids))
    if index_path and not filtered:
        from graphiti_spark.analytics.indices import bm25_from_index

        scored = bm25_from_index(docs.sparkSession, index_path, terms, id_col=id_col)
    else:
        scored = bm25_scores(docs, id_col, text_col, terms)
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(limit)


# ---------------------------------------------------------------------------
# Similarity (cosine) search — edge/node_similarity_search parity
# ---------------------------------------------------------------------------


def similarity_search(
    table: DataFrame,
    id_col: str,
    embedding_col: str,
    query_vector: list[float],
    min_score: float = DEFAULT_CONFIG.min_fact_score,
    limit: int = DEFAULT_CONFIG.default_search_limit,
) -> DataFrame:
    """cosine(embedding, query) >= min_score ORDER BY score DESC LIMIT k
    (search_utils.py:208-280). The score is one codegen'd expression; the
    top-k compiles to TakeOrderedAndProject — no Python in the scan."""
    qlit = F.array(*[F.lit(float(x)) for x in query_vector])
    scored = table.withColumn("score", cosine_col(F.col(embedding_col), qlit))
    return (
        scored.filter(F.col("score") >= min_score)
        .select(F.col(id_col), "score")
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(limit)
    )


# ---------------------------------------------------------------------------
# Graph BFS expansion — edge/node_bfs_search parity
# ---------------------------------------------------------------------------


def bfs_nodes(
    edges: DataFrame,
    origin_uuids: list[str],
    max_depth: int = 3,
    src_col: str = "source_node_uuid",
    dst_col: str = "target_node_uuid",
) -> DataFrame:
    """Nodes reachable within max_depth undirected hops of the origin set
    (node_bfs_search, search_utils.py:451-486; `{1,3}` pattern :299).

    Driver loop of frontier joins; the frontier is broadcast (origin
    neighborhoods are small relative to the edge table). Returns
    (uuid, depth) with the minimal hop count.
    """
    spark = edges.sparkSession
    bidir = edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v")).unionByName(
        edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v"))
    )
    visited = spark.createDataFrame(
        [(u, 0) for u in origin_uuids], "uuid string, depth int"
    )
    frontier = visited.select("uuid")
    for depth in range(1, max_depth + 1):
        nxt = (
            bidir.join(F.broadcast(frontier.withColumnRenamed("uuid", "u")), "u")
            .select(F.col("v").alias("uuid"))
            .dropDuplicates(["uuid"])
            .join(visited.select("uuid"), "uuid", "left_anti")
            .withColumn("depth", F.lit(depth))
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("uuid")
    return visited


def bfs_edges(
    edges: DataFrame,
    origin_uuids: list[str],
    max_depth: int = 3,
    src_col: str = "source_node_uuid",
    dst_col: str = "target_node_uuid",
) -> DataFrame:
    """Distinct edges touched by a <=max_depth BFS (edge_bfs_search,
    search_utils.py:283-334): edges whose source lies within depth-1."""
    reach = bfs_nodes(edges, origin_uuids, max_depth - 1, src_col, dst_col)
    touch = reach.select(F.col("uuid").alias("_n"))
    out = edges.join(
        F.broadcast(touch),
        (F.col(src_col) == F.col("_n")) | (F.col(dst_col) == F.col("_n")),
    ).drop("_n")
    return out.dropDuplicates([src_col, dst_col, "name"] if "name" in edges.columns else [src_col, dst_col])


# ---------------------------------------------------------------------------
# Rank fusion + rerankers
# ---------------------------------------------------------------------------


def rrf(
    rankings: list[DataFrame],
    id_col: str,
    rank_const: int = DEFAULT_CONFIG.rrf_rank_const,
    min_score: float = 0.0,
) -> DataFrame:
    """Reciprocal rank fusion (search_utils.py:930-942: score += 1/(rank+1);
    the Rust twin uses k=60, reranking.rs:8-30).

    Each input DF must carry (id_col, score); rank is dense 0-based by
    descending score with id tie-break — deterministic under parallelism.
    Output: (id_col, rrf_score) sorted desc.

    CONTRACT (scale): each input must be a bounded ranked candidate list
    (top-k / over-fetch output, like every caller in this package) — the
    global row_number Window is a single-task sort by design, which is O(k)
    here and exactly what rank fusion means. Do NOT feed unbounded tables;
    rank them with a limit first.
    """
    ranked = []
    for i, df in enumerate(rankings):
        w = Window.orderBy(F.desc("score"), F.asc(id_col))
        ranked.append(
            df.select(F.col(id_col), F.col("score")).withColumn(
                "rank", F.row_number().over(w) - 1
            )
        )
    allr = reduce(lambda a, b: a.unionByName(b), ranked)
    fused = (
        allr.groupBy(id_col)
        .agg(F.sum(F.lit(1.0) / (F.col("rank") + F.lit(float(rank_const)))).alias("rrf_score"))
        .filter(F.col("rrf_score") >= min_score)
    )
    return fused.orderBy(F.desc("rrf_score"), F.asc(id_col))


def node_distance_rerank(
    results: DataFrame,
    edges: DataFrame,
    center_uuid: str,
    id_col: str = "uuid",
    src_col: str = "source_node_uuid",
    dst_col: str = "target_node_uuid",
) -> DataFrame:
    """Rerank by adjacency to a center node (node_distance_reranker,
    search_utils.py:945-987): distance 1 if adjacent, inf (1e9) otherwise,
    the center itself 0.1; ascending distance. Within equal distances the
    fused upstream order is preserved (the reference's stable sort keeps
    the RRF pre-rank): rrf_score, when present, is the secondary key."""
    nbrs = (
        edges.filter((F.col(src_col) == center_uuid) | (F.col(dst_col) == center_uuid))
        .select(
            F.when(F.col(src_col) == center_uuid, F.col(dst_col))
            .otherwise(F.col(src_col))
            .alias("_nbr")
        )
        .dropDuplicates(["_nbr"])
    )
    out = results.join(
        F.broadcast(nbrs), results[id_col] == F.col("_nbr"), "left"
    ).withColumn(
        "distance",
        F.when(F.col(id_col) == center_uuid, F.lit(0.1))
        .when(F.col("_nbr").isNotNull(), F.lit(1.0))
        .otherwise(F.lit(1e9)),
    )
    sec = [F.desc("rrf_score")] if "rrf_score" in results.columns else []
    return out.drop("_nbr").orderBy(F.asc("distance"), *sec, F.asc(id_col))


def episode_mentions_rerank(
    results: DataFrame, mentions: DataFrame, id_col: str = "uuid"
) -> DataFrame:
    """Rerank by MENTIONS count (episode_mentions_reranker,
    search_utils.py:990-1015)."""
    counts = mentions.groupBy("entity_uuid").agg(F.count(F.lit(1)).alias("mention_score"))
    out = (
        results.join(counts, results[id_col] == counts["entity_uuid"], "left")
        .drop("entity_uuid")
        .withColumn("mention_score", F.coalesce("mention_score", F.lit(0)))
    )
    sec = [F.desc("rrf_score")] if "rrf_score" in results.columns else []
    return out.orderBy(F.desc("mention_score"), *sec, F.asc(id_col))


def lexical_cross_encoder_scorer(text_col, query: str):
    """Default cross-encoder scorer: deterministic lexical STAND-IN.

    Scores each (query, passage) pair by query-token coverage:
    |query_tokens ∩ passage_tokens| / |query_tokens|. Returns a score
    Column given the passage text column and the query string — the
    contract any real model scorer must satisfy (see cross_encoder_rerank).
    """
    q_toks = sorted({t for t in query.lower().split() if t})
    if not q_toks:
        return F.lit(0.0)
    overlap = F.size(
        F.array_intersect(
            F.array_distinct(tokens_col(text_col)),
            F.array(*[F.lit(t) for t in q_toks]),
        )
    )
    return F.when(text_col.isNull(), F.lit(0.0)).otherwise(
        overlap.cast("double") / F.lit(float(len(q_toks)))
    )


def cross_encoder_rerank(
    results: DataFrame,
    table: DataFrame,
    id_col: str,
    text_col: str,
    query: str,
    scorer=None,
) -> DataFrame:
    """Cross-encoder rerank with a PLUGGABLE pairwise scorer.

    The reference reranks (query, passage) pairs through an external
    cross-encoder model (search.py:261-266; cross_encoder/client.py). No
    model runs in this sandbox, so ``scorer`` defaults to the deterministic
    lexical stand-in (lexical_cross_encoder_scorer) — an explicit, tested
    pairwise scorer rather than a silent fallback to RRF. A user with a
    real model injects ``scorer=lambda text, q: my_model_udf(text, F.lit(q))``
    (any callable (text Column, query str) -> score Column, typically a
    Pandas-UDF model call) without forking the orchestrator; ties break by
    the fused upstream score then id either way.
    """
    if not query:
        return results
    scorer = scorer or lexical_cross_encoder_scorer
    scored = results.join(table.select(F.col(id_col), F.col(text_col)), id_col, "left")
    scored = scored.withColumn("ce_score", scorer(F.col(text_col), query)).drop(text_col)
    order = [F.desc("ce_score")]
    if "rrf_score" in scored.columns:
        order.append(F.desc("rrf_score"))
    order.append(F.asc(id_col))
    return scored.orderBy(*order)


def maximal_marginal_relevance(
    candidates: list[tuple[str, list[float]]],
    query_vector: list[float],
    lambda_mult: float = DEFAULT_CONFIG.mmr_lambda,
    limit: int = DEFAULT_CONFIG.default_search_limit,
) -> list[str]:
    """Greedy MMR over an already-collected top-N (search_utils.py:1018-1054).
    The reference also runs this driver-side in-memory; candidate count is
    bounded by the 2x-limit over-fetch so O(n^2) is tiny."""
    import numpy as np

    if not candidates:
        return []
    ids = [c[0] for c in candidates]
    mat = np.array([c[1] for c in candidates], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat = mat / norms
    q = np.array(query_vector, dtype=np.float64)
    qn = np.linalg.norm(q)
    q = q / (qn if qn > 0 else 1.0)
    rel = mat @ q
    sim = mat @ mat.T
    chosen: list[int] = []
    remaining = list(range(len(ids)))
    while remaining and len(chosen) < limit:
        best, best_score = None, -1e18
        for i in remaining:
            penalty = max(sim[i][j] for j in chosen) if chosen else 0.0
            score = lambda_mult * rel[i] + (lambda_mult - 1.0) * penalty
            if score > best_score or (score == best_score and (best is None or ids[i] < ids[best])):
                best, best_score = i, score
        chosen.append(best)
        remaining.remove(best)
    return [ids[i] for i in chosen]


def hybrid_search(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    embedding_col: str,
    query: str,
    query_vector: list[float],
    limit: int = DEFAULT_CONFIG.default_search_limit,
    config: PipelineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """BM25 + cosine at 2x over-fetch each, RRF-fused, cut to limit —
    the hybrid_node_search / edge_search shape (search_utils.py:624-695;
    search.py:200-297 with over-fetch at :218-231)."""
    over = limit * config.overfetch_factor
    ft = fulltext_search(docs, id_col, text_col, query, limit=over)
    sim = similarity_search(docs, id_col, embedding_col, query_vector, min_score=0.0, limit=over)
    return rrf([ft, sim], id_col, rank_const=config.rrf_rank_const).limit(limit)
