"""`search()` orchestrator — the batch twin of the reference's hybrid
search entry point (/root/reference/graphiti_core/search/search.py:68-197):
embed the query once, fan out edge/node/episode/community searches per the
SearchConfig, run each configured method at 2x over-fetch (search.py:218),
rerank, cut to limit, assemble SearchResults.

Each fan-out leg is an independent DataFrame pipeline over the materialized
graph tables; the legs share the one query embedding and nothing else, so on
a cluster they execute as independent job groups.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

import warnings

from graphiti_spark.analytics.search import (
    bfs_edges,
    bfs_nodes,
    cross_encoder_rerank,
    episode_mentions_rerank,
    fulltext_search,
    maximal_marginal_relevance,
    node_distance_rerank,
    rrf,
    similarity_search,
)
from graphiti_spark.analytics.search_config import (
    Reranker,
    SearchConfig,
    SearchFilters,
    SearchMethod,
    apply_search_filters,
)
from graphiti_spark.config import DEFAULT_CONFIG
from graphiti_spark.functions.embeddings import hashed_ngram_embedding_py


@dataclass
class SearchResults:
    """search_config.py:121-126 twin."""

    edges: list = field(default_factory=list)
    nodes: list = field(default_factory=list)
    episodes: list = field(default_factory=list)
    communities: list = field(default_factory=list)


def _run_methods(
    table: DataFrame,
    id_col: str,
    text_col: str,
    emb_col: str | None,
    methods,
    query: str,
    qvec: list[float],
    overfetch: int,
    min_score: float,
    bfs_origins: list[str] | None,
    edges_for_bfs: DataFrame | None,
    bfs_scope: str = "edges",
    index_path: str | None = None,
) -> list[DataFrame]:
    out = []
    for m in methods:
        if m == SearchMethod.bm25:
            out.append(
                fulltext_search(
                    table, id_col, text_col, query, limit=overfetch,
                    index_path=index_path,
                )
            )
        elif m == SearchMethod.cosine_similarity and emb_col and emb_col in table.columns:
            out.append(
                similarity_search(table, id_col, emb_col, qvec, min_score=min_score, limit=overfetch)
            )
        elif m == SearchMethod.bfs and bfs_origins and edges_for_bfs is not None:
            # scope-aware: the node legs take node uuids from node_bfs_search
            # (search_utils.py:451-486), the edge legs edge uuids from
            # edge_bfs_search (:283-334); both deterministically ordered
            # before the over-fetch limit.
            if bfs_scope == "nodes":
                reach = bfs_nodes(edges_for_bfs, bfs_origins, max_depth=3)
                out.append(
                    reach.select(
                        F.col("uuid").alias(id_col),
                        (F.lit(1.0) / (F.lit(1.0) + F.col("depth"))).alias("score"),
                    )
                    # a leg returns rows of the searched table only — BFS over
                    # the edge graph can reach uuids filtered out of (or never
                    # in) the node table
                    .join(table.select(id_col), id_col, "left_semi")
                    .orderBy(F.desc("score"), F.asc(id_col))
                    .limit(overfetch)
                )
            else:
                reach = bfs_edges(edges_for_bfs, bfs_origins, max_depth=3)
                out.append(
                    reach.select(F.col("uuid").alias(id_col))
                    .withColumn("score", F.lit(1.0))
                    .orderBy(F.asc(id_col))
                    .limit(overfetch)
                )
    return out


def _rerank(
    ranked: list[DataFrame],
    table: DataFrame,
    id_col: str,
    emb_col: str | None,
    reranker: Reranker,
    qvec: list[float],
    limit: int,
    config=DEFAULT_CONFIG,
    text_col: str | None = None,
    query: str = "",
    edges: DataFrame | None = None,
    mentions: DataFrame | None = None,
    center_uuid: str | None = None,
    scope: str = "nodes",
    cross_encoder_scorer=None,
) -> list:
    if not ranked:
        return []
    fused = rrf(ranked, id_col, rank_const=config.rrf_rank_const)
    if reranker == Reranker.node_distance:
        # node_distance is defined over NODE uuids. For the edge scope the
        # reference groups edges by source node, reranks those nodes by
        # distance, and emits edges in reranked-source order with the RRF
        # pre-rank preserved within a source (search.py:267-291).
        if scope == "edges" and edges is not None and center_uuid:
            with_src = fused.join(
                table.select(F.col(id_col), "source_node_uuid"), id_col
            )
            out = node_distance_rerank(
                with_src, edges, center_uuid, id_col="source_node_uuid"
            )
            return [r[id_col] for r in out.limit(limit).collect()]
        if scope == "nodes" and edges is not None and center_uuid:
            out = node_distance_rerank(fused, edges, center_uuid, id_col)
            return [r[id_col] for r in out.limit(limit).collect()]
        warnings.warn(
            "node_distance reranker needs a node or edge scope plus edges + "
            "bfs_origin_uuids (center); falling back to RRF order",
            stacklevel=2,
        )
    elif reranker == Reranker.episode_mentions:
        # For the edge scope the reference sorts edges by how many episodes
        # cite them, len(edge.episodes) (search.py:294-296); for the node
        # scope it counts MENTIONS edges per node (search_utils.py:990-1015).
        if scope == "edges" and "episodes" in table.columns:
            out = (
                fused.join(table.select(F.col(id_col), "episodes"), id_col)
                .withColumn("mention_score", F.size(F.coalesce("episodes", F.array())))
                .orderBy(F.desc("mention_score"), F.desc("rrf_score"), F.asc(id_col))
            )
            return [r[id_col] for r in out.limit(limit).collect()]
        if scope == "nodes" and mentions is not None:
            out = episode_mentions_rerank(fused, mentions, id_col)
            return [r[id_col] for r in out.limit(limit).collect()]
        warnings.warn(
            "episode_mentions reranker needs the node scope with a mentions "
            "DataFrame (pass search(..., mentions=...)) or the edge scope "
            "with an episodes column; falling back to RRF order",
            stacklevel=2,
        )
    elif reranker == Reranker.cross_encoder:
        if text_col and text_col in table.columns:
            out = cross_encoder_rerank(
                fused, table, id_col, text_col, query, scorer=cross_encoder_scorer
            )
            return [r[id_col] for r in out.limit(limit).collect()]
        warnings.warn(
            "cross_encoder reranker needs a text column; falling back to RRF order",
            stacklevel=2,
        )
    elif reranker == Reranker.mmr and emb_col and emb_col in table.columns:
        top = fused.limit(limit * config.overfetch_factor)
        cands = (
            top.join(table.select(F.col(id_col), F.col(emb_col)), id_col)
            .select(id_col, emb_col)
            .collect()
        )
        pairs = [(r[id_col], [float(x) for x in r[emb_col]]) for r in cands]
        return maximal_marginal_relevance(pairs, qvec, config.mmr_lambda, limit)
    return [r[id_col] for r in fused.limit(limit).collect()]


def search(
    query: str,
    config: SearchConfig,
    edges: DataFrame | None = None,
    nodes: DataFrame | None = None,
    episodes: DataFrame | None = None,
    communities: DataFrame | None = None,
    filters: SearchFilters | None = None,
    bfs_origin_uuids: list[str] | None = None,
    mentions: DataFrame | None = None,
    cross_encoder_scorer=None,
    fulltext_index_paths: dict[str, str] | None = None,
) -> SearchResults:
    """Fan out the configured searches; return uuid lists per scope.

    Query embedded ONCE with the deterministic hashed-ngram embedder
    (search.py:128-132 embeds once with the external model).

    ``mentions``: entity-mention table powering the episode_mentions
    reranker; ``bfs_origin_uuids[0]`` is the center for node_distance.
    ``cross_encoder_scorer``: optional (text Column, query str) -> score
    Column callable injected into cross_encoder_rerank in every scope —
    plug a real model UDF here; defaults to the lexical stand-in.
    ``fulltext_index_paths``: optional {scope: path} of persisted postings
    indices (indices.build_text_index); a scope with an entry serves its
    bm25 leg from the partition-pruned index instead of a table scan."""
    qvec = hashed_ngram_embedding_py(query)
    idx = fulltext_index_paths or {}
    over = config.limit * DEFAULT_CONFIG.overfetch_factor
    center = bfs_origin_uuids[0] if bfs_origin_uuids else None
    results = SearchResults()

    if config.edge_config and edges is not None:
        t = apply_search_filters(edges, filters) if filters else edges
        ranked = _run_methods(
            t, "uuid", "fact", "fact_embedding", config.edge_config.search_methods,
            query, qvec, over, config.edge_config.min_score, bfs_origin_uuids, edges,
            bfs_scope="edges", index_path=idx.get("edges"),
        )
        results.edges = _rerank(ranked, t, "uuid", "fact_embedding",
                                config.edge_config.reranker, qvec, config.limit,
                                text_col="fact", query=query, edges=edges,
                                mentions=mentions, center_uuid=center,
                                scope="edges",
                                cross_encoder_scorer=cross_encoder_scorer)
    if config.node_config and nodes is not None:
        t = apply_search_filters(nodes, filters) if filters else nodes
        ranked = _run_methods(
            t, "uuid", "name", "name_embedding", config.node_config.search_methods,
            query, qvec, over, config.node_config.min_score, bfs_origin_uuids, edges,
            bfs_scope="nodes", index_path=idx.get("nodes"),
        )
        results.nodes = _rerank(ranked, t, "uuid", "name_embedding",
                                config.node_config.reranker, qvec, config.limit,
                                text_col="name", query=query, edges=edges,
                                mentions=mentions, center_uuid=center,
                                scope="nodes",
                                cross_encoder_scorer=cross_encoder_scorer)
    if config.episode_config and episodes is not None:
        ranked = _run_methods(
            episodes, "uuid", "content", None, config.episode_config.search_methods,
            query, qvec, over, 0.0, None, None,
            index_path=idx.get("episodes"),
        )
        results.episodes = _rerank(ranked, episodes, "uuid", None,
                                   config.episode_config.reranker, qvec, config.limit,
                                   text_col="content", query=query,
                                   mentions=mentions, center_uuid=center,
                                   scope="episodes",
                                   cross_encoder_scorer=cross_encoder_scorer)
    if config.community_config and communities is not None:
        ranked = _run_methods(
            communities, "uuid", "summary", "name_embedding",
            config.community_config.search_methods, query, qvec, over,
            config.community_config.min_score, None, None,
            index_path=idx.get("communities"),
        )
        results.communities = _rerank(ranked, communities, "uuid", "name_embedding",
                                      config.community_config.reranker, qvec, config.limit,
                                      text_col="summary", query=query,
                                      mentions=mentions, center_uuid=center,
                                      scope="communities",
                                      cross_encoder_scorer=cross_encoder_scorer)
    return results
