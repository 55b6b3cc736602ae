"""Search configuration + filters + canned recipes.

Parity targets (citations into /root/reference):
 - SearchFilters: node label filter, edge name IN filter, and date filters
   expressed as OR-of-AND comparator lists over valid_at/invalid_at/
   created_at/expired_at (graphiti_core/search/search_filters.py:24-51 model,
   :53-184 Cypher generation),
 - SearchConfig dataclasses (search/search_config.py:112-126),
 - 15 canned recipes (search/search_config_recipes.py:34-223) — reproduced
   as module constants with the same method/reranker combinations.

The Cypher-string generator becomes a pure Column-expression builder:
OR-of-ANDs = reduce(|, [reduce(&, ...)]) — Catalyst folds it into the scan
predicate, so date filters push down to parquet/Iceberg row-group pruning.
"""

from __future__ import annotations

import operator
from dataclasses import dataclass, field
from datetime import datetime
from enum import Enum
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class ComparisonOperator(Enum):
    """search_filters.py comparator surface (= <> > < >= <=)."""

    equals = "="
    not_equals = "<>"
    greater_than = ">"
    less_than = "<"
    greater_than_equal = ">="
    less_than_equal = "<="


_OPS = {
    ComparisonOperator.equals: operator.eq,
    ComparisonOperator.not_equals: operator.ne,
    ComparisonOperator.greater_than: operator.gt,
    ComparisonOperator.less_than: operator.lt,
    ComparisonOperator.greater_than_equal: operator.ge,
    ComparisonOperator.less_than_equal: operator.le,
}


@dataclass(frozen=True)
class DateFilter:
    date: datetime
    comparison_operator: ComparisonOperator


@dataclass
class SearchFilters:
    """search_filters.py:24-51 twin. Date filters are OR-of-AND lists:
    outer list entries OR together; each inner list ANDs."""

    node_labels: list[str] | None = None
    edge_types: list[str] | None = None
    valid_at: list[list[DateFilter]] | None = None
    invalid_at: list[list[DateFilter]] | None = None
    created_at: list[list[DateFilter]] | None = None
    expired_at: list[list[DateFilter]] | None = None


def _date_predicate(col: Column, groups: list[list[DateFilter]]) -> Column:
    ors = []
    for conj in groups:
        ands = [_OPS[f.comparison_operator](col, F.lit(f.date)) for f in conj]
        ors.append(reduce(operator.and_, ands))
    return reduce(operator.or_, ors)


def apply_search_filters(df: DataFrame, filters: SearchFilters) -> DataFrame:
    """Column-expression restatement of the Cypher filter generator
    (search_filters.py:53-184). Every predicate is deterministic and
    pushdown-eligible."""
    out = df
    if filters.node_labels and "labels" in out.columns:
        pred = reduce(
            operator.or_, [F.array_contains("labels", lab) for lab in filters.node_labels]
        )
        out = out.filter(pred)
    if filters.edge_types and "name" in out.columns:
        out = out.filter(F.col("name").isin(filters.edge_types))
    for col_name in ("valid_at", "invalid_at", "created_at", "expired_at"):
        groups = getattr(filters, col_name)
        if groups and col_name in out.columns:
            out = out.filter(_date_predicate(F.col(col_name), groups))
    return out


# ---------------------------------------------------------------------------
# Search configuration (search_config.py:112-126)
# ---------------------------------------------------------------------------


class Reranker(Enum):
    rrf = "rrf"
    mmr = "mmr"
    node_distance = "node_distance"
    episode_mentions = "episode_mentions"
    cross_encoder = "cross_encoder"  # external model — stubbed in-sandbox


class SearchMethod(Enum):
    bm25 = "bm25"
    cosine_similarity = "cosine_similarity"
    bfs = "bfs"


@dataclass(frozen=True)
class EdgeSearchConfig:
    search_methods: tuple[SearchMethod, ...]
    reranker: Reranker = Reranker.rrf
    min_score: float = 0.6  # search_utils.py:57


@dataclass(frozen=True)
class NodeSearchConfig:
    search_methods: tuple[SearchMethod, ...]
    reranker: Reranker = Reranker.rrf
    min_score: float = 0.8


@dataclass(frozen=True)
class EpisodeSearchConfig:
    search_methods: tuple[SearchMethod, ...] = (SearchMethod.bm25,)
    reranker: Reranker = Reranker.rrf


@dataclass(frozen=True)
class CommunitySearchConfig:
    search_methods: tuple[SearchMethod, ...] = (SearchMethod.bm25, SearchMethod.cosine_similarity)
    reranker: Reranker = Reranker.rrf
    min_score: float = 0.6


@dataclass(frozen=True)
class SearchConfig:
    """search_config.py:112-118 twin; limit over-fetch x2 applied by the
    executor (search.py:218)."""

    edge_config: EdgeSearchConfig | None = None
    node_config: NodeSearchConfig | None = None
    episode_config: EpisodeSearchConfig | None = None
    community_config: CommunitySearchConfig | None = None
    limit: int = 10
    reranker_min_score: float = 0.0


_HYBRID = (SearchMethod.bm25, SearchMethod.cosine_similarity)
_HYBRID_BFS = (SearchMethod.bm25, SearchMethod.cosine_similarity, SearchMethod.bfs)

# Canned recipes (search_config_recipes.py:34-223 names preserved).
COMBINED_HYBRID_SEARCH_RRF = SearchConfig(
    edge_config=EdgeSearchConfig(_HYBRID, Reranker.rrf),
    node_config=NodeSearchConfig(_HYBRID, Reranker.rrf),
    episode_config=EpisodeSearchConfig(),
    community_config=CommunitySearchConfig(),
)
COMBINED_HYBRID_SEARCH_MMR = SearchConfig(
    edge_config=EdgeSearchConfig(_HYBRID, Reranker.mmr),
    node_config=NodeSearchConfig(_HYBRID, Reranker.mmr),
    episode_config=EpisodeSearchConfig(),
    community_config=CommunitySearchConfig(),
)
COMBINED_HYBRID_SEARCH_CROSS_ENCODER = SearchConfig(
    edge_config=EdgeSearchConfig(_HYBRID, Reranker.cross_encoder),
    node_config=NodeSearchConfig(_HYBRID, Reranker.cross_encoder),
    episode_config=EpisodeSearchConfig(),
    community_config=CommunitySearchConfig(),
)
EDGE_HYBRID_SEARCH_RRF = SearchConfig(edge_config=EdgeSearchConfig(_HYBRID, Reranker.rrf))
EDGE_HYBRID_SEARCH_MMR = SearchConfig(edge_config=EdgeSearchConfig(_HYBRID, Reranker.mmr))
EDGE_HYBRID_SEARCH_NODE_DISTANCE = SearchConfig(
    edge_config=EdgeSearchConfig(_HYBRID_BFS, Reranker.node_distance)
)
EDGE_HYBRID_SEARCH_EPISODE_MENTIONS = SearchConfig(
    edge_config=EdgeSearchConfig(_HYBRID, Reranker.episode_mentions)
)
EDGE_HYBRID_SEARCH_CROSS_ENCODER = SearchConfig(
    edge_config=EdgeSearchConfig(_HYBRID_BFS, Reranker.cross_encoder)
)
NODE_HYBRID_SEARCH_RRF = SearchConfig(node_config=NodeSearchConfig(_HYBRID, Reranker.rrf))
NODE_HYBRID_SEARCH_MMR = SearchConfig(node_config=NodeSearchConfig(_HYBRID, Reranker.mmr))
NODE_HYBRID_SEARCH_NODE_DISTANCE = SearchConfig(
    node_config=NodeSearchConfig(_HYBRID_BFS, Reranker.node_distance)
)
NODE_HYBRID_SEARCH_EPISODE_MENTIONS = SearchConfig(
    node_config=NodeSearchConfig(_HYBRID, Reranker.episode_mentions)
)
NODE_HYBRID_SEARCH_CROSS_ENCODER = SearchConfig(
    node_config=NodeSearchConfig(_HYBRID_BFS, Reranker.cross_encoder)
)
COMMUNITY_HYBRID_SEARCH_RRF = SearchConfig(community_config=CommunitySearchConfig())
COMMUNITY_HYBRID_SEARCH_CROSS_ENCODER = SearchConfig(
    community_config=CommunitySearchConfig(reranker=Reranker.cross_encoder)
)
