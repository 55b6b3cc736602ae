"""Pipeline configuration constants.

Thresholds mirror the reference defaults (citations into /root/reference):
 - node name similarity >= 0.8 for bulk dedup        (utils/bulk_utils.py:274)
 - fuzzy name ratio      >= 0.9                      (utils/maintenance/node_operations.py:436)
 - maintenance embedding >= 0.92, name >= 0.95       (maintenance_dedupe_entities.py:44-46)
 - edge fact similarity  >= 0.6                      (utils/bulk_utils.py:369)
 - fuzzy candidate cap 50 per group                  (node_operations.py:444-456)
 - episode content cap 100_000 chars                 (nodes.py:248)
 - entity name cap 255 chars                         (nodes.py:151-157)
 - episode context window 3                          (graph_data_operations.py:28)
 - search over-fetch 2x limit                        (search/search.py:218)
 - RRF rank constant 1 (python) / 60 (rust)          (search_utils.py:930-942)
 - PageRank damping 0.85, 20 iterations              (centrality_operations.py:58-62)
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    # --- entity resolution thresholds (reference parity) ---
    node_min_score: float = 0.8          # bulk_utils.py:274
    fuzzy_threshold: float = 0.9         # node_operations.py:436
    maintenance_embedding_threshold: float = 0.92  # maintenance_dedupe_entities.py:44
    maintenance_name_threshold: float = 0.95       # maintenance_dedupe_entities.py:46
    edge_min_score: float = 0.6          # bulk_utils.py:369
    fuzzy_candidate_cap: int = 50        # node_operations.py:444-456

    # --- blocking / skew hygiene (scale additions, SURVEY.md §4.1) ---
    blocking_token_max_df: int = 256     # drop blocking tokens seen in > N entities
    lsh_num_hash_tables: int = 8
    lsh_ngram_size: int = 3
    salt_buckets: int = 16               # salting for high-degree entity keys
    hot_key_threshold: int = 10000       # mentions per entity before salting kicks in

    # --- size caps (reference parity) ---
    max_entity_name_len: int = 255       # nodes.py:151-157
    max_episode_content_len: int = 100_000  # nodes.py:248
    max_summary_len: int = 10_000        # nodes.py:427-432

    # --- embeddings (deterministic hashed char-ngram stand-in) ---
    embedding_dim: int = 64
    embedding_ngram: int = 3

    # --- search ---
    default_search_limit: int = 10       # search_config.py:29
    overfetch_factor: int = 2            # search.py:218
    rrf_rank_const: int = 1              # search_utils.py:930-942 (rust uses 60)
    mmr_lambda: float = 0.5
    min_fact_score: float = 0.6          # search_utils.py:57
    episode_window: int = 3              # graph_data_operations.py:28

    # --- graph algorithms ---
    pagerank_damping: float = 0.85       # centrality_operations.py:58
    pagerank_iterations: int = 20        # centrality_operations.py:62
    cc_max_iterations: int = 50
    # <= N edges: driver union-find (reference-parity path). Duplicate-pair
    # edges are tiny rows (~100 B); 1M ≈ 100 MB on a 24 GB driver. Above it,
    # the distributed large/small-star loop takes over — at 10^12 docs the
    # pair list exceeds any driver, so the loop is the real path and the
    # driver UF an optimization for small/medium corpora.
    cc_driver_threshold: int = 1_000_000

    # --- job identity ---
    group_id_from_domain: bool = True
    created_at_iso: str = "2025-01-01T00:00:00+00:00"  # fixed job ts → determinism

    extra: dict = field(default_factory=dict)


DEFAULT_CONFIG = PipelineConfig()
