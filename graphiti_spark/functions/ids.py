"""Deterministic uuid5 identity — the reference's reproducibility backbone.

Parity targets (citations into /root/reference):
 - entity uuid = uuid5(uuid5(NAMESPACE_DNS, f"graphiti.entity.{group_id}"),
                       normalize_entity_name(name))
   (graphiti_core/utils/uuid_utils.py:271-296, applied at nodes.py:131 and
    node_operations.py:331; normalize_entity_name defaults to the ENHANCED
    chain, uuid_utils.py:52-80 — mirrored by identity_normalize_py below)
 - edge uuid   = uuid5(uuid5(NAMESPACE_DNS, f"graphiti.edge.{group_id}"),
                       f"{source_uuid}|{target_uuid}|{NAME_UPPER}")
   (uuid_utils.py:309-334)
 - episode uuid: the reference uses random uuid4 for episodes; our batch DAG
   needs determinism, so episode uuid = uuid5(episode namespace, url) — the
   url is the natural primary key per FIXTURES.md §1.

uuid5 is pure Python stdlib and deterministic across executors, so these are
Arrow-batched pandas UDFs (vectorized batch transfer; python loop only over
the in-batch rows — no viable JVM-side uuid5 expression exists).
"""

from __future__ import annotations

import uuid
from functools import lru_cache

import pandas as pd
from pyspark.sql import functions as F

from graphiti_spark.session import session_pandas_udf
from pyspark.sql.types import StringType

from graphiti_spark.functions.normalize import (
    normalize_entity_name_enhanced_py,
    normalize_entity_name_py,
)

# The reference's normalize_entity_name (uuid_utils.py:52-80) is env-gated:
# DEDUP_NORMALIZE_NAMES=false skips normalization entirely,
# DEDUP_ENHANCED_NORMALIZATION=false falls back to the basic chain. Both
# default true, so the enhanced normalizer IS the uuid identity. Resolved
# once at import (the reference re-reads os.getenv per call — pointless
# inside a vectorized UDF loop).
import os as _os

_NORMALIZE_NAMES = _os.getenv("DEDUP_NORMALIZE_NAMES", "true").lower() == "true"
_ENHANCED = _os.getenv("DEDUP_ENHANCED_NORMALIZATION", "true").lower() == "true"


def identity_normalize_py(name: str) -> str:
    """The normalization applied inside entity uuid identity
    (uuid_utils.py:291 generate_deterministic_uuid -> normalize_entity_name)."""
    if not _NORMALIZE_NAMES:
        return name
    if _ENHANCED:
        return normalize_entity_name_enhanced_py(name)
    return normalize_entity_name_py(name) or name


@lru_cache(maxsize=4096)
def _entity_ns(group_id: str) -> uuid.UUID:
    return uuid.uuid5(uuid.NAMESPACE_DNS, f"graphiti.entity.{group_id}")


@lru_cache(maxsize=4096)
def _edge_ns(group_id: str) -> uuid.UUID:
    return uuid.uuid5(uuid.NAMESPACE_DNS, f"graphiti.edge.{group_id}")


@lru_cache(maxsize=16)
def _episode_ns(kind: str = "episode") -> uuid.UUID:
    return uuid.uuid5(uuid.NAMESPACE_DNS, f"graphiti.{kind}")


def entity_uuid_py(name: str, group_id: str) -> str:
    """uuid_utils.py:271-296 parity: uuid5 over the ENHANCED-normalized name
    (the reference default — possessives, titles, company indicators and
    abbreviations fold into one identity; see identity_normalize_py)."""
    return str(uuid.uuid5(_entity_ns(group_id), identity_normalize_py(name)))


def edge_uuid_py(source_uuid: str, target_uuid: str, name: str, group_id: str) -> str:
    """uuid_utils.py:309-334 parity (predicate upper-cased in the key)."""
    return str(uuid.uuid5(_edge_ns(group_id), f"{source_uuid}|{target_uuid}|{name.upper()}"))


def episode_uuid_py(url: str) -> str:
    return str(uuid.uuid5(_episode_ns(), url))


@session_pandas_udf(StringType())
def entity_uuid_udf(name: pd.Series, group_id: pd.Series) -> pd.Series:
    return pd.Series([entity_uuid_py(n, g) for n, g in zip(name, group_id)])


@session_pandas_udf(StringType())
def identity_normalize_udf(name: pd.Series) -> pd.Series:
    """Column form of identity_normalize_py — the string two names must share
    to be the same entity uuid (used by the ER catalog so blocking/scoring
    operate on the identity norm, not the basic one)."""
    return pd.Series([identity_normalize_py(n) for n in name])


@session_pandas_udf(StringType())
def edge_uuid_udf(src: pd.Series, dst: pd.Series, name: pd.Series, group_id: pd.Series) -> pd.Series:
    return pd.Series([edge_uuid_py(s, d, n, g) for s, d, n, g in zip(src, dst, name, group_id)])


@session_pandas_udf(StringType())
def episode_uuid_udf(url: pd.Series) -> pd.Series:
    ns = _episode_ns()
    return pd.Series([str(uuid.uuid5(ns, u)) for u in url])
