"""Deterministic hashed char-ngram embeddings + vector math columns.

The reference embeds names/facts with an external model
(/root/reference/graphiti_core/embedder/client.py) and compares with cosine
(graph_queries.py:98-121). No model downloads are possible (or desirable —
determinism) here, so the stand-in is a feature-hashed character-ngram vector:
for each 3-gram g of the normalized string, bucket = md5(g) % dim, sign from
the next md5 bit, accumulate, then L2-normalize. Pure function of the string
-> identical across executors and runs.

Vector math (cosine/dot/normalize) is expressed with higher-order functions
(zip_with + aggregate) so similarity scoring stays JVM-side; the only pandas
UDF is the embedding constructor itself (Arrow-batched, numpy-vectorized).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

from graphiti_spark.config import DEFAULT_CONFIG
from graphiti_spark.session import session_pandas_udf

_DIM = DEFAULT_CONFIG.embedding_dim
_N = DEFAULT_CONFIG.embedding_ngram


def hashed_ngram_embedding_py(text: str, dim: int = _DIM, n: int = _N) -> list[float]:
    s = text.lower()
    if len(s) < n:
        s = s + ("_" * (n - len(s)))
    vec = np.zeros(dim, dtype=np.float64)
    for i in range(len(s) - n + 1):
        g = s[i : i + n]
        h = hashlib.md5(g.encode("utf-8")).digest()
        bucket = int.from_bytes(h[:4], "big") % dim
        sign = 1.0 if (h[4] & 1) else -1.0
        vec[bucket] += sign
    norm = float(np.linalg.norm(vec))
    if norm > 0:
        vec /= norm
    return [float(x) for x in vec]


@session_pandas_udf(ArrayType(FloatType()))
def hashed_ngram_embedding_udf(text: pd.Series) -> pd.Series:
    return pd.Series([hashed_ngram_embedding_py(t if t is not None else "") for t in text])


def dot_col(a: Column | str, b: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm_col(c: Column) -> Column:
    return F.sqrt(F.aggregate(c, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine_col(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm.

    Mirrors the DB-side cosine in graph_queries.py:98-121 / the Rust SIMD
    twin (graphiti-search-rs/src/search/similarity.rs) as one codegen'd
    expression tree.
    """
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    na, nb = _norm_col(ca), _norm_col(cb)
    return F.when((na > 0) & (nb > 0), dot_col(ca, cb) / (na * nb)).otherwise(F.lit(0.0))


def l2_normalize_col(a: Column | str) -> Column:
    """helpers.py:110-113 parity (normalize_l2)."""
    ca = F.col(a) if isinstance(a, str) else a
    n = _norm_col(ca)
    return F.when(n > 0, F.transform(ca, lambda x: (x.cast("double") / n).cast("float"))).otherwise(ca)
