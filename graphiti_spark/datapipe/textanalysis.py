"""Document-level text analysis over the corpus: language ID, quality
scoring, token accounting, fingerprints — the profiling stage a training-data
pipeline runs between extraction and dedup.

Thin DataFrame operators over the pure column functions in
functions/textstats.py (each of which has an exact DuckDB SQL twin for the
correctness oracle). Everything here is a map-only scan stage: no shuffle,
whole-stage codegen end-to-end, safe to run inline with the S1 text
extraction pass at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphiti_spark.functions.textstats import (
    bpe_ish_token_count_col,
    fingerprint_col,
    lang_id_col,
    lang_score_cols,
    quality_score_col,
    token_count_col,
    tokens_col,
)


def profile_documents(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One-pass per-document profile: sizes, token counts, quality, lang."""
    c = F.col(text_col)
    return docs.select(
        F.col(id_col),
        F.length(c).alias("n_chars"),
        token_count_col(c).alias("n_tokens"),
        bpe_ish_token_count_col(c).alias("n_bpe_tokens"),
        quality_score_col(c).alias("quality"),
        lang_id_col(c).alias("lang_pred"),
        fingerprint_col(c).alias("fingerprint"),
    )


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, per-language marker scores, argmax prediction)."""
    return docs.select(
        F.col(id_col),
        *lang_score_cols(F.col(text_col)),
        lang_id_col(F.col(text_col)).alias("lang_pred"),
    )


def quality_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    min_tokens: int = 10,
) -> DataFrame:
    """C4/Gopher-style keep-list: quality and length gates as pushdown-able
    predicates over the profile columns."""
    c = F.col(text_col)
    return (
        docs.withColumn("quality", quality_score_col(c))
        .withColumn("n_tokens", token_count_col(c))
        .filter((F.col("quality") >= min_quality) & (F.col("n_tokens") >= min_tokens))
        .select(F.col(id_col), "quality", "n_tokens")
    )


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 256,
    overlap: int = 32,
) -> DataFrame:
    """Sliding-window chunking: (id, chunk_id, chunk_text, n_tokens) with
    ``chunk_tokens``-token windows advancing by ``chunk_tokens - overlap``
    — the retrieval/episode-splitting prep step. Map-only (HOF build +
    posexplode), no shuffle; empty documents yield no rows; a document
    shorter than one window yields exactly one chunk.

    Deterministic window starts: 1, 1+stride, ... while start <= n_tokens
    (so the final, possibly short tail window is kept)."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens_col(F.col(text_col))
    starts = F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(stride))
    chunks = F.when(
        F.size(toks) > 0,
        F.transform(starts, lambda s: F.concat_ws(" ", F.slice(toks, s, chunk_tokens))),
    ).otherwise(F.array().cast("array<string>"))
    out = docs.select(F.col(id_col), F.posexplode(chunks).alias("chunk_id", "chunk_text"))
    return out.withColumn(
        "n_tokens", F.size(F.split(F.col("chunk_text"), r"\s+"))
    )


def token_budget(docs: DataFrame, text_col: str = "text", by: str | None = None) -> DataFrame:
    """Corpus token accounting, optionally grouped (e.g. by lang/source) —
    the budgeting query behind sampling weights."""
    c = F.col(text_col)
    base = docs.withColumn("_tok", token_count_col(c)).withColumn(
        "_bpe", bpe_ish_token_count_col(c)
    )
    keys = [by] if by else []
    agg = base.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_tok").alias("total_tokens"),
        F.sum("_bpe").alias("total_bpe_tokens"),
    )
    return agg.orderBy(*keys) if keys else agg
