"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003,
"Winnowing: Local Algorithms for Document Fingerprinting" — the MOSS
algorithm): hash every k-token shingle, slide a window of ``window``
consecutive hashes, record the minimum of each window. The selected set is
a provably well-spread sample of the document's shingles with the winnowing
guarantee: any match of at least ``window + k - 1`` consecutive tokens
between two documents shares at least one fingerprint — unlike MinHash
(whole-document similarity) this localizes PARTIAL overlap, the
plagiarism / quote / syndicated-fragment case.

Departure from the paper, for engine determinism: the paper breaks window
ties by rightmost position to minimize fingerprint count; we fingerprint
the plain window minimum VALUE and dedupe (`array_distinct`), which selects
the same hash set (a tie means the same VALUE is the min either way) and
keeps the expression in the Spark/DuckDB common subset.

Scale shape at 100 TB:
 - fingerprint extraction is MAP-ONLY (tokens -> shingle hashes -> windowed
   min, all higher-order functions on one row; zero Python, zero shuffle) —
   it fuses into the extraction scan;
 - `winnow_pairs` explodes (doc, fingerprint), caps fingerprint document
   frequency (hot boilerplate fingerprints are dropped BEFORE the self-join
   — the minhash bucket_cap argument), and self-joins on the fingerprint
   key: one shuffle on a well-spread key, pair aggregation is algebraic.

Reference parity: none (the reference has no corpus-curation tier); this
joins the dedup family of SURVEY.md §2's additions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphiti_spark.functions.textstats import tokens_col


def _winnow_col(toks: Column, k: int, window: int) -> Column:
    """Distinct winnowing fingerprints of a token array, as one expression.

    Guarded `when`s, not greatest(.., 0): Spark's sequence(1, 0) counts
    DOWN ([1, 0]) instead of returning empty, and slice index 0 errors."""
    n_g = F.size(toks) - k + 1
    grams = F.when(
        n_g >= 1,
        F.transform(
            F.sequence(F.lit(1), n_g), lambda i: F.array_join(F.slice(toks, i, k), " ")
        ),
    ).otherwise(F.array().cast("array<string>"))
    hashes = F.transform(
        grams,
        lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long"),
    )
    n_w = F.size(hashes) - window + 1
    mins = F.when(
        n_w >= 1,
        F.transform(
            F.sequence(F.lit(1), n_w), lambda p: F.array_min(F.slice(hashes, p, window))
        ),
    ).otherwise(F.array().cast("array<long>"))
    return F.array_distinct(mins)


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """(id, fingerprint) — one row per distinct selected hash per document.
    Documents shorter than ``window + k - 1`` tokens emit no fingerprints
    (no full window exists)."""
    return docs.select(
        F.col(id_col),
        F.explode(_winnow_col(tokens_col(F.col(text_col)), k, window)).alias(
            "fingerprint"
        ),
    )


def winnow_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
    df_cap: int = 200,
    min_shared: int = 1,
) -> DataFrame:
    """Partial-overlap candidate pairs: documents sharing >= ``min_shared``
    winnowing fingerprints, with the shared count as overlap evidence.
    Fingerprints appearing in more than ``df_cap`` documents are boilerplate
    and are dropped before the self-join (skew guard; the survivors still
    connect genuinely overlapping pairs through their rarer fragments)."""
    fps = winnow_fingerprints(docs, id_col, text_col, k, window)
    dfreq = fps.groupBy("fingerprint").agg(F.count(F.lit(1)).alias("_df"))
    kept = fps.join(
        dfreq.filter(F.col("_df") <= df_cap).select("fingerprint"), "fingerprint"
    )
    a = kept.select(F.col("fingerprint"), F.col(id_col).alias("id_a"))
    b = kept.select(F.col("fingerprint"), F.col(id_col).alias("id_b"))
    return (
        a.join(b, "fingerprint")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )
