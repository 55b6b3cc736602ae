"""Exact repeated-span deduplication — the k-gram formulation of
"Deduplicating Training Data Makes Language Models Better" (Lee et al.
2021) ExactSubstr: remove every token covered by a k-token window whose
content recurs ANYWHERE in the corpus (across documents or within one),
keeping the single globally-first occurrence.

Contract (deterministic, SQL-twinnable):
 - tokens are the corpus-wide convention (`functions.textstats.tokens_col`:
   lowercased whitespace split);
 - a k-gram occurrence (doc, pos) is *duplicated* iff its md5'd content
   occurs >= 2 times in the corpus and (doc, pos) is not the lexicographic
   minimum occurrence (the keeper);
 - a token position is removed iff some duplicated k-gram occurrence starts
   within the trailing window [pos-k+1, pos] — so any repeated run of
   >= k tokens is removed in full (all its k-grams are duplicated), while
   repeats shorter than k are kept: the approximation direction vs a true
   suffix array is one-sided and documented, never silent.

Scale shape for a 10^12-document corpus:
 - occurrence table is O(total tokens): built inside the array world
   (transform over a sequence -> posexplode), so the token array is never
   replicated per gram row;
 - gram stats are ONE algebraic aggregation (count + min(struct)) — hot
   boilerplate grams collapse map-side before the exchange, the same
   argument as `decontam.paragraph_dedup`;
 - the stats join back is 1:1 per occurrence (stats has one row per gram) —
   a hot gram skews the build side only, which AQE splits;
 - coverage is a per-document window (rows between k-1 preceding), and the
   final reassembly is a per-document collect_list bounded by document
   length — nothing global, no driver loop.

Reference anchor: the reference dedups at entity granularity
(graphiti_core/utils/maintenance/node_operations.py dedupe paths); corpus
span-level dedup is part of the training-data surface the north rule adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphiti_spark.functions.textstats import tokens_col, word_ngrams_col


def repeated_span_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """(doc_id, n_tokens, n_removed, text_dedup): the token stream with all
    non-keeper duplicated >= k-token spans removed; `text_dedup` is the kept
    tokens joined by single spaces (the normalized-token contract — byte
    reconstruction of the original whitespace is out of scope by design).
    Documents shorter than k tokens pass through untouched."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    base = docs.select(
        F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("tk")
    )
    # k-gram content hashes, built without leaving the array world; grams
    # come from the single shared definition (functions/textstats.py)
    gram_arr = F.transform(word_ngrams_col(F.col("tk"), k), F.md5)
    occ = base.select("doc_id", F.posexplode(gram_arr).alias("pos", "gram"))
    stats = occ.groupBy("gram").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min(F.struct("doc_id", "pos")).alias("keeper"),
    )
    dup_starts = (
        occ.join(stats.filter(F.col("cnt") >= 2), "gram")
        .filter(
            ~(
                (F.col("doc_id") == F.col("keeper.doc_id"))
                & (F.col("pos") == F.col("keeper.pos"))
            )
        )
        .select("doc_id", "pos", F.lit(1).alias("_dup"))
    )
    tokpos = base.select("doc_id", F.posexplode("tk").alias("pos", "token"))
    flagged = tokpos.join(dup_starts, ["doc_id", "pos"], "left")
    # token positions are consecutive integers per document, so a
    # rows-between window over pos equals the positional window
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(-(k - 1), 0)
    covered = flagged.withColumn(
        "_cov", F.coalesce(F.max("_dup").over(w), F.lit(0))
    )
    agg = covered.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("_cov").alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("_cov") == 0, F.struct("pos", "token"))
                    )
                ),
                lambda x: x["token"],
            ),
            " ",
        ).alias("text_dedup"),
    )
    return (
        base.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
            F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
        )
    )
