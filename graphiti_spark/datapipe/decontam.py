"""Eval-set decontamination and cross-corpus paragraph dedup.

Two standard curation passes a training-data pipeline runs before a corpus
ships (both from the public playbook — GPT-3's 13-gram overlap rule and
CCNet's duplicated-paragraph removal):

`ngram_decontaminate`
  Drop (or just flag) training documents that share >= k distinct word
  n-grams with a benchmark/eval set. The eval side is small by
  construction, so its distinct n-grams BROADCAST; the corpus side streams
  through one explode + broadcast-semi/inner join — the 100 TB side never
  shuffles on the gram key.

`paragraph_dedup`
  Remove every duplicated paragraph occurrence except the first (corpus
  order = (doc_id, position)), then reassemble documents. The skew trap:
  a boilerplate paragraph repeated 10^9 times makes any
  Window.partitionBy(paragraph) explode one task. This implementation
  never windows over the paragraph key — the winner per paragraph is
  min(struct(doc_id, pos)) via groupBy, which map-side-combines duplicate
  keys down to one row per partition BEFORE the exchange, so a hot
  paragraph costs one row per upstream partition, not 10^9 rows in one
  reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphiti_spark.functions.textstats import tokens_col, word_ngrams_col

# single shared n-gram definition (functions/textstats.py)
_word_ngrams = word_ngrams_col


def contamination_report(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str | None = None,
) -> DataFrame:
    """(id, n_collisions): distinct eval n-grams each training document
    contains. Only colliding documents appear (n_collisions >= 1)."""
    eval_text_col = eval_text_col or text_col
    eval_grams = (
        eval_docs.select(
            F.explode(_word_ngrams(tokens_col(F.col(eval_text_col)), n)).alias("gram")
        )
        .distinct()
    )
    corpus_grams = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(_word_ngrams(tokens_col(F.col(text_col)), n))).alias(
            "gram"
        ),
    )
    return (
        corpus_grams.join(F.broadcast(eval_grams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_collisions"))
    )


def ngram_decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 13,
    min_collisions: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str | None = None,
) -> DataFrame:
    """docs minus those sharing >= min_collisions distinct eval n-grams."""
    bad = contamination_report(
        docs, eval_docs, n=n, id_col=id_col, text_col=text_col, eval_text_col=eval_text_col
    ).filter(F.col("n_collisions") >= min_collisions)
    return docs.join(F.broadcast(bad.select(id_col)), id_col, "left_anti")


def paragraph_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
) -> DataFrame:
    """(id, deduped_text): duplicated paragraphs removed corpus-wide,
    keeping only the first occurrence in (id, position) order; documents
    reassembled with ``sep``, dropping documents left empty.

    Plan shape (see module docstring): explode -> groupBy(paragraph).agg(
    min(struct(id, pos))) -> broadcast-free inner join back on the full
    (paragraph, id, pos) key -> per-doc reassembly. No window over the
    paragraph key exists, so paragraph skew cannot concentrate a reducer.
    """
    paras = docs.select(
        F.col(id_col),
        F.posexplode(
            F.filter(F.split(F.col(text_col), sep), lambda p: p != "")
        ).alias("pos", "para"),
    )
    winners = paras.groupBy("para").agg(
        F.min(F.struct(id_col, "pos")).alias("w")
    ).select("para", F.col(f"w.{id_col}").alias(id_col), F.col("w.pos").alias("pos"))
    kept = paras.join(winners, ["para", id_col, "pos"], "left_semi")
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "para"))),
                    lambda s: s["para"],
                ),
                sep,
            ).alias("deduped_text")
        )
    )
