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


def embedding_decontam(
    corpus_embeddings: DataFrame,
    eval_embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    eval_id_col: str = "eval_id",
    use_gemm: bool = False,
) -> DataFrame:
    """Embedding-space eval-set decontamination: for every corpus document,
    the maximum cosine similarity against ANY eval-set embedding, the
    nearest eval id, and a ``contaminated`` flag at ``threshold``. The
    semantic complement to `ngram_decontaminate`: n-gram overlap misses
    paraphrased eval items; embedding similarity catches them (the
    Llama-3 / phi-family decontamination recipe).

    Returns (id, max_cos rounded 6dp, nearest_eval_id, contaminated).
    Nearest-id ties (identical raw cosine) break to the LOWER eval id.

    Scale shape at 100 TB: eval sets are small by construction (10^3-10^5
    rows) — the eval side always BROADCASTS; the corpus side is map-only
    (broadcast nested-loop + per-doc aggregate — no shuffle of the corpus,
    no exchange at all after the scan). Two execution paths, same contract:

      - default: one codegen'd expression per (doc, eval) pair via
        ``cosine_col`` — exact, oracle-restatable in SQL;
      - ``use_gemm=True``: Arrow-batched pandas UDF doing one float64
        matrix multiply per batch against the collected eval matrix —
        the 10-100x-faster path when |eval| is large; identical up to
        float-summation association (tested against the exact path).
    """
    if use_gemm:
        return _embedding_decontam_gemm(
            corpus_embeddings, eval_embeddings, threshold, id_col, vec_col, eval_id_col
        )
    ev = eval_embeddings.select(
        F.col(eval_id_col).alias("_eid"), F.col(vec_col).alias("_ev")
    )
    from graphiti_spark.functions.embeddings import cosine_col

    pairs = corpus_embeddings.select(id_col, vec_col).crossJoin(F.broadcast(ev))
    scored = pairs.select(
        F.col(id_col),
        F.struct(
            cosine_col(F.col(vec_col), F.col("_ev")).alias("cos"),
            (-F.col("_eid").cast("long")).alias("neg_eid"),
        ).alias("s"),
    )
    best = scored.groupBy(id_col).agg(F.max("s").alias("b"))
    return best.select(
        id_col,
        F.round(F.col("b.cos"), 6).alias("max_cos"),
        (-F.col("b.neg_eid")).alias("nearest_eval_id"),
        (F.col("b.cos") >= threshold).alias("contaminated"),
    )


def _embedding_decontam_gemm(
    corpus_embeddings: DataFrame,
    eval_embeddings: DataFrame,
    threshold: float,
    id_col: str,
    vec_col: str,
    eval_id_col: str,
) -> DataFrame:
    """GEMM path: eval matrix (sorted by id — argmax first-hit == min id)
    collected once, shipped in the UDF closure; per Arrow batch one
    C @ E.T in float64. Zero-norm rows score 0.0 (cosine_col contract)."""
    from typing import Iterator

    import numpy as np
    import pandas as pd

    rows = eval_embeddings.select(eval_id_col, vec_col).sort(eval_id_col).collect()
    eids = np.array([int(r[0]) for r in rows], dtype=np.int64)
    emat = np.array([list(r[1]) for r in rows], dtype=np.float64)
    enorm = np.linalg.norm(emat, axis=1)
    enorm[enorm == 0] = np.inf  # zero-norm eval vectors score 0 vs everything

    def _score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cmat = np.array(list(pdf[vec_col]), dtype=np.float64)
            cnorm = np.linalg.norm(cmat, axis=1)
            cnorm[cnorm == 0] = np.inf
            sims = (cmat @ emat.T) / np.outer(cnorm, enorm)
            hit = np.argmax(sims, axis=1)  # first max -> lowest eval id
            mx = sims[np.arange(len(cmat)), hit]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "max_cos": np.round(mx, 6),
                    "nearest_eval_id": eids[hit],
                    "contaminated": mx >= threshold,
                }
            )

    out_schema = (
        f"{id_col} {dict(corpus_embeddings.select(id_col).dtypes)[id_col]}, "
        "max_cos double, nearest_eval_id long, contaminated boolean"
    )
    return corpus_embeddings.select(id_col, vec_col).mapInPandas(_score, out_schema)
