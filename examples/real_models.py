"""Wire REAL learned models through the library's injection seams — the
executable companion to README "Plugging in real models".

Two seams, both proven against their documented contracts when the model
libraries are installed (and cleanly reported as unavailable when not):

1. **ER embedding gate** (`operators/er.make_score_pair_udf(embed_fn=...)`):
   a sentence-transformer replaces the built-in hashed-3-gram name
   embedding inside the Arrow batch. Contract (er.py docstring): pure
   batch callable ``list[str] -> (n, d) float ndarray`` with L2-normalized
   rows, loaded lazily once per worker.
2. **Cross-encoder rerank** (`analytics/search.cross_encoder_rerank
   (scorer=...)`): a CrossEncoder scores (query, passage) pairs through a
   Pandas UDF — the reference's cross_encoder/client.py analog
   (/root/reference/graphiti_core/cross_encoder/client.py).

Run:  python examples/real_models.py [sf_dir]
Needs `pip install sentence-transformers` (not available in the build
sandbox — the script exits with a clear message; tests/
test_real_models_example.py skips the same way).
"""

from __future__ import annotations

import sys


def build_sentence_transformer_embed_fn(
    model_name: str = "sentence-transformers/all-MiniLM-L6-v2",
):
    """An `embed_fn` for make_score_pair_udf backed by a real
    sentence-transformer, satisfying the seam's contract:
      - batch callable list[str] -> (n, d) ndarray;
      - rows L2-normalized (the scorer computes cosine as a plain dot);
      - pure (fixed model revision; no sampling) so retried/resumed tasks
        reproduce identical vectors;
      - lazy singleton per worker process (the load happens at first
        batch, not at closure-capture time on the driver).
    """
    state: dict = {}

    def embed_fn(names: list[str]):
        if "model" not in state:
            from sentence_transformers import SentenceTransformer

            state["model"] = SentenceTransformer(model_name)
        return state["model"].encode(
            list(names),
            normalize_embeddings=True,  # unit rows: the contract
            convert_to_numpy=True,
            show_progress_bar=False,
        )

    return embed_fn


def build_cross_encoder_scorer(
    model_name: str = "cross-encoder/ms-marco-MiniLM-L-6-v2",
):
    """A `(text Column, query str) -> score Column` scorer for
    cross_encoder_rerank, backed by a real CrossEncoder through an
    Arrow-batched Pandas UDF (one model.predict per batch, never per
    row). Lazy per-worker model load, same discipline as embed_fn."""
    import pandas as pd
    from pyspark.sql import functions as F

    state: dict = {}

    @F.pandas_udf("double")
    def ce_udf(passage: pd.Series, query: pd.Series) -> pd.Series:
        if "model" not in state:
            from sentence_transformers import CrossEncoder

            state["model"] = CrossEncoder(model_name)
        pairs = [(q, p if p is not None else "") for q, p in zip(query, passage)]
        return pd.Series([float(s) for s in state["model"].predict(pairs)])

    return lambda text_col, query: ce_udf(text_col, F.lit(query))


def main(sf_dir: str) -> dict:
    try:
        import sentence_transformers  # noqa: F401
    except ImportError:
        print(
            "sentence-transformers not installed — this example wires real "
            "models through the ER embed_fn and cross-encoder seams; "
            "`pip install sentence-transformers` and rerun."
        )
        return {}

    from pyspark.sql import functions as F

    from graphiti_spark.analytics.search import bm25_scores, cross_encoder_rerank
    from graphiti_spark.operators.er import make_score_pair_udf
    from graphiti_spark.plans.pipeline import run_pipeline
    from graphiti_spark.session import get_spark
    from graphiti_spark.synth import pages_from_documents

    spark = get_spark(app_name="real_models_example")
    spark.sparkContext.setLogLevel("ERROR")

    # -- seam 1: the KG pipeline with a real encoder behind the ER gate ----
    pages = pages_from_documents(spark, sf_dir)
    out = run_pipeline(
        spark,
        pages,
        embed_fn=build_sentence_transformer_embed_fn(),
        embed_tag="all-MiniLM-L6-v2",
    )
    n_nodes = out["nodes"].count()
    n_edges = out["edges"].count()

    # the same seam standalone: score a handful of name pairs and show
    # the model-driven cosine replacing the hashed-ngram one
    scorer = make_score_pair_udf(embed_fn=build_sentence_transformer_embed_fn())
    pairs = spark.createDataFrame(
        [("apache spark", "apache spark core"), ("apache spark", "postgres")],
        ["norm_a", "norm_b"],
    )
    scored = pairs.select(
        "norm_a", "norm_b", scorer("norm_a", "norm_b").alias("s")
    ).select("norm_a", "norm_b", "s.cosine", "s.fuzzy").collect()

    # -- seam 2: retrieval with a real cross-encoder rerank ----------------
    docs = out["edges"].select(
        F.col("uuid").alias("doc_id"), F.col("fact").alias("text")
    )
    query = "who supports stream systems"
    base = bm25_scores(docs, "doc_id", "text", query.split()).limit(50)
    reranked = cross_encoder_rerank(
        base, docs, "doc_id", "text", query, scorer=build_cross_encoder_scorer()
    )
    top = reranked.limit(5).collect()

    result = {
        "nodes": n_nodes,
        "edges": n_edges,
        "pair_cosines": {(r["norm_a"], r["norm_b"]): r["cosine"] for r in scored},
        "top_reranked": [(r["doc_id"], round(r["ce_score"], 4)) for r in top],
    }
    print(result)
    return result


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
