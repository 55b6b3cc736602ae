"""End-to-end corpus curation: the public-pipeline recipe (C4/Gopher gates ->
LM perplexity tercile -> fuzzy dedup -> eval decontamination -> shard export)
composed from graphiti_spark.datapipe operators.

Run:  python examples/curate_corpus.py [sf_dir] [out_dir]
Defaults: /root/testdata/sf0.001 -> /tmp/curated_shards

Every stage is a DataFrame transform — one lazy plan per phase, nothing
collected to the driver; at cluster scale only `n_shards` and the session
master change (see tools/submit_job.py for the spark-submit form).
"""

from __future__ import annotations

import sys


def main(sf_dir: str, out_dir: str) -> dict:
    from pyspark.sql import functions as F

    from graphiti_spark.datapipe.decontam import embedding_decontam, ngram_decontaminate
    from graphiti_spark.datapipe.dedup import keep_canonical, minhash_lsh_pairs
    from graphiti_spark.datapipe.lm_quality import (
        lm_perplexity,
        ppl_buckets,
        train_backoff_lm,
    )
    from graphiti_spark.datapipe.quality import c4_clean_and_flags, gopher_quality_flags
    from graphiti_spark.datapipe.shards import write_training_shards
    from graphiti_spark.session import get_spark
    from graphiti_spark.synth import webtext_documents

    spark = get_spark(app_name="curate_corpus")
    spark.sparkContext.setLogLevel("ERROR")
    docs = webtext_documents(spark, sf_dir)
    n0 = docs.count()

    # 1. Rule gates: C4 line cleaning + page gate, then Gopher composite.
    cleaned = (
        c4_clean_and_flags(docs)
        .filter("c4_kept")
        .select(F.col("id").alias("doc_id"), F.col("clean_text").alias("text"))
        .join(docs.select("doc_id", "lang"), "doc_id")
    )
    gated = cleaned.join(
        gopher_quality_flags(cleaned).filter("keep").select("doc_id"), "doc_id"
    )
    n1 = gated.count()

    # 2. Model gate: train the backoff LM on the gated English corpus and
    #    drop the worst-perplexity tercile (CCNet's head/middle split).
    lm = train_backoff_lm(gated.filter("lang = 'en'"), order=3)
    scored = ppl_buckets(lm_perplexity(gated, lm)).filter("bucket != 'tail'")
    survivors = gated.join(scored.select(F.col("id").alias("doc_id")), "doc_id")
    n2 = survivors.count()

    # 3. Fuzzy dedup: MinHash-LSH pairs -> connected components -> canonical.
    pairs = minhash_lsh_pairs(survivors, jaccard_threshold=0.9, rows_per_band=2)
    kept = keep_canonical(survivors, pairs).filter("is_kept")  # doc_id as string
    deduped = survivors.join(
        kept, survivors["doc_id"].cast("string") == kept["doc_id"], "left_semi"
    )
    n3 = deduped.count()

    # 4. Eval decontamination: the GPT-3 13-gram rule against a held-out
    #    slice standing in for the eval set. (The webtext corpus reuses
    #    paragraphs zipfian-style, so shorter n-grams collide everywhere —
    #    at n=13 only genuinely shared spans fire, same as production.)
    evalset = docs.filter(F.col("doc_id") % 97 == 0)
    clean = ngram_decontaminate(deduped, evalset, n=13, min_collisions=1)
    n4 = clean.count()

    # 5. Deterministic shard export + manifest.
    manifest = write_training_shards(clean, out_dir, n_shards=8)
    funnel = {"input": n0, "rule_gates": n1, "lm_gate": n2, "dedup": n3, "decontam": n4,
              "shards": manifest.count()}
    print(funnel)
    return funnel


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated_shards"
    main(sf, out)
