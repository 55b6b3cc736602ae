"""Benchmark runner — prints ONE JSON line.

Headline: the S1-S9 KG-construction pipeline end-to-end at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]; value = wall seconds, with triples/sec (the
BASELINE.json metric) alongside. Secondary queries time the other operator
families over the same corpus.

Scaling evidence (north rule: >=0.8 efficiency N -> 4N): run this twice,
  SPARK_GRAFT_CPUS=8 python bench.py
  SPARK_GRAFT_CPUS=32 python bench.py
and compare triples_per_sec (tools/scaling_bench.py automates it).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from graphiti_spark.session import get_spark
    from graphiti_spark.synth import pages_from_documents
    from graphiti_spark.plans.pipeline import run_pipeline

    spark = get_spark(
        app_name="graphiti_spark_bench",
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries: dict[str, float] = {}
    counts: dict[str, int] = {}
    cpu: dict[str, float] = {}

    # Whole-process-tree CPU (JVM + detached pyspark worker daemons) per
    # query, alongside wall — the VERDICT r3 #3 split: on a contended host
    # a query's wall inflates while its cpu stays put, so cpu/wall
    # attributes any delta to contention instead of leaving it ambiguous.
    from tools.scaling_bench import _tree_cpu_seconds

    def _cpu_now() -> float:
        return sum(_tree_cpu_seconds(os.getpid()).values())

    def timed(name: str, fn) -> None:
        if os.environ.get("SPARK_GRAFT_BENCH_TRACE"):
            print(f"[trace {time.strftime('%H:%M:%S')}] {name}", file=sys.stderr)
        c0 = _cpu_now()
        t0 = time.time()
        counts[name] = int(fn())
        queries[name] = round(time.time() - t0, 3)
        cpu[name] = round(_cpu_now() - c0, 2)

    # --- headline: full pipeline e2e (pages -> canonical bi-temporal graph) ---
    replicate = int(os.environ.get("SPARK_GRAFT_BENCH_REPLICATE", "1"))
    pages = pages_from_documents(spark, sf_dir, replicate=replicate)
    c0 = _cpu_now()
    t0 = time.time()
    out = run_pipeline(spark, pages)
    n_edges = out["edges"].count()
    n_nodes = out["nodes"].count()
    n_mentions = out["mentions"].count()
    pipeline_sec = time.time() - t0
    queries["kg_pipeline_e2e"] = round(pipeline_sec, 3)
    cpu["kg_pipeline_e2e"] = round(_cpu_now() - c0, 2)
    counts["kg_pipeline_e2e"] = n_edges

    if os.environ.get("SPARK_GRAFT_BENCH_PIPELINE_ONLY") == "1":
        payload = {
            "metric": "kg_pipeline_e2e_sec",
            "value": round(pipeline_sec, 3),
            "unit": "sec",
            "queries": queries,
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            "cpus": int(cpus),
            "rows": {"edges": n_edges, "nodes": n_nodes, "mentions": n_mentions},
            "triples_per_sec": round(n_edges / pipeline_sec, 2),
        }
        if os.environ.get("SPARK_GRAFT_BENCH_TIMINGS") == "1":
            payload["timings"] = {
                k: round(v, 2) for k, v in out["_ledger"].timings.items()
            }
        print(json.dumps(payload))
        return

    # --- operator families over the same corpus ---
    from pyspark.sql import functions as F

    # Release the pipeline's checkpointed outputs before timing the other
    # operator families: the full `out` dict pins a multi-GB live set in the
    # driver-side block store, and the resulting GC pressure was measured to
    # inflate every subsequent query 2.5-5x (minhash_lsh_pairs 12.6 s with
    # the handles live vs 3.6-6.9 s after release, same session, quiet host).
    # Only the 2-column edge list survives — it is all degree/pagerank need.
    # 4-column edge slice: the graph-consumer rows (rdf export, kg-embed
    # examples, walks) need uuid+name too; still a narrow frame.
    edges_named = (
        out["edges"]
        .select("uuid", "source_node_uuid", "target_node_uuid", "name")
        .localCheckpoint(eager=True)
    )
    nodes_slim = out["nodes"].select("uuid", "name").localCheckpoint(eager=True)
    # full-column slices for the neo4j-admin CSV export row (the exporter
    # serializes every importer field; rows are few, facts are short)
    nodes_csv = out["nodes"].select(
        "uuid", "name", "group_id", "mention_count"
    ).localCheckpoint(eager=True)
    edges_csv = out["edges"].select(
        "uuid", "source_node_uuid", "target_node_uuid", "name", "fact", "group_id"
    ).localCheckpoint(eager=True)
    edges = edges_named.select("source_node_uuid", "target_node_uuid")
    # 3-column mention slice survives alongside the edge list (entity_pmi
    # needs only these; the wide frames are what pin the heap)
    mentions_slim = (
        out["mentions"]
        .select("group_id", "episode_uuid", "entity_uuid")
        .localCheckpoint(eager=True)
    )
    out.clear()
    spark._jvm.System.gc()

    # Webtext-shaped corpus for the curation families (VERDICT r3 #1): the
    # raw driver docs are single-line and punctuation-free, so the C4 line
    # filter stripped every character (BENCH_r03 c4_quality rows=0) and
    # several Gopher keep-paths never fired. webtext_documents maps each
    # driver doc to a deterministic multi-line punctuated page with zipfian
    # boilerplate reuse, planted near-dups, and per-rule drop minorities —
    # every gate now measures real keep AND drop work.
    from graphiti_spark.synth import webtext_documents

    docs = webtext_documents(spark, sf_dir).persist()
    n_docs = docs.count()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").persist()
    emb.count()

    from graphiti_spark.datapipe.dedup import exact_dedup, minhash_lsh_pairs, simhash_pairs
    from graphiti_spark.datapipe.simsearch import brute_force_topk, lsh_bucketed_topk
    from graphiti_spark.datapipe.textanalysis import profile_documents
    from graphiti_spark.analytics.search import bm25_scores
    from graphiti_spark.analytics.centrality import degree_centrality, pagerank

    timed("exact_dedup", lambda: exact_dedup(docs).count())
    timed(
        "minhash_lsh_pairs",
        lambda: minhash_lsh_pairs(docs, jaccard_threshold=0.95, rows_per_band=2).count(),
    )
    timed("simhash_pairs", lambda: simhash_pairs(docs, max_hamming=3).count())
    timed("text_profile", lambda: profile_documents(docs).count())
    from graphiti_spark.datapipe.pii import mask_pii
    from graphiti_spark.datapipe.quality import gopher_quality_flags

    timed("gopher_quality", lambda: gopher_quality_flags(docs).count())
    from graphiti_spark.datapipe.quality import c4_clean_and_flags

    timed(
        "c4_quality",
        lambda: c4_clean_and_flags(docs).select(F.sum(F.length("clean_text"))).collect()[0][0],
    )
    from graphiti_spark.datapipe.lm_quality import lm_perplexity, train_backoff_lm

    timed(
        "lm_perplexity",
        lambda: lm_perplexity(docs, train_backoff_lm(docs.filter("lang = 'en'"))).count(),
    )
    timed(
        "lm_perplexity_tri",
        lambda: lm_perplexity(
            docs, train_backoff_lm(docs.filter("lang = 'en'"), order=3)
        ).count(),
    )
    # CCNet-fidelity order (Wenzek 2020 uses a 5-gram KenLM); min_count=2
    # is the KenLM-style count cutoff that Heaps-bounds the model tables
    timed(
        "lm_perplexity_5",
        lambda: lm_perplexity(
            docs, train_backoff_lm(docs.filter("lang = 'en'"), order=5, min_count=2)
        ).count(),
    )
    timed(
        "pii_mask",
        lambda: mask_pii(docs).select(F.sum(F.length("masked_text"))).collect()[0][0],
    )
    from graphiti_spark.datapipe.decontam import paragraph_dedup
    from graphiti_spark.datapipe.sampling import pack_sequences

    timed("pack_sequences", lambda: pack_sequences(docs).count())
    from graphiti_spark.datapipe.spandedup import repeated_span_dedup

    timed("span_dedup", lambda: repeated_span_dedup(docs, k=8).count())
    # the webtext corpus separates paragraphs with single '\n' — dedup on
    # that boundary (cross-doc boilerplate paragraphs are real repeats now)
    timed("paragraph_dedup", lambda: paragraph_dedup(docs, sep="\n").count())
    timed("bm25_search", lambda: bm25_scores(docs, "doc_id", "text", ["spark", "join", "filter"]).count())

    # round-4 curation additions over the same webtext corpus
    from graphiti_spark.datapipe.nb_classifier import (
        nb_classifier_scores,
        train_nb_classifier,
    )

    def _nb() -> int:
        seed = docs.filter(F.col("doc_id") % 2 == 0).withColumn(
            "label", F.col("lang") == "en"
        )
        model = train_nb_classifier(seed, min_df=2)
        return nb_classifier_scores(docs, model).filter("keep").count()

    timed("nb_quality", _nb)
    from graphiti_spark.datapipe.textanalysis import pmi_collocations, tfidf_keywords

    timed("pmi_collocations", lambda: pmi_collocations(docs, min_count=5).count())
    timed("tfidf_keywords", lambda: tfidf_keywords(docs, k=5, min_df=2).count())
    from graphiti_spark.datapipe.sampling import weighted_sample_k

    timed(
        "weighted_sample_k",
        lambda: weighted_sample_k(docs, k=100, weight_col="n_chars", strata_col="lang").count(),
    )

    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    timed("ann_brute_topk", lambda: brute_force_topk(emb, qvec, k=20).count())
    timed("ann_lsh_topk", lambda: lsh_bucketed_topk(emb, qvec, k=20).count())

    # IVF+PQ composed index (the FAISS IndexIVFPQ shape): both quantizer
    # trainings + the routed ADC search — the full cost a production ANN
    # pays per index build + query
    from graphiti_spark.datapipe.simsearch import (
        ivf_pq_topk,
        train_ivf_centroids,
        train_pq_codebooks,
    )

    def _ivf_pq() -> int:
        cents = train_ivf_centroids(emb, k=16, n_iter=2)
        books = train_pq_codebooks(emb, dim=64, m=4, ksub=8, n_iter=1)
        return ivf_pq_topk(emb, cents, books, qvec, k=20, n_probe=4).count()

    timed("ivf_pq_topk", _ivf_pq)

    # WARC corpus front door: serialize the pages corpus into CC-style
    # member-gzip shards once (not timed — a crawler writes these), then
    # time the ingest-side parse back to the pages table.
    from graphiti_spark.sources.warc import (
        pack_warc_files,
        parse_warc_files,
        to_warc_records,
    )

    warc_shards = pack_warc_files(
        to_warc_records(pages_from_documents(spark, sf_dir, replicate=replicate)),
        n_files=64,
        gzip_per_record=True,
    ).persist()
    warc_shards.count()
    timed(
        "warc_parse",
        lambda: parse_warc_files(warc_shards, gzip_per_record=True)
        .select(F.sum(F.length("url")))
        .collect()[0][0],
    )
    warc_shards.unpersist()

    # link graph over the same pages corpus (map-only harvest + host agg)
    from graphiti_spark.datapipe.webgraph import extract_links, host_link_stats

    links = extract_links(pages_from_documents(spark, sf_dir, replicate=replicate))
    timed("link_graph_host_stats", lambda: host_link_stats(links).count())

    from graphiti_spark.analytics.graph_metrics import modularity_by_community
    from graphiti_spark.datapipe.webgraph import anchor_text_stats

    timed(
        "anchor_text_stats",
        lambda: anchor_text_stats(pages_from_documents(spark, sf_dir, replicate=replicate)).count(),
    )

    def _modularity() -> int:
        he = links.select(F.col("src_host").alias("src"), F.col("dst_host").alias("dst"))
        nodes = he.select(F.col("src").alias("host")).unionAll(
            he.select(F.col("dst").alias("host"))
        ).distinct()
        asg = nodes.select(
            F.col("host").alias("uuid"),
            F.element_at(F.split("host", r"\."), -1).alias("community"),
        )
        return modularity_by_community(he, asg).count()

    timed("host_tld_modularity", _modularity)

    # structured-data harvest over the webtext corpus (head-planted JSON-LD
    # islands, og meta, rel=canonical syndication blocks): map-only
    # regexp+from_json for the triples; ONE hash agg for the dedup.
    from graphiti_spark.operators.structured_data import (
        canonical_dedup,
        jsonld_blocks,
        jsonld_entities,
        jsonld_triples,
    )
    from graphiti_spark.synth import webtext_pages as _wt_pages

    wt = _wt_pages(spark, sf_dir).persist()
    wt.count()
    timed(
        "jsonld_triples",
        lambda: jsonld_triples(jsonld_entities(jsonld_blocks(wt))).count(),
    )
    timed("canonical_dedup", lambda: canonical_dedup(wt).count())
    wt.unpersist()

    # SemDeDup over the embedding corpus (k-means + within-cell pairs + CC)
    from graphiti_spark.datapipe.dedup import semantic_dedup

    timed(
        "semdedup",
        lambda: semantic_dedup(emb, k=8, threshold=0.92).filter("is_kept").count(),
    )

    # entity-level PMI association edges over the canonical mentions
    from graphiti_spark.analytics.graph_metrics import entity_cooccurrence_pmi

    timed("entity_pmi", lambda: entity_cooccurrence_pmi(mentions_slim).count())

    # robots.txt gate: one synthetic wildcard policy per host, applied with
    # one host equi-join + one max-struct agg over the full pages corpus
    from graphiti_spark.datapipe.robots import apply_robots, robots_rules

    def _robots() -> int:
        pg = pages_from_documents(spark, sf_dir, replicate=replicate)
        hosts = pg.select(
            F.regexp_extract("url", r"^https?://([^/?#]+)", 1).alias("host")
        ).distinct()
        robots = hosts.withColumn(
            "robots_txt",
            F.concat(
                F.lit("User-agent: *\nDisallow: /doc/"),
                (F.crc32("host") % 10).cast("string"),
            ),
        )
        return (
            apply_robots(pg, robots_rules(robots)).filter("robots_allowed").count()
        )

    timed("robots_gate", _robots)

    timed("degree_centrality", lambda: degree_centrality(edges).count())
    timed("kg_pagerank10", lambda: pagerank(edges, iterations=10).count())

    # triangle counting on the part co-purchase graph (~1.1M undirected
    # edges, avg degree ~90 at sf0.1) — the degree-ordered node-iterator's
    # wedge bound is what this times
    from graphiti_spark.analytics.graph_metrics import triangle_counts

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    co = (
        li.select("l_orderkey", F.col("l_partkey").alias("pa"))
        .join(li.select("l_orderkey", F.col("l_partkey").alias("pb")), "l_orderkey")
        .filter(F.col("pa") < F.col("pb"))
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
    )
    timed("triangle_counts", lambda: triangle_counts(co).count())

    # SCC + bow-tie on a scaled fixture graph (B=400 -> 6,000 nodes, ~27k
    # edges, same condensation-DAG depth as the web shape): what this times
    # is the coloring algorithm's loop structure — outer rounds = SCC-DAG
    # chain length (4 here), inner iterations = peeled-subgraph diameter —
    # NOT graph size, which only widens the per-iteration algebraic aggs.
    from graphiti_spark.analytics.graph_metrics import bowtie_classification
    from graphiti_spark.synth import bowtie_fixture_edges

    timed(
        "scc_bowtie",
        lambda: bowtie_classification(bowtie_fixture_edges(spark, blocks=400)).count(),
    )

    # --- graph consumers over the canonical KG (round-4 additions) ---
    from graphiti_spark.analytics.graph_metrics import k_truss_delta
    from graphiti_spark.analytics.walks import random_walks
    from graphiti_spark.datapipe.kg_embed import kg_embedding_examples
    from graphiti_spark.operators.quotes import extract_quotes
    from graphiti_spark.sinks.rdf import edges_to_ntriples

    timed("rdf_ntriples", lambda: edges_to_ntriples(edges_named, nodes_slim).count())
    timed(
        "kg_embed_examples",
        lambda: kg_embedding_examples(edges_named, n_negatives=2).count(),
    )
    timed("graph_walks", lambda: random_walks(edges_named, walk_len=3).count())
    # k-truss over the same co-purchase graph triangle_counts measures.
    # Round 5: DELTA peeling (triangles enumerated once, support maintained
    # by decrement) — row-identical to the per-round-recompute k_truss
    # (tests/test_ktruss.py parity), which benched 27.9 s in r4.
    timed("k_truss", lambda: k_truss_delta(co, k=4, max_iter=5).count())
    # quote attribution over a quote-bearing corpus built from the webtext
    # pages (the raw corpus has no reported speech; the MATCH paths must
    # fire for the row to measure real keep work, per VERDICT r3 #1)
    quote_docs = docs.select(
        "doc_id",
        F.concat(
            F.lit('"'),
            F.substring("text", 1, 80),
            F.lit(' and so on," said Ana Bell. Tom Reed wrote: "'),
            F.substring("text", 50, 90),
            F.lit(' extra tail words."'),
        ).alias("text"),
    )
    timed("quote_attribution", lambda: extract_quotes(quote_docs).count())

    # --- round-4 late additions: taxonomy/coref/containment/sketch/export
    # families. Hearst and coref need their templates planted (webtext has
    # no taxonomic enumerations or pronouns — same rule as quote_docs: the
    # match path must fire for the row to measure keep work).
    from graphiti_spark.operators.coref import resolve_pronouns
    from graphiti_spark.operators.hearst import extract_hypernyms
    from graphiti_spark.datapipe.dedup import containment_pairs
    from graphiti_spark.datapipe.sketches import cms_heavy_hitters
    from graphiti_spark.analytics.walks import node2vec_walks
    from graphiti_spark.sinks.neo4j_csv import graph_to_neo4j_csv

    hearst_docs = docs.select(
        "doc_id",
        F.concat(
            F.substring("text", 1, 400),
            F.lit(" and tools such as Spark Core, Flink and Trino matter. "),
            F.substring("text", 200, 300),
            F.lit(" Presto and other engines help."),
        ).alias("text"),
    )
    timed("hearst_hypernyms", lambda: extract_hypernyms(hearst_docs).count())
    coref_docs = docs.select(
        "doc_id",
        F.concat(
            F.substring("text", 1, 500),
            F.lit(" Ana Bell joined. She later led it and they followed her."),
        ).alias("text"),
    )
    timed("coref_pronouns", lambda: resolve_pronouns(coref_docs).count())
    # containment over the raw webtext corpus: the zipfian paragraph reuse
    # and planted near-dups give real asymmetric-subset hits
    timed(
        "containment_pairs",
        lambda: containment_pairs(docs, threshold=0.8).count(),
    )
    # token heavy hitters: CMS over the full exploded token stream (the
    # hot-vocabulary detector) — est>=threshold candidates exactly recounted
    tok_stream = docs.select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    # threshold scales with corpus size so the hitter set stays the zipf
    # head (~dozens of stopword-class tokens) at every SF
    timed(
        "cms_token_hitters",
        lambda: cms_heavy_hitters(
            tok_stream, "tok", threshold=2 * n_docs, depth=4, width=4096
        ).count(),
    )
    timed(
        "node2vec_walks", lambda: node2vec_walks(edges_named, walk_len=3).count()
    )
    timed(
        "neo4j_csv_rows",
        lambda: graph_to_neo4j_csv(nodes_csv, edges_csv).count(),
    )

    # --- incremental ingest: a 10% delta batch against a 90% pre-built graph
    # (plans/incremental.py). The timed number is the DELTA cost — the
    # add_episode-flow metric a live deployment cares about; the bootstrap is
    # untimed setup. Cost tracks the delta + its AFFECTED NEIGHBORHOOD, not
    # the corpus. Round 4: the delta runs over webtext_pages (long-tail
    # entity vocabulary) instead of the adversarial ~31-token corpus whose
    # 10% batches touched ~every canonical cluster; the per-phase timings
    # land in the payload so the neighborhood scoping is visible.
    import shutil
    import tempfile

    from graphiti_spark.plans.incremental import run_pipeline_incremental
    from graphiti_spark.synth import webtext_pages

    # A live ingest job is its own Spark application, not a tail query of an
    # analytics session — run it in a fresh session. (Measured: after the
    # ~1000 stages above, the delta batch reads 110-138 s in-session vs
    # 39-41 s in a fresh context — accumulated block-manager/heap state, not
    # work; handle unpersists alone do not recover it.) The session swap is
    # clean since session_pandas_udf (session.py): module-level UDFs rebind
    # to the new context instead of shipping accumulator updates to the old
    # session's dead server — the BENCH_r03 stack-trace root cause.
    docs.unpersist()
    emb.unpersist()
    if os.environ.get("SPARK_GRAFT_BENCH_TRACE"):
        print(f"[trace {time.strftime('%H:%M:%S')}] session_swap", file=sys.stderr)
    spark.stop()
    spark = get_spark(
        app_name="graphiti_spark_bench_incremental",
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    pages = webtext_pages(spark, sf_dir)

    state = tempfile.mkdtemp(prefix="bench_inc_")
    if os.environ.get("SPARK_GRAFT_BENCH_TRACE"):
        print(f"[trace {time.strftime('%H:%M:%S')}] bootstrap", file=sys.stderr)
    run_pipeline_incremental(spark, pages.filter(F.crc32("url") % 10 != 0), state)
    # one bootstrap serves BOTH delta legs: copy the committed state dir so
    # the second leg starts from an identical pre-built graph
    state_fresh = tempfile.mkdtemp(prefix="bench_inc_fresh_")
    shutil.rmtree(state_fresh)
    shutil.copytree(state, state_fresh)
    inc_result: dict = {}

    def _run_delta() -> int:
        inc_result.update(
            run_pipeline_incremental(spark, pages.filter(F.crc32("url") % 10 == 0), state)
        )
        return inc_result["edges_upserted"]

    timed("kg_incremental_delta", _run_delta)
    shutil.rmtree(state, ignore_errors=True)

    # Realistic-delta variant (VERDICT r4 #4): the same 10% of new urls,
    # but the batch carries its OWN tail-entity vocabulary (zipf head
    # shared, rank > 100 pool-tagged — synth.webtext_pages(pool=...)), the
    # shape a real crawl delta has. The adversarial leg above shares the
    # full 50k vocabulary, so its 10% batch touches ~70% of clusters; this
    # leg demonstrates the cost model (∝ delta + affected neighborhood):
    # affected_clusters collapses to ~the shared head and the delta wall
    # should sit well under the full-rebuild wall.
    inc_fresh: dict = {}

    def _run_delta_fresh() -> int:
        fresh_pages = webtext_pages(spark, sf_dir, pool="fresh")
        inc_fresh.update(
            run_pipeline_incremental(
                spark, fresh_pages.filter(F.crc32("url") % 10 == 0), state_fresh
            )
        )
        return inc_fresh["edges_upserted"]

    timed("kg_incremental_delta_fresh", _run_delta_fresh)
    shutil.rmtree(state_fresh, ignore_errors=True)

    # Corpus fingerprint (VERDICT r4 "wrong #1"): generator version = md5 of
    # synth.py at run time + per-family row counts. Rounds whose corpus_id
    # differs measured DIFFERENT WORK — never read their deltas as
    # code regressions.
    import hashlib

    synth_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "graphiti_spark", "synth.py"
    )
    with open(synth_path, "rb") as fh:
        synth_md5 = hashlib.md5(fh.read()).hexdigest()[:12]

    result = {
        "metric": "kg_pipeline_e2e_sec",
        "value": round(pipeline_sec, 3),
        "unit": "sec",
        "corpus": {
            "corpus_id": synth_md5,
            "generator": "graphiti_spark/synth.py md5[:12]",
            "n_docs": n_docs,
            "comparability": "rows comparable across rounds only when corpus_id matches",
        },
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": int(cpus),
        "rows": {
            "edges": n_edges,
            "nodes": n_nodes,
            "mentions": n_mentions,
            **{k: v for k, v in counts.items() if k != "kg_pipeline_e2e"},
        },
        "cpu_sec": cpu,
        "incremental_timings": inc_result.get("timings", {}),
        "incremental_fresh_timings": inc_fresh.get("timings", {}),
        "incremental_fresh_stats": {
            k: inc_fresh[k]
            for k in (
                "new_episodes",
                "changed_entities",
                "affected_clusters",
                "affected_existing_clusters",
                "rebuilt_edge_partitions",
                "nodes_upserted",
                "edges_upserted",
            )
            if k in inc_fresh
        },
        # neighborhood-scoping evidence: delta cost should track these, not
        # the corpus (changed_entities/affected_clusters vs total graph size)
        "incremental_stats": {
            k: inc_result[k]
            for k in (
                "new_episodes",
                "changed_entities",
                "affected_clusters",
                "affected_existing_clusters",
                "rebuilt_edge_partitions",
                "nodes_upserted",
                "edges_upserted",
            )
            if k in inc_result
        },
        "triples_per_sec": round(n_edges / pipeline_sec, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
