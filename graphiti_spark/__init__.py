"""graphiti_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch reimplementation of the query/data-processing capabilities of
oculairmedia/graphiti (a temporal-knowledge-graph library) as a batch Spark DAG:

    pages (url, warc_ts, html, text, lang)
      -> S1 extract_text   (deterministic boilerplate stripping, Arrow UDF)
      -> S2 episodes       (EpisodicNode rows, deterministic uuid5)
      -> S3 mentions       (vectorized NER -> entity mentions)
      -> S4 triples        (pattern-based (subj, pred, obj) extraction)
      -> S5 er_candidates  (exact / token-blocking / MinHash-LSH similarity join)
      -> S6 canonicalize   (large-star/small-star connected components)
      -> S7 edge merge     (pointer remap + property-merge aggregation)
      -> S8 invalidate     (bi-temporal contradiction window)
      -> S9 materialize    (partitioned tables + lineage, checkpoint/resume)

Everything is DataFrame-first: Catalyst plans the physical execution, Python
appears only inside Arrow-batched pandas UDFs (extraction, NER, uuid5).

Reference semantics are cited per-function as ``/root/reference/<file>:<line>``.
"""

__version__ = "0.1.0"
