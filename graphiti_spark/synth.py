"""Deterministic synthetic pages at scale, derived from the driver-provided
``documents.parquet`` (TESTDATA.md) — no external data, seeded by content.

``pages_from_documents`` maps each document row to the input_hint schema
(url, warc_ts, html, text, lang): the html wraps a deterministic
capitalization of the document's own words in boilerplate chrome, so the
full S1-S9 pipeline (boilerplate stripping, NER, triples, ER, CC) runs at
realistic density. Everything is a pure function of (doc_id, text) —
identical output at any parallelism, which is what makes the two-cluster-size
scaling benchmark an apples-to-apples comparison.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType
from graphiti_spark.session import plan_width, session_pandas_udf

_HEAD = (
    "<html><head><title>Doc</title><script>var t=1;</script>"
    "<style>.x{color:blue}</style></head><body>"
    "<nav><ul><li>Home</li><li>Index</li></ul>"
)
_NAV_CLOSE = "</nav><div>"
_TAIL = "</div><footer>Generated corpus page.</footer></body></html>"

# Small closed vocab of SVO verbs injected deterministically (ensures the
# triple extractor has work to do at corpus scale).
_VERBS = ["likes", "owns", "hired", "acquired", "founded", "supports", "joined", "launched"]


def _build_links(doc_id: int) -> str:
    """Deterministic related-links block, emitted INSIDE the stripped <nav>
    so extracted text is unchanged — the link graph (datapipe/webgraph.py)
    is harvested from html, never from text. Shape mirrors the real web:
    one link to a closed set of hub hosts (hot in-degree — the skew case
    host_graph's map-side combine must absorb) and 2-4 root-relative links
    to earlier doc ids (preferential attachment; targets may not exist
    in-corpus — dangling links are normal), plus one non-resolvable href
    (fragment) the extractor must drop. Pure function of doc_id."""
    h = int(hashlib.md5(f"{doc_id}:links".encode()).hexdigest()[:8], 16)
    items = [f'<li><a href="https://hub{h % 4}.example.net/">Hub</a></li>']
    for j in range(2 + h % 3):
        t = int(hashlib.md5(f"{doc_id}:l{j}".encode()).hexdigest()[:8], 16)
        items.append(f'<li><a href="/doc/{t % max(doc_id, 1)}">rel</a></li>')
    items.append('<li><a href="#top">top</a></li>')
    return '<ul class="rel">' + "".join(items) + "</ul>"


def _build_html(doc_id: int, text: str) -> bytes:
    """Pure function of (doc_id, text): entity-cased sentences + boilerplate."""
    words = (text or "").split()
    if not words:
        words = ["empty", "page"]
    sents: list[str] = []
    i = 0
    k = 0
    while i + 3 <= len(words):
        w1, w2, w3 = words[i], words[i + 1], words[i + 2]
        h = int(hashlib.md5(f"{doc_id}:{k}".encode()).hexdigest()[:8], 16)
        verb = _VERBS[h % len(_VERBS)]
        # Entity names derived from the doc's own words; suffix disambiguates
        # across verbs so ER has realistic shared-token blocking pressure.
        subj = f"{w1.capitalize()} {w2.capitalize()}"
        obj = f"{w3.capitalize()} Systems" if h % 3 == 0 else w3.capitalize()
        sents.append(f"{subj} {verb} {obj}.")
        i += 3
        k += 1
    paras = "".join(f"<p>{s}</p>" for s in sents)
    return (_HEAD + _build_links(doc_id) + _NAV_CLOSE + paras + _TAIL).encode("utf-8")


@session_pandas_udf(BinaryType())
def _build_html_udf(doc_id: pd.Series, text: pd.Series) -> pd.Series:
    return pd.Series(
        [_build_html(int(d), t if t is not None else "") for d, t in zip(doc_id, text)],
        dtype=object,
    )


def _cap_pair(words: list[str], i: int) -> str:
    return f"{words[i % len(words)].capitalize()} {words[(i + 1) % len(words)].capitalize()}"


def _build_message(doc_id: int, text: str) -> str:
    """Deterministic 'Speaker: utterance' transcript from the doc's words
    (EpisodeType.message contract, reference nodes.py:55-65)."""
    words = [w for w in (text or "").split() if w.isalpha()] or ["empty", "chat"]
    h = int(hashlib.md5(f"m{doc_id}".encode()).hexdigest()[:8], 16)
    alice = _cap_pair(words, h % len(words))
    bob = _cap_pair(words, (h + 3) % len(words))
    org = f"{words[(h + 5) % len(words)].capitalize()} Systems"
    city = words[(h + 7) % len(words)].capitalize()
    verb = _VERBS[h % len(_VERBS)]
    return "\n".join(
        [
            f"{alice}: I joined {org} in 2021.",
            f"{bob}: {alice} {verb} {city}.",
            f"{alice}: We visited {city} last year.",
        ]
    )


def _build_json(doc_id: int, text: str) -> str:
    """Deterministic JSON document (EpisodeType.json contract, nodes.py:66-68)."""
    import json

    words = [w for w in (text or "").split() if w.isalpha()] or ["empty", "record"]
    h = int(hashlib.md5(f"j{doc_id}".encode()).hexdigest()[:8], 16)
    name = _cap_pair(words, h % len(words))
    employer = f"{words[(h + 2) % len(words)].capitalize()} Systems"
    city = words[(h + 4) % len(words)].capitalize()
    return json.dumps(
        {
            "name": name,
            "employer": employer,
            "location": city,
            "since": "2020-01-01",
            "followers": h % 1000,
            "projects": [{"title": f"{city} Initiative", "status": "active"}],
        },
        sort_keys=True,
    )


def typed_pages_from_documents(
    spark: SparkSession, sf_dir: str, source_type: str = "message", limit: int | None = None
) -> DataFrame:
    """Message- or json-source pages derived from the documents table —
    deterministic fixtures for the EpisodeType dispatch path. The `source`
    column rides through episodes_stage into the per-row extractor dispatch."""
    builder = _build_message if source_type == "message" else _build_json

    @F.pandas_udf("string")
    def _content_udf(doc_id: pd.Series, text: pd.Series) -> pd.Series:
        return pd.Series(
            [builder(int(d), t if t is not None else "") for d, t in zip(doc_id, text)]
        )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if limit:
        docs = docs.filter(F.col("doc_id") < limit)
    # Same scan-width guard as pages_from_documents: widen BELOW the
    # content-building UDF so it doesn't run on one core for 1-split inputs.
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(plan_width(spark), "doc_id")
    return docs.select(
        F.concat(
            F.lit("https://chat."), F.col("source"), F.lit(".example.com/"), F.lit(source_type),
            F.lit("/"), F.col("doc_id"),
        ).alias("url"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(mins=F.col("doc_id") % 525600)
        ).alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        _content_udf(F.col("doc_id"), F.col("text")).alias("text"),
        F.col("lang"),
        F.lit(source_type).alias("source"),
        F.lit(f"synthetic {source_type} corpus").alias("source_description"),
    )


def pages_from_documents(spark: SparkSession, sf_dir: str, replicate: int = 1) -> DataFrame:
    """Pages table from the driver-provided documents. ``replicate`` unions
    `replicate` deterministic variants (distinct doc_id offsets -> distinct
    urls, hosts, and html) — used by the scaling benchmark to build a
    compute-dominant corpus at the same small storage footprint."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # Width guard at the SCAN (before the html-build UDF projection — an
    # exchange added above the projection would still run the UDF narrow):
    # small sf dirs are a single parquet split, which would build html on one
    # core at any parallelism. No-op when the scan already has >= cores splits.
    par = spark.sparkContext.defaultParallelism
    if replicate <= 1 and docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(plan_width(spark), "doc_id")
    if replicate > 1:
        variants = [
            docs.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                F.col("text"),
                F.col("lang"),
                F.concat(F.col("source"), F.lit(f"r{i}")).alias("source"),
            )
            for i in range(replicate)
        ]
        base = variants[0]
        for v in variants[1:]:
            base = base.unionByName(v)
        # plan_width partitions (1 wave/core by default): the downstream
        # Arrow-UDF map stages inherit this partitioning; synthetic docs are
        # uniform, so extra waves would only add per-task fixed overhead.
        docs = base.repartition(max(plan_width(spark), replicate))
    return docs.select(
        F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"), F.col("doc_id")).alias("url"),
        (F.to_timestamp(F.lit("2024-01-01 00:00:00")) + F.make_interval(mins=F.col("doc_id") % 525600)).alias("warc_ts"),
        _build_html_udf(F.col("doc_id"), F.col("text")).alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.col("lang"),
    )
