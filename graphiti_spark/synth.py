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

_HEAD = (
    "<html><head><title>Doc</title><script>var t=1;</script>"
    "<style>.x{color:blue}</style></head><body>"
    "<nav><ul><li>Home</li><li>Index</li></ul></nav><div>"
)
_TAIL = "</div><footer>Generated corpus page.</footer></body></html>"

# Small closed vocab of SVO verbs injected deterministically (ensures the
# triple extractor has work to do at corpus scale).
_VERBS = ["likes", "owns", "hired", "acquired", "founded", "supports", "joined", "launched"]


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
    return (_HEAD + paras + _TAIL).encode("utf-8")


@F.pandas_udf(BinaryType())
def _build_html_udf(doc_id: pd.Series, text: pd.Series) -> pd.Series:
    return pd.Series(
        [_build_html(int(d), t if t is not None else "") for d, t in zip(doc_id, text)],
        dtype=object,
    )


def pages_from_documents(spark: SparkSession, sf_dir: str, replicate: int = 1) -> DataFrame:
    """Pages table from the driver-provided documents. ``replicate`` unions
    `replicate` deterministic variants (distinct doc_id offsets -> distinct
    urls, hosts, and html) — used by the scaling benchmark to build a
    compute-dominant corpus at the same small storage footprint."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
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
        docs = base.repartition(max(spark.sparkContext.defaultParallelism, replicate))
    return docs.select(
        F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"), F.col("doc_id")).alias("url"),
        (F.to_timestamp(F.lit("2024-01-01 00:00:00")) + F.make_interval(mins=F.col("doc_id") % 525600)).alias("warc_ts"),
        _build_html_udf(F.col("doc_id"), F.col("text")).alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.col("lang"),
    )
