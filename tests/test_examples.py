"""The examples/ scripts run end-to-end at sf0.001 and their funnels are
sane (each curation stage keeps a nonzero, non-increasing survivor set; the
WARC->KG path reproduces the direct pipeline's counts exactly)."""

from __future__ import annotations

import os
import runpy
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


def _load(name):
    path = os.path.join(REPO, "examples", name)
    ns = runpy.run_path(path)
    return ns["main"]


def test_curate_corpus_example(spark, tmp_path):
    out = str(tmp_path / "shards")
    funnel = _load("curate_corpus.py")(SF, out)
    assert funnel["input"] > 0
    assert (
        funnel["input"]
        >= funnel["rule_gates"]
        >= funnel["lm_gate"]
        >= funnel["dedup"]
        >= funnel["decontam"]
        > 0
    )
    assert funnel["shards"] == 8
    # shards actually landed, partitioned by shard
    parts = [d for d in os.listdir(out) if d.startswith("shard=")]
    assert len(parts) == 8


def test_warc_to_kg_example(spark, tmp_path):
    wd = str(tmp_path / "wk")
    counts = _load("warc_to_kg.py")(SF, wd)
    # Identical to the direct pipeline at sf0.001 (tests/test_pipeline.py /
    # the verify recipe): WARC round-trip must not change a single row.
    assert counts == {
        "episodes": 500,
        "nodes": 6969,
        "edges": 9136,
        "mentions": 16511,
    }
