"""Persisted-postings candidate generation ≡ inline recompute.

operators/postings.py replaces the incremental ingest's per-batch
re-tokenize/re-minhash of the ENTIRE entity catalog with a persisted
blocking-key postings table and a broadcast semi-join lookup. Its contract
is exact equivalence: over correctly maintained postings state,
``candidate_pairs_from_postings`` returns EXACTLY the pairs of
``plans.incremental._incremental_candidate_pairs`` — including under
representative-name drift (entity_catalog's min-(episode_uuid, name) rule
can change an entity's name_norm when later mentions arrive; stale
postings rows must be invalidated at read time), A->B->A name flips
(identical live row sets from two batches must not double-count toward
the df cap), and within-name token multiplicity (the inline blocker's df
counts exploded rows, so 'new_york_new_haven' contributes 2 to the 'new'
bucket — ``pos`` preserves that across the cross-batch dedup).
"""

from __future__ import annotations

import dataclasses

import pytest
from pyspark.sql import functions as F

from graphiti_spark.config import DEFAULT_CONFIG
from graphiti_spark.operators.postings import (
    candidate_pairs_from_postings,
    entity_postings,
)
from graphiti_spark.plans.incremental import _incremental_candidate_pairs

_CAT_COLS = ["group_id", "entity_uuid", "name_norm"]


def _catalog(spark, rows):
    return spark.createDataFrame(rows, _CAT_COLS)


def _pairs(df):
    return {
        (r["group_id"], r["uuid_a"], r["uuid_b"])
        for r in df.select("group_id", "uuid_a", "uuid_b").collect()
    }


def _run_both(spark, batches, config=DEFAULT_CONFIG):
    """Replay ``batches`` (list of {entity_uuid: (group_id, name_norm)})
    through BOTH paths exactly as plans/incremental.py maintains them, and
    assert pair-set equality after every increment. Returns the final sets.

    Batch 0 bootstraps: postings for the full catalog. Batch k>0: catalog
    rows for touched entities overwrite/extend the catalog; postings for
    the touched rows are APPENDED (stale rows for renamed entities stay in
    the table, as on disk).
    """
    catalog = dict(batches[0])  # entity_uuid -> (group_id, name_norm)
    cat_df = _catalog(spark, [(g, u, n) for u, (g, n) in sorted(catalog.items())])
    postings = entity_postings(cat_df, config).localCheckpoint()
    out = None
    for batch in batches[1:]:
        catalog.update(batch)
        entities_all = _catalog(
            spark, [(g, u, n) for u, (g, n) in sorted(catalog.items())]
        ).localCheckpoint()
        touched = _catalog(
            spark, [(g, u, n) for u, (g, n) in sorted(batch.items())]
        )
        new_ids = touched.select("group_id", "entity_uuid")
        post_touched = entity_postings(touched, config).localCheckpoint()
        postings = postings.unionByName(post_touched).localCheckpoint()
        from_postings = candidate_pairs_from_postings(
            postings, entities_all, post_touched, new_ids, config
        )
        inline = _incremental_candidate_pairs(entities_all, new_ids, config)
        got, want = _pairs(from_postings), _pairs(inline)
        assert got == want, (
            f"postings path diverged from inline recompute: "
            f"extra={sorted(got - want)} missing={sorted(want - got)}"
        )
        out = got
    return out


def test_postings_equivalence_basic(spark):
    """Token + MinHash-band blockers fire across batches; old×old pairs are
    never emitted; pairs touching a new entity match the inline recompute."""
    b0 = {
        "e1": ("g1", "acme_corp"),
        "e2": ("g1", "acme_incorporated"),
        "e3": ("g1", "bluebird_labs"),
        "e4": ("g2", "acme_corp"),  # other group: must never pair with g1
    }
    b1 = {
        "e5": ("g1", "acme_holdings"),   # token 'acme' hits e1+e2
        "e6": ("g1", "bluebird_lab"),    # near-dup of e3 (band blocker)
        "e7": ("g2", "acme_corp_gmbh"),  # pairs only within g2
    }
    got = _run_both(spark, [b0, b1])
    assert ("g1", "e1", "e5") in got and ("g1", "e2", "e5") in got
    assert ("g1", "e3", "e6") in got
    # old×old never re-emitted; no cross-group pairs
    assert ("g1", "e1", "e2") not in got
    assert not {p for p in got if {p[1], p[2]} == {"e1", "e4"}}


def test_postings_name_drift_invalidated_at_read_time(spark):
    """A later batch changes e1's representative name; its batch-0 postings
    rows ('acme' token, old bands) are stale and must NOT generate pairs —
    the read-time (entity_uuid, name_sig) validation drops them."""
    b0 = {
        "e1": ("g1", "acme_corp"),
        "e2": ("g1", "zeppo_media"),
    }
    # e1 drifts to a name sharing nothing with 'acme'; e3 arrives matching
    # the OLD name — must not pair (inline recompute only sees current names)
    b1 = {
        "e1": ("g1", "aardvark_systems"),
        "e3": ("g1", "acme_corp"),
        "e4": ("g1", "aardvark_labs"),
    }
    got = _run_both(spark, [b0, b1])
    assert ("g1", "e1", "e4") in got  # current-name token 'aardvark'
    assert ("g1", "e1", "e3") not in got  # stale 'acme' postings are dead


def test_postings_flip_back_does_not_double_count_df(spark):
    """e1 flips A->B->A across three batches: the postings table then holds
    two identical live row sets for e1. With a df cap that the bucket sits
    exactly AT, double-counting would drop the bucket; the dedup keeps it."""
    cfg = dataclasses.replace(DEFAULT_CONFIG, blocking_token_max_df=3)
    b0 = {
        "e1": ("g1", "acme_corp"),
        "e2": ("g1", "acme_media"),
        "e3": ("g1", "acme_labs"),  # 'acme' df = 3 == cap
    }
    b1 = {"e1": ("g1", "bluebird_corp")}
    b2 = {"e1": ("g1", "acme_corp")}  # flip back: batch-0 rows live again
    got = _run_both(spark, [b0, b1, b2], cfg)
    assert ("g1", "e1", "e2") in got and ("g1", "e1", "e3") in got


def test_postings_within_name_multiplicity_matches_inline_df(spark):
    """'new_york_new_haven' contributes 2 exploded rows to the 'new' bucket
    in the inline blocker; with cap=3 the bucket (2 entities, df=3) must
    survive in BOTH paths — equivalence fails if pos is dropped."""
    # token blocker isolated (no MinHash bands) so the band blocker can't
    # also produce the pair and mask a df mismatch
    cfg = dataclasses.replace(
        DEFAULT_CONFIG, blocking_token_max_df=3, lsh_num_hash_tables=0
    )
    b0 = {"e1": ("g1", "new_york_new_haven")}
    b1 = {"e2": ("g1", "new_jersey")}
    got = _run_both(spark, [b0, b1], cfg)
    assert ("g1", "e1", "e2") in got
    # and with cap=2 the same bucket (df=3) is dropped by BOTH paths
    cfg2 = dataclasses.replace(cfg, blocking_token_max_df=2)
    got2 = _run_both(spark, [b0, b1], cfg2)
    assert not {p for p in got2 if {p[1], p[2]} == {"e1", "e2"}}


@pytest.mark.parametrize("kind", ["tok", "band"])
def test_entity_postings_key_population_matches_inline(spark, kind):
    """entity_postings emits exactly the (entity, key) population the inline
    blocker explodes — same token length filter, same NULL-band drop."""
    cat = _catalog(
        spark,
        [
            ("g1", "e1", "acme_corp"),
            ("g1", "e2", "a_b"),      # 1-char tokens filtered
            ("g1", "e3", ""),         # empty name: no tokens; the padded
            # '^$' gram still yields bands — same as the inline blocker
        ],
    )
    post = entity_postings(cat, DEFAULT_CONFIG).filter(F.col("kind") == kind)
    rows = post.collect()
    if kind == "tok":
        keys = {(r["entity_uuid"], r["key"]) for r in rows}
        assert keys == {("e1", "acme"), ("e1", "corp")}
    else:
        # 8 bands per entity, non-null keys, band index carried in pos
        by_ent = {}
        for r in rows:
            by_ent.setdefault(r["entity_uuid"], []).append(r)
        assert set(by_ent) == {"e1", "e2", "e3"}
        for ent, rs in by_ent.items():
            assert len(rs) == DEFAULT_CONFIG.lsh_num_hash_tables
            assert sorted(r["pos"] for r in rs) == list(
                range(DEFAULT_CONFIG.lsh_num_hash_tables)
            )
