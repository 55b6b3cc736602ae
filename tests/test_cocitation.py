"""Co-citation / bibliographic coupling (datapipe/webgraph.py): hand
fixtures, cap behavior, direction duality."""

from __future__ import annotations

import pytest

from graphiti_spark.datapipe.webgraph import cocitation_pairs, coupling_pairs


@pytest.fixture(scope="module")
def links(spark):
    # s1 and s2 both cite {x, y}; s3 cites {x, z}; hub h cites everything
    rows = [
        ("s1", "x"), ("s1", "y"),
        ("s2", "x"), ("s2", "y"),
        ("s3", "x"), ("s3", "z"),
        ("h", "x"), ("h", "y"), ("h", "z"), ("h", "w"),
        ("s1", "x"),  # duplicate edge collapses
    ]
    return spark.createDataFrame(rows, ["src_host", "dst_host"])


def test_cocitation_hand_checked(links):
    got = {
        (r["a"], r["b"]): (r["common"], r["cosine"])
        for r in cocitation_pairs(links, min_common=2).collect()
    }
    # x and y share sources {s1, s2, h} -> common 3; in-deg x=4, y=3
    c, cos = got[("x", "y")]
    assert c == 3
    assert cos == pytest.approx(3 / (4 * 3) ** 0.5)
    # x and z share {s3, h} -> common 2
    assert got[("x", "z")][0] == 2
    # y and z share only h -> below min_common
    assert ("y", "z") not in got


def test_coupling_hand_checked(links):
    got = {
        (r["a"], r["b"]): r["common"]
        for r in coupling_pairs(links, min_common=2).collect()
    }
    # s1 and s2 share out-links {x, y}; s1 and h share {x, y}; s2 and h too
    assert got[("s1", "s2")] == 2
    assert got[("h", "s1")] == 2
    assert got[("h", "s2")] == 2
    # s3 shares 2 with h ({x, z}) but only 1 with s1/s2
    assert got[("h", "s3")] == 2
    assert ("s1", "s3") not in got


def test_hub_cap_drops_pair_generation_only(links):
    # cap 3 drops hub h (out-deg 4) as a co-citation KEY: x-y common
    # falls to 2 (s1, s2) but in-degrees still count h
    got = {
        (r["a"], r["b"]): (r["common"], r["cosine"])
        for r in cocitation_pairs(links, df_cap=3, min_common=2).collect()
    }
    c, cos = got[("x", "y")]
    assert c == 2
    assert cos == pytest.approx(2 / (4 * 3) ** 0.5)
    assert ("x", "z") not in got  # s3's lone support is below min_common
