"""Hand-computed cases for analytics/graph_metrics.py (triangles/LCC, HITS,
Adamic-Adar, harmonic centrality). Every expectation below is derived in the
comments, never from engine output."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from graphiti_spark.analytics.graph_metrics import (
    adamic_adar,
    harmonic_centrality,
    hits,
    triangle_counts,
    undirected_edges,
)


def _edges(spark, pairs):
    return spark.createDataFrame([(a, b) for a, b in pairs], "src string, dst string")


def test_undirected_edges_canonicalizes(spark):
    # duplicates in both orientations + a self-loop collapse to 2 edges
    e = _edges(spark, [("b", "a"), ("a", "b"), ("a", "a"), ("b", "c"), ("c", "b")])
    got = sorted(tuple(r) for r in undirected_edges(e).collect())
    assert got == [("a", "b"), ("b", "c")]


def test_triangle_counts_hand_case(spark):
    # Graph: a-b, b-c, a-c, c-d, d-e, e-c, a-d.
    # Degrees: a=3 (b,c,d), b=2, c=4 (a,b,d,e), d=3 (c,e,a), e=2.
    # Triangles: {a,b,c}, {a,c,d}, {c,d,e}  -> per-node a=2, b=1, c=3, d=2, e=1.
    # LCC: a: 2*2/(3*2)=0.666667; b: 2*1/2=1.0; c: 2*3/(4*3)=0.5;
    #      d: 0.666667; e: 1.0.
    e = _edges(
        spark,
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e"), ("e", "c"), ("a", "d")],
    )
    rows = {r["uuid"]: r for r in triangle_counts(e).collect()}
    assert {u: r["triangles"] for u, r in rows.items()} == {
        "a": 2, "b": 1, "c": 3, "d": 2, "e": 1,
    }
    assert rows["a"]["lcc"] == pytest.approx(0.666667)
    assert rows["b"]["lcc"] == pytest.approx(1.0)
    assert rows["c"]["lcc"] == pytest.approx(0.5)
    assert rows["e"]["lcc"] == pytest.approx(1.0)


def test_triangle_counts_triangle_free_graph_all_zero(spark):
    # a star has no triangles; hub degree 3, spokes degree 1 (lcc 0 by the
    # degree<2 rule)
    e = _edges(spark, [("h", "x"), ("h", "y"), ("h", "z")])
    rows = {r["uuid"]: r for r in triangle_counts(e).collect()}
    assert all(r["triangles"] == 0 for r in rows.values())
    assert rows["h"]["lcc"] == 0.0 and rows["x"]["lcc"] == 0.0


def test_hits_hand_case_two_iterations(spark):
    # Edges a->c, b->c, c->d (n=4, L1 norm, 6dp per half-step).
    # hub0 = 0.25 each.
    # it1: auth raw c=0.5, d=0.25, total 0.75 -> auth c=0.666667, d=0.333333.
    #      hub raw a=b=0.666667, c=0.333333, total 1.666667
    #      -> hub a=b=0.4, c=0.2, d=0.
    # it2: auth raw c=0.8, d=0.2 -> auth c=0.8, d=0.2.
    #      hub raw a=b=0.8, c=0.2, total 1.8 -> hub a=b=0.444444, c=0.111111.
    e = _edges(spark, [("a", "c"), ("b", "c"), ("c", "d")])
    rows = {r["uuid"]: r for r in hits(e, n_iter=2).collect()}
    assert rows["a"]["hub"] == pytest.approx(0.444444)
    assert rows["b"]["hub"] == pytest.approx(0.444444)
    assert rows["c"]["hub"] == pytest.approx(0.111111)
    assert rows["d"]["hub"] == 0.0
    assert rows["c"]["authority"] == pytest.approx(0.8)
    assert rows["d"]["authority"] == pytest.approx(0.2)
    assert rows["a"]["authority"] == 0.0


def test_hits_l1_normalized(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")])
    out = hits(e, n_iter=10).collect()
    assert sum(r["hub"] for r in out) == pytest.approx(1.0, abs=1e-4)
    assert sum(r["authority"] for r in out) == pytest.approx(1.0, abs=1e-4)


def test_adamic_adar_hand_case(spark):
    # Edges: a-z, b-z, a-y, b-y, b-c.
    # Degrees: z=2, y=2, a=2, b=3, c=1.
    # Wedges by intermediate: z:{a,b} and y:{a,b} -> (a,b) twice;
    # a:{z,y} -> (y,z); b:{z,y,c} -> (y,z), (c,y), (c,z); c: deg 1, none.
    # So (a,b) = 2/ln2 = 2.885390; (y,z) = 1/ln2 + 1/ln3 = 2.352934;
    # (c,y) = (c,z) = 1/ln3 = 0.910239. All four are non-adjacent.
    e = _edges(spark, [("a", "z"), ("b", "z"), ("a", "y"), ("b", "y"), ("b", "c")])
    got = {(r["uuid_a"], r["uuid_b"]): r["score"] for r in adamic_adar(e).collect()}
    assert got[("a", "b")] == pytest.approx(round(2 / math.log(2), 6))
    assert got[("y", "z")] == pytest.approx(round(1 / math.log(2) + 1 / math.log(3), 6))
    assert got[("c", "y")] == pytest.approx(round(1 / math.log(3), 6))
    assert set(got) == {("a", "b"), ("y", "z"), ("c", "y"), ("c", "z")}


def test_adamic_adar_deg_cap_drops_hub_intermediate(spark):
    # same graph, cap 2: b (deg 3) is no longer an intermediate ->
    # (y,z) falls to 1/ln2 via a alone; the (·,c) pairs vanish.
    e = _edges(spark, [("a", "z"), ("b", "z"), ("a", "y"), ("b", "y"), ("b", "c")])
    got = {(r["uuid_a"], r["uuid_b"]): r["score"] for r in adamic_adar(e, deg_cap=2).collect()}
    assert set(got) == {("a", "b"), ("y", "z")}
    assert got[("y", "z")] == pytest.approx(round(1 / math.log(2), 6))


def test_adamic_adar_top_k_deterministic_cut(spark):
    e = _edges(spark, [("a", "z"), ("b", "z"), ("a", "y"), ("b", "y"), ("b", "c")])
    got = [(r["uuid_a"], r["uuid_b"]) for r in adamic_adar(e, top_k=2).collect()]
    # (a,b)=2.885390 then (y,z)=2.352934
    assert got == [("a", "b"), ("y", "z")]


def test_harmonic_centrality_path_graph(spark):
    # path a-b-c (undirected, all 3 nodes sampled, m=3):
    # h(a) = (1/1 + 1/2)/2 = 0.75, h(b) = (1+1)/2 = 1.0, h(c) = 0.75
    e = _edges(spark, [("a", "b"), ("b", "c")])
    rows = {r["uuid"]: r["harmonic"] for r in harmonic_centrality(e).collect()}
    assert rows == {"a": 0.75, "b": 1.0, "c": 0.75}


def test_harmonic_centrality_disconnected_contributes_zero(spark):
    # two components: a-b and c-d. For a: only b reachable -> 1/(m-1) = 1/3.
    e = _edges(spark, [("a", "b"), ("c", "d")])
    rows = {r["uuid"]: r["harmonic"] for r in harmonic_centrality(e).collect()}
    assert rows["a"] == pytest.approx(round(1 / 3, 6))
    assert rows["c"] == pytest.approx(round(1 / 3, 6))


def test_harmonic_centrality_directed(spark):
    # directed chain a->b->c: only forward distances count.
    # sources = all 3. credit(b): from a at d=1 -> 1.0/2 = 0.5
    # credit(c): from b at 1, from a at 2 -> (1 + 0.5)/2 = 0.75; credit(a)=0
    e = _edges(spark, [("a", "b"), ("b", "c")])
    rows = {r["uuid"]: r["harmonic"] for r in harmonic_centrality(e, directed=True).collect()}
    assert rows == {"a": 0.0, "b": 0.5, "c": 0.75}


def test_k_core_pendant_peeled_triangle_survives(spark):
    # triangle a-b-c with pendant d on a: k=2 peels d in one round; the
    # triangle survives with core degree 2 everywhere.
    from graphiti_spark.analytics.graph_metrics import k_core

    e = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c"), ("a", "d")])
    got = {r["uuid"]: r["core_degree"] for r in k_core(e, k=2).collect()}
    assert got == {"a": 2, "b": 2, "c": 2}


def test_k_core_chain_cascades_to_empty(spark):
    # path a-b-c-d under k=2: endpoints peel, then the remainder cascades
    # (round 1 drops a,d; round 2 drops b,c) -> empty core.
    from graphiti_spark.analytics.graph_metrics import k_core

    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert k_core(e, k=2).count() == 0


def test_k_core_k1_keeps_every_non_isolated_node(spark):
    from graphiti_spark.analytics.graph_metrics import k_core

    e = _edges(spark, [("a", "b"), ("c", "d")])
    got = {r["uuid"]: r["core_degree"] for r in k_core(e, k=1).collect()}
    assert got == {"a": 1, "b": 1, "c": 1, "d": 1}


def test_personalized_pagerank_hand_case(spark):
    # edges s->a, a->s, a->x (x dangling), seeds=[s], d=0.85.
    # r0: s=1. it1: s=0.15, a=0.85, x=0.
    # it2: s=0.15+0.85*0.425=0.51125, a=0.85*0.15=0.1275, x=0.36125.
    # it3: dangling x mass (0.36125) teleports to s:
    #   s = 0.15 + 0.85*(0.06375 + 0.36125) = 0.51125
    #   a = 0.85*0.51125 = 0.4345625, x = 0.85*0.06375 = 0.0541875.
    from graphiti_spark.analytics.centrality import personalized_pagerank

    e = spark.createDataFrame(
        [("s", "a"), ("a", "s"), ("a", "x")],
        "source_node_uuid string, target_node_uuid string",
    )
    got = {
        r["uuid"]: r["ppr"]
        for r in personalized_pagerank(e, ["s"], iterations=3).collect()
    }
    assert got["s"] == pytest.approx(0.51125)
    assert got["a"] == pytest.approx(0.4345625)
    assert got["x"] == pytest.approx(0.0541875)
    assert sum(got.values()) == pytest.approx(1.0)  # mass conserved


def test_personalized_pagerank_requires_seeds(spark):
    from graphiti_spark.analytics.centrality import personalized_pagerank

    e = spark.createDataFrame(
        [("s", "a")], "source_node_uuid string, target_node_uuid string"
    )
    with pytest.raises(ValueError):
        personalized_pagerank(e, [])


def test_link_prediction_hand_case(spark):
    """Square with one diagonal: edges (1,2),(1,3),(2,3),(2,4),(3,4).
    Γ(1)={2,3} Γ(2)={1,3,4} Γ(3)={1,2,4} Γ(4)={2,3}. The only non-adjacent
    pair with a wedge is (1,4), through z=2 and z=3 (both deg 3):
      cn=2, aa=2/ln(3), ra=2/3, jaccard=2/(2+2-2)=1.0, pa=2*2=4."""
    import math

    from graphiti_spark.analytics.graph_metrics import link_prediction

    e = spark.createDataFrame(
        [("1", "2"), ("1", "3"), ("2", "3"), ("2", "4"), ("3", "4")],
        "src string, dst string",
    )
    rows = link_prediction(e).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["uuid_a"], r["uuid_b"]) == ("1", "4")
    assert r["common_neighbors"] == 2
    assert r["adamic_adar"] == pytest.approx(round(2 / math.log(3), 6), abs=1e-9)
    assert r["resource_allocation"] == pytest.approx(0.666667, abs=1e-9)
    assert r["jaccard"] == pytest.approx(1.0)
    assert r["preferential_attachment"] == 4


def test_link_prediction_deg_cap_drops_hub_wedges(spark):
    from graphiti_spark.analytics.graph_metrics import link_prediction

    e = spark.createDataFrame(
        [("1", "2"), ("1", "3"), ("2", "3"), ("2", "4"), ("3", "4")],
        "src string, dst string",
    )
    # cap=2 removes both deg-3 intermediates -> no wedge survives
    assert link_prediction(e, deg_cap=2).count() == 0


def test_modularity_two_triangles_hand_computed(spark):
    """Two triangles bridged by one edge, communities = the triangles:
    m=7, internal 3+3, degree sums 7+7 ->
    each contribution = 3/7 - (7/14)^2 = 0.178571, Q = 0.357143."""
    from graphiti_spark.analytics.graph_metrics import (
        modularity,
        modularity_by_community,
    )

    e = spark.createDataFrame(
        [("1", "2"), ("2", "3"), ("3", "1"), ("4", "5"), ("5", "6"), ("6", "4"), ("3", "4"),
         ("4", "3")],  # reverse orientation collapses into the same edge
        "src string, dst string",
    )
    asg = spark.createDataFrame(
        [(str(i), "A" if i <= 3 else "B") for i in range(1, 7)],
        "uuid string, community string",
    )
    rows = {r["community"]: r for r in modularity_by_community(e, asg).collect()}
    for c in ("A", "B"):
        assert rows[c]["n_nodes"] == 3
        assert rows[c]["internal_edges"] == 3
        assert rows[c]["degree_sum"] == 7
        assert rows[c]["contribution"] == pytest.approx(3 / 7 - 0.25, abs=1e-6)
    assert modularity(e, asg) == pytest.approx(2 * (3 / 7 - 0.25), abs=1e-5)


def test_modularity_unassigned_nodes_grouped_null(spark):
    from graphiti_spark.analytics.graph_metrics import modularity_by_community

    e = spark.createDataFrame(
        [("1", "2"), ("2", "3"), ("3", "1"), ("3", "7")], "src string, dst string"
    )
    asg = spark.createDataFrame(
        [(str(i), "A") for i in range(1, 4)], "uuid string, community string"
    )
    rows = {r["community"]: r for r in modularity_by_community(e, asg).collect()}
    # m=4; A: internal 3, degrees 2+2+3=7; NULL: node 7 deg 1, edge 3-7 is cross
    assert rows["A"]["internal_edges"] == 3 and rows["A"]["degree_sum"] == 7
    assert rows[None]["n_nodes"] == 1
    assert rows[None]["internal_edges"] == 0
    assert rows[None]["degree_sum"] == 1
    assert rows[None]["contribution"] == pytest.approx(-((1 / 8) ** 2), abs=1e-6)


# --- SCC + bow-tie (hand-computed fixtures) ---------------------------------


def _dir_edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_scc_two_components_and_bridge(spark):
    from graphiti_spark.analytics.graph_metrics import strongly_connected_components

    e = _dir_edges(
        spark,
        [("a", "b"), ("b", "c"), ("c", "a"),  # SCC {a,b,c} -> id c
         ("c", "d"),                            # bridge (one-way)
         ("d", "e"), ("e", "d")],               # SCC {d,e} -> id e
    )
    got = {r["uuid"]: r["scc_id"] for r in strongly_connected_components(e).collect()}
    assert got == {"a": "c", "b": "c", "c": "c", "d": "e", "e": "e"}


def test_scc_pure_dag_is_all_singletons(spark):
    from graphiti_spark.analytics.graph_metrics import strongly_connected_components

    e = _dir_edges(spark, [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")])
    got = {r["uuid"]: r["scc_id"] for r in strongly_connected_components(e).collect()}
    assert got == {x: x for x in "abcd"}


def test_scc_empty_and_self_loop_only(spark):
    from graphiti_spark.analytics.graph_metrics import strongly_connected_components

    e = _dir_edges(spark, []).filter("1=0")
    assert strongly_connected_components(e).count() == 0


def test_bowtie_classification_hand_fixture(spark):
    from graphiti_spark.analytics.graph_metrics import bowtie_classification

    e = _dir_edges(
        spark,
        [
            ("m", "n"), ("n", "o"), ("o", "m"),  # core (largest SCC, size 3)
            ("i", "m"),                             # IN
            ("h", "i"),                             # IN (two hops)
            ("o", "p"),                             # OUT
            ("p", "q"),                             # OUT (two hops)
            ("i", "t"),                             # tendril off IN -> OTHER
            ("x", "y"), ("y", "x"),                # disconnected 2-SCC -> OTHER
        ],
    )
    got = {r["uuid"]: r["component"] for r in bowtie_classification(e).collect()}
    assert got == {
        "m": "CORE", "n": "CORE", "o": "CORE",
        "i": "IN", "h": "IN",
        "p": "OUT", "q": "OUT",
        "t": "OTHER", "x": "OTHER", "y": "OTHER",
    }


def test_bowtie_fixture_expected_split(spark):
    """The parameterized fixture graph decomposes exactly as designed:
    4B CORE / 4B IN / 4B OUT / 3B OTHER at B=15."""
    from graphiti_spark.analytics.graph_metrics import bowtie_classification
    from graphiti_spark.synth import bowtie_fixture_edges

    got = {
        r["component"]: r["count"]
        for r in bowtie_classification(bowtie_fixture_edges(spark, blocks=15))
        .groupBy("component")
        .count()
        .collect()
    }
    assert got == {"CORE": 60, "IN": 60, "OUT": 60, "OTHER": 45}


def test_entity_cooccurrence_pmi_hand_computed(spark):
    """4 episodes, entities A/B/C: c_A=3, c_B=3, c_C=1, A-B co-occur
    twice -> pmi = ln(2*4/9); A-C once (filtered at min_count=2, present
    with pmi = ln(4/3) at min_count=1)."""
    import math

    from graphiti_spark.analytics.graph_metrics import entity_cooccurrence_pmi

    mentions = spark.createDataFrame(
        [
            ("g", "e1", "A"), ("g", "e1", "B"),
            ("g", "e2", "A"), ("g", "e2", "B"),
            ("g", "e3", "A"), ("g", "e3", "C"),
            ("g", "e4", "B"),
            # duplicate mention of the same entity in one episode must not
            # double-count
            ("g", "e1", "A"),
        ],
        "group_id string, episode_uuid string, entity_uuid string",
    )
    got = {(r["uuid_a"], r["uuid_b"]): r for r in entity_cooccurrence_pmi(mentions).collect()}
    assert set(got) == {("A", "B")}
    assert got[("A", "B")]["c_ab"] == 2
    assert got[("A", "B")]["pmi"] == round(math.log(2 * 4 / 9), 6)

    all_pairs = {
        (r["uuid_a"], r["uuid_b"]): r["pmi"]
        for r in entity_cooccurrence_pmi(mentions, min_count=1).collect()
    }
    assert all_pairs[("A", "C")] == round(math.log(4 / 3), 6)

    # episode cap drops a boilerplate episode entirely
    capped = entity_cooccurrence_pmi(mentions, min_count=1, episode_cap=1)
    assert capped.count() == 0


def test_bowtie_full_taxonomy_fixture_split(spark):
    """tubes=True + full_taxonomy: the OTHER class splits exactly into
    TENDRIL_IN (the IN-attached chains), TUBE (core bypass), TENDRIL_OUT
    (points into OUT), DISCONNECTED (isolated pairs) at B=15."""
    from graphiti_spark.analytics.graph_metrics import bowtie_classification
    from graphiti_spark.synth import bowtie_fixture_edges

    got = {
        r["component"]: r["count"]
        for r in bowtie_classification(
            bowtie_fixture_edges(spark, blocks=15, tubes=True), full_taxonomy=True
        )
        .groupBy("component")
        .count()
        .collect()
    }
    assert got == {
        "CORE": 60,
        "IN": 60,
        "OUT": 60,
        "TENDRIL_IN": 45,
        "TUBE": 15,
        "TENDRIL_OUT": 15,
        "DISCONNECTED": 16,
    }
