"""Small-star/large-star connected components tests."""

from __future__ import annotations

import pytest

from gsearch_spark.operators.cc import assign_clusters, connected_components


def _components(spark, edges, vertices=None):
    e = spark.createDataFrame(edges, "a string, b string")
    if vertices is None:
        comp = connected_components(e)
        return {r["image_id"]: r["cluster_id"] for r in comp.collect()}
    v = spark.createDataFrame([(x,) for x in vertices], "image_id string")
    comp = assign_clusters(e, v)
    return {r["image_id"]: r["cluster_id"] for r in comp.collect()}


def test_cc_single_edge(spark):
    got = _components(spark, [("b", "a")])
    assert got == {"a": "a", "b": "a"}


def test_cc_chain(spark):
    """A long chain is the worst case for naive propagation."""
    n = 64
    ids = [f"n{i:03d}" for i in range(n)]
    edges = [(ids[i], ids[i + 1]) for i in range(n - 1)]
    got = _components(spark, edges)
    assert set(got.values()) == {ids[0]}
    assert len(got) == n


def test_cc_two_components_and_singletons(spark):
    edges = [("a", "b"), ("b", "c"), ("x", "y")]
    vertices = ["a", "b", "c", "x", "y", "lonely"]
    got = _components(spark, edges, vertices)
    assert got["a"] == got["b"] == got["c"] == "a"
    assert got["x"] == got["y"] == "x"
    assert got["lonely"] == "lonely"


def test_cc_star_and_clique(spark):
    edges = [("h", f"m{i}") for i in range(20)]
    edges += [(f"c{i}", f"c{j}") for i in range(6) for j in range(i + 1, 6)]
    got = _components(spark, edges)
    assert all(got[f"m{i}"] == "c0" or got[f"m{i}"] == "h" for i in range(20))
    roots = {got[k] for k in got if k.startswith("m")} | {got["h"]}
    assert roots == {"h"}
    assert {got[f"c{i}"] for i in range(6)} == {"c0"}


def test_cc_deterministic_across_partitionings(spark):
    edges = [(f"v{i}", f"v{(i * 7) % 40}") for i in range(40)
             if i != (i * 7) % 40]
    e1 = spark.createDataFrame(edges, "a string, b string").repartition(2)
    e2 = spark.createDataFrame(list(reversed(edges)),
                               "a string, b string").repartition(13)
    c1 = {r["image_id"]: r["cluster_id"]
          for r in connected_components(e1).collect()}
    c2 = {r["image_id"]: r["cluster_id"]
          for r in connected_components(e2).collect()}
    assert c1 == c2


def test_union_find_matches_distributed(spark):
    """Driver-local union-find (the add path's contracted-graph fast
    path) labels components identically to the distributed star CC:
    min member, every edge endpoint covered."""
    import random

    from gsearch_spark.operators.cc import connected_components, union_find

    rng = random.Random(7)
    nodes = [f"n{i:03d}" for i in range(60)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(80)]
    edges = [(a, b) for a, b in edges if a != b]

    local = union_find(edges)
    df = spark.createDataFrame(edges, schema="a string, b string")
    dist = {r["image_id"]: r["cluster_id"]
            for r in connected_components(df).collect()}
    assert local == dist


def test_union_find_empty_and_chain():
    from gsearch_spark.operators.cc import union_find
    assert union_find([]) == {}
    chain = [(f"c{i}", f"c{i+1}") for i in range(50)]
    out = union_find(chain)
    assert set(out.values()) == {"c0"} and len(out) == 51


def test_union_find_property_random_graphs():
    """Property check (hypothesis): union_find labels every node by the
    minimum of its reachability class, for arbitrary small multigraphs
    with self-loops and duplicate edges."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from gsearch_spark.operators.cc import union_find

    node = st.integers(min_value=0, max_value=25)

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.tuples(node, node), max_size=80))
    def check(pairs):
        edges = [(f"n{a:02d}", f"n{b:02d}") for a, b in pairs if a != b]
        got = union_find(edges)
        # brute-force reachability closure over the same edges
        nodes = {x for e in edges for x in e}
        adj = {x: set() for x in nodes}
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        want = {}
        seen = set()
        for start in sorted(nodes):
            if start in seen:
                continue
            comp, stack = set(), [start]
            while stack:
                x = stack.pop()
                if x in comp:
                    continue
                comp.add(x)
                stack.extend(adj[x] - comp)
            lo = min(comp)
            for x in comp:
                want[x] = lo
            seen |= comp
        assert got == want

    check()
