"""connected_components (operators/graph.py): correctness against a
pure-Python union-find reference, worst-case topology, and contract
details (string ids, determinism, singleton exclusion)."""

import random

import pytest
from pyspark.sql import functions as F


def _union_find_labels(edges):
    """Reference: component = min node id, via path-compressed DSU."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    return {n: find(n) for n in parent}


def _cc(spark, edges, **kw):
    from gus_spark.operators.graph import connected_components

    df = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(df, **kw)
    return dict(out.collect())


@pytest.mark.parametrize("seed,n,m", [(1, 60, 40), (2, 80, 120), (3, 40, 10)])
def test_cc_matches_union_find_on_random_graphs(spark, seed, n, m):
    rng = random.Random(seed)
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(m)
    ]
    got = _cc(spark, edges)
    # self-loops carry no connectivity and are ignored entirely
    want = _union_find_labels([(a, b) for a, b in edges if a != b])
    assert got == want


def test_cc_chain_worst_case_diameter(spark):
    """A 64-node path is the adversarial case for label-propagation
    (diameter 63); star-contraction must still converge in O(log n)
    rounds — max_iter=12 would fail a linear-round algorithm."""
    edges = [(i, i + 1) for i in range(63)]
    got = _cc(spark, edges, max_iter=12)
    assert got == {i: 0 for i in range(64)}


def test_cc_two_components_and_determinism(spark):
    edges = [(5, 9), (9, 7), (20, 30), (30, 25), (25, 20)]
    got1 = _cc(spark, edges)
    got2 = _cc(spark, edges)
    assert got1 == {5: 5, 9: 5, 7: 5, 20: 20, 30: 20, 25: 20}
    assert got1 == got2


def test_cc_string_ids(spark):
    from gus_spark.operators.graph import connected_components

    df = spark.createDataFrame(
        [("b", "c"), ("c", "a"), ("x", "y")], "src string, dst string"
    )
    out = dict(connected_components(df, src="src", dst="dst").collect())
    assert out == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_cc_empty_and_self_loop_only(spark):
    from gus_spark.operators.graph import connected_components

    empty = spark.createDataFrame([], "src long, dst long")
    assert connected_components(empty).count() == 0
    # a self-loop conveys no connectivity: ignored, node not emitted
    loops = spark.createDataFrame([(4, 4)], "src long, dst long")
    assert connected_components(loops).count() == 0


def test_dedup_clusters_partitions_the_corpus(spark):
    """Every document appears exactly once; keep-rows = one per
    cluster; sizes sum back to the corpus."""
    from tests.conftest import SF_DIR
    from gus_spark.queries import catalog

    df = catalog()["dedup_clusters"].fn(spark, SF_DIR)
    rows = df.collect()
    docs = [r.doc_id for r in rows]
    assert len(docs) == len(set(docs))
    reps = {r.cluster_rep for r in rows}
    keeps = [r for r in rows if r.keep]
    assert {r.doc_id for r in keeps} == reps
    # each row's rep is <= its doc_id and sizes are consistent
    by_rep = {}
    for r in rows:
        assert r.cluster_rep <= r.doc_id
        by_rep.setdefault(r.cluster_rep, []).append(r)
    for rep, members in by_rep.items():
        assert {m.cluster_size for m in members} == {len(members)}
