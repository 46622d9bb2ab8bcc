"""Property-based differential fuzz for connected components and the
duplicate-cluster survivor policy (operators/components.py): random edge
lists — self-loops, duplicate and reversed-duplicate edges, chains, stars,
whatever hypothesis shrinks to — must label exactly like a driver-side
union-find, and the scored survivor choice must match a brute-force
max-by-(score, -node) over each cluster."""

from hypothesis import given, settings
from hypothesis import strategies as st

from datapipelines_spark.operators.components import (
    connected_components,
    duplicate_clusters,
)

_NODES = st.integers(0, 9)

_edges = st.lists(st.tuples(_NODES, _NODES), min_size=1, max_size=15)


def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    # component label = min member id, matching the operator's contract
    roots = {}
    for n in parent:
        roots.setdefault(find(n), []).append(n)
    return {n: min(members) for members in roots.values() for n in members}


@settings(max_examples=12, deadline=None)
@given(edges=_edges)
def test_random_graph_matches_union_find(spark, edges):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, max_iterations=30).collect()
    }
    assert got == _union_find_components(edges)


@settings(max_examples=8, deadline=None)
@given(
    edges=_edges,
    # scores over a random subset of the node domain; a small value range
    # forces score ties so the lowest-id tie rule actually gets exercised
    scores=st.dictionaries(_NODES, st.integers(0, 3), max_size=10),
)
def test_random_survivor_policy_matches_bruteforce(spark, edges, scores):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    sdf = spark.createDataFrame(
        [(k, float(v)) for k, v in scores.items()] or [(None, None)],
        "node long, score double",
    ).where("node is not null")
    got = {
        r["node"]: (r["cluster_id"], r["is_canonical"])
        for r in duplicate_clusters(df, scores=sdf).collect()
    }
    comp = _union_find_components(edges)
    clusters = {}
    for n, c in comp.items():
        clusters.setdefault(c, []).append(n)
    expected = {}
    for c, members in clusters.items():
        # highest score wins; missing scores rank below every real score;
        # ties break to the lowest node id
        canon = max(
            members, key=lambda n: (scores.get(n, float("-inf")), -n)
        )
        for n in members:
            expected[n] = (c, n == canon)
    assert got == expected
