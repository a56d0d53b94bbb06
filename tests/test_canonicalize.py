import random

from deepie_spark.operators.canonicalize import connected_components


def _cc_oracle(edges):
    """Union-find oracle."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for s, d in edges:
        union(s, d)
    # min-id representative
    comp = {}
    for n in list(parent):
        comp[n] = find(n)
    # path compress to true min: iterate until stable
    changed = True
    while changed:
        changed = False
        for n in comp:
            if comp[comp[n]] != comp[n]:
                comp[n] = comp[comp[n]]
                changed = True
    return comp


def _check(spark, edges):
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    want = _cc_oracle(edges)
    # same partition of nodes into clusters, with min-id labels
    assert got == want, (got, want)


def test_cc_two_triangles(spark):
    _check(spark, [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12)])


def test_cc_chain(spark):
    _check(spark, [(i, i + 1) for i in range(1, 30)])


def test_cc_star_with_hub(spark):
    _check(spark, [(100, i) for i in range(1, 40)])


def test_cc_self_loops_and_dups(spark):
    _check(spark, [(5, 5), (1, 2), (2, 1), (2, 3)])


def test_cc_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    nodes = list(range(1, 120))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(150)
    ]
    _check(spark, edges)
