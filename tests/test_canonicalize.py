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


def test_cc_three_lineage_modes_identical(spark, tmp_path):
    """localCheckpoint (default), reliable checkpoint(), and parquet
    round snapshots must produce identical components."""
    rng = random.Random(11)
    nodes = list(range(1, 80))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(100)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    want = _cc_oracle(edges)

    local = {r["node"]: r["component"] for r in connected_components(df).collect()}
    reliable = {
        r["node"]: r["component"]
        for r in connected_components(
            df, checkpoint_dir=str(tmp_path / "ckpt")
        ).collect()
    }
    snap = {
        r["node"]: r["component"]
        for r in connected_components(df, state_dir=str(tmp_path / "state")).collect()
    }
    assert local == reliable == snap == want
    # reliable mode really wrote RDD checkpoint files
    import os

    assert any(os.scandir(tmp_path / "ckpt"))


def test_cc_kill_one_round_resume(spark, tmp_path):
    """Driver-loss resume: a run killed after one CC round (simulated
    with max_iter=1 + state_dir) leaves _SUCCESS-complete round
    snapshots; a rerun with the same state_dir resumes from the last
    snapshot — writing only NEW rounds — and converges to the same
    components as an uninterrupted run."""
    import os

    # a long chain needs several large/small-star rounds to converge
    edges = [(i, i + 1) for i in range(1, 40)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    state = str(tmp_path / "cc_state")

    connected_components(df, max_iter=1, state_dir=state).collect()  # "crash"
    rounds_before = sorted(
        d for d in os.listdir(state) if d.startswith("round_")
    )
    assert rounds_before == ["round_0000", "round_0001"]
    mtime_before = os.path.getmtime(os.path.join(state, "round_0001", "_SUCCESS"))

    got = {
        r["node"]: r["component"]
        for r in connected_components(df, state_dir=state).collect()
    }
    rounds_after = sorted(d for d in os.listdir(state) if d.startswith("round_"))
    # resume appended rounds >= 2 instead of rewriting 0/1 from scratch
    assert rounds_after[: len(rounds_before)] == rounds_before
    assert len(rounds_after) > len(rounds_before)
    assert os.path.getmtime(os.path.join(state, "round_0001", "_SUCCESS")) == mtime_before
    assert got == _cc_oracle(edges)


def test_cc_state_dir_rejects_stale_snapshots(spark, tmp_path):
    """Reusing a state_dir after the upstream edge set changed must NOT
    resume the old graph's round snapshots: round 0 records an input
    fingerprint, and a rerun with different edges wipes the stale
    rounds and recomputes components for the NEW graph."""
    import os

    state = str(tmp_path / "cc_state_stale")
    edges_a = [(1, 2), (2, 3), (10, 11)]
    df_a = spark.createDataFrame(edges_a, "src bigint, dst bigint")
    connected_components(df_a, state_dir=state).collect()
    assert os.path.exists(os.path.join(state, "_input_fingerprint.json"))

    # upstream changed: 3 now links to 10, merging the two clusters
    edges_b = [(1, 2), (2, 3), (3, 10), (10, 11)]
    df_b = spark.createDataFrame(edges_b, "src bigint, dst bigint")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df_b, state_dir=state).collect()
    }
    assert got == _cc_oracle(edges_b)  # NOT the stale two-cluster answer
    assert len(set(got.values())) == 1

    # same input again: resumes (round snapshots survive untouched)
    rounds = sorted(d for d in os.listdir(state) if d.startswith("round_"))
    mtimes = {
        d: os.path.getmtime(os.path.join(state, d, "_SUCCESS")) for d in rounds
    }
    got2 = {
        r["node"]: r["component"]
        for r in connected_components(df_b, state_dir=state).collect()
    }
    assert got2 == got
    for d in rounds:
        assert os.path.getmtime(os.path.join(state, d, "_SUCCESS")) == mtimes[d]
