"""PageRank (operators/graph.py): hand-computed reference on a small
graph, rank conservation, checkpoint equivalence, validation."""

from __future__ import annotations

import pytest


def _reference_pagerank(edges, iters=5, d=0.85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    out = {}
    for u, _ in edges:
        out[u] = out.get(u, 0) + 1
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        contrib = {v: 0.0 for v in nodes}
        for u, v in edges:
            contrib[v] += rank[u] / out[u]
        rank = {v: (1 - d) / n + d * contrib[v] for v in nodes}
    return rank


EDGES = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3)]


def test_matches_hand_reference(spark):
    from datafusion_federation_spark.operators.graph import pagerank
    df = spark.createDataFrame(EDGES, "src int, dst int")
    got = {r.node: r.rank for r in pagerank(df, iters=5).collect()}
    want = _reference_pagerank(EDGES)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)


def test_checkpointing_changes_nothing(spark):
    from datafusion_federation_spark.operators.graph import pagerank
    df = spark.createDataFrame(EDGES, "src int, dst int")
    plain = sorted(map(tuple, pagerank(df, iters=6).collect()))
    cut = sorted(map(tuple, pagerank(df, iters=6,
                                     checkpoint_every=2).collect()))
    assert [(n, pytest.approx(r, abs=1e-12)) for n, r in plain] == cut


def test_dangling_node_keeps_base_rank(spark):
    # node 2 has no in-edges: rank must be exactly (1-d)/N every
    # iteration; node 9 has no OUT-edges (leaks, simplified variant)
    from datafusion_federation_spark.operators.graph import pagerank
    df = spark.createDataFrame([(1, 9)], "src int, dst int")
    got = {r.node: r.rank for r in pagerank(df, iters=3).collect()}
    assert got[1] == pytest.approx(0.15 / 2, abs=1e-15)


def test_validation(spark):
    from datafusion_federation_spark.operators.graph import pagerank
    df = spark.createDataFrame(EDGES, "src int, dst int")
    with pytest.raises(ValueError, match="iters"):
        pagerank(df, iters=0)
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping=1.0)


def _reference_pagerank_dangling(edges, iters=5, d=0.85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    out = {}
    for u, _ in edges:
        out[u] = out.get(u, 0) + 1
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dm = sum(rank[v] for v in nodes if v not in out)
        contrib = {v: 0.0 for v in nodes}
        for u, v in edges:
            contrib[v] += rank[u] / out[u]
        rank = {v: (1 - d) / n + d * (contrib[v] + dm / n)
                for v in nodes}
    return rank


def test_dangling_redistribution_matches_reference(spark):
    # EDGES has a sink? 4->3, 3->1, 2->3, 1->{2,3}: every node with an
    # in-edge has out... node 4 has out; add a true sink (5) first
    edges = EDGES + [(1, 5)]
    from datafusion_federation_spark.operators.graph import pagerank
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r.node: r.rank
           for r in pagerank(df, iters=5, dangling=True).collect()}
    want = _reference_pagerank_dangling(edges)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)


def test_dangling_conserves_total_rank(spark):
    """VERDICT r5 item 7 done-criterion: Sigma rank == 1 each run (the
    simplified default leaks sink mass; the redistribution closes the
    recurrence)."""
    edges = EDGES + [(1, 5), (2, 6)]
    from datafusion_federation_spark.operators.graph import pagerank
    df = spark.createDataFrame(edges, "src int, dst int")
    total = sum(r.rank for r in
                pagerank(df, iters=7, dangling=True).collect())
    assert total == pytest.approx(1.0, abs=1e-9)
    leaked = sum(r.rank for r in
                 pagerank(df, iters=7, dangling=False).collect())
    assert leaked < 1.0 - 1e-3   # the default really does leak here


def test_dangling_plan_stays_linear_at_depth(spark):
    """r6's formulation referenced `ranks` twice per iteration, so the
    logical plan DOUBLED per round — at 7 iterations the 2^7-node tree
    OOMed the JVM just printing it, forcing a per-iteration
    localCheckpoint barrier. The r7 single-reference recurrence needs
    no lineage cut: building AND printing a 12-iteration plan must
    succeed quickly, and the text must grow ~linearly (a doubled plan
    would print 2^12 join subtrees; megabytes, then OOM)."""
    from datafusion_federation_spark.operators.graph import pagerank
    df = spark.createDataFrame(EDGES + [(1, 5), (2, 6)],
                               "src int, dst int")
    pr6 = pagerank(df, iters=6, dangling=True)
    pr12 = pagerank(df, iters=12, dangling=True)
    txt6 = pr6._jdf.queryExecution().optimizedPlan().treeString()
    txt12 = pr12._jdf.queryExecution().optimizedPlan().treeString()
    # linear growth: doubling iterations should ~double the plan text,
    # never square it (2^6 -> 2^12 would be a 64x blowup)
    assert len(txt12) < 3.5 * len(txt6), (len(txt6), len(txt12))
    # and the deep run still computes the exact reference values
    got = {r.node: r.rank
           for r in pagerank(df, iters=12, dangling=True).collect()}
    want = _reference_pagerank_dangling(EDGES + [(1, 5), (2, 6)],
                                        iters=12)
    assert got == {k: pytest.approx(v, abs=1e-9)
                   for k, v in want.items()}


def test_dangling_checkpoint_changes_nothing(spark):
    """review r7: checkpoint_every was silently DEAD on the dangling
    branch (the loop returned before the cut). It must now truncate
    lineage without changing a single value."""
    edges = EDGES + [(1, 5), (2, 6)]
    from datafusion_federation_spark.operators.graph import pagerank
    df = spark.createDataFrame(edges, "src int, dst int")
    plain = sorted(map(tuple,
                       pagerank(df, iters=6, dangling=True).collect()))
    cut = sorted(map(tuple,
                     pagerank(df, iters=6, dangling=True,
                              checkpoint_every=2).collect()))
    assert [(n, pytest.approx(r, abs=1e-12)) for n, r in plain] == cut
    # and the cut really happened: the checkpointed plan must NOT grow
    # with the pre-cut iterations (LogicalRDD replaces the lineage)
    deep = pagerank(df, iters=6, dangling=True, checkpoint_every=2)
    txt = deep._jdf.queryExecution().optimizedPlan().treeString()
    assert "LogicalRDD" in txt or "Scan ExistingRDD" in txt


# ---------------------------------------------------------------------------
# Triangle counting (r7)
# ---------------------------------------------------------------------------

def _brute_triangles(edges):
    from itertools import combinations
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    ref = {}
    for a, b, c in combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                ref[n] = ref.get(n, 0) + 1
    return ref


def test_triangles_match_brute_force(spark):
    import random
    from datafusion_federation_spark.operators.graph import (
        triangle_counts)
    random.seed(11)
    edges = list({(random.randint(1, 25), random.randint(1, 25))
                  for _ in range(150)})
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r.node: r.triangles for r in triangle_counts(df).collect()}
    assert got == _brute_triangles(edges)


def test_triangles_direction_and_duplicates_ignored(spark):
    """(a,b) and (b,a) plus repeats are ONE undirected edge; self-loops
    drop entirely."""
    from datafusion_federation_spark.operators.graph import (
        triangle_counts)
    edges = [(1, 2), (2, 1), (2, 3), (3, 2), (3, 1), (1, 1), (2, 2)]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = sorted(map(tuple, triangle_counts(df).collect()))
    assert got == [(1, 1), (2, 1), (3, 1)]


def test_triangles_hub_graph_exact(spark):
    """A star (hub + leaves) has NO triangles no matter the hub degree;
    adding one leaf-leaf edge creates exactly one. Exercises the
    degree-ordered orientation's hub handling (the hub receives the
    wedge apexes, never fans out)."""
    from datafusion_federation_spark.operators.graph import (
        triangle_counts)
    star = [(0, i) for i in range(1, 40)]
    assert triangle_counts(
        spark.createDataFrame(star, "src int, dst int")).count() == 0
    got = sorted(map(tuple, triangle_counts(
        spark.createDataFrame(star + [(1, 2)],
                              "src int, dst int")).collect()))
    assert got == [(0, 1), (1, 1), (2, 1)]


# ---------------------------------------------------------------------------
# Label propagation (r7)
# ---------------------------------------------------------------------------

def _lpa_reference(edges, iters):
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    lab = {n: n for n in adj}
    for _ in range(iters):
        new = {}
        for n in adj:
            cnt = {}
            for nb in adj[n]:
                cnt[lab[nb]] = cnt.get(lab[nb], 0) + 1
            new[n] = min((-c, l) for l, c in cnt.items())[1]
        lab = new
    return lab


def test_lpa_matches_reference(spark):
    import random
    from datafusion_federation_spark.operators.graph import (
        label_propagation)
    random.seed(9)
    edges = list({(random.randint(1, 35), random.randint(1, 35))
                  for _ in range(110)})
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r.node: r.label
           for r in label_propagation(df, iters=3).collect()}
    assert got == _lpa_reference(edges, 3)


def test_lpa_two_cliques_converge_to_min_labels(spark):
    """Two disjoint triangles: every node adopts its clique's minimum
    label within 2 rounds (tie-break: lowest label wins)."""
    from datafusion_federation_spark.operators.graph import (
        label_propagation)
    edges = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r.node: r.label
           for r in label_propagation(df, iters=2).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_lpa_plan_linear_and_validation(spark):
    from datafusion_federation_spark.operators.graph import (
        label_propagation)
    import pytest as _pytest
    df = spark.createDataFrame([(1, 2), (2, 3)], "src int, dst int")
    with _pytest.raises(ValueError, match="iters"):
        label_propagation(df, iters=0)
    t3 = label_propagation(df, iters=3) \
        ._jdf.queryExecution().optimizedPlan().treeString()
    t6 = label_propagation(df, iters=6) \
        ._jdf.queryExecution().optimizedPlan().treeString()
    assert len(t6) < 3.0 * len(t3), (len(t3), len(t6))


# ---------------------------------------------------------------------------
# k-core peeling (r7)
# ---------------------------------------------------------------------------

def _kcore_reference(edges, k, rounds):
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    e = set(und)
    for _ in range(rounds):
        deg = {}
        for a, b in e:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        e = {(a, b) for a, b in e if deg[a] >= k and deg[b] >= k}
    deg = {}
    for a, b in e:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    return deg


def test_kcore_matches_reference(spark):
    import random
    from datafusion_federation_spark.operators.graph import kcore_prune
    random.seed(13)
    edges = list({(random.randint(1, 30), random.randint(1, 30))
                  for _ in range(140)})
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r.node: r.degree
           for r in kcore_prune(df, k=3, rounds=3).collect()}
    assert got == _kcore_reference(edges, 3, 3)


def test_kcore_clique_survives_chain_dies(spark):
    """A 4-clique is its own 3-core; a path graph has no 2-core at
    all once the leaves peel inward."""
    from datafusion_federation_spark.operators.graph import kcore_prune
    clique = [(i, j) for i in range(1, 5) for j in range(i + 1, 5)]
    chain = [(10, 11), (11, 12), (12, 13), (13, 14)]
    df = spark.createDataFrame(clique + chain, "src int, dst int")
    got = {r.node: r.degree
           for r in kcore_prune(df, k=2, rounds=4).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_plan_linear_and_validation(spark):
    from datafusion_federation_spark.operators.graph import kcore_prune
    df = spark.createDataFrame([(1, 2), (2, 3)], "src int, dst int")
    with pytest.raises(ValueError, match="k must"):
        kcore_prune(df, k=0)
    with pytest.raises(ValueError, match="rounds"):
        kcore_prune(df, rounds=0)
    t3 = kcore_prune(df, k=2, rounds=3) \
        ._jdf.queryExecution().optimizedPlan().treeString()
    t6 = kcore_prune(df, k=2, rounds=6) \
        ._jdf.queryExecution().optimizedPlan().treeString()
    assert len(t6) < 3.0 * len(t3), (len(t3), len(t6))


def test_lpa_string_node_ids(spark):
    """review r7: the tie-break used to negate the LABEL (numeric
    only — ANSI raised on strings); it now negates the COUNT, so any
    orderable id type works with the same 'ties -> smallest label'
    contract."""
    from datafusion_federation_spark.operators.graph import (
        label_propagation)
    edges = [("a", "b"), ("b", "c"), ("a", "c"),
             ("x", "y"), ("y", "z"), ("x", "z")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.label
           for r in label_propagation(df, iters=2).collect()}
    assert got == {"a": "a", "b": "a", "c": "a",
                   "x": "x", "y": "x", "z": "x"}


def test_graph_ops_partition_layout_invariant(spark):
    """Triangles / LPA / k-core are pure functions of the edge SET:
    repartitioning the input must not change one output row (max/count
    aggregates with deterministic tie-breaks everywhere)."""
    import random
    from datafusion_federation_spark.operators.graph import (
        kcore_prune, label_propagation, triangle_counts)
    random.seed(17)
    edges = list({(random.randint(1, 30), random.randint(1, 30))
                  for _ in range(120)})
    a = spark.createDataFrame(edges, "src int, dst int")
    b = a.repartition(11)
    for op in (lambda d: triangle_counts(d),
               lambda d: label_propagation(d, iters=3),
               lambda d: kcore_prune(d, k=3, rounds=2)):
        assert sorted(map(tuple, op(a).collect())) == \
            sorted(map(tuple, op(b).collect()))
