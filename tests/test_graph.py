"""Connected components: union-find cross-check on random graphs, chain
graphs that force multiple propagation rounds, and dedup cluster views."""

from __future__ import annotations

import random

from etl_pipeline_spark.operators.graph import cluster_assignments, connected_components


def _union_find(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical component = min member id
    comp: dict[int, int] = {}
    members: dict[int, list[int]] = {}
    for n in parent:
        members.setdefault(find(n), []).append(n)
    for root, ms in members.items():
        label = min(ms)
        for m in ms:
            comp[m] = label
    return comp


def test_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    expected = _union_find(edges)
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert got == expected


def test_long_chain_needs_many_rounds(spark):
    # path 0-1-2-...-40: diameter 40, label must walk the whole chain
    edges = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r.node: r.component for r in connected_components(df, max_iter=50).collect()}
    assert got == {i: 0 for i in range(41)}


def test_disjoint_pairs_converge_in_one_round(spark):
    edges = [(2 * i + 1, 2 * i) for i in range(10)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r.node: r.component for r in connected_components(df, max_iter=2).collect()}
    assert got == {n: 2 * (n // 2) for n in range(20)}


def test_cluster_assignments_view(spark):
    # {1,2,3} via 1-2, 2-3 ; {10,11}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a bigint, doc_b bigint"
    )
    rows = {
        r.doc_id: (r.cluster_id, r.is_canonical, r.cluster_size)
        for r in cluster_assignments(pairs).collect()
    }
    assert rows == {
        1: (1, 1, 3),
        2: (1, 0, 3),
        3: (1, 0, 3),
        10: (10, 1, 2),
        11: (10, 0, 2),
    }


def test_empty_edges(spark):
    df = spark.createDataFrame([], "src bigint, dst bigint")
    assert connected_components(df).count() == 0


def test_pagerank_empty_graph_returns_empty(spark):
    """An empty edge relation must yield an empty rank relation (the
    relational oracle's empty-nodes CTE), not ZeroDivisionError on the
    1/n seed — sweep-found via a random corpus whose sparsified word
    graph pruned to nothing (textrank_keywords)."""
    from etl_pipeline_spark.operators.graph import pagerank

    df = spark.createDataFrame([], "src string, dst string")
    out = pagerank(df, n_iter=3)
    assert out.columns == ["node", "rank"]
    assert out.count() == 0


def test_pagerank_matches_numpy_power_iteration(spark):
    import numpy as np
    from pyspark.sql import Row

    from etl_pipeline_spark.operators.graph import pagerank

    # 4-node graph with a dangling node (3 has no out-edges)
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (1, 3)]
    df = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
    got = {r.node: r.rank for r in pagerank(df, n_iter=12).collect()}

    n, d = 4, 0.85
    out = {0: [1, 2], 1: [2, 3], 2: [0], 3: []}
    r = np.full(n, 1.0 / n)
    for _ in range(12):
        nxt = np.zeros(n)
        dangling = sum(r[v] for v in range(n) if not out[v])
        for v in range(n):
            for w in out[v]:
                nxt[w] += r[v] / len(out[v])
        r = (1 - d) / n + d * (nxt + dangling / n)
    for v in range(n):
        assert abs(got[v] - r[v]) < 1e-12, (v, got[v], r[v])
    assert abs(sum(got.values()) - 1.0) < 1e-9
