"""Distributed connected components — dedup cluster assignment.

Near-dup detection (MinHash-LSH, n-gram Jaccard, embedding cosine) emits
*pairs*; turning pairs into keep/drop decisions needs the transitive
closure: if A~B and B~C, all three are one duplicate cluster even when
A~C was never emitted. The reference has no equivalent (it has no graph
data at all); this is a beyond-reference operator every training-data
pipeline needs (SURVEY.md §7 north star).

Algorithm: iterative min-label propagation over the symmetrized edge set.
Each round is one shuffle (join labels to edges on src, min-agg on dst):

    label(v) <- min(label(v), min_{u->v} label(u))

Rounds needed = graph diameter. For dedup graphs that is tiny — duplicate
clusters are small, near-clique blobs (diameter 1-3), so 3-5 rounds
converge; the planted corpus (25 disjoint pairs) converges in 1. For
high-diameter graphs (long chains) the alternating large-star/small-star
algorithm (Kiveris et al., MapReduce & Beyond '14) converges in
O(log^2 n) rounds; min-label is the right default for dedup workloads
and keeps every round a plain shuffle Catalyst can plan.

Scale notes:
- Convergence is detected by SUM(label): min-propagation is monotone
  decreasing, so the sum strictly decreases iff any label changed — one
  cheap aggregate per round, no self-join diff.
- Each round calls ``localCheckpoint`` to truncate lineage; without it
  the plan doubles per iteration and the driver OOMs planning round ~20.
  On a real cluster with an HDFS checkpoint dir, ``checkpoint`` is the
  durable equivalent.
- The edge relation is persisted once and reused every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def symmetrize(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Undirected edge set as both directions, deduped.

    Emits both directions with ONE explode instead of a union of two
    branches: a union computes the (often expensive — LSH self-join,
    co-supplier build) edge relation twice, and since callers persist the
    *symmetrized* output, nothing upstream dedups that double scan
    (profiler: the pair-build subtree appeared 4x in dedup_cluster_assign's
    stage graph). Same distinct row set either way."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    both = F.array(
        F.struct(F.col("src"), F.col("dst")),
        F.struct(F.col("dst").alias("src"), F.col("src").alias("dst")),
    )
    return (
        e.select(F.explode(both).alias("p"))
        .select("p.src", "p.dst")
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node in `edges`; component = min node id
    reachable from the node. Long/int node ids.

    Isolated nodes (absent from `edges`) are their own components and are
    simply not emitted — callers union them back if they need full cover.
    """
    sym = symmetrize(edges, src, dst).persist()
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    if prev_sum is None:  # no edges at all
        sym.unpersist()
        return labels.select("node", F.col("label").alias("component"))

    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["src"] == labels["node"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        new_sum = labels.agg(F.sum("label")).collect()[0][0]
        if new_sum == prev_sum:
            break
        prev_sum = new_sum

    sym.unpersist()
    return labels.select("node", F.col("label").alias("component"))


def cluster_assignments(
    pairs: DataFrame, left: str = "doc_a", right: str = "doc_b"
) -> DataFrame:
    """Dedup view over components: (doc_id, cluster_id, is_canonical,
    cluster_size). Canonical doc = min id in the cluster (the keep row);
    the rest are the drop set.
    """
    comp = connected_components(pairs, left, right)
    w = F.count("*").over(Window.partitionBy("component"))
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("node") == F.col("component")).cast("int").alias("is_canonical"),
        w.cast("bigint").alias("cluster_size"),
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iter: int = 10,
    caller_cached: bool | None = None,
) -> DataFrame:
    """(node, rank) after ``n_iter`` synchronous PageRank iterations.

    Directed edges; uniform teleport; dangling-node mass (nodes with no
    out-edges) is redistributed uniformly each round, so ranks always sum
    to 1. Fixed iteration count (not convergence-tested) keeps the result
    deterministic for a given graph.

    Scale notes (same discipline as ``connected_components``):
    - the degree-weighted edge relation is built once and persisted; each
      round is one join (edges ⋈ ranks on src, reusing the persisted
      partitioning) + one groupBy(dst) shuffle;
    - dangling mass is a one-row aggregate RELATION broadcast-cross-joined
      into the rank update — not a per-round driver collect — so a round
      adds zero driver actions;
    - ``localCheckpoint`` per round truncates lineage growth;
    - iteration shuffles are sized to the measured node count (~100k
      nodes per partition with a small parallelism floor, conf restored
      afterwards): iterative state is
      usually orders of magnitude smaller than the session's scan-sized
      shuffle setting, and 10 rounds of over-partitioned 32-task stages
      cost more in scheduling than the data (measured 14.6 s → 8.3 s at
      sf0.1's 21k-node graph). On a 1e9-node graph the same rule yields
      ~10k-partition rounds.
    """
    # persist the (possibly expensive) edge relation once: nodes, degrees
    # and the weighted join below would otherwise each recompute its full
    # upstream plan (e.g. a scan + distinct over a fact table). If the
    # caller already persisted it (the session-scoped edge memos in
    # plans/*), reuse THEIR cache entry and — critically — do not
    # unpersist on exit: when src/dst are already named "src"/"dst" the
    # projection is plan-identical to the input, so an unconditional
    # unpersist here would silently evict the caller's memoized relation
    # (cache lookup is sameResult-based, not object-based). Memoizing
    # callers should say so EXPLICITLY via ``caller_cached=True``; the
    # ``None`` default falls back to sniffing ``e.storageLevel``, which
    # works today because Spark's cache lookup sees through an alias-only
    # Project, but that is version-sensitive internals — the explicit
    # flag is the supported contract.
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if caller_cached is None:
        caller_cached = e.storageLevel.useMemory or e.storageLevel.useDisk
    _caller_cached = caller_cached
    if not _caller_cached:
        e = e.persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        # empty graph: no nodes, no ranks — mirror the relational oracle,
        # whose empty nodes CTE yields an empty result, instead of
        # raising ZeroDivisionError on the 1/n seed (sweep-found via a
        # random corpus whose sparsified word graph pruned to nothing)
        empty = nodes.withColumn("rank", F.lit(0.0))
        nodes.unpersist()
        if not _caller_cached:
            e.unpersist()
        return empty

    sess = edges.sparkSession
    old_sp = sess.conf.get("spark.sql.shuffle.partitions")
    try:
        # state-sized shuffles, but never below the executor parallelism
        # floor: a 1-partition round serializes every join/agg onto one
        # task (measured ~35% slower at sf0.1's 21k-node graph than 8
        # parallel tasks); on a 1e9-node graph the n//100k term dominates
        floor = min(8, sess.sparkContext.defaultParallelism)
        sess.conf.set("spark.sql.shuffle.partitions", str(max(floor, n // 100_000)))

        deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
        weighted = e.join(deg, "src").persist()
        weighted.count()
        n_src = deg.count()
        if not _caller_cached:
            e.unpersist()

        ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint(eager=True)
        has_out = deg.select(F.col("src").alias("node"))
        for _ in range(n_iter):
            if n_src == n:
                # no dangling nodes exist (every node has out-edges; the
                # set is fixed across rounds) — the mass term is exactly
                # 0.0 and adding it is an IEEE no-op, so skip the
                # per-round leftanti branch entirely
                dm = F.lit(0.0)
                dang = None
            else:
                # dangling mass as a 1-row relation (broadcast below) —
                # keeps the float-op order of the former driver-side
                # formula: base = (1-d)/n + (d*dangling)/n, + d*contrib
                dang = ranks.join(has_out, "node", "leftanti").agg(
                    F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
                )
                dm = F.col("_dm")
            contribs = (
                weighted.join(ranks, weighted["src"] == ranks["node"])
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum(F.col("rank") / F.col("out_deg")).alias("contrib"))
            )
            updated = nodes.join(contribs, "node", "left")
            if dang is not None:
                updated = updated.crossJoin(F.broadcast(dang))
            ranks = updated.select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + (F.lit(damping) * dm) / F.lit(float(n))
                    + F.lit(damping) * F.coalesce("contrib", F.lit(0.0))
                ).alias("rank"),
            ).localCheckpoint(eager=True)
    finally:
        # every round is materialized above, so restoring the session's
        # shuffle sizing here cannot retroactively change the result
        sess.conf.set("spark.sql.shuffle.partitions", old_sp)
    nodes.unpersist()
    weighted.unpersist()
    return ranks


def cooccurrence_pairs(
    df: DataFrame, group_col: str, item_col: str
) -> DataFrame:
    """(item_a, item_b, n_shared) — distinct items co-occurring per group.

    ``item_a < item_b`` normalizes the undirected pair. The self-join is
    keyed on the group id, so cost is Σ per-group k·(k-1)/2 — bounded
    when groups are small (orders hold a handful of line items); for
    hot groups you'd cap or sample the group first.
    """
    # NOTE (r12, measured and REJECTED): the grouped-pair device that wins
    # for jaccard/containment_pairs (operators/dedup.py) LOSES here —
    # executor time 1.4-2x worse across the co-supplier consumers
    # (triangle 35→69 s, jaccard_link 21→36 s at sf0.1). The difference:
    # this join key is a narrow int with tiny per-key fan-out, so the
    # sort-merge legs are cheap, while collect_list forces an
    # ObjectHashAggregate whose per-group array allocation dominates.
    # The self-join stays.
    g = df.select(F.col(group_col).alias("g"), F.col(item_col).alias("item")).distinct()
    a, b = g.alias("a"), g.alias("b")
    return (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.item") < F.col("b.item")))
        .groupBy(
            F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def topk_neighbor_edges(pairs: DataFrame, k: int = 3) -> DataFrame:
    """Sparsify a weighted pair relation to each node's top-k neighbors.

    Dense co-occurrence graphs (every supplier eventually co-occurs with
    every other) make triangle counting Σ deg² — quadratic blowup. The
    standard sparsification keeps, per node, only its k strongest
    neighbors (count DESC, partner id ASC for determinism), then unions
    both directions back into an undirected edge set. |E| <= k·|V| (each
    node nominates at most k edges), so average degree is <= 2k and every
    downstream join is linear in |nodes|; a single node CAN still be many
    nodes' nearest neighbor (unbounded in-degree) — if that happens,
    degree-ordered orientation in the triangle join is the standard fix
    (see ``triangle_stats``).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    directed = pairs.select("item_a", "item_b", "n_shared").unionByName(
        pairs.select(
            F.col("item_b").alias("item_a"),
            F.col("item_a").alias("item_b"),
            "n_shared",
        )
    )
    w = Window.partitionBy("item_a").orderBy(
        F.desc("n_shared"), F.asc("item_b")
    )
    top = directed.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= k
    )
    return (
        top.select(
            F.least("item_a", "item_b").alias("src"),
            F.greatest("item_a", "item_b").alias("dst"),
        )
        .distinct()
    )


def triangle_stats(edges: DataFrame) -> DataFrame:
    """One row: n_nodes, n_edges, n_wedges, n_triangles, gcc.

    ``edges`` must be undirected-normalized (src < dst, distinct). The
    triangle join orients by node id (src < dst < far): e1=(x,y) ⋈
    e2=(y,z) builds wedges, e3=(x,z) closes them — each triangle counted
    exactly once. Wedge count Σ deg·(deg-1)/2 comes from the degree
    relation. gcc = 3·triangles / wedges (the global clustering
    coefficient).

    Scale: on bounded-degree graphs (see ``topk_neighbor_edges``) the
    wedge join is linear in nodes. On skewed graphs the classic fix is
    degree-ordered orientation (orient each edge toward the higher-degree
    endpoint) so no vertex fans out more than O(sqrt(|E|)); id-orientation
    keeps the oracle simple and is safe post-sparsification.
    """
    e = edges.select("src", "dst").persist()
    deg = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    counts = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        (F.sum(F.col("deg") * (F.col("deg") - 1)) / 2).cast("bigint").alias("n_wedges"),
    )
    n_edges = e.agg(F.count(F.lit(1)).alias("n_edges"))
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
        .join(
            e3,
            (F.col("e3.src") == F.col("e1.src")) & (F.col("e3.dst") == F.col("e2.dst")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    out = (
        counts.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.round(
                F.when(
                    F.col("n_wedges") > 0,
                    3.0 * F.col("n_triangles") / F.col("n_wedges"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("gcc"),
        )
    )
    return out


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 3,
) -> DataFrame:
    """(node, label) after ``n_iter`` synchronous label-propagation rounds.

    Community detection (Raghavan et al., Phys. Rev. E 76, 036106):
    every node adopts, each round, the most frequent label among its
    neighbors. The textbook algorithm breaks frequency ties randomly;
    this implementation is DETERMINISTIC — ties go to the smallest
    label — and runs a fixed round count, which is what makes the result
    oracle-checkable (the DuckDB twin unrolls the rounds as chained CTEs,
    the same device the PageRank oracle uses).

    The per-round argmax(count, then min label) is encoded as one MAX
    over ``cnt·2³² + (2³²−1−label)`` — a single groupBy aggregate instead
    of a row_number window, so a round is exactly two shuffles (neighbor
    label counts, per-node max). Requires node ids < 2³² and degree
    < 2³¹. Lineage is truncated per round.

    Nodes are taken from the symmetrized edge set (isolated nodes have no
    neighbors and no label pressure — callers union them back unchanged
    if needed).
    """
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    enc = 4294967296  # 2^32
    sym = symmetrize(edges, src, dst).persist()
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    n = labels.count()
    sess = edges.sparkSession
    old_sp = sess.conf.get("spark.sql.shuffle.partitions")
    try:
        # state-sized rounds with a parallelism floor — same rule (and
        # rationale) as pagerank above
        floor = min(8, sess.sparkContext.defaultParallelism)
        sess.conf.set("spark.sql.shuffle.partitions", str(max(floor, n // 100_000)))
        for _ in range(n_iter):
            counts = (
                sym.join(labels, sym["src"] == labels["node"])
                .groupBy(F.col("dst").alias("node"), "label")
                .agg(F.count(F.lit(1)).alias("cnt"))
            )
            labels = (
                counts.groupBy("node")
                .agg(
                    F.max(
                        F.col("cnt") * F.lit(enc) + (F.lit(enc - 1) - F.col("label"))
                    ).alias("score")
                )
                .select(
                    "node",
                    (F.lit(enc - 1) - F.col("score") % F.lit(enc)).alias("label"),
                )
                .localCheckpoint(eager=True)
            )
    finally:
        # every round is materialized above, so restoring the session's
        # shuffle sizing here cannot retroactively change the result
        sess.conf.set("spark.sql.shuffle.partitions", old_sp)
    sym.unpersist()
    return labels
