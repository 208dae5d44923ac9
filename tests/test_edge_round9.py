"""Round-9 hardening pins: session-cache race + lifecycle, the explicit
pagerank caller_cached contract, the AQE cached-plan-width guard, and
Decimal-rounding totality over extreme doubles (round-8 advisor items).
"""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from etl_pipeline_spark.utils.session_cache import (
    clear_caches,
    memoized_relation,
    register_cache,
    session_key,
)


def test_round6_total_over_extreme_doubles(spark):
    """Decimal(repr(x)).quantize(1e-6) under the DEFAULT 28-digit context
    raises InvalidOperation for |x| >= ~1e22; the widened local context
    makes similarity._round6 total over all finite doubles, still agreeing
    with Spark's F.round (advisor round-8, croston/_r6 shares the fix)."""
    from etl_pipeline_spark.operators.similarity import _round6

    vals = [1e22, -1e22, 1.23456789e25, 1e300, -1e300, 1e-300, 0.0, -0.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double").select(
        "x", F.round("x", 6).alias("r")
    )
    for row in df.collect():
        assert _round6(row.x) == row.r, row.x


def test_memoized_relation_concurrent_single_winner(spark):
    """Two threads racing the same memo key must settle on ONE cache entry,
    and — because a pure build() makes the racers plan-identical, so the
    CacheManager dedupes both persist() calls into one entry — the losing
    thread must NOT unpersist (that would evict the winner's storage, the
    same sameResult hazard pagerank had). The winner stays persisted."""
    cache = register_cache({})
    built: list = []
    barrier = threading.Barrier(2)
    results: list = []

    def build():
        df = spark.range(50).withColumn("y", F.col("id") + 1)
        built.append(df)
        return df

    def worker():
        barrier.wait()
        results.append(memoized_relation(cache, spark, ("race",), build))

    threads = [threading.Thread(target=worker) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert len(results) == 2 and results[0] is results[1]
    key = (session_key(spark), "race")
    assert list(cache) == [key]
    winner = cache[key]
    assert winner.storageLevel.useMemory or winner.storageLevel.useDisk
    clear_caches(spark)
    assert cache == {}
    assert not (winner.storageLevel.useMemory or winner.storageLevel.useDisk)


def test_memoized_relation_race_distinct_plan_loser_is_released(spark):
    """The impure-build escape hatch: when a racing loser's plan is
    genuinely distinct (no CacheManager dedup), its persisted entry is a
    real leak and memoized_relation releases it."""
    cache = register_cache({})
    key = (session_key(spark), "race-distinct")
    winner_holder: list = []
    loser_holder: list = []

    def build():
        # simulate the other thread winning WHILE this build runs (after
        # the initial cache miss, before the setdefault)
        w = spark.range(7).persist()
        w.count()
        cache[key] = w
        winner_holder.append(w)
        df = spark.range(8)  # DIFFERENT plan from the winner
        loser_holder.append(df)
        return df

    got = memoized_relation(cache, spark, ("race-distinct",), build)
    (winner,) = winner_holder
    assert got is winner
    (loser,) = loser_holder
    assert not (loser.storageLevel.useMemory or loser.storageLevel.useDisk)
    assert winner.storageLevel.useMemory  # untouched
    clear_caches(spark)


def test_pagerank_explicit_caller_cached(spark):
    """The memoizing callers now pass caller_cached=True explicitly instead
    of relying on pagerank sniffing e.storageLevel through an alias-only
    Project (version-sensitive Spark internals). Pin the contract: the
    explicit flag preserves the caller's cache entry, skips the internal
    persist, and is result-identical to the inferred path."""
    from etl_pipeline_spark.operators.graph import pagerank

    rows = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1)]
    edges = spark.createDataFrame(rows, "src bigint, dst bigint").persist()
    edges.count()
    explicit = sorted(tuple(r) for r in pagerank(edges, n_iter=3, caller_cached=True).collect())
    inferred = sorted(tuple(r) for r in pagerank(edges, n_iter=3).collect())
    assert explicit == inferred
    assert edges.storageLevel.useMemory, "explicit caller_cached=True evicted the cache"
    edges.unpersist()
    # explicit True on an UNCACHED input is the caller's promise — pagerank
    # must not persist it, and the result is still correct
    cold = spark.createDataFrame(rows, "src bigint, dst bigint")
    uncached = sorted(tuple(r) for r in pagerank(cold, n_iter=3, caller_cached=True).collect())
    assert uncached == explicit
    assert not (cold.storageLevel.useMemory or cold.storageLevel.useDisk)


def test_cached_edge_relation_stores_at_aqe_width(spark):
    """Guard the canChangeCachedPlanOutputPartitioning win (round 8,
    measured 1.3x on the HITS rounds): under the repo session a memoized
    edge relation whose build ends in a shuffle must STORE at the
    AQE-coalesced width, not the raw spark.sql.shuffle.partitions width —
    a silent conf regression would resurface 20 rounds x near-empty tasks
    before the bench ever notices."""
    assert (
        spark.conf.get("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning")
        == "true"
    )
    from etl_pipeline_spark.plans.corpus_quality import cosupplier_edges

    clear_caches(spark)
    edges = cosupplier_edges(spark, "/root/testdata/sf0.001")
    edges.count()  # materialize the persisted blocks
    raw = int(spark.conf.get("spark.sql.shuffle.partitions"))
    stored = edges.rdd.getNumPartitions()
    assert stored < raw, (
        f"cached edge relation stored at the raw shuffle width ({stored} >= {raw}); "
        "AQE cached-plan coalescing is not taking effect"
    )
    clear_caches(spark)


def test_pipeline_run_clears_session_memos(spark, tmp_path):
    """Pipeline.run teardown contract (round-9): on exit it releases every
    relation the run's session memoized, so a long-lived service embedding
    the package gets bounded executor storage without calling
    clear_caches itself."""
    from etl_pipeline_spark.pipeline import Pipeline, PipelineConfig

    cache = register_cache({})
    rel = memoized_relation(
        cache, spark, ("pipeline-teardown",), lambda: spark.range(10).withColumn("z", F.lit(1))
    )
    rel.count()
    key = (session_key(spark), "pipeline-teardown")
    assert key in cache
    cfg = PipelineConfig(landing_dir=str(tmp_path / "landing"), production_db="prod_teardown")
    try:
        Pipeline(spark, cfg).run([])  # no sources — teardown still runs
    finally:
        spark.sql("DROP DATABASE IF EXISTS prod_teardown CASCADE")
    assert key not in cache
    assert not (rel.storageLevel.useMemory or rel.storageLevel.useDisk)


def test_pipeline_run_clears_memos_even_on_error(spark, tmp_path):
    """The teardown is a finally: a run that dies outside the per-source
    containment still releases the session memos."""
    from etl_pipeline_spark.pipeline import Pipeline, PipelineConfig

    cache = register_cache({})
    rel = memoized_relation(
        cache, spark, ("pipeline-teardown-err",), lambda: spark.range(5)
    )
    rel.count()
    key = (session_key(spark), "pipeline-teardown-err")
    cfg = PipelineConfig(landing_dir=str(tmp_path / "landing"), production_db="prod_teardown_e")
    pipe = Pipeline(spark, cfg)
    try:
        with pytest.raises(TypeError):
            pipe.run(None)  # not iterable — raises inside _run_sources
    finally:
        spark.sql("DROP DATABASE IF EXISTS prod_teardown_e CASCADE")
    assert key not in cache
    assert not (rel.storageLevel.useMemory or rel.storageLevel.useDisk)
