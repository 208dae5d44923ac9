"""Count-min sketch: overestimate guarantee, mergeability, accuracy."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_pipeline_spark.operators.sketch import cms_build, cms_estimate, cms_merge


def _keys(spark, counts: dict[str, int]):
    rows = [Row(k=k) for k, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows)


def test_cms_overestimates_and_is_accurate_when_wide(spark):
    counts = {"a": 50, "b": 7, "c": 1, "d": 13}
    df = _keys(spark, counts)
    sketch = cms_build(df, "k", depth=4, width=1024)
    probes = spark.createDataFrame([Row(k=k) for k in counts])
    est = {r.k: r.est for r in cms_estimate(sketch, probes, "k", 4, 1024).collect()}
    # always an overestimate; with 4 keys in 1024 buckets × 4 rows there is
    # no collision in at least one row, so the min is exact
    assert est == counts


def test_cms_merge_equals_single_build(spark):
    counts = {"a": 20, "b": 5, "c": 9}
    df = _keys(spark, counts)
    h1 = df.filter(F.col("k") != "c")
    h2 = df.filter(F.col("k") == "c")
    merged = cms_merge(cms_build(h1, "k", 3, 256), cms_build(h2, "k", 3, 256))
    single = cms_build(df, "k", 3, 256)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, single.collect()))


def test_cms_never_underestimates_under_collision_pressure(spark):
    counts = {f"k{i}": (i % 7) + 1 for i in range(200)}
    df = _keys(spark, counts)
    sketch = cms_build(df, "k", depth=3, width=64)  # forced collisions
    probes = spark.createDataFrame([Row(k=k) for k in counts])
    est = {r.k: r.est for r in cms_estimate(sketch, probes, "k", 3, 64).collect()}
    assert all(est[k] >= counts[k] for k in counts)
    assert sum(est.values()) > sum(counts.values())  # collisions inflate somewhere


def _bloom_mod():
    from etl_pipeline_spark.operators import sketch

    return sketch


def test_bloom_never_drops_true_members(spark):
    sk = _bloom_mod()
    members = spark.createDataFrame([Row(k=f"m{i}") for i in range(50)])
    bloom = sk.bloom_build(members, "k", m=512, k=3)
    checked = sk.bloom_check(members.distinct(), bloom, "k", m=512, k=3)
    assert all(r.maybe_member == 1 for r in checked.collect())


def test_bloom_prunes_most_non_members_when_wide(spark):
    sk = _bloom_mod()
    members = spark.createDataFrame([Row(k=f"m{i}") for i in range(20)])
    others = spark.createDataFrame([Row(k=f"x{i}") for i in range(200)])
    bloom = sk.bloom_build(members, "k", m=8192, k=3)
    checked = sk.bloom_check(others, bloom, "k", m=8192, k=3)
    fp = sum(r.maybe_member for r in checked.collect())
    # 60 set bits in 8192 positions → fp rate ≈ (60/8192)^3; 200 probes
    # should see essentially none, and certainly not most
    assert fp <= 5


def test_bloom_union_merge_equals_single_build(spark):
    sk = _bloom_mod()
    a = spark.createDataFrame([Row(k=f"a{i}") for i in range(10)])
    b = spark.createDataFrame([Row(k=f"b{i}") for i in range(10)])
    merged = sk.bloom_build(a, "k", 256, 3).union(sk.bloom_build(b, "k", 256, 3)).distinct()
    single = sk.bloom_build(a.union(b), "k", 256, 3)
    assert sorted(r.pos for r in merged.collect()) == sorted(
        r.pos for r in single.collect()
    )


def test_hll_accuracy_within_standard_error_band(spark):
    from etl_pipeline_spark.operators.sketch import hll_build, hll_estimate

    n = 5000
    df = spark.createDataFrame([Row(k=i) for i in range(n)])
    est = hll_estimate(hll_build(df, "k", p=10), p=10).collect()[0]
    # se = 1.04/sqrt(1024) ~ 3.3%; 3 sigma ~ 10%
    assert abs(est.est - n) <= 0.10 * n
    assert est.n_set <= 1024


def test_hll_merge_equals_single_build(spark):
    from etl_pipeline_spark.operators.sketch import hll_build, hll_merge

    a = spark.createDataFrame([Row(k=f"a{i}") for i in range(300)])
    b = spark.createDataFrame([Row(k=f"b{i}") for i in range(300)])
    merged = hll_merge(hll_build(a, "k", 6), hll_build(b, "k", 6))
    single = hll_build(a.union(b), "k", 6)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, single.collect())
    )


def test_hll_duplicates_do_not_move_registers(spark):
    from etl_pipeline_spark.operators.sketch import hll_build

    once = spark.createDataFrame([Row(k=f"k{i}") for i in range(100)])
    thrice = once.union(once).union(once)
    assert sorted(map(tuple, hll_build(once, "k", 7).collect())) == sorted(
        map(tuple, hll_build(thrice, "k", 7).collect())
    )


def test_hll_corrected_estimate_accurate_in_both_bands(spark):
    from etl_pipeline_spark.operators.sketch import (
        hll_build_grouped,
        hll_estimate_corrected_grouped,
    )

    rows = [Row(g="tiny", k=f"t{i % 5}") for i in range(500)] + [
        Row(g="big", k=f"b{i}") for i in range(5000)
    ]
    df = spark.createDataFrame(rows)
    regs = hll_build_grouped(df, ["g"], "k", p=8)
    est = {r.g: r.est for r in hll_estimate_corrected_grouped(regs, ["g"], p=8).collect()}
    assert abs(est["tiny"] - 5) <= 0.5        # linear-counting band
    assert abs(est["big"] - 5000) <= 0.20 * 5000  # raw band (se ~6.5%)


def test_hll_inclusion_exclusion_intersection(spark):
    from etl_pipeline_spark.operators.sketch import (
        hll_build,
        hll_estimate_corrected,
        hll_merge,
    )

    # |A|=2000, |B|=2000, |A∩B|=1000 (planted overlap)
    a = spark.createDataFrame([Row(k=f"k{i}") for i in range(2000)])
    b = spark.createDataFrame([Row(k=f"k{i}") for i in range(1000, 3000)])
    p = 10
    ra, rb = hll_build(a, "k", p), hll_build(b, "k", p)
    ea = hll_estimate_corrected(ra, p).collect()[0].est
    eb = hll_estimate_corrected(rb, p).collect()[0].est
    eu = hll_estimate_corrected(hll_merge(ra, rb), p).collect()[0].est
    inter = ea + eb - eu
    assert abs(inter - 1000) <= 0.2 * 1000

# --------------------------------------------------------------------------
# Fast-decode parity: the Spark-only conv() decode and the engine-portable
# instr-chain decode must produce the same BIGINT for every input — the
# invariant that lets both engines share the digest-chunk hash family
# (hex8_at_expr) while each keeps its own decode dialect: Spark uses one
# conv() per occurrence, DuckDB oracles keep the portable instr-chain.
# (The hash-family SQL itself changed when digest-chunk hashing landed —
# oracle text is NOT frozen across rounds; only the decode form is shared.)
# --------------------------------------------------------------------------


def test_hex8_fast_decode_equals_portable(spark):
    from etl_pipeline_spark.operators.sketch import hex8_expr

    df = spark.range(500).selectExpr("CAST(id AS STRING) AS s")
    both = df.select(
        F.expr(hex8_expr("s", fast=True)).alias("fast"),
        F.expr(hex8_expr("s")).alias("portable"),
    )
    assert both.filter(F.col("fast") != F.col("portable")).count() == 0


def test_hll_cell_from_h_equals_embedded_form(spark):
    from etl_pipeline_spark.operators.sketch import (
        hex8_expr,
        hll_cell_from_h,
        hll_cell_sql,
    )

    p = 8
    idx_e, rho_e = hll_cell_sql("CAST(id AS STRING)", p)
    idx_f, rho_f = hll_cell_from_h("h", p)
    df = spark.range(500).withColumn(
        "h", F.expr(hex8_expr("CAST(id AS STRING)", fast=True))
    )
    both = df.select(
        F.expr(idx_e).alias("idx_e"),
        F.expr(rho_e).alias("rho_e"),
        F.expr(idx_f).alias("idx_f"),
        F.expr(rho_f).alias("rho_f"),
    )
    bad = both.filter(
        (F.col("idx_e") != F.col("idx_f")) | (F.col("rho_e") != F.col("rho_f"))
    )
    assert bad.count() == 0


def test_histogram_sketch_mergeable_and_bounded(spark):
    """The quantile sketch must behave like the other sketches: cells from
    disjoint slices merge by summing into exactly the whole-table cells,
    and the state never exceeds `bins` rows."""
    from etl_pipeline_spark.operators.sketch import histogram_sketch
    from etl_pipeline_spark.sources.star import load_table
    from tests.conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events")
    cells_all, stats = histogram_sketch(ev, "value", bins=64)
    assert cells_all.count() <= 64
    # merge of halves == whole, PROVIDED the same (mn, mx) domain is used:
    # bin ids depend on the global stats row, so slices bin against it
    lo = ev.filter(F.col("event_id") % 2 == 0)
    hi = ev.filter(F.col("event_id") % 2 == 1)
    import etl_pipeline_spark.operators.sketch as sk

    def cells_with_domain(df):
        return (
            df.crossJoin(F.broadcast(stats))
            .select(F.expr(sk._bin_sql("value", 64)).alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    merged = (
        cells_with_domain(lo)
        .unionByName(cells_with_domain(hi))
        .groupBy("bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    a = sorted(map(tuple, cells_all.collect()))
    b = sorted((r.bin, r.cnt) for r in merged.collect())
    assert a == b


def test_histogram_quantiles_within_bin_width(spark):
    """The interpolated estimate can be off by at most one bin width."""
    from etl_pipeline_spark.operators.sketch import (
        histogram_quantiles,
        histogram_sketch,
    )
    from etl_pipeline_spark.sources.star import load_table
    from tests.conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events")
    cells, stats = histogram_sketch(ev, "value", bins=128)
    est = {r.q: r.est for r in histogram_quantiles(cells, stats, [0.5, 0.9, 0.99]).collect()}
    s = stats.collect()[0]
    width = (s.mx - s.mn) / 128
    exact = ev.agg(
        F.expr("percentile(value, 0.5)").alias("a"),
        F.expr("percentile(value, 0.9)").alias("b"),
        F.expr("percentile(value, 0.99)").alias("c"),
    ).collect()[0]
    for q, ex in ((0.5, exact.a), (0.9, exact.b), (0.99, exact.c)):
        assert abs(est[q] - ex) <= width, (q, est[q], ex, width)
