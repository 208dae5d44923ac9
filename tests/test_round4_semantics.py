"""Semantic properties of the round-4 wave — invariants beyond oracle
parity (which only proves the two engines agree with each other)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_pipeline_spark.plans.registry import REGISTRY, _ensure_loaded
from tests.conftest import SF_DIR

_ensure_loaded()


def _rows(spark, name):
    return REGISTRY[name].spark_fn(spark, SF_DIR).collect()


def test_kfold_exact_balance_per_stratum(spark):
    rows = _rows(spark, "stratified_kfold_assign")
    by_lang: dict[str, list[int]] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r.n_docs)
    for lang, counts in by_lang.items():
        assert len(counts) == 5, lang
        assert max(counts) - min(counts) <= 1, (lang, counts)
    assert all(r.is_balanced == 1 for r in rows)


def test_token_budget_quotas_sum_exactly(spark):
    rows = _rows(spark, "token_budget_allocation")
    assert sum(r.quota for r in rows) == 100_000
    # largest-remainder: every extra went to a larger remainder than any
    # non-extra arm (ties by lang, so compare keyed tuples)
    got = [(r.remainder, r.lang) for r in rows if r.extra == 1]
    skipped = [(r.remainder, r.lang) for r in rows if r.extra == 0]
    if got and skipped:
        # EVERY extra arm must outrank EVERY skipped arm in the
        # (remainder DESC, lang ASC) order — compare worst-extra vs
        # best-skipped, not best vs best
        assert max((-r, l) for r, l in got) < min((-r, l) for r, l in skipped)


def test_bootstrap_ci_brackets_mean(spark):
    row = _rows(spark, "bootstrap_revenue_ci")[0]
    assert row.n_replicates == 32
    assert row.ci_lo <= row.boot_mean <= row.ci_hi
    # the replicate band should bracket the true mean for Poisson(1)
    # weights over 15k orders (sub-percent spread)
    from etl_pipeline_spark.sources.star import load_table

    true_mean = (
        load_table(spark, SF_DIR, "orders").agg(F.avg("o_totalprice")).collect()[0][0]
    )
    assert row.ci_lo <= true_mean <= row.ci_hi


def test_entity_resolution_copies_resolve_to_original(spark):
    rows = _rows(spark, "entity_resolution_customers")
    canon = {r.entity_id: r.canonical_id for r in rows}
    # every injected copy (id >= 1e6) must resolve into a cluster whose
    # canonical is its source customer's cluster
    for eid, cid in canon.items():
        if eid >= 1_000_000:
            src = eid - 1_000_000
            assert src in canon, eid
            assert canon[src] == cid, (eid, src)
    # canonical rows are self-canonical
    assert all((r.entity_id == r.canonical_id) == bool(r.is_canonical) for r in rows)


def test_interval_islands_are_disjoint_and_cover(spark):
    rows = _rows(spark, "interval_merge_sessions")
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user, islands in by_user.items():
        islands.sort(key=lambda r: r.island_start_epoch)
        for a, b in zip(islands, islands[1:]):
            # merged islands cannot overlap (next starts at/after prev end)
            assert b.island_start_epoch >= a.island_end_epoch - 1, (user, a, b)
        assert [r.island for r in sorted(islands, key=lambda r: r.island)] == list(
            range(1, len(islands) + 1)
        )


def test_jl_distortion_centers_on_one(spark):
    rows = _rows(spark, "jl_projection_distortion")
    assert len(rows) == 50 * 49 // 2
    mean_d = sum(r.distortion for r in rows) / len(rows)
    # JL with m=16: E[distortion] = 1, sd ~ sqrt(2/m) ≈ 0.35 per pair;
    # the MEAN over 1225 pairs concentrates much tighter
    assert 0.8 <= mean_d <= 1.2, mean_d


def test_dedup_canonical_pick_keeps_best_member(spark):
    from etl_pipeline_spark.sources.star import load_table

    rows = _rows(spark, "dedup_canonical_pick")
    docs = {
        r.doc_id: r.q
        for r in load_table(spark, SF_DIR, "documents")
        .select(
            "doc_id",
            F.size(F.array_distinct(F.split("text", " "))).alias("q"),
        )
        .collect()
    }
    for r in rows:
        assert docs[r.kept_doc_id] == r.kept_quality
        assert r.n_dropped == r.n_members - 1
        assert r.n_members >= 2  # clusters come from pairs


def test_rfm_scores_monotone_in_metrics(spark):
    rows = _rows(spark, "rfm_customer_segments")
    # score bands must be monotone: a customer with higher frequency
    # can't have a lower f_score than one with lower frequency
    by_f = sorted(rows, key=lambda r: r.freq)
    for a, b in zip(by_f, by_f[1:]):
        assert a.f_score <= b.f_score
    by_m = sorted(rows, key=lambda r: r.monetary)
    for a, b in zip(by_m, by_m[1:]):
        assert a.m_score <= b.m_score
    assert all(r.rfm == r.r_score * 100 + r.f_score * 10 + r.m_score for r in rows)


def test_pareto_classes_partition_revenue(spark):
    rows = _rows(spark, "pareto_abc_revenue")
    shares = {r.abc: r.revenue_share for r in rows}
    assert set(shares) <= {"A", "B", "C"}
    assert abs(sum(shares.values()) - 1.0) < 1e-4
    # A holds the largest share by construction
    if "A" in shares and "C" in shares:
        assert shares["A"] > shares["C"]


def test_benford_probabilities_normalize(spark):
    rows = _rows(spark, "benford_first_digit")
    assert {r.digit for r in rows} <= set(range(1, 10))
    assert abs(sum(r.observed_p for r in rows) - 1.0) < 1e-4
    expect = {d: math.log10(1 + 1 / d) for d in range(1, 10)}
    for r in rows:
        assert abs(r.expected_p - expect[r.digit]) < 1e-5


def test_markov_rows_normalize_per_source(spark):
    rows = _rows(spark, "markov_transition_events")
    by_from: dict[str, float] = {}
    for r in rows:
        by_from[r.from_type] = by_from.get(r.from_type, 0.0) + r.p_trans
    for ft, total in by_from.items():
        assert abs(total - 1.0) < 1e-4, (ft, total)


def test_late_data_counts_bounded_and_sorted_stream_clean(spark):
    rows = _rows(spark, "late_data_accounting")
    assert all(r.n_late <= r.n_events for r in rows)
    assert any(r.n_events > 0 for r in rows)
    # a stream whose arrival order equals event-time order has no late
    # events: feed the operator an arrival-sorted copy via a temp view
    from etl_pipeline_spark.plans.ops_analytics import (
        _H6_NS,
        _LATE_NS,
    )
    from etl_pipeline_spark.sources.star import load_table
    from pyspark.sql.window import Window as W

    ev = load_table(spark, SF_DIR, "events").select("event_type", "ts")
    sorted_ev = ev.withColumn(
        "event_id", F.row_number().over(W.partitionBy("event_type").orderBy("ts"))
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    late = sorted_ev.select(
        "event_type",
        ((F.col("ts") < F.max("ts").over(w) - _LATE_NS).cast("int")).alias("l"),
    ).agg(F.sum("l")).collect()[0][0]
    assert late == 0


def test_windowed_distinct_est_tracks_exact(spark):
    rows = _rows(spark, "windowed_distinct_users")
    for r in rows:
        if r.n_exact >= 5:
            assert abs(r.est - r.n_exact) <= 0.25 * r.n_exact + 3, r
    grains = {r.grain for r in rows}
    assert grains == {"6h", "24h"}


def test_assoc_lift_symmetric_confidence_not(spark):
    rows = _rows(spark, "assoc_rules_events")
    for r in rows:
        assert r.n_ab <= min(r.n_a, r.n_b)
        assert 0 < r.confidence <= 1
        assert r.lift > 0


def test_adamic_adar_excludes_existing_edges(spark):
    from etl_pipeline_spark.plans.corpus_quality import cosupplier_edges

    edges = {
        (r.src, r.dst)
        for r in cosupplier_edges(spark, SF_DIR).collect()
    }
    rows = _rows(spark, "adamic_adar_link_prediction")
    for r in rows:
        assert (r.node_a, r.node_b) not in edges
        assert r.n_common >= 1 and r.aa_score > 0


def test_textrank_ranks_sum_to_one(spark):
    rows = _rows(spark, "textrank_keywords")
    assert len(rows) == 20
    # top-20 of a rank distribution that sums to 1 over all nodes
    assert 0 < sum(r.rank for r in rows) <= 1.0 + 1e-6
    assert all(r.rank > 0 for r in rows)


def test_theil_sen_robust_to_outlier_month(spark):
    """Injecting one absurd month moves OLS but barely moves Theil-Sen —
    the robustness property the estimator exists for."""
    from pyspark.sql.window import Window as W

    from etl_pipeline_spark.sources.star import load_table

    orders = load_table(spark, SF_DIR, "orders")
    monthly = (
        orders.select(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias("m"),
            "o_totalprice",
        )
        .groupBy("m")
        .agg((F.sum("o_totalprice") / F.count(F.lit(1))).alias("v"))
        .collect()
    )
    import statistics

    def theil_sen(pts):
        slopes = sorted(
            (b[1] - a[1]) / (b[0] - a[0])
            for i, a in enumerate(pts)
            for b in pts[i + 1 :]
        )
        return slopes[(len(slopes) - 1) // 2]

    def ols(pts):
        n = len(pts)
        sx = sum(p[0] for p in pts); sy = sum(p[1] for p in pts)
        sxx = sum(p[0] * p[0] for p in pts); sxy = sum(p[0] * p[1] for p in pts)
        return (n * sxy - sx * sy) / (n * sxx - sx * sx)

    pts = sorted((r.m, r.v) for r in monthly)
    spoiled = pts[:-1] + [(pts[-1][0], pts[-1][1] * 100)]
    ts_shift = abs(theil_sen(spoiled) - theil_sen(pts))
    ols_shift = abs(ols(spoiled) - ols(pts))
    assert ts_shift < ols_shift / 10


def test_attribution_credit_sums_to_attributed_purchases(spark):
    from etl_pipeline_spark.plans.advanced_analytics import _ATTR_NS
    from etl_pipeline_spark.sources.star import load_table

    rows = _rows(spark, "attribution_credit_events")
    total_credit = sum(r.credit for r in rows)
    ev = load_table(spark, SF_DIR, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", F.col("ts").alias("tp")
    )
    touches = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id", F.col("ts").alias("tt")
    )
    n_attributed = (
        purchases.join(
            touches,
            (purchases["user_id"] == touches["user_id"])
            & (F.col("tt") < F.col("tp"))
            & (F.col("tt") >= F.col("tp") - _ATTR_NS),
            "semi",
        ).count()
    )
    # every attributed purchase hands out exactly 1.0 credit in total
    assert abs(total_credit - n_attributed) < 1e-3


def test_stickiness_bounded_and_funnel_ordered(spark):
    srows = _rows(spark, "stickiness_dau_mau")
    assert all(0 < r.stickiness <= 1 for r in srows)
    assert all(r.dau <= r.mau for r in srows)
    frow = _rows(spark, "funnel_latency_quantiles")[0]
    assert frow.p50_latency_sec <= frow.p90_latency_sec
    assert frow.n_conversions > 0
