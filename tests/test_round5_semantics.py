"""Semantic properties of the round-5 waves — invariants beyond oracle
parity (parity only proves the two engines agree with each other; these
prove the STATISTICS mean what they claim)."""

from __future__ import annotations

import math

from etl_pipeline_spark.plans.registry import REGISTRY, _ensure_loaded
from tests.conftest import SF_DIR

_ensure_loaded()


def _rows(spark, name):
    return REGISTRY[name].spark_fn(spark, SF_DIR).collect()


def test_vshape_depth_positive_and_counts(spark):
    for r in _rows(spark, "pattern_vshape_prices"):
        assert r.n_vshapes >= 1
        # a V requires >= 2 strict declines: depth strictly positive
        assert r.max_drop > 0


def test_ewma_is_a_weighted_average(spark):
    """Normalized dyadic weights make the EWMA a convex combination:
    it must sit inside the series' [min, max] envelope, and day 1
    (no prior) must equal the revenue itself with no alarm."""
    rows = sorted(_rows(spark, "ewma_control_chart_daily"),
                  key=lambda r: r.day_epoch)
    lo = min(r.rev for r in rows)
    hi = max(r.rev for r in rows)
    for r in rows:
        assert lo - 1e-6 <= r.ewma <= hi + 1e-6
    assert rows[0].alarm == 0 and abs(rows[0].ewma - rows[0].rev) < 1e-6


def test_mann_kendall_statistic_consistency(spark):
    r = _rows(spark, "mann_kendall_trend_revenue")[0]
    max_s = r.n_days * (r.n_days - 1) // 2
    assert -max_s <= r.s_stat <= max_s
    assert r.var_s > 0
    if r.z is not None:
        assert (r.trend == "increasing") == (r.z > 1.959964)
        assert (r.trend == "decreasing") == (r.z < -1.959964)


def test_nelson_aalen_dominated_by_km_log(spark):
    """H_NA(t) <= -ln(S_KM(t)) pointwise (x <= -ln(1-x) termwise) —
    the two survival estimators must tell one consistent story."""
    km = {r.duration_days: r for r in _rows(spark, "kaplan_meier_retention")}
    na = {r.duration_days: r for r in _rows(spark, "nelson_aalen_hazard")}
    assert set(km) == set(na)
    for d, k in km.items():
        if k.km_survival > 0:
            assert na[d].cum_hazard <= -math.log(k.km_survival) + 1e-4
        assert na[d].n_at_risk == k.n_at_risk


def test_cohort_ltv_monotone_in_age(spark):
    by_cohort: dict[int, list] = {}
    for r in _rows(spark, "cohort_ltv_curve"):
        assert r.n_active <= r.n_users
        by_cohort.setdefault(r.cohort_month, []).append(r)
    for rows in by_cohort.values():
        rows.sort(key=lambda r: r.age_month)
        for a, b in zip(rows, rows[1:]):
            assert b.ltv_per_user >= a.ltv_per_user - 1e-9  # cumulative


def test_item_cooccurrence_cosine_bounds(spark):
    for r in _rows(spark, "item_cooccurrence_topk"):
        assert 0 < r.cosine <= 1
        assert r.n_ab <= min(r.n_a, r.n_b)


def test_hhi_bounds(spark):
    for r in _rows(spark, "hhi_segment_concentration"):
        assert 10000 / r.n_customers - 1e-6 <= r.hhi <= 10000 + 1e-6
        assert 0 < r.top_share <= 1
        # HHI >= 10000 * top_share^2 (one term of the sum)
        assert r.hhi >= 10000 * r.top_share**2 - 1e-4


def test_fisher_index_between_laspeyres_and_paasche(spark):
    for r in _rows(spark, "price_index_laspeyres"):
        lo, hi = sorted((r.laspeyres, r.paasche))
        assert lo - 1e-6 <= r.fisher <= hi + 1e-6  # geometric mean
        assert r.n_parts >= 1


def test_burstiness_bounded(spark):
    rows = _rows(spark, "burstiness_user_interarrival")
    assert rows
    for r in rows:
        assert -10 <= r.b_bin <= 10
        assert -1 - 1e-9 <= r.avg_b <= 1 + 1e-9


def test_streak_histogram_accounts_every_purchaser(spark):
    from pyspark.sql import functions as F

    from etl_pipeline_spark.sources.star import load_table

    rows = _rows(spark, "purchase_streaks_histogram")
    n_users = sum(r.n_users for r in rows)
    truth = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .count()
    )
    assert n_users == truth
    assert all(r.max_streak >= 1 for r in rows)


def test_ztest_flag_matches_z(spark):
    r = _rows(spark, "ztest_conversion_ab")[0]
    assert 0 <= r.p_a <= 1 and 0 <= r.p_b <= 1
    if r.z is not None:
        assert r.significant == int(abs(r.z) > 1.959964)


def test_dup_mass_bounds(spark):
    r = _rows(spark, "crossdoc_ngram_dup_mass")[0]
    assert r.n_distinct <= r.n_instances
    assert r.dup_instances <= r.n_instances
    assert 0 <= r.dup_mass <= 1


def test_did_identity_from_cells(spark):
    r = _rows(spark, "diff_in_diff_purchase")[0]
    if r.did_estimate is not None:
        recomputed = (r.treat_post_mean - r.treat_pre_mean) - (
            r.ctrl_post_mean - r.ctrl_pre_mean
        )
        assert abs(r.did_estimate - recomputed) < 1e-4  # rounding only


def test_cuped_reduction_identity(spark):
    r = _rows(spark, "cuped_variance_reduction")[0]
    if r.variance_reduction is not None:
        assert 0 <= r.variance_reduction <= 1  # it's corr(X,Y)^2
        assert abs(
            r.var_cuped - r.var_y * (1 - r.variance_reduction)
        ) <= 1e-3 * max(r.var_y, 1.0)


def test_t_closeness_bounds(spark):
    for r in _rows(spark, "t_closeness_audit"):
        assert 0 <= r.t_distance <= 1  # total variation distance
        assert r.is_violation == int(r.t_distance > 0.2)


def test_er_eval_count_consistency(spark):
    r = _rows(spark, "er_precision_recall")[0]
    assert r.n_tp <= min(r.n_pred, r.n_truth)
    assert 0 <= r.f1 <= 1
    # injected variants always edge to their original by rule 1
    assert r.recall == 1.0


def test_modularity_and_assortativity_in_range(spark):
    q = _rows(spark, "modularity_cosupplier")[0]
    assert -0.5 - 1e-9 <= q.modularity_q < 1
    assert q.n_communities >= 1
    a = _rows(spark, "assortativity_cosupplier")[0]
    if a.assortativity is not None:
        assert -1 - 1e-9 <= a.assortativity <= 1 + 1e-9


def test_bounce_rate_bounds(spark):
    for r in _rows(spark, "session_bounce_rate"):
        assert r.n_bounce <= r.n_sessions
        assert 0 <= r.bounce_rate <= 1


def test_forecast_backtest_models_present(spark):
    rows = {r.model: r for r in _rows(spark, "forecast_backtest_mape")}
    assert set(rows) == {"naive", "seasonal_naive"}
    for r in rows.values():
        assert r.mape >= 0 and r.mae >= 0 and r.n_days > 0
