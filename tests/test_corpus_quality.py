"""Semantics tests for the wave-2 corpus-quality operators (packing,
triangles, gopher rules, MAD anomalies, temperature sampling) — oracle
parity is covered by test_oracle_parity; these pin the algorithmic
guarantees on hand-built inputs."""

from __future__ import annotations

import math

from etl_pipeline_spark.operators.graph import (
    cooccurrence_pairs,
    topk_neighbor_edges,
    triangle_stats,
)
from etl_pipeline_spark.operators.packing import (
    exclusive_prefix_sum,
    pack_sequences,
)


# ------------------------------------------------------------ prefix sum
def test_exclusive_prefix_sum_matches_sequential(spark):
    rows = [(i, (i * 7) % 13 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "id bigint, n bigint")
    # tiny bucket width so the two-level scan crosses many bucket borders
    out = {
        r["id"]: r["cum_excl"]
        for r in exclusive_prefix_sum(df, "id", "n", bucket_width=16).collect()
    }
    acc = 0
    for i, n in rows:
        assert out[i] == acc, f"id {i}"
        acc += n


def test_pack_sequences_budget_boundaries(spark):
    # sizes 100 each, budget 256: docs 0,1,2 start at 0,100,200 -> seq 0;
    # doc 3 starts at 300 -> seq 1 (straddlers belong to their start block)
    df = spark.createDataFrame([(i, 100) for i in range(6)], "id bigint, n bigint")
    out = {r["id"]: r["seq_id"] for r in pack_sequences(df, "id", "n", 256).collect()}
    assert out == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1}


def test_prefix_sum_independent_of_bucket_width(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(50)], "id bigint, n bigint")
    a = {r["id"]: r["cum_excl"] for r in exclusive_prefix_sum(df, "id", "n", 7).collect()}
    b = {r["id"]: r["cum_excl"] for r in exclusive_prefix_sum(df, "id", "n", 4096).collect()}
    assert a == b


# ------------------------------------------------------------- triangles
def test_triangle_stats_on_k4(spark):
    # complete graph on 4 nodes: 6 edges, C(4,3)=4 triangles,
    # wedges = 4 * C(3,2) = 12, gcc = 3*4/12 = 1.0
    edges = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(a + 1, 4)], "src bigint, dst bigint"
    )
    row = triangle_stats(edges).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_wedges, row.n_triangles) == (4, 6, 12, 4)
    assert row.gcc == 1.0


def test_triangle_stats_triangle_free(spark):
    # path graph 0-1-2-3: 3 edges, 2 wedges, no triangles
    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src bigint, dst bigint")
    row = triangle_stats(edges).collect()[0]
    assert (row.n_edges, row.n_wedges, row.n_triangles, row.gcc) == (3, 2, 0, 0.0)


def test_cooccurrence_and_topk_sparsify(spark):
    # groups: {1,2,3} twice, {1,4} once -> pair (1,2),(1,3),(2,3) n=2; (1,4) n=1
    rows = [(10, 1), (10, 2), (10, 3), (11, 1), (11, 2), (11, 3), (12, 1), (12, 4)]
    df = spark.createDataFrame(rows, "g bigint, item bigint")
    pairs = {
        (r.item_a, r.item_b): r.n_shared
        for r in cooccurrence_pairs(df, "g", "item").collect()
    }
    assert pairs == {(1, 2): 2, (1, 3): 2, (2, 3): 2, (1, 4): 1}
    # k=1: 1 keeps (1,2) [tie 2 vs 3 broken by id]; 2 and 4 both keep
    # node 1; 3 keeps (1,3) -> exactly the nominations, |E| <= k*|V|
    edges = {
        (r.src, r.dst)
        for r in topk_neighbor_edges(cooccurrence_pairs(df, "g", "item"), k=1).collect()
    }
    assert edges == {(1, 2), (1, 3), (1, 4)}
    assert len(edges) <= 1 * 4  # k * n_nodes


# ------------------------------------------- gopher rules / MAD / sampling
def test_gopher_rules_discriminate(spark, sf_dir):
    from etl_pipeline_spark.plans.corpus_quality import quality_filter_gopher

    rows = quality_filter_gopher(spark, sf_dir).collect()
    kept = sum(r.keep for r in rows)
    assert 0 < kept < len(rows)  # rules actually split the corpus
    for r in rows:
        assert r.keep == (
            r.r_nwords and r.r_wordlen and r.r_ttr and r.r_stop and r.r_symbol
        )


def test_mad_flags_planted_outlier(spark):
    vals = [float(v) for v in (10, 11, 12, 13, 14, 9, 10, 500)]
    df = spark.createDataFrame([("a", v) for v in vals], "event_type string, value double")
    df.createOrReplaceTempView("ev_tiny")
    out = spark.sql(
        """
        WITH med AS (SELECT event_type, percentile(value, 0.5) AS med
                     FROM ev_tiny GROUP BY event_type),
        dev AS (SELECT e.event_type, ABS(e.value - m.med) AS adev, m.med
                FROM ev_tiny e JOIN med m USING (event_type)),
        stats AS (SELECT event_type, MIN(med) AS med,
                         percentile(adev, 0.5) AS mad FROM dev GROUP BY event_type)
        SELECT SUM(CASE WHEN d.adev > 3.0*1.4826*s.mad THEN 1 ELSE 0 END) AS n
        FROM dev d JOIN stats s USING (event_type)
        """
    ).collect()
    assert out[0].n == 1  # only the planted 500 is flagged


def test_temperature_sampling_upweights_rare_langs(spark, sf_dir):
    from etl_pipeline_spark.plans.corpus_quality import temperature_sampled_mix

    rows = {r.lang: r for r in temperature_sampled_mix(spark, sf_dir).collect()}
    big = max(rows.values(), key=lambda r: r.n_total)
    small = min(rows.values(), key=lambda r: r.n_total)
    # temperature < 1 compresses the mixture: rare langs keep a HIGHER
    # fraction of their docs than dominant ones
    assert small.keep_prob > big.keep_prob
    # keep_prob matches the closed form
    tot = sum(r.n_total for r in rows.values())
    wsum = sum(math.sqrt(r.n_total) for r in rows.values())
    for r in rows.values():
        expect = min(1.0, 0.5 * tot * (math.sqrt(r.n_total) / wsum) / r.n_total)
        assert abs(r.keep_prob - expect) < 1e-6
    # sampled count is binomial-close to expectation (hash uniformity)
    for r in rows.values():
        exp_n = r.keep_prob * r.n_total
        assert abs(r.n_sampled - exp_n) <= 4 * math.sqrt(max(exp_n, 1.0))


def test_lsh_recall_eval_bounds(spark, sf_dir):
    from etl_pipeline_spark.plans.corpus_quality import dedup_lsh_recall_eval

    row = dedup_lsh_recall_eval(spark, sf_dir).collect()[0]
    assert row.n_hits <= min(row.n_truth, row.n_candidates)
    assert 0.0 <= row.precision <= 1.0 and 0.0 <= row.recall <= 1.0
    # the planted near-dups are high-Jaccard: banded LSH should find most
    assert row.recall >= 0.5


# --------------------------------------------------------- label propagation
def test_label_propagation_two_cliques(spark):
    from etl_pipeline_spark.operators.graph import label_propagation

    # two 3-cliques joined by nothing: each collapses to its min label
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (10, 11), (10, 12), (11, 12)],
        "src bigint, dst bigint",
    )
    labels = {r.node: r.label for r in label_propagation(edges, n_iter=3).collect()}
    assert len({labels[0], labels[1], labels[2]}) == 1
    assert len({labels[10], labels[11], labels[12]}) == 1
    assert labels[0] != labels[10]


def test_label_propagation_deterministic_tiebreak(spark):
    from etl_pipeline_spark.operators.graph import label_propagation

    # star: center 5 with leaves 1,2 — round 1: center sees labels {1,2}
    # (tie, count 1 each) -> smallest label 1 wins deterministically
    edges = spark.createDataFrame([(5, 1), (5, 2)], "src bigint, dst bigint")
    labels = {r.node: r.label for r in label_propagation(edges, n_iter=1).collect()}
    assert labels[5] == 1
    # leaves see only the center's label
    assert labels[1] == 5 and labels[2] == 5


def test_rolling_features_window_math(spark):
    # one user, values 1..5: at rn=3 the trailing-3 mean is 2, std is 1
    df = spark.createDataFrame(
        [(i, 1, i * 1000, float(i)) for i in range(1, 6)],
        "event_id bigint, user_id bigint, ts bigint, value double",
    )
    df.createOrReplaceTempView("ev_roll")
    rows = spark.sql(
        """
        SELECT * FROM (
          SELECT event_id, value,
                 ROW_NUMBER() OVER win AS rn,
                 SUM(value) OVER win3 / 3.0 AS m,
                 SQRT(GREATEST((SUM(value*value) OVER win3
                       - SUM(value) OVER win3 * SUM(value) OVER win3 / 3.0) / 2.0,
                      0.0)) AS sd
          FROM ev_roll
          WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id),
                 win3 AS (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        ) WHERE rn >= 3
        """
    ).collect()
    by_id = {r.event_id: r for r in rows}
    assert set(by_id) == {3, 4, 5}
    assert abs(by_id[3].m - 2.0) < 1e-12 and abs(by_id[3].sd - 1.0) < 1e-9
    assert abs(by_id[5].m - 4.0) < 1e-12


# ----------------------------------------------------------- analytics
def test_cohort_retention_offsets_nonnegative(spark, sf_dir):
    from etl_pipeline_spark.plans.analytics import cohort_retention_users

    rows = cohort_retention_users(spark, sf_dir).collect()
    assert rows and all(r.offset_weeks >= 0 for r in rows)
    # offset 0 must exist for every cohort (a user is active in their
    # first-seen week by definition)
    cohorts = {r.cohort_week_epoch for r in rows}
    zero = {r.cohort_week_epoch for r in rows if r.offset_weeks == 0}
    assert cohorts == zero


def test_chisq_contributions_independent_data(spark):
    # uniform 2x2 table -> expected == observed -> zero chi2 everywhere
    rows = [(t, b * 6 * 3_600_000_000_000) for t in ("a", "b") for b in (0, 1) for _ in range(10)]
    df = spark.createDataFrame(rows, "event_type string, ts bigint")
    df.createOrReplaceTempView("ev_chi")
    out = spark.sql(
        """
        WITH obs AS (
            SELECT event_type,
                   CAST(((ts div 3600000000000) % 24) div 6 AS INT) AS daypart,
                   CAST(COUNT(*) AS BIGINT) AS obs
            FROM ev_chi GROUP BY 1, 2
        ),
        r AS (SELECT event_type, SUM(obs) AS row_tot FROM obs GROUP BY 1),
        c AS (SELECT daypart, SUM(obs) AS col_tot FROM obs GROUP BY 1),
        t AS (SELECT SUM(obs) AS n FROM obs)
        SELECT SUM((obs - CAST(row_tot AS DOUBLE) * col_tot / n)
                   * (obs - CAST(row_tot AS DOUBLE) * col_tot / n)
                   / (CAST(row_tot AS DOUBLE) * col_tot / n)) AS chi2
        FROM obs JOIN r USING (event_type) JOIN c USING (daypart) CROSS JOIN t
        """
    ).collect()
    assert abs(out[0].chi2) < 1e-12


def test_corr_moments_match_numpy(spark, sf_dir):
    import numpy as np

    from etl_pipeline_spark.plans.analytics import corr_lineitem_moments

    row = corr_lineitem_moments(spark, sf_dir).collect()[0]
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_quantity", "l_extendedprice", "l_discount"
    ).toPandas()
    np_r = np.corrcoef(li.l_quantity, li.l_extendedprice)[0, 1]
    assert abs(row.r_qty_price - np_r) < 1e-5
    assert abs(row.r_qty_discount) < 0.1  # independent columns


def test_operator_guards(spark):
    import pytest as _pytest

    from etl_pipeline_spark.operators.graph import (
        label_propagation,
        topk_neighbor_edges,
    )
    from etl_pipeline_spark.operators.multimodal import (
        audio_band_energies,
        perceptual_ahash,
    )
    from etl_pipeline_spark.operators.packing import pack_sequences

    df = spark.createDataFrame([(1, 2)], "id bigint, n bigint")
    with _pytest.raises(ValueError):
        pack_sequences(df, "id", "n", budget=0)
    pairs = spark.createDataFrame([(1, 2, 3)], "item_a bigint, item_b bigint, n_shared bigint")
    with _pytest.raises(ValueError):
        topk_neighbor_edges(pairs, k=0)
    edges = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    with _pytest.raises(ValueError):
        label_propagation(edges, n_iter=0)
    media = spark.createDataFrame([(1, bytearray(b""))], "media_id long, payload binary")
    with _pytest.raises(ValueError):
        audio_band_energies(media, n_bands=0)
    # empty payloads don't crash the Arrow kernels
    assert perceptual_ahash(media).collect()[0].ahash_hi == 0
    assert audio_band_energies(media).count() == 0


def test_prefix_sum_property_random(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=5, deadline=None)
    @given(
        sizes=st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=60),
        width=st.integers(min_value=1, max_value=16),
    )
    def check(sizes, width):
        df = spark.createDataFrame(
            list(enumerate(sizes)), "id bigint, n bigint"
        )
        out = {
            r["id"]: r["cum_excl"]
            for r in exclusive_prefix_sum(df, "id", "n", bucket_width=width).collect()
        }
        acc = 0
        for i, n in enumerate(sizes):
            assert out[i] == acc
            acc += n

    check()


# ----------------------------------------------------------------- k-means
def test_kmeans_separates_planted_blobs(spark):
    from etl_pipeline_spark.operators.clustering import kmeans_fit_assign

    # two tight 4-d blobs around (0,...) and (10,...): k=2 must split them
    rows = []
    for i in range(20):
        base = 0.0 if i < 10 else 10.0
        rows.append((i, [base + 0.01 * (i % 5), base, base, base]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = {r.vec_id: r.cluster for r in kmeans_fit_assign(df, k=2, n_iter=3).collect()}
    lo = {out[i] for i in range(10)}
    hi = {out[i] for i in range(10, 20)}
    assert len(lo) == 1 and len(hi) == 1 and lo != hi


def test_kmeans_deterministic(spark):
    from etl_pipeline_spark.operators.clustering import kmeans_fit_assign

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = sorted((r.vec_id, r.cluster) for r in kmeans_fit_assign(emb).collect())
    b = sorted((r.vec_id, r.cluster) for r in kmeans_fit_assign(emb).collect())
    assert a == b


def test_kmeans_guards(spark):
    import pytest as _pytest

    from etl_pipeline_spark.operators.clustering import kmeans_fit_assign

    df = spark.createDataFrame([(1, [1.0])], "vec_id bigint, embedding array<double>")
    with _pytest.raises(ValueError):
        kmeans_fit_assign(df, k=0)
    with _pytest.raises(ValueError):
        kmeans_fit_assign(df, n_iter=0)
    # r11 empty-input convention: empty corpus → empty assignment with
    # the documented schema, matching the oracle's empty result
    empty = df.filter("vec_id < 0")
    out = kmeans_fit_assign(empty)
    assert out.columns == ["vec_id", "cluster"]
    assert out.count() == 0
