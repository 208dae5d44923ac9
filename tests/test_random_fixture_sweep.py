"""Registry-vs-oracle parity on RANDOMIZED star-schema fixtures.

The driver's correctness gate and tests/test_oracle_parity.py prove
Spark == DuckDB on the ONE deterministic fixture corpus (seed=42). This
sweep re-runs a cross-family subset of the registry on freshly generated
random fixtures — different key distributions, duplicate timestamps,
empty/1-token documents, a planted zero-norm embedding, negative event
values, orphan foreign keys — so a query whose parity silently depends
on a fixture accident (no ties, dense days, all-positive values, FK
integrity) fails HERE instead of on user data.

Same compare as the driver: row count + column names + order-insensitive
stringified values (tests/conftest.canonicalize).
"""

from __future__ import annotations

import datetime
import random

import duckdb
import pandas as pd
import pytest

from etl_pipeline_spark.plans.registry import REGISTRY, _ensure_loaded
from tests.conftest import canonicalize

_ensure_loaded()

_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

_SEGMENTS = ["MACHINERY", "FURNITURE", "HOUSEHOLD", "BUILDING", "AUTOMOBILE"]
_STATUSES = ["P", "O", "F"]
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_FLAGS = [("A", "O"), ("N", "F"), ("N", "O"), ("A", "F"), ("R", "F"), ("R", "O")]
_EVENT_TYPES = ["signup", "click", "error", "view", "purchase"]
_LANGS = ["en", "de", "zh", "fr", "es"]
_PTYPES = ["MEDIUM", "PROMO", "LARGE", "STANDARD", "ECONOMY", "SMALL"]
_WORDS = (
    "the a spark table scan join merge sort window batch stream row "
    "column value key part order data query filter hash agg vector"
).split()


def _cents(rng: random.Random, lo: int, hi: int) -> float:
    return rng.randint(lo, hi) / 100.0


def _gen_star(out_dir: str, seed: int) -> None:
    """Write a small random star schema matching the fixture schemas
    column-for-column (single parquet FILE per table — both engines read
    the same path)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(seed)

    def write(name: str, df: pd.DataFrame, schema: pa.Schema | None = None) -> None:
        # pandas datetimes default to ns; Spark rejects INT64
        # TIMESTAMP(NANOS) outside the events special-case — write micros
        # like the real fixtures
        for c in df.columns:
            if str(df[c].dtype).startswith("datetime64"):
                df[c] = df[c].astype("datetime64[us]")
        tbl = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
        pq.write_table(tbl, f"{out_dir}/{name}.parquet")

    write(
        "region",
        pd.DataFrame(
            {"r_regionkey": pd.array(range(3), dtype="int32"),
             "r_name": [f"REGION{i}" for i in range(3)]}
        ),
    )
    write(
        "nation",
        pd.DataFrame(
            {
                "n_nationkey": pd.array(range(5), dtype="int32"),
                "n_name": [f"NATION{i}" for i in range(5)],
                "n_regionkey": pd.array(
                    [rng.randrange(3) for _ in range(5)], dtype="int32"
                ),
            }
        ),
    )
    n_cust, n_supp, n_part = 20, 8, 15
    write(
        "customer",
        pd.DataFrame(
            {
                "c_custkey": pd.array(range(1, n_cust + 1), dtype="int64"),
                "c_name": [f"Customer#{i}" for i in range(1, n_cust + 1)],
                "c_nationkey": pd.array(
                    [rng.randrange(5) for _ in range(n_cust)], dtype="int32"
                ),
                # negative balances are in-domain (fixture has them too)
                "c_acctbal": [_cents(rng, -99999, 999999) for _ in range(n_cust)],
                "c_mktsegment": [rng.choice(_SEGMENTS) for _ in range(n_cust)],
            }
        ),
    )
    write(
        "supplier",
        pd.DataFrame(
            {
                "s_suppkey": pd.array(range(1, n_supp + 1), dtype="int64"),
                "s_name": [f"Supplier#{i}" for i in range(1, n_supp + 1)],
                "s_nationkey": pd.array(
                    [rng.randrange(5) for _ in range(n_supp)], dtype="int32"
                ),
                "s_acctbal": [_cents(rng, -99999, 999999) for _ in range(n_supp)],
            }
        ),
    )
    write(
        "part",
        pd.DataFrame(
            {
                "p_partkey": pd.array(range(1, n_part + 1), dtype="int64"),
                "p_name": [f"part {rng.choice(_WORDS)} {i}" for i in range(1, n_part + 1)],
                "p_brand": [f"Brand#{rng.randrange(1, 25)}" for _ in range(n_part)],
                "p_type": [rng.choice(_PTYPES) for _ in range(n_part)],
                "p_size": pd.array(
                    [rng.randrange(1, 50) for _ in range(n_part)], dtype="int32"
                ),
                "p_retailprice": [_cents(rng, 100, 200000) for _ in range(n_part)],
            }
        ),
    )

    n_ord = 60
    d0 = datetime.datetime(1995, 1, 1)
    orders = pd.DataFrame(
        {
            "o_orderkey": pd.array(range(1, n_ord + 1), dtype="int64"),
            # one orphan custkey (no matching customer) — joins must just
            # drop it, never crash or double-count
            "o_custkey": pd.array(
                [n_cust + 99 if i == 0 else rng.randrange(1, n_cust + 1) for i in range(n_ord)],
                dtype="int64",
            ),
            "o_orderstatus": [rng.choice(_STATUSES) for _ in range(n_ord)],
            "o_totalprice": [_cents(rng, 100, 50_000_000) for _ in range(n_ord)],
            "o_orderdate": [
                d0 + datetime.timedelta(days=rng.randrange(0, 900)) for _ in range(n_ord)
            ],
            "o_orderpriority": [rng.choice(_PRIORITIES) for _ in range(n_ord)],
        }
    )
    write("orders", orders)

    n_li = 150
    per_order: dict[int, int] = {}

    def linenum(ok: int) -> int:
        per_order[ok] = per_order.get(ok, 0) + 1
        return per_order[ok]

    okeys = [rng.randrange(1, n_ord + 1) for _ in range(n_li)]
    flags = [rng.choice(_FLAGS) for _ in range(n_li)]
    write(
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": pd.array(okeys, dtype="int64"),
                "l_partkey": pd.array(
                    [rng.randrange(1, n_part + 1) for _ in range(n_li)], dtype="int64"
                ),
                "l_suppkey": pd.array(
                    [rng.randrange(1, n_supp + 1) for _ in range(n_li)], dtype="int64"
                ),
                "l_linenumber": pd.array(
                    [linenum(ok) for ok in okeys], dtype="int32"
                ),
                "l_quantity": [float(rng.randrange(1, 51)) for _ in range(n_li)],
                "l_extendedprice": [_cents(rng, 100, 10_000_000) for _ in range(n_li)],
                "l_discount": [rng.randrange(0, 11) / 100.0 for _ in range(n_li)],
                "l_tax": [rng.randrange(0, 9) / 100.0 for _ in range(n_li)],
                "l_returnflag": [f[0] for f in flags],
                "l_linestatus": [f[1] for f in flags],
                "l_shipdate": [
                    d0 + datetime.timedelta(days=rng.randrange(0, 960))
                    for _ in range(n_li)
                ],
            }
        ),
    )

    n_ev = 200
    t0 = datetime.datetime(2024, 1, 1)
    # duplicate timestamps ON PURPOSE (the round-8 sessionize fix class):
    # draw from a coarse pool so collisions are guaranteed
    ts_pool = [
        t0 + datetime.timedelta(minutes=rng.randrange(0, 60 * 24 * 30)) for _ in range(n_ev // 2)
    ]
    write(
        "events",
        pd.DataFrame(
            {
                "event_id": pd.array(range(1, n_ev + 1), dtype="int64"),
                "ts": [rng.choice(ts_pool) for _ in range(n_ev)],
                "user_id": pd.array(
                    [rng.randrange(1, 11) for _ in range(n_ev)], dtype="int64"
                ),
                "event_type": [rng.choice(_EVENT_TYPES) for _ in range(n_ev)],
                # negative and zero values are in-domain
                "value": [_cents(rng, -100000, 1000000) for _ in range(n_ev)],
                "props": [f'{{"k": {rng.randrange(0, 100)}}}' for _ in range(n_ev)],
            }
        ),
    )

    n_doc = 12
    texts = []
    for i in range(n_doc):
        if i == 0:
            texts.append("")  # empty doc (shingles/token kernels fixed r8)
        elif i == 1:
            texts.append("one")  # sub-n-token doc
        elif i == 2 and n_doc > 3:
            texts.append(texts[-1] if texts[-1] else "one")  # exact dup
        else:
            texts.append(
                " ".join(rng.choice(_WORDS) for _ in range(rng.randrange(3, 40)))
            )
    write(
        "documents",
        pd.DataFrame(
            {
                "doc_id": pd.array(range(1, n_doc + 1), dtype="int64"),
                "text": texts,
                "lang": [rng.choice(_LANGS) for _ in range(n_doc)],
                "source": [f"src{rng.randrange(0, 6)}" for _ in range(n_doc)],
                "n_chars": pd.array([len(t) for t in texts], dtype="int64"),
            }
        ),
    )

    import pyarrow as pa

    n_vec, dim = 12, 64
    vecs = [
        [0.0] * dim  # planted zero-norm vector (NULL-cosine convention)
        if i == 0
        else [rng.uniform(-1.0, 1.0) for _ in range(dim)]
        for i in range(n_vec)
    ]
    emb_schema = pa.schema(
        [
            pa.field("vec_id", pa.int64()),
            pa.field("embedding", pa.list_(pa.float32())),
            pa.field("label", pa.int32()),
        ]
    )
    tbl = pa.Table.from_pydict(
        {
            "vec_id": list(range(1, n_vec + 1)),
            "embedding": vecs,
            "label": [rng.randrange(0, 10) for _ in range(n_vec)],
        },
        schema=emb_schema,
    )
    import pyarrow.parquet as pq

    pq.write_table(tbl, f"{out_dir}/embeddings.parquet")


# Cross-family subset: every family whose semantics are data-independent
# (no fixture-tuned constants that would make random data vacuous).
_SWEEP_QUERIES = [
    # relational / TPC-H shapes
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "q12_priority_class_counts",
    "q14_promo_revenue_share",
    "rollup_order_counts",
    "pivot_orders_status",
    "grouping_sets_status_priority",
    "cube_lineitem_flags",
    "semi_join_include_filter",
    "anti_join_missing",
    "set_ops_union_except",
    "distinct_dedupe",
    "scalar_subquery_above_avg",
    "exists_big_quantity_orders",
    "window_rank_running",
    "lead_lag_order_gaps",
    "window_range_trailing_spend",
    "percentile_event_values",
    "pagination_page_slice",
    # events / time
    "events_tumbling_1h",
    "events_sliding_30m15m",
    "events_sessionize_30m",
    "session_bounce_rate",
    "markov_transition_events",
    "resample_ffill_user_6h",
    "asof_purchase_last_view",
    "range_join_click_attribution",
    "interval_merge_sessions",
    # documents / LLM ops
    "dedup_exact_hash",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "doc_fingerprints",
    "simhash_fingerprints",
    "token_stats",
    "text_quality_scores",
    "tfidf_top_terms",
    # embeddings (incl. the planted zero vector)
    "ann_cosine_topk",
    "dedup_embedding_cosine",
    "knn_label_accuracy",
    # sketches
    "hll_orders_by_flag",
    "cms_partkey_estimates",
    "bloom_supplier_prune",
    # the 24-query same-text SQL surface
    "sql_not_in_null_aware",
    "sql_correlated_scalar_count",
    "sql_keep_first_per_key",
    "sql_histogram_event_values",
    "sql_intersect_except_all",
    "sql_unpivot_status_totals",
    "sql_last_value_ignore_nulls",
    "sql_top_customer_per_segment",
    "sql_monthly_revenue_ma3",
    "sql_funnel_view_click_purchase",
    "sql_ewma_user_values",
    "sql_equidepth_value_deciles",
    "sql_pii_redaction",
    "sql_outlier_iqr_fences",
    "sql_ntile_balance_quartiles",
    "sql_lateral_top2_orders",
    "sql_conditional_agg_filter",
    "sql_fuzzy_name_pairs",
    "sql_zscore_normalize_events",
    "sql_regression_price_trend",
    "sql_mode_priority_by_status",
    "sql_entropy_event_types",
    "sql_drift_psi_event_values",
    "sql_table_checksum_orders",
    # stat tests / distribution analytics on random values
    "benford_first_digit",
    "ks_test_purchase_view",
    "chisq_event_daypart",
    "anova_f_totalprice_priority",
    "mutual_info_status_priority",
    "spearman_corr_daily",
    "kendall_tau_daily",
    "gini_revenue_concentration",
    "lorenz_curve_deciles",
    "hhi_segment_concentration",
    "pareto_abc_revenue",
    "entropy_rate_transitions",
    # commerce / behavioral
    "rfm_customer_segments",
    "stickiness_dau_mau",
    "session_path_topk",
    "funnel_latency_quantiles",
    "attribution_credit_events",
    "markov_attribution_removal",
    # text / corpus quality on random docs
    "doclen_log_histogram",
    "readability_flesch_docs",
    "lexical_diversity_by_lang",
    "tokenizer_fertility_by_lang",
    "zipf_alpha_terms",
    "heaps_vocab_growth",
    "repetition_quality",
    "unigram_surprisal_quality",
    "quality_filter_gopher",
    "lang_id_confusion",
    "top_tokens_per_lang",
    # sampling / splits / privacy audits
    "stratified_sample_langs",
    "train_test_split_assign",
    "weighted_sample_docs",
    "k_anonymity_audit",
    "l_diversity_audit",
    # graph wave (SQL-unrolled oracles) on the random bipartite graph
    "pagerank_part_supplier",
    "triangle_cosupplier_stats",
    "jaccard_link_prediction",
    "adamic_adar_link_prediction",
    "bfs_hops_from_hub",
    "assortativity_cosupplier",
    "modularity_cosupplier",
    "kcore_cosupplier_peel",
    "lpa_cosupplier_communities",
    # dedup / ER / corpus on random docs
    "dedup_canonical_pick",
    "entity_resolution_customers",
    "dedup_containment_pairs",
    "crossdoc_ngram_dup_mass",
    "winnow_fingerprint_pairs",
    "dedup_chunk_exact",
    "doc_chunk_overlap",
    "decontaminate_eval_overlap",
    "keyword_and_search",
    "novelty_rate_docs",
    "inverted_index_postings",
    "bigram_pmi_top",
    # event analytics / survival on random event streams
    "change_point_cusum_events",
    "late_data_accounting",
    "seasonal_baseline_events",
    "windowed_distinct_users",
    "windowed_heavy_hitters",
    "windowed_quantiles",
    "feature_rolling_events",
    "purchase_streaks_histogram",
    "burstiness_user_interarrival",
    "repeat_purchase_interval",
    "cohort_retention_users",
    "kaplan_meier_retention",
    "nelson_aalen_hazard",
    "logrank_test_retention",
    # TPC-H tail shapes (some filter constants may select nothing on a
    # random corpus — empty-vs-empty is still a parity check)
    "q2_min_cost_supplier",
    "q3_top_unshipped_orders",
    "q4_order_priority_check",
    "q9_product_type_profit",
    "q13_customer_distribution",
    "q16_supplier_part_buckets",
    "q18_large_volume_customers",
    "q22_idle_balance_by_country",
    "lead_lag_order_gaps",
    # profiling / sketches / CDC on random keys
    "profile_orders",
    "key_skew_partkey",
    "approx_distinct_users",
    "collect_order_years",
    "quantile_sketch_values",
    "snapshot_diff_orders",
    "incremental_agg_orders",
    "scd2_state_at_purchase",
    "hll_orderkey_cardinality",
    "cms_heavy_hitters",
    # ANN index paths (trained on the random corpus incl. the zero vector)
    "embedding_sq8_topk",
    "ann_ivf_topk",
    "ann_pq_topk",
    "dedup_lsh_recall_eval",
]


@pytest.fixture(scope="module", params=[11, 23])
def random_sf(request, tmp_path_factory):
    out = str(tmp_path_factory.mktemp(f"rand_sf_{request.param}"))
    _gen_star(out, seed=request.param)
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{out}/{t}.parquet')"
        )
    yield out, con
    con.close()


@pytest.mark.parametrize("name", _SWEEP_QUERIES)
def test_query_matches_oracle_on_random_fixture(spark, random_sf, name):
    sf_dir, con = random_sf
    spec = REGISTRY[name]
    assert spec.oracle is not None, f"{name} has no oracle — drop it from the sweep"
    got = canonicalize(spec.spark_fn(spark, sf_dir).toPandas())
    want = canonicalize(con.execute(spec.oracle).fetchdf())
    assert len(got) == len(want), f"{name}: {len(got)} rows vs oracle {len(want)}"
    assert list(got.columns) == list(want.columns), name
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True, obj=name)


# Queries whose analyzed plans retain decimal arithmetic that is PROVABLY
# exact in both engines (documented at the query site) — everything else
# in the shared-text SQL surface must run pure double arithmetic, or the
# engines silently drift (the sql_drift_psi_event_values incident: Spark
# decimal literals over integer-only columns vs DuckDB doubles).
_DECIMAL_EXEMPT = {"sql_histogram_event_values"}


def test_sql_surface_has_no_decimal_arithmetic_drift(spark):
    """Lint: no shared-text SQL query may keep Spark in DECIMAL
    arithmetic (CheckOverflow nodes or decimal-typed casts in the
    analyzed plan) unless exempted above with an exactness proof — bare
    decimal literals over integer columns are the silent-drift class the
    randomized sweep caught."""
    import re

    offenders = {}
    for name, spec in sorted(REGISTRY.items()):
        if not name.startswith("sql_"):
            continue
        plan = (
            spec.spark_fn(spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution()
            .analyzed()
            .toString()
        )
        ndec = len(re.findall(r"decimal\(\d+,\s*\d+\)", plan))
        nover = plan.count("CheckOverflow")
        if (ndec or nover) and name not in _DECIMAL_EXEMPT:
            offenders[name] = (ndec, nover)
    assert not offenders, (
        f"decimal arithmetic in shared-text SQL plans: {offenders} — "
        "use e0-suffixed double literals (0.5e0) or add an exactness-"
        "proven exemption"
    )
