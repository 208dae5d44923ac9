"""Relational operator queries (SURVEY.md §2.5).

The reference computes each of these shapes imperatively (lookup loops,
set-based dedupe, offset pagination, Counter aggregation); here each is a
declarative DataFrame plan so Catalyst provides pushdown, pruning, broadcast
join selection and partial aggregation. Per query we note the reference
behavior it re-expresses (file:line) and the scale rationale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_pipeline_spark.plans.registry import register
from etl_pipeline_spark.sources.star import load_table

# Exact-cents discounted-revenue device (q1's sum_disc_price, shared by the
# q3/q5 revenue sums): cents(price) × (100 − disc_pct) is an exact integer
# on the 1e-4 lattice; Spark accumulates it in DECIMAL(38,0) (the oracle's
# BIGINT sum widens to HUGEINT) so the 2-dp half-up round is order-free.
_REV_DISC_SPARK = (
    "FLOOR(CAST(SUM(CAST("
    "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)"
    " * CAST(100 - ROUND(l_discount * 100, 0) AS BIGINT)"
    " AS DECIMAL(38,0))) AS DOUBLE)"
    " / 100.0e0 + 0.5e0) / 100.0e0"
)


# --------------------------------------------------------------------------
# Flagship: scan → pushdown filter → hash agg (partial+final) → sort.
# Reference shape: per-source counters + GetCount verification
# (etl/utils/run_summary.py:12-31, etl/loaders/geojson_loader.py:160-183)
# generalized to the TPC-H Q1 pricing-summary pattern.
# Scale: filter + projection reach the parquet scan (PushedFilters/ReadSchema);
# 6-group hash agg with map-side combine — no skew risk, one shuffle.
# Rounded means use the portable exact-lattice device, not ROUND(AVG(x)):
# inputs are exact lattice values (quantity integer, price/discount 2-dp),
# so SUM over the integer-scaled column is an exact order-free BIGINT and
# FLOOR(sum·scale / n + 0.5) is the same correctly-rounded double chain in
# both engines — no partial-agg-order jitter, no repr-vs-binary ROUND
# divergence at midpoints (the agg_metrics_summary / forecast mae class).
# The PLAIN 2-dp money SUM stays ROUND(SUM(double), 2): its true sum is a
# cents multiple, so the nearest 2-dp boundary is 10⁷× the float jitter.
# The PRODUCT sums (disc_price on the 1e-4 lattice, charge on 1e-6) can
# land exactly ON a .005 tie, so they accumulate as exact integers —
# DECIMAL(38,0) on Spark / HUGEINT-summed BIGINT in DuckDB (the gini
# device; BIGINT alone would overflow near 1e19 ≈ tens of TB) — and take
# the FLOOR half-up through identical correctly-rounded double chains.
# --------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    oracle="""
        SELECT
            l_returnflag,
            l_linestatus,
            SUM(l_quantity)                                        AS sum_qty,
            ROUND(SUM(l_extendedprice), 2)                         AS sum_base_price,
            FLOOR(CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                           * CAST(100 - ROUND(l_discount * 100, 0) AS BIGINT))
                       AS DOUBLE)
                  / 100.0e0 + 0.5e0) / 100.0e0                     AS sum_disc_price,
            FLOOR(CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                           * CAST(100 - ROUND(l_discount * 100, 0) AS BIGINT)
                           * CAST(100 + ROUND(l_tax * 100, 0) AS BIGINT))
                       AS DOUBLE)
                  / 10000.0e0 + 0.5e0) / 100.0e0                   AS sum_charge,
            FLOOR(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) * 1.0e6
                  / COUNT(*) + 0.5e0) / 1.0e6                      AS avg_qty,
            FLOOR(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) * 1.0e0
                  / COUNT(*) + 0.5e0) / 100.0e0                    AS avg_price,
            FLOOR(SUM(CAST(ROUND(l_discount * 100, 0) AS BIGINT)) * 1.0e4
                  / COUNT(*) + 0.5e0) / 1.0e6                      AS avg_disc,
            COUNT(*)                                               AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "pushdown", "flagship"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.expr("CAST('1998-09-02 00:00:00' AS TIMESTAMP_NTZ)"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            # DECIMAL(38,0) accumulators mirror the oracle's HUGEINT sums
            # (exact at any scale); every post-SUM op is double
            F.expr(
                "FLOOR(CAST(SUM(CAST("
                "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)"
                " * CAST(100 - ROUND(l_discount * 100, 0) AS BIGINT)"
                " AS DECIMAL(38,0))) AS DOUBLE)"
                " / 100.0e0 + 0.5e0) / 100.0e0"
            ).alias("sum_disc_price"),
            F.expr(
                "FLOOR(CAST(SUM(CAST("
                "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)"
                " * CAST(100 - ROUND(l_discount * 100, 0) AS BIGINT)"
                " * CAST(100 + ROUND(l_tax * 100, 0) AS BIGINT)"
                " AS DECIMAL(38,0))) AS DOUBLE)"
                " / 10000.0e0 + 0.5e0) / 100.0e0"
            ).alias("sum_charge"),
            F.expr(
                "FLOOR(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) * 1.0e6"
                " / COUNT(*) + 0.5e0) / 1.0e6"
            ).alias("avg_qty"),
            F.expr(
                "FLOOR(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) * 1.0e0"
                " / COUNT(*) + 0.5e0) / 100.0e0"
            ).alias("avg_price"),
            F.expr(
                "FLOOR(SUM(CAST(ROUND(l_discount * 100, 0) AS BIGINT)) * 1.0e4"
                " / COUNT(*) + 0.5e0) / 1.0e6"
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# 3-way join + agg + top-k (TPC-H Q3 shape).
# Reference shape: priority-ordered selection, `ORDER BY … LIMIT k`
# (etl/utils/recovery.py:108-110, error list cap run_summary.py:28-30).
# Scale: customer filter prunes before the join; orders⋈lineitem is the big
# shuffle — both sides hash-partitioned on orderkey; top-k is a TakeOrdered,
# no global sort materialization.
# Revenue uses the exact-cents device (q1's sum_disc_price): the discounted
# price is exact on the 1e-4 lattice, so the sum accumulates as an exact
# 128-bit integer (DECIMAL(38,0) / HUGEINT) and the 2-dp round is
# order-free — no partial-agg jitter can flip a .005 tie, and the
# DESC-revenue sort key is bit-identical in both engines.
# --------------------------------------------------------------------------
@register(
    "q3_top_unshipped_orders",
    oracle="""
        SELECT
            l_orderkey,
            FLOOR(CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                           * CAST(100 - ROUND(l_discount * 100, 0) AS BIGINT))
                       AS DOUBLE)
                  / 100.0e0 + 0.5e0) / 100.0e0 AS revenue,
            o_orderdate,
            o_orderpriority
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    tags=("join", "agg", "topk"),
)
def q3_top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = "CAST('1998-03-15 00:00:00' AS TIMESTAMP_NTZ)"
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(F.expr(f"o_orderdate < {cutoff}"))
    li = load_table(spark, sf_dir, "lineitem").filter(F.expr(f"l_shipdate > {cutoff}"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.expr(_REV_DISC_SPARK).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# 6-table join through dimensions (TPC-H Q5 shape) — the deep-join stressor.
# Reference shape: authority→dataset lookup chains (etl/pipeline.py:747-770).
# Scale: region/nation/supplier broadcast; only customer⋈orders⋈lineitem
# shuffle. AQE reorders/skew-splits at runtime.
# --------------------------------------------------------------------------
@register(
    "q5_local_supplier_volume",
    oracle="""
        SELECT
            n_name,
            FLOOR(CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                           * CAST(100 - ROUND(l_discount * 100, 0) AS BIGINT))
                       AS DOUBLE)
                  / 100.0e0 + 0.5e0) / 100.0e0 AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name
    """,
    tags=("join", "agg", "broadcast"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.expr("CAST('1996-01-01 00:00:00' AS TIMESTAMP_NTZ)"))
        & (F.col("o_orderdate") < F.expr("CAST('1997-01-01 00:00:00' AS TIMESTAMP_NTZ)"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.expr(_REV_DISC_SPARK).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Broadcast lookup join — the reference's mapping/source↔FC resolution
# (etl/mapping.py:128-170, etl/models.py:144-237) is a per-row Python loop
# over a tiny dimension; on Spark it's a broadcast hash join, zero shuffle
# on the dimension side.
# --------------------------------------------------------------------------
@register(
    "lookup_enrich_customers",
    oracle="""
        SELECT
            r_name,
            n_name,
            COUNT(*)                    AS n_customers,
            -- exact-cents mean (the q1 device): SUM(cents) is an exact
            -- order-free BIGINT; FLOOR(x + 0.5) is half-up toward +inf,
            -- identical in both engines even for negative balances
            FLOOR(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) * 1.0e4
                  / COUNT(*) + 0.5e0) / 1.0e6 AS avg_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
    tags=("join", "broadcast"),
)
def lookup_enrich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.expr(
                "FLOOR(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) * 1.0e4"
                " / COUNT(*) + 0.5e0) / 1.0e6"
            ).alias("avg_acctbal"),
        )
    )


# --------------------------------------------------------------------------
# Semi-join include filter — the reference filters GPKG feature classes and
# OGC collections against configured `include` lists
# (etl/loaders/gpkg_loader.py:193-218, etl/handlers/ogc_api.py:320-339).
# --------------------------------------------------------------------------
@register(
    "semi_join_include_filter",
    oracle="""
        SELECT s_suppkey, s_name, s_acctbal
        FROM supplier
        WHERE s_nationkey IN (
            SELECT n_nationkey FROM nation
            WHERE n_name IN ('NATION_1', 'NATION_7', 'NATION_13', 'NATION_19')
        )
    """,
    tags=("join", "semi"),
)
def semi_join_include_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    include = ("NATION_1", "NATION_7", "NATION_13", "NATION_19")
    supp = load_table(spark, sf_dir, "supplier")
    nations = load_table(spark, sf_dir, "nation").filter(F.col("n_name").isin(*include))
    return supp.join(
        F.broadcast(nations), supp.s_nationkey == nations.n_nationkey, "leftsemi"
    ).select("s_suppkey", "s_name", "s_acctbal")


# --------------------------------------------------------------------------
# Anti-join — the reference computes `missing = configured - found` for OGC
# collections (etl/handlers/ogc_api.py:329-338). Here: customers that never
# placed an order.
# --------------------------------------------------------------------------
@register(
    "anti_join_missing",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tags=("join", "anti"),
)
def anti_join_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "leftanti").select(
        "c_custkey", "c_name"
    )


# --------------------------------------------------------------------------
# Distinct dedupe — the reference dedupes Atom enclosure URLs via a Python
# set (etl/handlers/atom_feed.py:83-103); relationally it's DISTINCT.
# --------------------------------------------------------------------------
@register(
    "distinct_dedupe",
    oracle="""
        SELECT DISTINCT o_custkey, o_orderstatus, o_orderpriority
        FROM orders
        WHERE o_totalprice > 100000
    """,
    tags=("dedupe",),
)
def distinct_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_totalprice") > 100000)
        .select("o_custkey", "o_orderstatus", "o_orderpriority")
        .dropDuplicates()
    )


# --------------------------------------------------------------------------
# LIMIT/OFFSET pagination — the reference pages REST results with
# resultOffset/resultRecordCount (etl/handlers/rest_api.py:575-637). The
# relational semantics: row_number over a total order, sliced to one page.
# A bare ROW_NUMBER() OVER (ORDER BY key) funnels the whole table through
# ONE task at 100×; the global row number is instead the two-level
# distributed prefix sum (operators/packing.py): per-bucket counts, a
# window over the SMALL bucket-offsets relation, broadcast back, local
# intra-bucket cumsum — rn = exclusive_count_of_smaller_keys + 1. The
# oracle keeps the ROW_NUMBER spelling; values identical by definition.
# --------------------------------------------------------------------------
@register(
    "pagination_page_slice",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice, rn
        FROM (
            SELECT o_orderkey, o_custkey, o_totalprice,
                   ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn
            FROM orders
        )
        WHERE rn > 300 AND rn <= 400
    """,
    tags=("window", "pagination"),
)
def pagination_page_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_pipeline_spark.operators.packing import exclusive_prefix_sum

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    with_rn = exclusive_prefix_sum(
        orders.withColumn("__one", F.lit(1)), "o_orderkey", "__one"
    )
    return with_rn.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        (F.col("cum_excl") + 1).cast("int").alias("rn"),
    ).filter((F.col("rn") > 300) & (F.col("rn") <= 400))


# --------------------------------------------------------------------------
# Page bucketing — the reference's pagination loop materializes page after
# page of max_record_count features (etl/handlers/rest_api.py:252-298);
# expressed as sequence packing with budget = page size: page_nr =
# floor(exclusive_prefix_count / 2000) + 1 via the same two-level
# distributed prefix sum (operators/packing.py::pack_sequences), then
# per-page stats (the page manifest a distributed fetcher would plan
# from). No single-partition window over orders anywhere in the plan.
# --------------------------------------------------------------------------
@register(
    "pagination_page_manifest",
    oracle="""
        SELECT
            CAST(FLOOR((rn - 1) / 2000) + 1 AS BIGINT) AS page_nr,
            COUNT(*)        AS page_rows,
            MIN(o_orderkey) AS first_key,
            MAX(o_orderkey) AS last_key
        FROM (
            SELECT o_orderkey, ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn
            FROM orders
        )
        GROUP BY 1
    """,
    tags=("window", "pagination"),
)
def pagination_page_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_pipeline_spark.operators.packing import pack_sequences

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    packed = pack_sequences(
        orders.withColumn("__one", F.lit(1)), "o_orderkey", "__one", budget=2000
    )
    return (
        packed.select(
            "o_orderkey", (F.col("seq_id") + 1).cast("bigint").alias("page_nr")
        )
        .groupBy("page_nr")
        .agg(
            F.count(F.lit(1)).alias("page_rows"),
            F.min("o_orderkey").alias("first_key"),
            F.max("o_orderkey").alias("last_key"),
        )
    )


# --------------------------------------------------------------------------
# Set ops — the reference concatenates file lists (union,
# etl/loaders/filegdb.py:257-259) and subtracts found ids from configured
# ids (except, etl/handlers/ogc_api.py:330-333).
# --------------------------------------------------------------------------
@register(
    "set_ops_union_except",
    oracle="""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        UNION
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("setop",),
)
def set_ops_union_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    open_c = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    part_c = orders.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    done_c = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    # SQL UNION/EXCEPT are distinct-set semantics → union().distinct(), exceptAll
    # would keep duplicates.
    return open_c.union(part_c).distinct().exceptAll(done_c.distinct())


# --------------------------------------------------------------------------
# Metrics aggregation — the reference aggregates run metrics imperatively
# (etl/monitoring.py:206-233: min/max/avg/count per metric;
# etl/utils/concurrent.py:33-72: success rates). One groupBy does all of it,
# with map-side partial aggregation.
# --------------------------------------------------------------------------
@register(
    "agg_metrics_summary",
    # avg_value via EXACT INTEGER CENTS, not ROUND(AVG(double), 6): the
    # float sum inside AVG carries ~1e-15 partial-agg-order jitter, and a
    # group mean landing ON a 6-dp rounding boundary flips the rounded
    # digit between engines (and between Spark runs — partition order is
    # not deterministic). Sweep-found on a random corpus. SUM(cents) is an
    # exact BIGINT; /100.0e0/COUNT(*) is the same two correctly-rounded
    # double ops in both engines — bit-identical, order-free. The 2-dp
    # money sums are safe as-is: the true sum is a multiple of 0.01, so
    # the nearest 2-dp boundary is ~0.005 away, 10⁷× the jitter.
    oracle="""
        SELECT
            event_type,
            COUNT(*)                       AS n_events,
            COUNT(DISTINCT user_id)        AS n_users,
            ROUND(SUM(value), 2)           AS total_value,
            ROUND(SUM(CAST(ROUND(value * 100, 0) AS BIGINT))
                  / 100.0e0 / COUNT(*), 6) AS avg_value,
            ROUND(MIN(value), 2)           AS min_value,
            ROUND(MAX(value), 2)           AS max_value
        FROM events
        GROUP BY event_type
    """,
    tags=("agg", "metrics"),
)
def agg_metrics_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.expr(
            "ROUND(SUM(CAST(ROUND(value * 100, 0) AS BIGINT))"
            " / 100.0e0 / COUNT(*), 6)"
        ).alias("avg_value"),
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.max("value"), 2).alias("max_value"),
    )


# --------------------------------------------------------------------------
# Conditional success-rate aggregation — run_summary's done/skip/error
# ratios (etl/utils/run_summary.py:33-47) as CASE-WHEN fractions.
# --------------------------------------------------------------------------
@register(
    "agg_success_rate",
    oracle="""
        SELECT
            o_orderpriority,
            COUNT(*) AS n_orders,
            ROUND(AVG(CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END), 6)
                AS fulfilled_rate,
            ROUND(SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END), 2)
                AS open_value
        FROM orders
        GROUP BY o_orderpriority
    """,
    tags=("agg", "conditional"),
)
def agg_success_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    fulfilled = F.when(F.col("o_orderstatus") == "F", F.lit(1.0)).otherwise(F.lit(0.0))
    open_val = F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice")).otherwise(F.lit(0.0))
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.avg(fulfilled), 6).alias("fulfilled_rate"),
        F.round(F.sum(open_val), 2).alias("open_value"),
    )


# --------------------------------------------------------------------------
# Ranking / running windows — beyond the reference (SURVEY §2.5 notes it has
# no window functions) but required of a complete engine: per-customer order
# rank and running spend.
# --------------------------------------------------------------------------
@register(
    "window_rank_running",
    oracle="""
        SELECT
            o_custkey,
            o_orderkey,
            RANK() OVER (PARTITION BY o_custkey
                         ORDER BY o_totalprice DESC NULLS LAST, o_orderkey)
                AS spend_rank,
            ROUND(SUM(o_totalprice) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate NULLS LAST, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                AS running_spend
        FROM orders
        WHERE o_custkey < 100
    """,
    tags=("window",),
)
def window_rank_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    # explicit NULL placement (r11 nulls probe): Spark orders ASC NULLS
    # FIRST where DuckDB orders NULLS LAST — an undated order would lead
    # one engine's running-spend timeline and trail the other's.
    # Convention: rows missing the ordering attribute accumulate last.
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    rank_w = Window.partitionBy("o_custkey").orderBy(
        F.desc_nulls_last("o_totalprice"), F.asc("o_orderkey")
    )
    run_w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc_nulls_last("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(rank_w).alias("spend_rank"),
        F.round(F.sum("o_totalprice").over(run_w), 2).alias("running_spend"),
    )


# --------------------------------------------------------------------------
# Single-group filter aggregation (TPC-H Q6 shape) — the all-pushdown query:
# every predicate reaches the scan, agg collapses to one row.
# Revenue is price × discount — exact on the 1e-4 lattice, so it takes the
# exact-cents device (integer accumulate, order-free 2-dp half-up round).
# --------------------------------------------------------------------------
@register(
    "q6_forecast_revenue",
    oracle="""
        SELECT FLOOR(CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                              * CAST(ROUND(l_discount * 100, 0) AS BIGINT))
                          AS DOUBLE)
                     / 100.0e0 + 0.5e0) / 100.0e0 AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
    """,
    tags=("agg", "pushdown"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.expr("CAST('1996-01-01 00:00:00' AS TIMESTAMP_NTZ)"))
            & (F.col("l_shipdate") < F.expr("CAST('1997-01-01 00:00:00' AS TIMESTAMP_NTZ)"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.expr(
                "FLOOR(CAST(SUM(CAST("
                "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)"
                " * CAST(ROUND(l_discount * 100, 0) AS BIGINT)"
                " AS DECIMAL(38,0))) AS DOUBLE)"
                " / 100.0e0 + 0.5e0) / 100.0e0"
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# ROLLUP — hierarchical subtotals (status → priority → grand total), the
# relational form of the reference's per-phase + per-run counter rollups
# (etl/utils/run_summary.py:33-47).
# --------------------------------------------------------------------------
@register(
    "rollup_order_counts",
    oracle="""
        SELECT
            COALESCE(o_orderstatus, '<all>')   AS status,
            COALESCE(o_orderpriority, '<all>') AS priority,
            COUNT(*)                           AS n_orders,
            ROUND(SUM(o_totalprice), 2)        AS total_value
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        -- empty-input convention: Spark's rollup() emits NO rows over an
        -- empty relation; the zero-count grand-total row DuckDB emits is
        -- dropped in both engines (probe, r11)
        HAVING COUNT(*) > 0
    """,
    tags=("agg", "rollup"),
)
def rollup_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_value"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("<all>")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("<all>")).alias("priority"),
            "n_orders",
            "total_value",
        )
    )


# --------------------------------------------------------------------------
# Correlated EXISTS subquery — orders containing any near-max-quantity line
# (decorrelated by Catalyst into a semi-join).
# --------------------------------------------------------------------------
@register(
    "exists_big_quantity_orders",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_quantity >= 49
        )
    """,
    tags=("join", "subquery"),
)
def exists_big_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    big = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return orders.join(
        big, orders.o_orderkey == big.l_orderkey, "leftsemi"
    ).select("o_orderkey", "o_totalprice")


# --------------------------------------------------------------------------
# Scalar subquery — customers above the global average balance; the scalar
# aggregate broadcasts as a literal after its own one-row plan.
# --------------------------------------------------------------------------
@register(
    "scalar_subquery_above_avg",
    oracle="""
        SELECT c_custkey, ROUND(c_acctbal, 2) AS acctbal
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
    """,
    tags=("subquery",),
)
def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    avg_bal = cust.agg(F.avg("c_acctbal").alias("a"))
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .select("c_custkey", F.round("c_acctbal", 2).alias("acctbal"))
    )


# --------------------------------------------------------------------------
# LEAD/LAG — inter-order gaps per customer in days; the event-sequence
# analysis shape (epoch-day arithmetic on TIMESTAMP_NTZ, tz-proof).
# --------------------------------------------------------------------------
@register(
    "lead_lag_order_gaps",
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(date_diff('day',
                    LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                           ORDER BY o_orderdate, o_orderkey),
                    o_orderdate) AS BIGINT) AS days_since_prev
        FROM orders
        WHERE o_custkey < 200
    """,
    tags=("window",),
)
def lead_lag_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), prev).cast("bigint").alias("days_since_prev"),
    )


# --------------------------------------------------------------------------
# Exact percentiles — the reference's metric summaries keep min/max/avg only
# (etl/monitoring.py:206-233); an engine needs distribution statistics.
# Spark `percentile()` and DuckDB `quantile_cont` implement the same
# interpolated definition — verified bit-identical.
# --------------------------------------------------------------------------
@register(
    "percentile_event_values",
    oracle="""
        SELECT event_type,
               ROUND(quantile_cont(value, 0.50), 6) AS p50,
               ROUND(quantile_cont(value, 0.95), 6) AS p95,
               ROUND(quantile_cont(value, 0.99), 6) AS p99
        FROM events
        GROUP BY event_type
    """,
    tags=("agg", "metrics"),
)
def percentile_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.50)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


# --------------------------------------------------------------------------
# CUBE — all grouping combinations in one pass (multi-dimensional run
# metrics: phase × status in the reference's summary becomes one CUBE).
# --------------------------------------------------------------------------
@register(
    "cube_lineitem_flags",
    oracle="""
        SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
               COALESCE(l_linestatus, '<all>') AS linestatus,
               COUNT(*) AS n_lines,
               SUM(l_quantity) AS total_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        -- empty-input convention: Spark's cube() emits NO rows over an
        -- empty relation, while the SQL standard (and DuckDB) emit one
        -- zero-count grand-total row; both engines drop it (probe, r11)
        HAVING COUNT(*) > 0
    """,
    tags=("agg", "cube"),
)
def cube_lineitem_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_lines"), F.sum("l_quantity").alias("total_qty"))
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("<all>")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("<all>")).alias("linestatus"),
            "n_lines",
            "total_qty",
        )
    )


# --------------------------------------------------------------------------
# PIVOT — status columns per priority (wide metrics table). Spark's pivot
# relational operator; the oracle spells it as conditional aggregation,
# which is also exactly what Spark plans underneath.
# --------------------------------------------------------------------------
@register(
    "pivot_orders_status",
    oracle="""
        SELECT o_orderpriority,
               CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS status_f,
               CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS status_o,
               CAST(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS status_p
        FROM orders
        GROUP BY o_orderpriority
    """,
    tags=("agg", "pivot"),
)
def pivot_orders_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce(F.col("F"), F.lit(0)).alias("status_f"),
            F.coalesce(F.col("O"), F.lit(0)).alias("status_o"),
            F.coalesce(F.col("P"), F.lit(0)).alias("status_p"),
        )
    )


# --------------------------------------------------------------------------
# Order-priority checking (TPC-H Q4 shape): EXISTS-gated counts — pure
# count aggregation, hash-exact (no float arithmetic at all).
# --------------------------------------------------------------------------
@register(
    "q4_order_priority_check",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
          AND EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
          )
        GROUP BY o_orderpriority
    """,
    tags=("join", "agg", "subquery"),
)
def q4_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.expr("CAST('1996-07-01 00:00:00' AS TIMESTAMP_NTZ)"))
        & (F.col("o_orderdate") < F.expr("CAST('1996-10-01 00:00:00' AS TIMESTAMP_NTZ)"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (li.l_orderkey == orders.o_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "leftsemi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


# --------------------------------------------------------------------------
# Shipping-mode buckets (TPC-H Q12 shape): conditional counts by priority
# class — CASE-WHEN aggregation, hash-exact.
# --------------------------------------------------------------------------
@register(
    "q12_priority_class_counts",
    oracle="""
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_linestatus
    """,
    tags=("join", "agg", "conditional"),
)
def q12_priority_class_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("CAST('1997-01-01 00:00:00' AS TIMESTAMP_NTZ)"))
        & (F.col("l_shipdate") < F.expr("CAST('1998-01-01 00:00:00' AS TIMESTAMP_NTZ)"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# Promotion revenue share (TPC-H Q14 shape): a ratio of conditional sums —
# one rounded scalar output.
# --------------------------------------------------------------------------
@register(
    "q14_promo_revenue_share",
    oracle="""
        SELECT ROUND(
                   -- NULLIF: an all-zero-revenue month (free-item lines
                   -- only) has no defined promo share — NULL, not an
                   -- ANSI 0-divide (probe-found on a truncated corpus)
                   100.0 * SUM(CASE WHEN p_type = 'PROMO'
                                    THEN l_extendedprice * (1 - l_discount)
                                    ELSE 0 END)
                   / NULLIF(SUM(l_extendedprice * (1 - l_discount)), 0), 4)
               AS promo_revenue_pct
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
    tags=("join", "agg"),
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("CAST('1997-03-01 00:00:00' AS TIMESTAMP_NTZ)"))
        & (F.col("l_shipdate") < F.expr("CAST('1997-04-01 00:00:00' AS TIMESTAMP_NTZ)"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0 * F.sum(promo) / F.nullif(F.sum(rev), F.lit(0.0)), 4
            ).alias("promo_revenue_pct")  # zero-revenue month → NULL
        )
    )


# --------------------------------------------------------------------------
# Approximate distinct (HyperLogLog++) — the cardinality sketch a metrics
# layer uses at 100 TB where exact COUNT(DISTINCT) would shuffle every key.
# The approx VALUE has no DuckDB twin (different HLL implementations), so
# the driver-checkable contract is the accuracy CLAIM instead: the output
# carries the exact count plus approx_in_bounds = |approx − exact| ≤
# 3·rsd·exact, and the oracle recomputes n_events + exact_users cell-exact
# and asserts the bound column is 1 for every group. If Spark's estimate
# ever drifts out of tolerance the hash mismatches — the weaker rows-only
# check is gone. (The exact twin exists to make the claim checkable; the
# production pattern at 100 TB is the approx column alone, or the
# engine's own mergeable HLL relation — hll_orderkey_cardinality /
# hll_orders_by_flag — when cell-exact oracle parity is required.)
# --------------------------------------------------------------------------
@register(
    "approx_distinct_users",
    oracle="""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
               CAST(1 AS INT) AS approx_in_bounds
        FROM events GROUP BY 1
    """,
    tags=("agg", "approx"),
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    rsd = 0.05
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=rsd).alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("exact_users"),
    ).select(
        "event_type",
        "n_events",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= 3 * rsd * F.col("exact_users")
        )
        .cast("int")
        .alias("approx_in_bounds"),
    )


# --------------------------------------------------------------------------
# GROUPING SETS — the explicit-set sibling of ROLLUP/CUBE: exactly the
# (status,priority), (status), (priority) groupings, no grand total. One
# pass, one expand+shuffle; the reference's per-phase AND per-status
# counters in a single plan.
# --------------------------------------------------------------------------
@register(
    "grouping_sets_status_priority",
    oracle="""
        SELECT COALESCE(o_orderstatus, '<any>')   AS status,
               COALESCE(o_orderpriority, '<any>') AS priority,
               CAST(COUNT(*) AS BIGINT)           AS n_orders,
               ROUND(SUM(o_totalprice), 2)        AS total_value
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), (o_orderpriority))
    """,
    tags=("agg", "grouping_sets"),
)
def grouping_sets_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], ["o_orderpriority"]],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_value"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("<any>")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("<any>")).alias("priority"),
            "n_orders",
            "total_value",
        )
    )


# --------------------------------------------------------------------------
# Array aggregation roundtrip — collect_set → sort_array → string join: the
# "gather a small set per group" shape (the reference gathers per-source
# file lists, etl/loaders/filegdb.py:243-278). Emitted as a joined string
# so the value hash is representation-independent across engines.
# --------------------------------------------------------------------------
@register(
    "collect_order_years",
    oracle="""
        SELECT c_custkey,
               array_to_string(list_sort(list_distinct(list(
                   CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)))), ',')
                   AS order_years
        -- o_orderdate IS NOT NULL (r11 nulls probe): an undated order has
        -- no year — a customer with ONLY undated orders came back as ''
        -- from Spark's concat_ws-over-empty-set vs NULL from DuckDB's
        -- string_agg
        FROM customer JOIN orders ON c_custkey = o_custkey
        WHERE c_custkey < 100 AND o_orderdate IS NOT NULL
        GROUP BY c_custkey
    """,
    tags=("agg", "array"),
)
def collect_order_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 100)
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .groupBy("c_custkey")
        .agg(
            F.concat_ws(
                ",", F.sort_array(F.collect_set(F.year("o_orderdate").cast("bigint")))
            ).alias("order_years")
        )
    )


# --------------------------------------------------------------------------
# RANGE-frame window — value-based frame (trailing 90 days by ORDER BY
# value, not row count): the moving-aggregate shape rows-frames can't
# express when rows are unevenly spaced. Sort key is epoch DAYS (integer,
# tz-proof) so both engines share frame arithmetic exactly.
# --------------------------------------------------------------------------
@register(
    "window_range_trailing_spend",
    oracle="""
        SELECT o_custkey, o_orderkey, epoch_day,
               ROUND(SUM(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY epoch_day
                   RANGE BETWEEN 90 PRECEDING AND CURRENT ROW), 2)
                   AS trailing_90d_spend
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   CAST(date_diff('day', TIMESTAMP '1970-01-01 00:00:00',
                                  o_orderdate) AS BIGINT) AS epoch_day
            FROM orders
        )
        WHERE o_custkey < 150
    """,
    tags=("window", "range-frame"),
)
def window_range_trailing_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 150)
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("timestamp_ntz"))
            .cast("bigint")
            .alias("epoch_day"),
        )
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("epoch_day")
        .rangeBetween(-90, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "epoch_day",
        F.round(F.sum("o_totalprice").over(w), 2).alias("trailing_90d_spend"),
    )


# --------------------------------------------------------------------------
# Distribution windows — NTILE quartiles + PERCENT_RANK + CUME_DIST over
# account balance per nation: the analytics-ranking triple in one window
# pass (single sort per partition).
# --------------------------------------------------------------------------
@register(
    "window_balance_distribution",
    oracle="""
        SELECT c_nationkey, c_custkey,
               CAST(NTILE(4) OVER w AS BIGINT)        AS quartile,
               ROUND(PERCENT_RANK() OVER w, 6)        AS pct_rank,
               ROUND(CUME_DIST() OVER w, 6)           AS cume
        FROM customer
        WHERE c_nationkey < 5 AND c_acctbal IS NOT NULL
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
    tags=("window", "distribution"),
)
def window_balance_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # c_acctbal IS NOT NULL (r11 nulls probe): a missing balance has no
    # rank — Spark's NULLS FIRST would seat it in quartile 1, DuckDB's
    # NULLS LAST in quartile 4, shifting cume/pct for the whole nation.
    cust = load_table(spark, sf_dir, "customer").filter(
        (F.col("c_nationkey") < 5) & F.col("c_acctbal").isNotNull()
    )
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_nationkey",
        "c_custkey",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


# --------------------------------------------------------------------------
# Snapshot diff (operators/diff.py): row-level added/removed/changed between
# two table versions — the incremental-refresh primitive the reference's
# truncate-and-reload (etl/pipeline.py:685-697) can't express. Both
# snapshots derive from `orders` deterministically so the oracle rebuilds
# them: old drops every 97th key, new drops every 89th and bumps the price
# of every 13th.
# --------------------------------------------------------------------------
@register(
    "snapshot_diff_orders",
    oracle="""
        WITH old AS (
          SELECT o_orderkey, o_orderstatus, ROUND(o_totalprice, 2) AS price
          FROM orders WHERE o_orderkey % 97 <> 0
        ),
        new AS (
          SELECT o_orderkey, o_orderstatus,
                 ROUND(CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice * 1.1
                            ELSE o_totalprice END, 2) AS price
          FROM orders WHERE o_orderkey % 89 <> 0
        )
        SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
               -- IS NOT DISTINCT FROM (r11 nulls probe): the operator's
               -- comparison is null-safe (NULL == NULL is a match, NULL vs
               -- value is a change) — plain `=` would send a both-sides-NULL
               -- status row to 'changed' instead of 'unchanged'
               CASE WHEN old.o_orderkey IS NULL THEN 'added'
                    WHEN new.o_orderkey IS NULL THEN 'removed'
                    WHEN old.o_orderstatus IS NOT DISTINCT FROM new.o_orderstatus
                         AND old.price IS NOT DISTINCT FROM new.price THEN 'unchanged'
                    ELSE 'changed' END AS status
        FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
    """,
    tags=("relational", "diff", "incremental"),
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_pipeline_spark.operators.diff import snapshot_diff

    orders = load_table(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("price")
    )
    new = orders.filter(F.col("o_orderkey") % 89 != 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.round(
            F.when(F.col("o_orderkey") % 13 == 0, F.col("o_totalprice") * 1.1)
            .otherwise(F.col("o_totalprice")),
            2,
        ).alias("price"),
    )
    return snapshot_diff(old, new, ["o_orderkey"])


# --------------------------------------------------------------------------
# Incremental aggregate maintenance (operators/incremental.py): carry the
# previous aggregate forward, re-aggregate ONLY groups touched by the
# old→new diff. The oracle is the FULL recompute over `new`, so the hash
# match proves incremental == full cell-for-cell. Same deterministic
# old/new snapshots as snapshot_diff_orders. At 100 TB every shuffle here
# is change-volume-sized, not table-sized — this is the pattern that
# replaces the reference's daily truncate-and-reload.
# --------------------------------------------------------------------------
@register(
    "incremental_agg_orders",
    oracle="""
        WITH new AS (
          SELECT o_orderkey, o_orderpriority, o_orderdate,
                 CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice * 1.1
                      ELSE o_totalprice END AS o_totalprice
          FROM orders WHERE o_orderkey % 89 <> 0
        )
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
               o_orderpriority,
               ROUND(SUM(o_totalprice), 2) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM new
        GROUP BY 1, 2
    """,
    tags=("relational", "incremental", "agg"),
)
def incremental_agg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_pipeline_spark.operators.incremental import incremental_agg_refresh

    orders = load_table(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey",
        "o_orderpriority",
        F.year("o_orderdate").cast("bigint").alias("o_year"),
        "o_totalprice",
    )
    new = orders.filter(F.col("o_orderkey") % 89 != 0).select(
        "o_orderkey",
        "o_orderpriority",
        F.year("o_orderdate").cast("bigint").alias("o_year"),
        F.when(F.col("o_orderkey") % 13 == 0, F.col("o_totalprice") * 1.1)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    aggs = [
        F.sum("o_totalprice").alias("revenue"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
    ]
    prev = old.groupBy("o_year", "o_orderpriority").agg(*aggs)
    refreshed = incremental_agg_refresh(
        prev, old, new, "o_orderkey", ["o_year", "o_orderpriority"], aggs
    )
    return refreshed.select(
        "o_year", "o_orderpriority", F.round("revenue", 2).alias("revenue"), "n_orders"
    )


# --------------------------------------------------------------------------
# Key-skew diagnostics: the heaviest join/agg keys with their share of all
# rows and ratio to the mean key load — the relation you inspect BEFORE
# choosing salting (operators/skew.py) or AQE skew-join handling for a
# 100 TB join. One count shuffle + two scalar broadcasts; top-10 is
# TakeOrdered with a deterministic (cnt DESC, key ASC) tie-break.
# --------------------------------------------------------------------------
@register(
    "key_skew_partkey",
    oracle="""
        WITH per_key AS (
            SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM lineitem GROUP BY l_partkey
        ),
        tot AS (
            SELECT CAST(SUM(cnt) AS DOUBLE) AS total_rows,
                   AVG(cnt) AS avg_cnt
            FROM per_key
        )
        SELECT l_partkey, cnt,
               ROUND(cnt / total_rows, 6) AS row_share,
               ROUND(cnt / avg_cnt, 6) AS skew_factor
        FROM per_key CROSS JOIN tot
        ORDER BY cnt DESC, l_partkey
        LIMIT 10
    """,
    tags=("relational", "skew", "diagnostics", "topk"),
)
def key_skew_partkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_key = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    tot = per_key.agg(
        F.sum("cnt").cast("double").alias("total_rows"), F.avg("cnt").alias("avg_cnt")
    )
    return (
        per_key.join(F.broadcast(tot))
        .select(
            "l_partkey",
            "cnt",
            F.round(F.col("cnt") / F.col("total_rows"), 6).alias("row_share"),
            F.round(F.col("cnt") / F.col("avg_cnt"), 6).alias("skew_factor"),
        )
        .orderBy(F.desc("cnt"), F.asc("l_partkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Performance-regression detection (SURVEY.md §2.9 R10,
# operators/regression.py): the reference's stateful detector
# (etl/utils/regression_detector.py:26-171 — baseline mean/std, z-score
# anomaly, percent-magnitude threshold) re-expressed as one aggregate
# query over a metrics history relation. Here the history is the daily
# per-event_type value series from `events`; the "current run" is the
# latest day, the baseline is every prior day. One shuffle keyed on the
# series; baseline state is one moment row per series at any history
# length. Inputs rounded (6 dp) before moments, outputs after (4 dp) —
# the cross-engine determinism discipline of the drift/PSI family.
# --------------------------------------------------------------------------
_DAY_NS = 86_400_000_000_000


@register(
    "regression_detect_metrics",
    oracle=f"""
        WITH hist AS (
            SELECT epoch_ns(ts) // {_DAY_NS} AS run_day, event_type,
                   ROUND(SUM(CAST(ROUND(value * 100, 0) AS BIGINT))
                         / 100.0e0 / COUNT(*), 6) AS metric
            FROM events GROUP BY 1, 2
        ),
        cur_run AS (SELECT MAX(run_day) AS d FROM hist),
        base AS (
            -- bm: the 4-dp baseline mean over the 1e-6-LATTICE metrics
            -- uses the portable FLOOR half-up over the exact integer sum
            -- (probe-found: ROUND over the jittered AVG flipped on a
            -- 4-dp tie); m stays double for the z/magnitude ratios
            SELECT event_type, AVG(ROUND(metric, 6)) AS m,
                   FLOOR(SUM(CAST(ROUND(ROUND(metric, 6) * 1.0e6, 0)
                                  AS BIGINT)) * 1.0e0 / 100.0e0 / COUNT(*)
                         + 0.5e0) / 1.0e4 AS bm,
                   stddev_pop(ROUND(metric, 6)) AS s,
                   CAST(COUNT(*) AS BIGINT) AS n_history
            FROM hist CROSS JOIN cur_run WHERE run_day < d GROUP BY 1
        ),
        cur AS (
            -- cur4: same device on the single lattice point (a value ON
            -- a .00005 repr-tie splits the engines' native ROUND)
            SELECT event_type, ROUND(metric, 6) AS current_value,
                   FLOOR(CAST(ROUND(ROUND(metric, 6) * 1.0e6, 0) AS BIGINT)
                         * 1.0e0 / 100.0e0 + 0.5e0) / 1.0e4 AS cur4
            FROM hist CROSS JOIN cur_run WHERE run_day = d
        ),
        j AS (
            SELECT c.event_type, c.current_value, c.cur4, b.m, b.bm, b.s,
                   COALESCE(b.n_history, CAST(0 AS BIGINT)) AS n_history,
                   ROUND(CASE WHEN b.s > 0
                              THEN (c.current_value - b.m) / b.s
                              ELSE 0.0 END, 4) AS z_score,
                   ROUND(CASE WHEN b.m <> 0
                              THEN (c.current_value - b.m) / b.m * 100.0
                              ELSE 0.0 END, 4) AS magnitude_pct
            FROM cur c LEFT JOIN base b ON b.event_type = c.event_type
        )
        SELECT event_type,
               cur4 AS current_value,
               bm AS baseline_mean,
               ROUND(s, 4) AS baseline_std,
               n_history, z_score, magnitude_pct,
               CAST(n_history >= 3 AND ABS(z_score) > 2.0
                    AND ABS(magnitude_pct) > 10.0 AS INT) AS is_regression
        FROM j
    """,
    tags=("metrics", "regression", "agg"),
)
def regression_detect_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_pipeline_spark.operators.regression import detect_regressions

    ev = load_table(spark, sf_dir, "events")
    hist = (
        ev.select(
            F.expr(f"ts div {_DAY_NS}").alias("run_day"), "event_type", "value"
        )
        .groupBy("run_day", "event_type")
        # exact-cents mean — see agg_metrics_summary's avg_value note
        .agg(
            F.expr(
                "ROUND(SUM(CAST(ROUND(value * 100, 0) AS BIGINT))"
                " / 100.0e0 / COUNT(*), 6)"
            ).alias("metric")
        )
    )
    return detect_regressions(
        hist,
        ["event_type"],
        "run_day",
        "metric",
        current_run=None,  # latest day, resolved relationally
        threshold_sigma=2.0,
        min_magnitude_pct=10.0,
        min_history=3,
    )
