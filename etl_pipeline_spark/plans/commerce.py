"""Round-6 commerce/ops KPI wave: segment spend percentiles, perfect-order
rate, open-order backlog, price elasticity, repeat-purchase intervals, and
effective catalog size.

Beyond-reference components (the reference pipeline has none of these);
each is the Spark-first relational expression of a standard commerce /
supply-chain warehouse primitive:

- spend percentile by segment — the new range-bucketed two-level rank
  device (operators/packing.py::range_bucketed_rank) on its natural
  workload: PERCENT_RANK over a fact-derived relation partitioned by a
  ~5-value key, with NO fact-sized single-task sort;
- perfect-order rate — the classic fulfilment KPI (every line shipped by
  commit date, nothing returned), a per-order ALL-reduce then a monthly
  share;
- open-order backlog — interval counting via the +1/−1 event-difference
  trick and a running sum over the BOUNDED day domain (never over rows);
- log-log price elasticity — per-brand OLS slope of ln(qty) on
  ln(unit price) from one pass of moment sums (Greene, Econometric
  Analysis §2; the moments idiom of corr_lineitem_moments);
- repeat-purchase interval — per-customer order gaps (one LAG window,
  customer-keyed) whose p50/p90 are rank-selected from the bounded
  per-(segment, gap-days) histogram — the funnel_latency_quantiles
  discipline, never a population percentile sort;
- effective catalog size — exp(Shannon entropy) of the part-revenue mix
  per segment (the assortment-diversity metric; Hill numbers, q=1).

Parity: money stays in exact integer cents; ln() inputs are integer-ratio
doubles (IEEE-exact in both engines) and transcendental outputs round
before any compare or to >=4 fractional digits at the end (the ANOVA
convention: cross-libm jitter ~1e-12 sits far below the round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_pipeline_spark.operators.packing import range_bucketed_rank
from etl_pipeline_spark.plans.registry import register
from etl_pipeline_spark.sources.star import load_table

_EPOCH_DAY_DUCK = (
    "CAST(date_diff('day', TIMESTAMP '1970-01-01 00:00:00', o_orderdate)"
    " AS BIGINT)"
)
_CENTS_DUCK = "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"


def _day_epoch(col: str = "o_orderdate"):
    return (
        F.datediff(F.col(col), F.lit("1970-01-01").cast("timestamp_ntz"))
        .cast("bigint")
    )


def _cents(expr: str) -> F.Column:
    return F.expr(f"CAST(ROUND(({expr}) * 100, 0) AS BIGINT)")


# ---------------------------------------------------------------------------
# Customer spend percentile within market segment. c_mktsegment has 5
# values, so PERCENT_RANK() OVER (PARTITION BY segment ORDER BY spend)
# would sort ~n/5 of the whole customer relation per task at scale —
# exactly the quantile_normalize_values anti-pattern. The range-bucketed
# rank device gives the identical ties-share-min rank with the only
# single-task window running over the (segments × 1024 buckets) totals
# relation.
# ---------------------------------------------------------------------------
@register(
    "spend_percentile_by_segment",
    oracle=f"""
        WITH spend AS (
            -- cents IS NOT NULL (r11 nulls probe): a customer whose every
            -- order price is missing has no rankable spend — the engines
            -- would seat the NULL at opposite ends of the percent order.
            -- The NULL-segment partition itself is KEPT (PARTITION BY
            -- groups NULLs; the Spark-side range_bucketed_rank now joins
            -- its per-partition offsets null-safely to match).
            SELECT o_custkey, CAST(SUM({_CENTS_DUCK}) AS BIGINT) AS cents
            FROM orders GROUP BY 1
        )
        SELECT c.c_custkey, c.c_mktsegment AS segment,
               s.cents / 100.0 AS spend,
               ROUND(PERCENT_RANK() OVER (
                   PARTITION BY c.c_mktsegment ORDER BY s.cents), 6)
                   AS pct_rank
        FROM customer c JOIN spend s ON s.o_custkey = c.c_custkey
        WHERE s.cents IS NOT NULL
    """,
    tags=("commerce", "window", "percentile"),
)
def spend_percentile_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    spend = orders.groupBy("o_custkey").agg(
        F.sum(_cents("o_totalprice")).cast("bigint").alias("cents")
    ).filter(F.col("cents").isNotNull())
    joined = cust.join(
        spend, cust.c_custkey == spend.o_custkey
    ).select("c_custkey", "segment", "cents")
    ranked = range_bucketed_rank(
        joined,
        "cents",
        partition_cols=("segment",),
        with_rank=True,
        # entity-cardinality input (one row per customer) built by a
        # fact scan + aggregate + dimension join: dedupe it across the
        # operator's three lineages (guide §5)
        dedupe_input=True,
    )
    pct = (F.col("rnk") - 1).cast("double") / (F.col("n_part") - 1)
    return ranked.select(
        "c_custkey",
        "segment",
        (F.col("cents") / 100.0).alias("spend"),
        F.round(
            F.when(F.col("n_part") > 1, pct).otherwise(F.lit(0.0)), 6
        ).alias("pct_rank"),
    )


# ---------------------------------------------------------------------------
# Perfect-order rate per month: an order is "perfect" iff EVERY line
# shipped within 90 days of the order date and nothing was returned
# (the testdata lineitem carries no commit date, so the SLA is a fixed
# ship-latency bound). One orderkey equi-join, then the ALL-quantifier
# as a per-(order, month) MIN over a 0/1 flag, then a month-domain
# share. No windows anywhere.
# ---------------------------------------------------------------------------
@register(
    "perfect_order_rate",
    oracle="""
        WITH per_order AS (
            SELECT o.o_orderkey,
                   CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) - 1
                        AS BIGINT) AS month_idx,
                   MIN(CASE WHEN date_diff('day', o.o_orderdate,
                                           l.l_shipdate) <= 90
                                 AND l.l_returnflag <> 'R'
                            THEN 1 ELSE 0 END) AS ok
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            GROUP BY 1, 2
        )
        SELECT month_idx,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(ok) AS BIGINT) AS n_perfect,
               ROUND(SUM(ok) * 1.0 / COUNT(*), 6) AS perfect_rate
        FROM per_order GROUP BY 1
    """,
    tags=("commerce", "agg", "fulfilment"),
)
def perfect_order_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_returnflag"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    per_order = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(
            "o_orderkey",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
            .cast("bigint")
            .alias("month_idx"),
        )
        .agg(
            F.min(
                F.when(
                    (
                        F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
                        <= 90
                    )
                    & (F.col("l_returnflag") != "R"),
                    1,
                ).otherwise(0)
            ).alias("ok")
        )
    )
    return per_order.groupBy("month_idx").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("ok").cast("bigint").alias("n_perfect"),
        F.round(F.sum("ok") * 1.0 / F.count(F.lit(1)), 6).alias("perfect_rate"),
    )


# ---------------------------------------------------------------------------
# Open-order backlog per day: an order is open from its order date until
# its last line ships. Interval counting NEVER expands intervals to
# days×orders rows: each order contributes +1 at its start day and −1
# the day after it closes (two grouped counts), and the running sum over
# the merged day-domain deltas (bounded: ~2.5k days at any fact volume)
# yields the backlog curve. The only window is over that day domain.
# ---------------------------------------------------------------------------
@register(
    "open_orders_backlog_daily",
    oracle=f"""
        WITH span AS (
            SELECT o.o_orderkey,
                   {_EPOCH_DAY_DUCK} AS d0,
                   CAST(date_diff('day', TIMESTAMP '1970-01-01 00:00:00',
                                  MAX(l.l_shipdate)) AS BIGINT) AS d1
            -- endpoint NULL guards (r11 nulls probe): an undated order (or
            -- a line with no shipdate) has no interval — its NULL day key
            -- would lead Spark's running-sum order and trail DuckDB's
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderdate IS NOT NULL AND l.l_shipdate IS NOT NULL
            GROUP BY 1, 2
        ),
        delta AS (
            SELECT d0 AS day_epoch, CAST(COUNT(*) AS BIGINT) AS c
            FROM span GROUP BY 1
            UNION ALL
            SELECT d1 + 1 AS day_epoch, -CAST(COUNT(*) AS BIGINT) AS c
            FROM span GROUP BY 1
        ),
        net AS (
            SELECT day_epoch, CAST(SUM(c) AS BIGINT) AS net
            FROM delta GROUP BY 1
        )
        SELECT day_epoch,
               CAST(SUM(net) OVER (ORDER BY day_epoch
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS open_orders
        FROM net
    """,
    tags=("commerce", "timeseries", "interval"),
)
def open_orders_backlog_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").isNotNull()
    )
    span = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", _day_epoch().alias("d0"))
        .agg(
            F.datediff(
                F.max("l_shipdate"), F.lit("1970-01-01").cast("timestamp_ntz")
            )
            .cast("bigint")
            .alias("d1")
        )
    )
    opens = span.groupBy(F.col("d0").alias("day_epoch")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    closes = span.groupBy((F.col("d1") + 1).alias("day_epoch")).agg(
        (-F.count(F.lit(1))).cast("bigint").alias("c")
    )
    net = (
        opens.unionByName(closes)
        .groupBy("day_epoch")
        .agg(F.sum("c").cast("bigint").alias("net"))
    )
    # day-domain relation (bounded by the calendar): the unpartitioned
    # running sum here is the deliberate, safe place — see module doc
    w = Window.orderBy("day_epoch").rowsBetween(Window.unboundedPreceding, 0)
    return net.select(
        "day_epoch", F.sum("net").over(w).cast("bigint").alias("open_orders")
    )


# ---------------------------------------------------------------------------
# Log-log price elasticity per brand: OLS slope of ln(quantity) on
# ln(unit price) across that brand's lineitems — elasticity < 0 means
# demand falls as price rises. ln() inputs round to 6 dp BEFORE the
# moment sums (the round-before-accumulate rule: cross-libm ln jitter is
# ~1 ulp and must not enter a sum), then slope = (nΣxy − ΣxΣy)/(nΣxx −
# (Σx)²) from ONE grouped pass. Degenerate brands (zero x-variance) emit
# NULL, the Spearman zero-variance guard.
# ---------------------------------------------------------------------------
@register(
    "price_elasticity_loglog",
    oracle="""
        WITH d AS (
            SELECT p.p_brand,
                   ROUND(LN(l.l_extendedprice / l.l_quantity), 6) AS x,
                   ROUND(LN(l.l_quantity), 6) AS y
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            -- log-log domain: a zero/negative price or quantity has no
            -- logarithm (qty 0 is an ANSI 0-divide crash in Spark and
            -- LN(inf) in DuckDB; price 0 is Spark NULL vs DuckDB -inf —
            -- probe-found via a planted free-item line). Standard
            -- practice excludes such lines from the regression.
            WHERE l.l_extendedprice > 0 AND l.l_quantity > 0
        ),
        m AS (
            SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(x) AS sx, SUM(y) AS sy,
                   SUM(x * y) AS sxy, SUM(x * x) AS sxx
            FROM d GROUP BY 1
        )
        SELECT p_brand, n AS n_lines,
               CASE WHEN n * sxx - sx * sx <= 1e-9 THEN NULL
                    ELSE ROUND((n * sxy - sx * sy)
                               / (n * sxx - sx * sx), 6) END AS elasticity
        FROM m
    """,
    tags=("commerce", "regression", "pricing"),
)
def price_elasticity_loglog(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    d = (
        li
        # log-log domain filter — see the oracle note (probe-found)
        .filter((F.col("l_extendedprice") > 0) & (F.col("l_quantity") > 0))
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(
            "p_brand",
            F.round(F.log(F.col("l_extendedprice") / F.col("l_quantity")), 6)
            .alias("x"),
            F.round(F.log(F.col("l_quantity")), 6).alias("y"),
        )
    )
    m = d.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return m.select(
        "p_brand",
        F.col("n").alias("n_lines"),
        F.when(den <= 1e-9, F.lit(None).cast("double"))
        .otherwise(F.round(num / den, 6))
        .alias("elasticity"),
    )


# ---------------------------------------------------------------------------
# Repeat-purchase interval per segment: days between consecutive orders
# of the same customer (one customer-keyed LAG window — high-cardinality
# partitioning, the safe kind), p50/p90 rank-selected from the bounded
# per-(segment, gap) histogram. Quantile = smallest gap whose cumulative
# count reaches ceil(q·n) (type-1) — the only quantile definition two
# engines reproduce exactly, and the histogram rank window runs over
# segments × ≤2.5k distinct gaps regardless of fact volume.
# ---------------------------------------------------------------------------
@register(
    "repeat_purchase_interval",
    oracle=f"""
        WITH o AS (
            -- o_orderdate IS NOT NULL (r11 nulls probe): an undated order
            -- has no place in the purchase timeline — its NULL day would
            -- lead Spark's LAG order and trail DuckDB's, fabricating a gap
            SELECT o_custkey, {_EPOCH_DAY_DUCK} AS d,
                   LAG({_EPOCH_DAY_DUCK}) OVER (
                       PARTITION BY o_custkey
                       ORDER BY {_EPOCH_DAY_DUCK}, o_orderkey) AS prev_d
            FROM orders WHERE o_orderdate IS NOT NULL
        ),
        g AS (
            SELECT c.c_mktsegment AS segment, o.d - o.prev_d AS gap
            FROM o JOIN customer c ON c.c_custkey = o.o_custkey
            WHERE o.prev_d IS NOT NULL
        ),
        h AS (
            SELECT segment, gap, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM g GROUP BY 1, 2
        ),
        cum AS (
            SELECT segment, gap, cnt,
                   SUM(cnt) OVER (PARTITION BY segment ORDER BY gap
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum,
                   SUM(cnt) OVER (PARTITION BY segment) AS n
            FROM h
        )
        SELECT segment,
               CAST(MIN(CASE WHEN cum >= CEIL(0.5 * n) THEN gap END)
                    AS BIGINT) AS p50_gap_days,
               CAST(MIN(CASE WHEN cum >= CEIL(0.9 * n) THEN gap END)
                    AS BIGINT) AS p90_gap_days,
               CAST(MAX(n) AS BIGINT) AS n_gaps
        FROM cum GROUP BY 1
    """,
    tags=("commerce", "window", "retention"),
)
def repeat_purchase_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    lag_w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    o = orders.select(
        "o_custkey", "o_orderkey", _day_epoch().alias("d")
    ).withColumn("prev_d", F.lag("d").over(lag_w))
    g = (
        o.where(F.col("prev_d").isNotNull())
        .join(F.broadcast(cust), o.o_custkey == cust.c_custkey)
        .select("segment", (F.col("d") - F.col("prev_d")).alias("gap"))
    )
    h = g.groupBy("segment", "gap").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    cum_w = (
        Window.partitionBy("segment")
        .orderBy("gap")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    n_w = Window.partitionBy("segment")
    cum = h.select(
        "segment",
        "gap",
        F.sum("cnt").over(cum_w).alias("cum"),
        F.sum("cnt").over(n_w).alias("n"),
    )
    return cum.groupBy("segment").agg(
        F.min(F.when(F.col("cum") >= F.ceil(0.5 * F.col("n")), F.col("gap")))
        .cast("bigint")
        .alias("p50_gap_days"),
        F.min(F.when(F.col("cum") >= F.ceil(0.9 * F.col("n")), F.col("gap")))
        .cast("bigint")
        .alias("p90_gap_days"),
        F.max("n").cast("bigint").alias("n_gaps"),
    )


# ---------------------------------------------------------------------------
# Effective catalog size per segment: exp(H) where H is the Shannon
# entropy of the part-revenue mix — "how many equally-selling parts this
# assortment behaves like" (Hill number of order 1). Revenue stays exact
# cents; p = part_cents/segment_cents is an exact-integer ratio, so both
# engines feed IDENTICAL doubles to ln(); the Σ p·ln p partial-order
# jitter (~1e-13) dies under the final rounds. Shuffles are segment×part
# sized, never row-sized.
# ---------------------------------------------------------------------------
@register(
    "effective_catalog_size",
    oracle="""
        WITH pr AS (
            SELECT c.c_mktsegment AS segment, l.l_partkey,
                   CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT))
                        AS BIGINT) AS cents
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            GROUP BY 1, 2
            -- zero-revenue parts are outside the revenue distribution's
            -- support: the entropy convention is 0·ln(0) = 0, but LN(0)
            -- is an error in DuckDB and NULL (a silently dropped term)
            -- in Spark — sweep-found via the planted zero-price line.
            -- Excluding them keeps both the entropy terms and n_parts on
            -- the same support in both engines.
            HAVING SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)) > 0
        ),
        tot AS (
            SELECT segment, CAST(SUM(cents) AS BIGINT) AS total,
                   CAST(COUNT(*) AS BIGINT) AS n_parts
            FROM pr GROUP BY 1
        )
        SELECT pr.segment, MAX(t.n_parts) AS n_parts,
               -- + 0.0e0 normalizes IEEE negative zero: a single-part
               -- segment gives -SUM(1·ln 1) = -0.0, which DuckDB keeps
               -- while Spark's BigDecimal ROUND has no -0 (probe-found
               -- on a truncated tiny corpus)
               ROUND(-SUM((pr.cents * 1.0 / t.total)
                          * LN(pr.cents * 1.0 / t.total)) + 0.0e0, 6) AS entropy,
               ROUND(EXP(-SUM((pr.cents * 1.0 / t.total)
                              * LN(pr.cents * 1.0 / t.total))), 2)
                   AS effective_parts
        FROM pr JOIN tot t ON t.segment = pr.segment
        GROUP BY 1
    """,
    tags=("commerce", "entropy", "assortment"),
)
def effective_catalog_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    pr = (
        li.select("l_orderkey", "l_partkey", _cents("l_extendedprice").alias("c100"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("segment", "l_partkey")
        .agg(F.sum("c100").cast("bigint").alias("cents"))
        # zero-mass cells leave the support BEFORE the LN — see oracle
        .filter(F.col("cents") > 0)
    )
    tot = pr.groupBy("segment").agg(
        F.sum("cents").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
    )
    p = F.col("cents") * 1.0 / F.col("total")
    return (
        pr.join(F.broadcast(tot), "segment")
        .groupBy("segment")
        .agg(
            F.max("n_parts").alias("n_parts"),
            # + 0.0 normalizes -0.0 — see the oracle note
            F.round(-F.sum(p * F.log(p)) + F.lit(0.0), 6).alias("entropy"),
            F.round(F.exp(-F.sum(p * F.log(p))), 2).alias("effective_parts"),
        )
    )


# ---------------------------------------------------------------------------
# Monthly revenue bridge (round-6 wave): decompose month-over-month
# revenue change into new / expansion / contraction / churned — the SaaS
# revenue-movement waterfall. Per-(customer, month) cents full-outer
# self-joined against (customer, month−1): a-only rows are new-or-
# reactivated revenue in month m, b-only rows churn INTO m+1, matched
# rows split into expansion / contraction by sign. Exact integer cents
# end-to-end; one equi-join on (custkey, month); month-domain output.
# ---------------------------------------------------------------------------
@register(
    "revenue_bridge_monthly",
    oracle=f"""
        WITH cm AS (
            SELECT o_custkey,
                   CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                        AS BIGINT) AS m,
                   CAST(SUM({_CENTS_DUCK}) AS BIGINT) AS cents
            FROM orders GROUP BY 1, 2
        ),
        br AS (
            SELECT COALESCE(a.m, b.m + 1) AS month_idx,
                   CASE WHEN b.o_custkey IS NULL THEN a.cents ELSE 0 END
                       AS new_c,
                   CASE WHEN a.o_custkey IS NULL THEN b.cents ELSE 0 END
                       AS churn_c,
                   CASE WHEN a.o_custkey IS NOT NULL
                             AND b.o_custkey IS NOT NULL
                             AND a.cents > b.cents
                        THEN a.cents - b.cents ELSE 0 END AS expan_c,
                   CASE WHEN a.o_custkey IS NOT NULL
                             AND b.o_custkey IS NOT NULL
                             AND a.cents < b.cents
                        THEN b.cents - a.cents ELSE 0 END AS contr_c
            FROM cm a FULL JOIN cm b
              ON b.o_custkey = a.o_custkey AND b.m = a.m - 1
        )
        SELECT month_idx,
               CAST(SUM(new_c) AS BIGINT) / 100.0 AS rev_new,
               CAST(SUM(expan_c) AS BIGINT) / 100.0 AS rev_expansion,
               CAST(SUM(contr_c) AS BIGINT) / 100.0 AS rev_contraction,
               CAST(SUM(churn_c) AS BIGINT) / 100.0 AS rev_churned
        FROM br GROUP BY 1
    """,
    tags=("commerce", "revenue", "waterfall"),
)
def revenue_bridge_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cm = orders.groupBy(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("bigint")
        .alias("m"),
    ).agg(F.sum(_cents("o_totalprice")).cast("bigint").alias("cents"))
    a = cm.select(
        F.col("o_custkey").alias("ck_a"),
        F.col("m").alias("m_a"),
        F.col("cents").alias("c_a"),
    )
    b = cm.select(
        F.col("o_custkey").alias("ck_b"),
        F.col("m").alias("m_b"),
        F.col("cents").alias("c_b"),
    )
    br = a.join(
        b,
        (F.col("ck_b") == F.col("ck_a")) & (F.col("m_b") == F.col("m_a") - 1),
        "full_outer",
    ).select(
        F.coalesce(F.col("m_a"), F.col("m_b") + 1).alias("month_idx"),
        F.when(F.col("ck_b").isNull(), F.col("c_a")).otherwise(0).alias("new_c"),
        F.when(F.col("ck_a").isNull(), F.col("c_b")).otherwise(0).alias("churn_c"),
        F.when(
            F.col("ck_a").isNotNull()
            & F.col("ck_b").isNotNull()
            & (F.col("c_a") > F.col("c_b")),
            F.col("c_a") - F.col("c_b"),
        )
        .otherwise(0)
        .alias("expan_c"),
        F.when(
            F.col("ck_a").isNotNull()
            & F.col("ck_b").isNotNull()
            & (F.col("c_a") < F.col("c_b")),
            F.col("c_b") - F.col("c_a"),
        )
        .otherwise(0)
        .alias("contr_c"),
    )
    return br.groupBy("month_idx").agg(
        (F.sum("new_c").cast("bigint") / 100.0).alias("rev_new"),
        (F.sum("expan_c").cast("bigint") / 100.0).alias("rev_expansion"),
        (F.sum("contr_c").cast("bigint") / 100.0).alias("rev_contraction"),
        (F.sum("churn_c").cast("bigint") / 100.0).alias("rev_churned"),
    )


# ---------------------------------------------------------------------------
# Croston's method for intermittent demand (Croston 1972, the standard
# forecaster for slow-moving SKUs): per part, monthly demand epochs
# (months with any shipment) drive two exponentially-smoothed estimates —
# demand SIZE z and inter-demand INTERVAL y — and the forecast is
# z_hat / y_hat (expected demand per period). alpha = 1/2 EXACTLY so
# every smoothing weight is a binary fraction 2^-k: weight * integer
# quantity products are IEEE-exact and both engines agree to the final
# 6-dp round. The EWMA recursion S_n = a*x_n + (1-a)*S_(n-1), S_1 = x_1
# unrolls to weights a(1-a)^(n-i) for i >= 2 and (1-a)^(n-1) for i = 1 —
# a CASE inside one grouped sum, no recursion in either engine.
#
# Scale shape: ONE fact pass to (part, month) totals; everything after
# runs on that part-keyed month relation (dimension x ~84 months), with
# windows partitioned by part — never an unpartitioned sort. Parts with
# a single demand epoch are excluded (no interval to smooth).
# ---------------------------------------------------------------------------
_CROSTON_W = (
    "CASE WHEN i = 1 THEN POWER(0.5, n - 1) ELSE POWER(0.5, n - i + 1) END"
)


@register(
    "croston_demand_forecast",
    oracle=f"""
        WITH pm AS (
            -- l_shipdate IS NOT NULL (r11 nulls probe): an undated
            -- shipment has no demand month — its NULL m would lead
            -- Spark's epoch order and trail DuckDB's, shifting every gap
            SELECT l_partkey,
                   year(l_shipdate) * 12 + month(l_shipdate) - 1 AS m,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
            FROM lineitem WHERE l_shipdate IS NOT NULL GROUP BY 1, 2
        ),
        mn AS (SELECT MIN(m) AS m0 FROM pm),
        seq AS (
            SELECT l_partkey, q,
                   ROW_NUMBER() OVER (PARTITION BY l_partkey ORDER BY m)
                       AS i,
                   COUNT(*) OVER (PARTITION BY l_partkey) AS n,
                   COALESCE(m - LAG(m) OVER (PARTITION BY l_partkey
                                             ORDER BY m),
                            m - m0 + 1) AS gap
            FROM pm CROSS JOIN mn
        ),
        ew AS (
            SELECT l_partkey,
                   CAST(MAX(n) AS BIGINT) AS n_epochs,
                   SUM(q * {_CROSTON_W}) AS z_hat,
                   SUM(gap * {_CROSTON_W}) AS y_hat
            FROM seq GROUP BY 1
        )
        SELECT CAST(l_partkey AS BIGINT) AS l_partkey, n_epochs,
               ROUND(z_hat, 6) AS size_ewma,
               ROUND(y_hat, 6) AS interval_ewma,
               ROUND(z_hat / y_hat, 6) AS croston_forecast
        FROM ew WHERE n_epochs >= 2
    """,
    tags=("commerce", "forecast", "timeseries"),
)
def croston_demand_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").isNotNull()
    )
    pm = (
        li.select(
            "l_partkey",
            (F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1).alias("m"),
            F.expr("CAST(l_quantity AS BIGINT)").alias("qi"),
        )
        .groupBy("l_partkey", "m")
        .agg(F.sum("qi").cast("bigint").alias("q"))
    )
    mn = pm.agg(F.min("m").alias("m0"))
    w_part = Window.partitionBy("l_partkey").orderBy("m")
    seq = pm.crossJoin(F.broadcast(mn)).select(  # one-row min side
        "l_partkey",
        "q",
        F.row_number().over(w_part).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy("l_partkey")).alias("n"),
        F.coalesce(
            F.col("m") - F.lag("m").over(w_part),
            F.col("m") - F.col("m0") + 1,
        ).alias("gap"),
    )
    w = F.expr(_CROSTON_W)
    ew = seq.groupBy("l_partkey").agg(
        F.max("n").cast("bigint").alias("n_epochs"),
        F.sum(F.col("q") * w).alias("z_hat"),
        F.sum(F.col("gap") * w).alias("y_hat"),
    )
    return ew.where(F.col("n_epochs") >= 2).select(
        F.col("l_partkey").cast("bigint").alias("l_partkey"),
        "n_epochs",
        F.round("z_hat", 6).alias("size_ewma"),
        F.round("y_hat", 6).alias("interval_ewma"),
        F.round(F.col("z_hat") / F.col("y_hat"), 6).alias("croston_forecast"),
    )
