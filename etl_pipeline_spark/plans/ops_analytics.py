"""Round-4 wave-2 operational analytics: RFM segmentation, Pareto/ABC
concentration, Benford auditing, Markov transitions, quantile
normalization, CUSUM change points, and watermark late-data accounting.

Beyond-reference components; each is the Spark-first relational form of a
standard warehouse/ops primitive:

- RFM segmentation — recency/frequency/monetary quintile scores against
  percentile thresholds (broadcast 1-row threshold relation, no global
  NTILE window over customers);
- Pareto/ABC classification — cumulative revenue share over the customer
  AGGREGATE (never the fact table); the single-partition cumsum over
  n_customers rows is the documented local form — at 10⁹ customers the
  two-level distributed prefix sum (operators/packing.py) is the same
  plan with bucketed offsets;
- Benford first-digit audit — the classic fabricated-numbers screen;
- Markov transition matrix over per-user event sequences — one LAG
  window + one grouped count;
- quantile normalization — within-group percent_rank, the
  distribution-free feature transform;
- CUSUM change-point detection — cumulative deviation of daily means
  from the series mean, argmax |S|; day/series means are ROUNDED to 6 dp
  before the cumsum so both engines accumulate identical inputs in
  identical order (raw grouped means differ in final ulps across
  partial-agg orders);
- watermark late-data accounting — the batch twin of streaming
  watermarks: running max event-time per stream minus the allowed
  lateness, events behind it counted per window (what a Structured
  Streaming job would have dropped).

Floats round 6 dp (money 2 dp) on identical parenthesization; every
query carries a complete-output DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_pipeline_spark.operators.packing import range_bucketed_rank
from etl_pipeline_spark.plans.registry import register
from etl_pipeline_spark.sources.star import load_table
from etl_pipeline_spark.utils.local_rows import values_df

_EPOCH_DAY_DUCK = (
    "CAST(date_diff('day', TIMESTAMP '1970-01-01 00:00:00', o_orderdate)"
    " AS BIGINT)"
)


# ---------------------------------------------------------------------------
# RFM segmentation. Quintile thresholds (p20/p40/p60/p80 of each metric
# over the customer aggregate) live in ONE broadcast row; each customer
# scores 1-5 per metric by threshold comparison — no global NTILE window
# over the customer population (single-partition at 10⁹ customers).
# Thresholds are rounded to 6 dp so both engines compare against
# identical values (interpolated percentiles differ in final ulps).
# R score: higher = more recent; F/M: higher = more/larger.
#
# Scale note: the exact percentile() buffers the customer-aggregate
# values in one aggregation state — the oracle-checkable demo form (the
# same trade anomaly_mad_events documents). At 10⁹ customers the
# thresholds — the ONLY global state here — come from the mergeable
# histogram-quantile sketch (operators/sketch.py::histogram_quantiles)
# instead; scoring is unchanged (a broadcast-threshold CASE either way).
# ---------------------------------------------------------------------------
def _score_sql(metric: str, t: str) -> str:
    """1-5 score by comparison against rounded quintile thresholds."""
    return (
        f"CASE WHEN {metric} <= {t}_20 THEN 1"
        f" WHEN {metric} <= {t}_40 THEN 2"
        f" WHEN {metric} <= {t}_60 THEN 3"
        f" WHEN {metric} <= {t}_80 THEN 4 ELSE 5 END"
    )


@register(
    "rfm_customer_segments",
    oracle=f"""
        WITH base AS (
            SELECT o_custkey,
                   MAX({_EPOCH_DAY_DUCK}) AS last_day,
                   CAST(COUNT(*) AS BIGINT) AS freq,
                   ROUND(SUM(o_totalprice), 2) AS monetary
            FROM orders GROUP BY o_custkey
        ),
        th AS (
            SELECT
                ROUND(quantile_cont(last_day, 0.20), 6) AS r_20,
                ROUND(quantile_cont(last_day, 0.40), 6) AS r_40,
                ROUND(quantile_cont(last_day, 0.60), 6) AS r_60,
                ROUND(quantile_cont(last_day, 0.80), 6) AS r_80,
                ROUND(quantile_cont(freq, 0.20), 6) AS f_20,
                ROUND(quantile_cont(freq, 0.40), 6) AS f_40,
                ROUND(quantile_cont(freq, 0.60), 6) AS f_60,
                ROUND(quantile_cont(freq, 0.80), 6) AS f_80,
                ROUND(quantile_cont(monetary, 0.20), 6) AS m_20,
                ROUND(quantile_cont(monetary, 0.40), 6) AS m_40,
                ROUND(quantile_cont(monetary, 0.60), 6) AS m_60,
                ROUND(quantile_cont(monetary, 0.80), 6) AS m_80
            FROM base
        )
        SELECT b.o_custkey, b.last_day, b.freq, b.monetary,
               {_score_sql('b.last_day', 'r')} AS r_score,
               {_score_sql('b.freq', 'f')} AS f_score,
               {_score_sql('b.monetary', 'm')} AS m_score,
               {_score_sql('b.last_day', 'r')} * 100
                 + {_score_sql('b.freq', 'f')} * 10
                 + {_score_sql('b.monetary', 'm')} AS rfm
        FROM base b CROSS JOIN th
    """,
    tags=("agg", "segmentation", "window-free"),
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    base = (
        orders.select(
            "o_custkey",
            F.datediff(
                F.col("o_orderdate"), F.lit("1970-01-01").cast("timestamp_ntz")
            )
            .cast("bigint")
            .alias("day"),
            "o_totalprice",
        )
        .groupBy("o_custkey")
        .agg(
            F.max("day").alias("last_day"),
            F.count(F.lit(1)).cast("bigint").alias("freq"),
            F.round(F.sum("o_totalprice"), 2).alias("monetary"),
        )
    )
    th = base.agg(
        *[
            F.round(F.expr(f"percentile({m}, {p / 100})"), 6).alias(
                f"{m[0]}_{p}"
            )
            for m in ("last_day", "freq", "monetary")
            for p in (20, 40, 60, 80)
        ]
    ).withColumnsRenamed({"l_20": "r_20", "l_40": "r_40", "l_60": "r_60", "l_80": "r_80"})
    scored = base.crossJoin(F.broadcast(th))
    r = F.expr(_score_sql("last_day", "r"))
    f_ = F.expr(_score_sql("freq", "f"))
    m = F.expr(_score_sql("monetary", "m"))
    return scored.select(
        "o_custkey",
        "last_day",
        "freq",
        "monetary",
        r.alias("r_score"),
        f_.alias("f_score"),
        m.alias("m_score"),
        (r * 100 + f_ * 10 + m).alias("rfm"),
    )


# ---------------------------------------------------------------------------
# Pareto / ABC revenue concentration: customers sorted by revenue
# (descending, custkey tiebreak), cumulative share classifies A (first
# 80% of revenue), B (next 15%), C (tail). Output is the 3-row class
# summary. Revenue is held as EXACT integer cents end-to-end, so the
# cumulative sum is associative — accumulation order cannot move an
# A/B/C boundary in either engine or at any scale. That order-freedom is
# what lets the Spark side run the cumsum through the two-level
# range-bucketed prefix sum (operators/packing.py::range_bucketed_rank)
# instead of a single-task ``SUM OVER (ORDER BY rev DESC)`` — the plan
# that cannot run over 10⁹ customers.
# ---------------------------------------------------------------------------
@register(
    "pareto_abc_revenue",
    oracle="""
        WITH cust AS (
            SELECT o_custkey,
                   CAST(ROUND(SUM(o_totalprice) * 100, 0) AS BIGINT)
                       AS rev_cents
            FROM orders GROUP BY o_custkey
        ),
        tot AS (SELECT CAST(SUM(rev_cents) AS BIGINT) AS total FROM cust),
        ranked AS (
            SELECT o_custkey, rev_cents,
                   SUM(rev_cents) OVER (ORDER BY rev_cents DESC, o_custkey ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum
            FROM cust
        ),
        classed AS (
            SELECT o_custkey, rev_cents,
                   CASE WHEN ROUND(CAST(cum AS DOUBLE) / t.total, 6) <= 0.80
                            THEN 'A'
                        WHEN ROUND(CAST(cum AS DOUBLE) / t.total, 6) <= 0.95
                            THEN 'B'
                        ELSE 'C' END AS abc
            FROM ranked CROSS JOIN tot t
        )
        SELECT abc,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               ROUND(SUM(rev_cents) / 100.0, 2) AS revenue,
               ROUND(SUM(rev_cents) * 1.0 / MIN(t.total), 6) AS revenue_share
        FROM classed CROSS JOIN tot t
        GROUP BY abc
    """,
    tags=("agg", "window", "concentration"),
)
def pareto_abc_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # exact cents (the gini convention): integer cumsum is order-free,
    # so the bucketed prefix sum below is bit-identical to a sequential
    # scan — no boundary can ride an fp reorder
    cust = orders.groupBy("o_custkey").agg(
        F.expr("CAST(ROUND(SUM(o_totalprice) * 100, 0) AS BIGINT)").alias(
            "rev_cents"
        )
    )
    tot = cust.agg(F.sum("rev_cents").cast("bigint").alias("total"))
    # two-level prefix sum in (rev_cents DESC, custkey ASC) order — the
    # only global sort ever materialized is the 1024-row bucket-totals
    # relation; the customer relation sorts within buckets, in parallel
    ranked = range_bucketed_rank(
        cust,
        "rev_cents",
        ascending=False,
        tiebreak=("o_custkey",),
        value_col="rev_cents",
        # entity-cardinality input built by a fact scan + aggregate:
        # dedupe it across the operator's three lineages (guide §5)
        dedupe_input=True,
    )
    share = F.round(F.col("cum").cast("double") / F.col("total"), 6)
    classed = ranked.crossJoin(F.broadcast(tot)).select(
        "o_custkey",
        "rev_cents",
        "total",
        F.when(share <= 0.80, "A").when(share <= 0.95, "B").otherwise("C")
        .alias("abc"),
    )
    return classed.groupBy("abc").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.round(F.sum("rev_cents") / 100.0, 2).alias("revenue"),
        F.round(F.sum("rev_cents") * 1.0 / F.min("total"), 6).alias(
            "revenue_share"
        ),
    )


# ---------------------------------------------------------------------------
# Benford first-digit audit: distribution of the leading digit of order
# totals vs Benford's law p(d) = log10(1 + 1/d) — the classic screen
# for fabricated or truncated numeric columns. One grouped count over a
# narrow projection; 9 output rows.
# ---------------------------------------------------------------------------
@register(
    "benford_first_digit",
    oracle="""
        WITH d AS (
            SELECT digit FROM (
                -- ABS before FLOOR: Benford analyzes MAGNITUDES (the
                -- standard convention), and a negative total would
                -- otherwise put '-' in the leading character where the
                -- ANSI digit cast crashes BEFORE the domain filter can
                -- exclude it (advisor-found latent crash class).
                SELECT CAST(substr(CAST(CAST(FLOOR(ABS(o_totalprice)) AS BIGINT)
                                        AS VARCHAR), 1, 1) AS INT) AS digit
                FROM orders
            )
            -- Benford's law is defined over leading digits 1-9; a total
            -- in (-1, 1) has leading digit 0 and is OUT OF DOMAIN (the
            -- 1/digit expected-p would divide by zero — ANSI crash in
            -- Spark, inf in DuckDB; sweep-found via a planted 0.0 total).
            -- Standard practice excludes such values BEFORE the
            -- population count, so observed_p stays a distribution over
            -- the analyzed digits.
            WHERE digit BETWEEN 1 AND 9
        ),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d)
        SELECT digit,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(COUNT(*) * 1.0 / t.n, 6) AS observed_p,
               ROUND(LOG10(1.0 + 1.0 / digit), 6) AS expected_p,
               ROUND(ABS(COUNT(*) * 1.0 / t.n
                         - LOG10(1.0 + 1.0 / digit)), 6) AS abs_dev
        FROM d CROSS JOIN tot t
        GROUP BY digit, t.n
    """,
    tags=("quality", "agg", "audit"),
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = orders.select(
        F.expr(
            "CAST(substr(CAST(CAST(FLOOR(ABS(o_totalprice)) AS BIGINT)"
            " AS STRING), 1, 1) AS INT)"
        ).alias("digit")
    ).filter(F.col("digit").between(1, 9))  # Benford domain — see oracle
    tot = d.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return (
        d.crossJoin(F.broadcast(tot))
        .groupBy("digit", "n")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
        .select(
            "digit",
            "n_orders",
            F.round(F.col("n_orders") * 1.0 / F.col("n"), 6).alias("observed_p"),
            F.round(F.log10(1.0 + 1.0 / F.col("digit")), 6).alias("expected_p"),
            F.round(
                F.abs(
                    F.col("n_orders") * 1.0 / F.col("n")
                    - F.log10(1.0 + 1.0 / F.col("digit"))
                ),
                6,
            ).alias("abs_dev"),
        )
    )


# ---------------------------------------------------------------------------
# Markov transition matrix over per-user event sequences: LAG the event
# type within each user's (ts, event_id) order, count (from, to) pairs,
# normalize per source state. One user-keyed window shuffle + one
# grouped count over a type²-bounded relation.
# ---------------------------------------------------------------------------
@register(
    "markov_transition_events",
    oracle="""
        WITH seq AS (
            -- ts/event_type IS NOT NULL (r11 nulls probe): an
            -- untimestamped event has no place in the chain (the engines
            -- seat its NULL ordering key at opposite partition ends) and
            -- a typeless event is no state — both leave the chain
            SELECT user_id, event_type,
                   LAG(event_type) OVER (PARTITION BY user_id
                       ORDER BY epoch_ns(ts), event_id) AS prev_type
            FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
        ),
        trans AS (
            SELECT prev_type AS from_type, event_type AS to_type,
                   CAST(COUNT(*) AS BIGINT) AS n_trans
            FROM seq WHERE prev_type IS NOT NULL
            GROUP BY 1, 2
        ),
        out_tot AS (
            SELECT from_type, CAST(SUM(n_trans) AS BIGINT) AS n_from
            FROM trans GROUP BY 1
        )
        SELECT t.from_type, t.to_type, t.n_trans,
               ROUND(t.n_trans * 1.0 / o.n_from, 6) AS p_trans
        FROM trans t JOIN out_tot o ON o.from_type = t.from_type
    """,
    tags=("timeseries", "window", "markov"),
)
def markov_transition_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts", "event_id")
        .filter(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_trans"))
    )
    out_tot = trans.groupBy("from_type").agg(
        F.sum("n_trans").cast("bigint").alias("n_from")
    )
    return trans.join(F.broadcast(out_tot), "from_type").select(
        "from_type",
        "to_type",
        "n_trans",
        F.round(F.col("n_trans") * 1.0 / F.col("n_from"), 6).alias("p_trans"),
    )


# ---------------------------------------------------------------------------
# Quantile normalization: within-type percent_rank of `value` — the
# distribution-free transform that makes heterogeneous metrics
# comparable. percent_rank = (rank-1)/(n-1) with ties sharing rank, a
# definition both engines implement identically. event_type has ~5
# values, so ``PERCENT_RANK() OVER (PARTITION BY event_type ORDER BY
# value)`` would sort ~n/5 of the ENTIRE fact table in one task — the
# single-partition-sort killer wearing a thin partition-key disguise.
# Instead: per-(type, value-bucket) counts + broadcast exclusive offsets
# (operators/packing.py::range_bucketed_rank) — rank = bucket offset +
# local rank (ties co-bucket by construction, so min-rank semantics are
# exact), and the fact table only ever sorts within a (type, bucket).
# ---------------------------------------------------------------------------
@register(
    "quantile_normalize_values",
    oracle="""
        -- value IS NOT NULL (r11 nulls probe): a missing value has no
        -- rank — the engines seat it at opposite ends of the value order
        SELECT event_id, event_type, value,
               ROUND(PERCENT_RANK() OVER (
                   PARTITION BY event_type ORDER BY value), 6) AS pct_rank
        FROM events WHERE value IS NOT NULL
    """,
    tags=("window", "features", "normalize"),
)
def quantile_normalize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "event_type", "value")
        .filter(F.col("value").isNotNull())
    )
    ranked = range_bucketed_rank(
        ev, "value", partition_cols=("event_type",), with_rank=True
    )
    pct = (F.col("rnk") - 1).cast("double") / (F.col("n_part") - 1)
    return ranked.select(
        "event_id",
        "event_type",
        "value",
        F.round(
            F.when(F.col("n_part") > 1, pct).otherwise(F.lit(0.0)), 6
        ).alias("pct_rank"),
    )


# ---------------------------------------------------------------------------
# CUSUM change-point detection per event type: S_d = Σ_{days ≤ d}
# (mean_day − mean_series); the day with max |S| is the most likely
# level-shift point. Day and series means are ROUNDED to 6 dp BEFORE the
# cumsum so both engines accumulate identical inputs (raw grouped means
# carry partial-agg-order ulps); the cumsum itself runs in identical
# (day ASC) order. Everything after the first grouped aggregate runs on
# types × days rows.
# ---------------------------------------------------------------------------
_DAY_NS = 86_400_000_000_000


@register(
    "change_point_cusum_events",
    oracle=f"""
        WITH daily AS (
            -- ts IS NOT NULL (r11 nulls probe): an untimestamped event has
            -- no day — its NULL day_epoch group would lead Spark's cumsum
            -- order and trail DuckDB's
            SELECT event_type,
                   (epoch_ns(ts) // {_DAY_NS}) * 86400 AS day_epoch,
                   ROUND(SUM(value) / COUNT(*), 6) AS day_mean
            FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
        ),
        series AS (
            SELECT event_type, ROUND(SUM(value) / COUNT(*), 6) AS series_mean
            FROM events WHERE ts IS NOT NULL GROUP BY 1
        ),
        cusum AS (
            SELECT d.event_type, d.day_epoch,
                   ROUND(SUM(d.day_mean - s.series_mean) OVER (
                       PARTITION BY d.event_type ORDER BY d.day_epoch
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ), 6) AS s
            FROM daily d JOIN series s ON s.event_type = d.event_type
        )
        SELECT event_type, day_epoch AS cp_day_epoch, s AS cusum_s,
               n_days FROM (
            SELECT event_type, day_epoch, s,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                       ORDER BY ABS(s) DESC, day_epoch ASC) AS r,
                   CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
                       AS n_days
            FROM cusum
        ) WHERE r = 1
    """,
    tags=("timeseries", "window", "changepoint"),
)
def change_point_cusum_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            "event_type",
            F.expr(f"(ts DIV {_DAY_NS}) * 86400").alias("day_epoch"),
            "value",
        )
    )
    daily = ev.groupBy("event_type", "day_epoch").agg(
        F.round(F.sum("value") / F.count(F.lit(1)), 6).alias("day_mean")
    )
    series = ev.groupBy("event_type").agg(
        F.round(F.sum("value") / F.count(F.lit(1)), 6).alias("series_mean")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_epoch")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cusum = (
        daily.join(F.broadcast(series), "event_type")
        .withColumn(
            "s",
            F.round(
                F.sum(F.col("day_mean") - F.col("series_mean")).over(w), 6
            ),
        )
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("s")).desc(), F.asc("day_epoch")
    )
    wc = Window.partitionBy("event_type")
    return (
        cusum.withColumn("r", F.row_number().over(wr))
        .withColumn("n_days", F.count(F.lit(1)).over(wc).cast("bigint"))
        .filter(F.col("r") == 1)
        .select(
            "event_type",
            F.col("day_epoch").alias("cp_day_epoch"),
            F.col("s").alias("cusum_s"),
            "n_days",
        )
    )


# ---------------------------------------------------------------------------
# Watermark late-data accounting — the batch twin of streaming
# watermarks: per stream (event type), the watermark after each arrival
# (arrival order = event_id) is the running max event-time minus the
# allowed lateness; an event arriving behind the watermark is what a
# Structured Streaming job would drop. Counted per 6h window: the
# lateness profile that sizes `withWatermark` before a stream goes live.
# ---------------------------------------------------------------------------
_LATE_NS = 30 * 60 * 1_000_000_000
_H6_NS = 6 * 3_600_000_000_000


@register(
    "late_data_accounting",
    oracle=f"""
        WITH marked AS (
            SELECT event_type, epoch_ns(ts) AS t,
                   MAX(epoch_ns(ts)) OVER (
                       PARTITION BY event_type ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) - {_LATE_NS} AS wm
            FROM events
        )
        SELECT event_type,
               (t // {_H6_NS}) * 21600 AS win_start_epoch,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CASE WHEN wm IS NOT NULL AND t < wm
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
               ROUND(SUM(CASE WHEN wm IS NOT NULL AND t < wm
                              THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
                   AS late_share
        FROM marked
        GROUP BY 1, 2
    """,
    tags=("streaming", "window", "watermark"),
)
def late_data_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "ts"
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = ev.select(
        "event_type",
        F.col("ts").alias("t"),
        (F.max("ts").over(w) - _LATE_NS).alias("wm"),
    )
    late = F.when(
        F.col("wm").isNotNull() & (F.col("t") < F.col("wm")), 1
    ).otherwise(0)
    return (
        marked.groupBy(
            "event_type",
            F.expr(f"(t DIV {_H6_NS}) * 21600").alias("win_start_epoch"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(late).cast("bigint").alias("n_late"),
            F.round(F.sum(late) * 1.0 / F.count(F.lit(1)), 6).alias(
                "late_share"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Gini coefficient of revenue concentration (the Lorenz-curve scalar
# companion to pareto_abc_revenue): G = 2·Σ i·x_(i) / (n·Σx) − (n+1)/n
# with x sorted ascending. All sums run in EXACT integers — the
# rank-weighted sum Σ i·x_i is ~(n/2)·total_cents, past int64 by ~1e6
# paying customers, so BOTH engines widen before multiplying (Spark
# DECIMAL(38,0), DuckDB HUGEINT — 128-bit exact either way; DuckDB's
# bare BIGINT product would error on overflow, Spark's would wrap or
# ANSI-throw). The only float operations are on identical exact
# integers, so the 6-dp round cannot ride a partial-agg ulp.
# The rank window is customer-aggregate-sized (dimension, not fact);
# at 10⁹ customers the two-level prefix sum (operators/packing.py) is the
# same plan shape — the pareto_abc_revenue scale note applies verbatim.
# ---------------------------------------------------------------------------
@register(
    "gini_revenue_concentration",
    oracle="""
        WITH cust AS (
            SELECT o_custkey,
                   CAST(ROUND(SUM(o_totalprice) * 100, 0) AS BIGINT) AS rev_cents
            FROM orders GROUP BY o_custkey
        ),
        r AS (
            SELECT rev_cents,
                   ROW_NUMBER() OVER (ORDER BY rev_cents ASC, o_custkey ASC) AS rnk
            FROM cust
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
               ROUND(CAST(SUM(rev_cents) AS DOUBLE) / 100.0, 2) AS total_revenue,
               ROUND(2.0e0 * CAST(SUM(CAST(rnk AS HUGEINT) * rev_cents) AS DOUBLE)
                     / (COUNT(*) * CAST(SUM(rev_cents) AS DOUBLE))
                     - (COUNT(*) + 1.0e0) / COUNT(*), 6) AS gini
        FROM r
    """,
    tags=("agg", "window", "concentration"),
)
def gini_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        F.expr("CAST(ROUND(SUM(o_totalprice) * 100, 0) AS BIGINT)").alias(
            "rev_cents"
        )
    )
    # global ROW_NUMBER in (rev_cents ASC, custkey ASC) order via the
    # two-level bucketed device — no single-task sort of the customer
    # relation (operators/packing.py::range_bucketed_rank)
    r = range_bucketed_rank(
        cust,
        "rev_cents",
        ascending=True,
        tiebreak=("o_custkey",),
        with_row_number=True,
        dedupe_input=True,
    ).select("rev_cents", "o_custkey", F.col("rn").alias("rnk"))
    return r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.expr("ROUND(CAST(SUM(rev_cents) AS DOUBLE) / 100.0, 2)").alias(
            "total_revenue"
        ),
        F.expr(
            "ROUND(2.0e0 * CAST(SUM(CAST(rnk AS DECIMAL(38,0)) * rev_cents)"
            " AS DOUBLE)"
            " / (COUNT(*) * CAST(SUM(rev_cents) AS DOUBLE))"
            " - (COUNT(*) + 1.0e0) / COUNT(*), 6)"
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# Autocorrelation function of daily revenue at lags 1..7 (Box–Jenkins):
# r_k = Σ (x_t − x̄)(x_{t+k} − x̄) / Σ (x_t − x̄)² over the day-ordered
# series — the seasonality/momentum diagnostic behind every forecasting
# model choice. Lags are ROW lags over the sorted daily series (gaps
# collapse, documented; both engines sort the identical relation). Day
# sums round to 2 dp and the series mean to 6 dp BEFORE the deviation
# products (the CUSUM round-before-accumulate rule), so both engines
# multiply identical doubles; the final Σ ratios carry ~1e-15 relative
# partial-agg jitter, far below the 6-dp round (the ANOVA convention).
# The LEAD windows run over the day-domain relation (≤ a few thousand
# rows at any fact volume) — the bounded-histogram discipline.
# ---------------------------------------------------------------------------
_ACF_MAX_LAG = 7


@register(
    "acf_daily_revenue",
    oracle=f"""
        WITH daily AS (
            -- o_orderdate/o_totalprice IS NOT NULL (r11 nulls probe): an
            -- undated order has no day (the NULL day_epoch row would lead
            -- Spark's row-number order and trail DuckDB's), and a day
            -- whose only orders carry no price has no revenue point (its
            -- NULL rev pairs count differently per engine)
            SELECT {_EPOCH_DAY_DUCK} AS day_epoch,
                   ROUND(SUM(o_totalprice), 2) AS rev
            FROM orders
            WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
            GROUP BY 1
        ),
        -- series mean via the exact-cents device (rev is 2-dp by
        -- construction): SUM(cents) is an exact order-free BIGINT, so the
        -- FLOOR half-up chain is bit-identical in both engines — no
        -- ROUND(AVG(double)) midpoint flips. NULLIF keeps an empty orders
        -- relation NULL-safe under ANSI.
        m AS (SELECT FLOOR(SUM(CAST(ROUND(rev * 100, 0) AS BIGINT)) * 1.0e4
                           / NULLIF(COUNT(*), 0) + 0.5e0) / 1.0e6 AS mu
              FROM daily),
        dev AS (
            SELECT d.day_epoch, d.rev - m.mu AS dv,
                   ROW_NUMBER() OVER (ORDER BY d.day_epoch) AS rn
            FROM daily d CROSS JOIN m
        ),
        denom AS (SELECT SUM(dv * dv) AS ss FROM dev),
        lags AS (SELECT unnest(generate_series(1, {_ACF_MAX_LAG})) AS lag),
        pairs AS (
            SELECT l.lag, a.dv AS d0, b.dv AS dk
            FROM lags l
            JOIN dev a ON TRUE
            JOIN dev b ON b.rn = a.rn + l.lag
        )
        SELECT p.lag,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               -- NULLIF: a CONSTANT daily series has ss = 0 (every
               -- deviation exactly 0 on the cents lattice) — the ACF is
               -- undefined, not an ANSI 0-divide / NaN (bug 43, r11);
               -- + 0.0e0 normalizes IEEE -0.0 (the bug-42 class)
               ROUND(SUM(p.d0 * p.dk) / NULLIF(MIN(dn.ss), 0), 6) + 0.0e0
                   AS acf
        FROM pairs p CROSS JOIN denom dn
        GROUP BY p.lag
    """,
    tags=("timeseries", "stats", "diagnostic"),
)
def acf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull() & F.col("o_totalprice").isNotNull()
    )
    daily = orders.groupBy(
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("timestamp_ntz"))
        .cast("bigint")
        .alias("day_epoch")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    m = daily.agg(
        F.expr(
            "FLOOR(SUM(CAST(ROUND(rev * 100, 0) AS BIGINT)) * 1.0e4"
            " / NULLIF(COUNT(*), 0) + 0.5e0) / 1.0e6"
        ).alias("mu")
    )
    w = Window.orderBy("day_epoch")
    dev = daily.crossJoin(F.broadcast(m)).select(
        "day_epoch", (F.col("rev") - F.col("mu")).alias("dv")
    )
    # one window pass delivers all 7 row-lags; the explode emits (lag,
    # d0·dk) pairs so a single grouped agg finishes every lag at once
    leads = dev.select(
        "dv",
        *[F.lead("dv", k).over(w).alias(f"dk_{k}") for k in range(1, _ACF_MAX_LAG + 1)],
    )
    long = leads.select(
        "dv",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("lag"), F.col(f"dk_{k}").alias("dk")
                    )
                    for k in range(1, _ACF_MAX_LAG + 1)
                ]
            )
        ).alias("p"),
    ).select("dv", "p.lag", "p.dk").filter(F.col("dk").isNotNull())
    denom = dev.agg(F.sum(F.col("dv") * F.col("dv")).alias("ss"))
    return (
        long.groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(F.col("dv") * F.col("dk")).alias("num"),
        )
        .crossJoin(F.broadcast(denom))
        .select(
            "lag",
            "n_pairs",
            # NULLIF: constant series → ss = 0 → undefined ACF (bug 43);
            # + 0.0 normalizes -0.0 (bug-42 class)
            (
                F.round(F.col("num") / F.nullif(F.col("ss"), F.lit(0.0)), 6)
                + F.lit(0.0)
            ).alias("acf"),
        )
    )


# ---------------------------------------------------------------------------
# EWMA control chart over daily revenue. The recursive definition
# z_t = λ·x_t + (1-λ)·z_{t-1} has no relational form, but with a DYADIC
# smoothing constant λ = 1/2 the truncated expansion
#     z_t = Σ_{j=0..19} 2^-(j+1) · x_{t-j}  /  Σ_{j=0..19} 2^-(j+1)
# is EXACT float arithmetic end-to-end: revenues are integer cents,
# 2^-(j+1) only shifts the exponent, and every partial sum fits in a
# double's 53-bit significand — so the result is bit-identical in any
# summation order and any engine (no libm, no partial-agg jitter; the
# truncation tail 2^-20 ≈ 1e-6 is the definition, not an error). One
# LAG window pass delivers all 20 terms; the day-domain relation is the
# only thing ever windowed (volume-independent — the acf discipline).
# Alarm rule: revenue outside [0.5, 1.5]× yesterday's EWMA.
# ---------------------------------------------------------------------------
_EWMA_J = 20


def _ewma_terms_duck() -> tuple[str, str]:
    num = " + ".join(
        f"COALESCE(LAG(cents, {j}) OVER w, 0) * {2.0 ** -(j + 1)!r}"
        for j in range(_EWMA_J)
    )
    den = " + ".join(
        f"CASE WHEN LAG(cents, {j}) OVER w IS NULL THEN 0.0"
        f" ELSE {2.0 ** -(j + 1)!r} END"
        for j in range(_EWMA_J)
    )
    return num, den


_EWMA_NUM, _EWMA_DEN = _ewma_terms_duck()


@register(
    "ewma_control_chart_daily",
    oracle=f"""
        WITH daily AS (
            -- o_orderdate IS NOT NULL (r11 nulls probe): an undated order
            -- has no day — its NULL day_epoch row would lead Spark's LAG
            -- chain and trail DuckDB's, shifting every EWMA term
            SELECT {_EPOCH_DAY_DUCK} AS day_epoch,
                   SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS cents
            FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
        ),
        z AS (
            SELECT day_epoch, cents,
                   ({_EWMA_NUM}) / ({_EWMA_DEN}) AS ewma_cents
            FROM daily
            WINDOW w AS (ORDER BY day_epoch)
        )
        SELECT day_epoch, cents / 100.0 AS rev,
               ROUND(ewma_cents / 100.0, 6) AS ewma,
               CASE WHEN LAG(ewma_cents) OVER (ORDER BY day_epoch) IS NULL
                    THEN 0
                    WHEN cents > 1.5 * LAG(ewma_cents) OVER (ORDER BY day_epoch)
                      OR cents < 0.5 * LAG(ewma_cents) OVER (ORDER BY day_epoch)
                    THEN 1 ELSE 0 END AS alarm
        FROM z
    """,
    tags=("timeseries", "window", "anomaly"),
)
def ewma_control_chart_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    )
    daily = orders.groupBy(
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("timestamp_ntz"))
        .cast("bigint")
        .alias("day_epoch")
    ).agg(
        F.sum(F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")).alias(
            "cents"
        )
    )
    w = Window.orderBy("day_epoch")
    num = sum(
        (
            F.coalesce(F.lag("cents", j).over(w), F.lit(0)) * F.lit(2.0 ** -(j + 1))
            for j in range(_EWMA_J)
        ),
        F.lit(0.0),
    )
    den = sum(
        (
            F.when(F.lag("cents", j).over(w).isNull(), 0.0).otherwise(
                F.lit(2.0 ** -(j + 1))
            )
            for j in range(_EWMA_J)
        ),
        F.lit(0.0),
    )
    z = daily.select(
        "day_epoch", "cents", (num / den).alias("ewma_cents")
    )
    prev = F.lag("ewma_cents").over(w)
    return z.select(
        "day_epoch",
        (F.col("cents") / 100.0).alias("rev"),
        F.round(F.col("ewma_cents") / 100.0, 6).alias("ewma"),
        F.when(prev.isNull(), 0)
        .when(
            (F.col("cents") > 1.5 * prev) | (F.col("cents") < 0.5 * prev), 1
        )
        .otherwise(0)
        .alias("alarm"),
    )


# ---------------------------------------------------------------------------
# Mann–Kendall trend test on daily revenue: S = Σ_{i<j} sign(x_j - x_i),
# tie-corrected variance, normal-approximation z. The pair build is
# QUADRATIC IN THE DAY DOMAIN ONLY (a calendar-bounded relation — ~2.4k
# rows for a 6½-year history — so ~3M pairs at any data volume; the fact
# table is touched once by the daily grouped sum). Revenues compare as
# exact integer cents, so S and the tie table are exact integers; the
# only floats are the final /18 and sqrt — both IEEE-deterministic.
# ---------------------------------------------------------------------------
@register(
    "mann_kendall_trend_revenue",
    oracle=f"""
        WITH daily AS (
            SELECT {_EPOCH_DAY_DUCK} AS day_epoch,
                   SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS cents
            FROM orders GROUP BY 1
        ),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily),
        s AS (
            SELECT CAST(SUM(CASE WHEN b.cents > a.cents THEN 1
                                 WHEN b.cents < a.cents THEN -1
                                 ELSE 0 END) AS BIGINT) AS s_stat
            FROM daily a JOIN daily b ON b.day_epoch > a.day_epoch
        ),
        ties AS (
            SELECT COALESCE(CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT), 0)
                   AS tie_term
            FROM (
                SELECT CAST(COUNT(*) AS BIGINT) AS t
                FROM daily GROUP BY cents HAVING COUNT(*) > 1
            )
        )
        SELECT n.n_days, s.s_stat,
               ROUND((n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                      - ties.tie_term) / 18.0, 6) AS var_s,
               ROUND(CASE
                   WHEN s.s_stat > 0 THEN (s.s_stat - 1)
                        / SQRT((n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                                - ties.tie_term) / 18.0)
                   WHEN s.s_stat < 0 THEN (s.s_stat + 1)
                        / SQRT((n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                                - ties.tie_term) / 18.0)
                   ELSE 0.0 END, 6) AS z,
               CASE
                   WHEN s.s_stat > 0 AND (s.s_stat - 1)
                        / SQRT((n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                                - ties.tie_term) / 18.0) > 1.959964
                   THEN 'increasing'
                   WHEN s.s_stat < 0 AND (s.s_stat + 1)
                        / SQRT((n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                                - ties.tie_term) / 18.0) < -1.959964
                   THEN 'decreasing'
                   ELSE 'no_trend' END AS trend
        FROM n CROSS JOIN s CROSS JOIN ties
    """,
    tags=("timeseries", "stats", "trend"),
)
def mann_kendall_trend_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("timestamp_ntz"))
        .cast("bigint")
        .alias("day_epoch")
    ).agg(
        F.sum(F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")).alias(
            "cents"
        )
    )
    n = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    a = daily.select(
        F.col("day_epoch").alias("da"), F.col("cents").alias("ca")
    )
    b = daily.select(
        F.col("day_epoch").alias("db"), F.col("cents").alias("cb")
    )
    s = (
        a.join(b, F.col("db") > F.col("da"))
        .agg(
            F.sum(
                F.when(F.col("cb") > F.col("ca"), 1)
                .when(F.col("cb") < F.col("ca"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s_stat")
        )
    )
    ties = (
        daily.groupBy("cents")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ).cast("bigint"),
                F.lit(0),
            ).alias("tie_term")
        )
    )
    var_expr = (
        F.col("n_days")
        * (F.col("n_days") - 1)
        * (2 * F.col("n_days") + 5)
        - F.col("tie_term")
    ) / 18.0
    z_expr = (
        F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1) / F.sqrt(var_expr))
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1) / F.sqrt(var_expr))
        .otherwise(0.0)
    )
    return (
        n.crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(ties))
        .select(
            "n_days",
            "s_stat",
            F.round(var_expr, 6).alias("var_s"),
            F.round(z_expr, 6).alias("z"),
            F.when(
                (F.col("s_stat") > 0)
                & ((F.col("s_stat") - 1) / F.sqrt(var_expr) > 1.959964),
                "increasing",
            )
            .when(
                (F.col("s_stat") < 0)
                & ((F.col("s_stat") + 1) / F.sqrt(var_expr) < -1.959964),
                "decreasing",
            )
            .otherwise("no_trend")
            .alias("trend"),
        )
    )


# ---------------------------------------------------------------------------
# Purchase-streak histogram — the second gaps-and-islands family member
# (pattern_vshape_prices does direction runs; this does calendar runs):
# per user, the longest run of CONSECUTIVE calendar days with >= 1
# purchase, via the classic day − row_number island key; then the
# distribution of per-user maxima. Integer-only end to end. Every
# window partitions by user; islands are a (user, streak)-sized
# relation — nothing global touches the fact table after the distinct.
# ---------------------------------------------------------------------------
@register(
    "purchase_streaks_histogram",
    oracle=f"""
        WITH pd AS (
            SELECT DISTINCT user_id, epoch_ns(ts) // {_DAY_NS} AS day
            FROM events WHERE event_type = 'purchase'
        ),
        r AS (
            SELECT user_id, day,
                   day - ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY day) AS isl
            FROM pd
        ),
        st AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS len
            FROM r GROUP BY user_id, isl
        ),
        mx AS (SELECT user_id, MAX(len) AS max_streak FROM st GROUP BY user_id)
        SELECT max_streak, CAST(COUNT(*) AS BIGINT) AS n_users
        FROM mx GROUP BY 1
    """,
    tags=("window", "sessionization", "behavioral"),
)
def purchase_streaks_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pd_ = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.expr(f"ts DIV {_DAY_NS}").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    st = (
        pd_.withColumn("isl", F.col("day") - F.row_number().over(w))
        .groupBy("user_id", "isl")
        .agg(F.count(F.lit(1)).cast("bigint").alias("len"))
    )
    mx = st.groupBy("user_id").agg(F.max("len").alias("max_streak"))
    return mx.groupBy("max_streak").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )


# ---------------------------------------------------------------------------
# Cohort LTV curve: users cohorted by first-event month, cumulative
# purchase revenue per user by cohort age. Month gaps collapse (ages
# run over the cohort's OBSERVED months, the acf row-adjacency rule).
# Revenue stays exact integer cents through the per-cell aggregate AND
# the cumulative window, so the running sum is order-proof; the only
# floats are the final two divisions (IEEE-deterministic, identical
# parenthesization both engines). Cohort sizes join back broadcast
# (month-domain-sized); every window partitions by cohort month.
# ---------------------------------------------------------------------------
@register(
    "cohort_ltv_curve",
    oracle=f"""
        WITH ev AS (
            -- ts IS NOT NULL (r11 nulls probe): an untimestamped event has
            -- no month — its NULL age_month cell would lead Spark's
            -- cumulative-LTV order and trail DuckDB's
            SELECT user_id,
                   CAST(EXTRACT(year FROM ts) * 12
                        + EXTRACT(month FROM ts) - 1 AS BIGINT) AS em,
                   CASE WHEN event_type = 'purchase'
                        THEN CAST(ROUND(value * 100, 0) AS BIGINT)
                        ELSE 0 END AS cents
            FROM events WHERE ts IS NOT NULL
        ),
        coh AS (SELECT user_id, MIN(em) AS cohort_month FROM ev GROUP BY 1),
        sizes AS (
            SELECT cohort_month, CAST(COUNT(*) AS BIGINT) AS n_users
            FROM coh GROUP BY 1
        ),
        cells AS (
            SELECT c.cohort_month, e.em - c.cohort_month AS age_month,
                   CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active,
                   SUM(e.cents) AS cell_cents
            FROM ev e JOIN coh c ON c.user_id = e.user_id
            GROUP BY 1, 2
        )
        SELECT cells.cohort_month, cells.age_month, sizes.n_users,
               cells.n_active,
               ROUND((CAST(SUM(cell_cents) OVER (
                          PARTITION BY cells.cohort_month
                          ORDER BY cells.age_month
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                      ) AS BIGINT) / 100.0) / sizes.n_users, 6)
                   AS ltv_per_user
        FROM cells JOIN sizes ON sizes.cohort_month = cells.cohort_month
    """,
    tags=("cohort", "window", "revenue"),
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
    ).select(
        "user_id",
        (
            F.year(
                F.expr(
                    f"date_add(DATE '1970-01-01', CAST(ts DIV {_DAY_NS} AS INT))"
                )
            )
            * 12
            + F.month(
                F.expr(
                    f"date_add(DATE '1970-01-01', CAST(ts DIV {_DAY_NS} AS INT))"
                )
            )
            - 1
        )
        .cast("bigint")
        .alias("em"),
        F.when(
            F.col("event_type") == "purchase",
            F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)"),
        )
        .otherwise(0)
        .alias("cents"),
    )
    coh = ev.groupBy("user_id").agg(F.min("em").alias("cohort_month"))
    sizes = coh.groupBy("cohort_month").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    cells = (
        ev.join(coh, "user_id")
        .groupBy(
            "cohort_month", (F.col("em") - F.col("cohort_month")).alias("age_month")
        )
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("n_active"),
            F.sum("cents").alias("cell_cents"),
        )
    )
    cw = (
        Window.partitionBy("cohort_month")
        .orderBy("age_month")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        cells.join(F.broadcast(sizes), "cohort_month")
        .select(
            "cohort_month",
            "age_month",
            "n_users",
            "n_active",
            F.round(
                (F.sum("cell_cents").over(cw).cast("bigint") / 100.0)
                / F.col("n_users"),
                6,
            ).alias("ltv_per_user"),
        )
    )


# ---------------------------------------------------------------------------
# Classical seasonal decomposition, weekday component: observed daily
# revenue = trend (centered 7-day moving average) + weekday effect
# (mean detrended value per weekday) + residual. Trend is only defined
# where the full 7-row window exists (the standard convention — edge
# days carry no trend and drop out of the effect means). Weekday
# encodes as (day_epoch + 4) % 7 with 0 = Sunday (epoch day 0 is a
# Thursday) — pure integer arithmetic, timezone-proof. Day sums are
# exact cents; the trend window sum stays an exact BIGINT (sum7), so the
# per-day detrended value in 1/700-dollar units (7·cents − sum7) is an
# exact integer too, and the per-weekday means are single FLOOR-half-up
# chains over order-free BIGINT sums — no ROUND(AVG(double)) midpoint
# flips (the forecast-mae class). Everything below the daily grouped
# sum is day-domain.
# ---------------------------------------------------------------------------
@register(
    "seasonal_decompose_weekday",
    oracle=f"""
        WITH daily AS (
            -- o_orderdate IS NOT NULL (r11 nulls probe): an undated order
            -- has no day — its NULL day_epoch row would lead Spark's
            -- centered 7-day window and trail DuckDB's
            SELECT {_EPOCH_DAY_DUCK} AS day_epoch,
                   SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS cents
            FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
        ),
        tr AS (
            SELECT day_epoch, cents,
                   CASE WHEN COUNT(*) OVER w = 7
                        THEN SUM(cents) OVER w
                        ELSE NULL END AS sum7
            FROM daily
            WINDOW w AS (ORDER BY day_epoch
                         ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        )
        SELECT CAST((day_epoch + 4) % 7 AS BIGINT) AS weekday,
               CAST(COUNT(sum7) AS BIGINT) AS n_days,
               FLOOR(SUM(7 * cents - sum7) * 1.0e0 / 7.0e0
                     / COUNT(*) + 0.5e0) / 100.0e0 AS weekday_effect,
               FLOOR(SUM(sum7) * 1.0e0 / 7.0e0
                     / COUNT(*) + 0.5e0) / 100.0e0 AS avg_trend
        FROM tr
        WHERE sum7 IS NOT NULL
        GROUP BY 1
    """,
    tags=("timeseries", "window", "seasonal"),
)
def seasonal_decompose_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    )
    daily = orders.groupBy(
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("timestamp_ntz"))
        .cast("bigint")
        .alias("day_epoch")
    ).agg(
        F.sum(F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")).alias(
            "cents"
        )
    )
    w = Window.orderBy("day_epoch").rowsBetween(-3, 3)
    tr = daily.select(
        "day_epoch",
        "cents",
        F.when(
            F.count(F.lit(1)).over(w) == 7,
            F.sum("cents").over(w),
        ).alias("sum7"),
    ).filter(F.col("sum7").isNotNull())
    return tr.groupBy(
        ((F.col("day_epoch") + 4) % 7).cast("bigint").alias("weekday")
    ).agg(
        F.count("sum7").cast("bigint").alias("n_days"),
        F.expr(
            "FLOOR(SUM(7 * cents - sum7) * 1.0e0 / 7.0e0"
            " / COUNT(*) + 0.5e0) / 100.0e0"
        ).alias("weekday_effect"),
        F.expr(
            "FLOOR(SUM(sum7) * 1.0e0 / 7.0e0 / COUNT(*) + 0.5e0) / 100.0e0"
        ).alias("avg_trend"),
    )


# ---------------------------------------------------------------------------
# Goh–Barabási burstiness of per-user inter-event times:
# B = (σ − μ) / (σ + μ) ∈ [−1, 1] (−1 perfectly regular, 0 Poisson,
# → 1 extremely bursty) — the behavioral-health diagnostic for event
# streams (bot traffic is regular, human traffic is bursty). Gaps are
# integer SECONDS (ns DIV 1e9) so the per-user moment pass (n, Σdt,
# Σdt²) is exact int64 — σ² = Σdt²/n − (Σdt/n)² and B are then pure
# IEEE-deterministic per-user scalars; the histogram bins FLOOR(B·10)
# on identical doubles. One user-keyed LAG + one user-keyed aggregate;
# the histogram relation is 21 bins.
# ---------------------------------------------------------------------------
_BB_NS_PER_S = 1_000_000_000


@register(
    "burstiness_user_interarrival",
    oracle=f"""
        WITH gaps AS (
            SELECT user_id,
                   (epoch_ns(ts) - LAG(epoch_ns(ts)) OVER (
                       PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
                   )) // {_BB_NS_PER_S} AS dt
            FROM events
        ),
        mom AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(dt) AS BIGINT) AS s1,
                   CAST(SUM(dt * dt) AS BIGINT) AS s2
            FROM gaps WHERE dt IS NOT NULL GROUP BY 1
        ),
        b AS (
            SELECT user_id, n,
                   CASE WHEN SQRT(GREATEST(CAST(s2 AS DOUBLE) / n
                                  - (CAST(s1 AS DOUBLE) / n)
                                    * (CAST(s1 AS DOUBLE) / n), 0.0))
                             + CAST(s1 AS DOUBLE) / n = 0 THEN 0.0
                        ELSE (SQRT(GREATEST(CAST(s2 AS DOUBLE) / n
                                   - (CAST(s1 AS DOUBLE) / n)
                                     * (CAST(s1 AS DOUBLE) / n), 0.0))
                              - CAST(s1 AS DOUBLE) / n)
                             / (SQRT(GREATEST(CAST(s2 AS DOUBLE) / n
                                     - (CAST(s1 AS DOUBLE) / n)
                                       * (CAST(s1 AS DOUBLE) / n), 0.0))
                                + CAST(s1 AS DOUBLE) / n) END AS bness
            FROM mom
        )
        SELECT CAST(FLOOR(bness * 10) AS BIGINT) AS b_bin,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               ROUND(AVG(bness), 6) AS avg_b
        FROM b GROUP BY 1
    """,
    tags=("stats", "behavioral", "window"),
)
def burstiness_user_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select(
            "user_id", (F.col("ts") - F.lag("ts").over(w)).alias("diff_ns")
        )
        .select("user_id", F.expr(f"diff_ns DIV {_BB_NS_PER_S}").alias("dt"))
        .filter(F.col("dt").isNotNull())
    )
    mom = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("dt").cast("bigint").alias("s1"),
        F.sum(F.col("dt") * F.col("dt")).cast("bigint").alias("s2"),
    )
    mu = F.col("s1").cast("double") / F.col("n")
    # GREATEST guards the float ulp that could push an exactly-zero
    # variance fractionally negative (Spark SQRT(neg) is NaN; DuckDB
    # errors) — the feature_rolling_events discipline
    sigma = F.sqrt(
        F.greatest(
            F.col("s2").cast("double") / F.col("n") - mu * mu, F.lit(0.0)
        )
    )
    bness = F.when(sigma + mu == 0, 0.0).otherwise((sigma - mu) / (sigma + mu))
    b = mom.select("user_id", "n", bness.alias("bness"))
    return b.groupBy(
        F.floor(F.col("bness") * 10).cast("bigint").alias("b_bin")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.round(F.avg("bness"), 6).alias("avg_b"),
    )


# ---------------------------------------------------------------------------
# Forecast backtest — MAPE/MAE of the two standard zero-parameter
# baselines every forecasting effort must beat: naive (yesterday's
# revenue) and seasonal-naive (same weekday last week). Forecast days
# join by CALENDAR day (day_epoch − 1 / − 7 equi-joins on the
# day-domain relation), not row adjacency — a day-gap must invalidate
# the forecast, not silently reach further back. Revenues are exact
# cents; each day's APE is one IEEE division; the per-model means run
# over the day-domain (jitter ~1e-16 against the 6-dp round).
# ---------------------------------------------------------------------------
@register(
    "forecast_backtest_mape",
    oracle=f"""
        WITH daily AS (
            SELECT {_EPOCH_DAY_DUCK} AS day_epoch,
                   SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS cents
            FROM orders GROUP BY 1
        ),
        scored AS (
            SELECT 'naive' AS model, a.cents AS actual, f.cents AS forecast
            FROM daily a JOIN daily f ON f.day_epoch = a.day_epoch - 1
            UNION ALL
            SELECT 'seasonal_naive' AS model, a.cents AS actual,
                   f.cents AS forecast
            FROM daily a JOIN daily f ON f.day_epoch = a.day_epoch - 7
        )
        SELECT model,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               -- MAPE is undefined at actual = 0 (the metric's textbook
               -- flaw: |Δ|/0 is an ANSI crash in Spark, inf in DuckDB;
               -- scan-found via the planted zero-total order being a
               -- day's only order). Standard practice: zero-actual days
               -- are excluded from the MAPE mean (CASE → NULL, AVG skips
               -- NULLs identically in both engines); mae keeps all days.
               ROUND(AVG(CASE WHEN actual <> 0 THEN
                         ABS(CAST(actual - forecast AS DOUBLE)) / actual
                         END), 6) AS mape,
               -- portable half-up on exact integer cents: AVG of integer
               -- cents lands EXACTLY on a .5-cent midpoint whenever the
               -- cent sum is odd over an even day count, and the engines'
               -- native ROUND conventions then disagree (repr-HALF_UP vs
               -- double-half-away — the croston incident class; scan-found
               -- on a fresh random seed). SUM is an exact integer in both
               -- engines; the single division, +0.5, FLOOR, /100 chain is
               -- the same correctly-rounded double ops everywhere.
               FLOOR(CAST(SUM(ABS(actual - forecast)) AS BIGINT)
                     * 1.0e0 / COUNT(*) + 0.5) / 100.0e0 AS mae
        FROM scored GROUP BY model
    """,
    tags=("timeseries", "forecast", "eval"),
)
def forecast_backtest_mape(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("timestamp_ntz"))
        .cast("bigint")
        .alias("day_epoch")
    ).agg(
        F.sum(F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")).alias(
            "cents"
        )
    )
    a = daily.select("day_epoch", F.col("cents").alias("actual"))
    f1 = daily.select(
        (F.col("day_epoch") + 1).alias("day_epoch"),
        F.col("cents").alias("forecast"),
    )
    f7 = daily.select(
        (F.col("day_epoch") + 7).alias("day_epoch"),
        F.col("cents").alias("forecast"),
    )
    scored = (
        a.join(f1, "day_epoch")
        .select(F.lit("naive").alias("model"), "actual", "forecast")
        .unionByName(
            a.join(f7, "day_epoch").select(
                F.lit("seasonal_naive").alias("model"), "actual", "forecast"
            )
        )
    )
    ape = F.abs((F.col("actual") - F.col("forecast")).cast("double"))
    return scored.groupBy("model").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        # zero-actual days excluded from the MAPE mean — see oracle note
        F.round(
            F.avg(F.when(F.col("actual") != 0, ape / F.col("actual"))), 6
        ).alias("mape"),
        # portable half-up on exact cents — see the oracle note
        F.expr(
            "FLOOR(CAST(SUM(ABS(actual - forecast)) AS BIGINT)"
            " * 1.0e0 / COUNT(*) + 0.5) / 100.0e0"
        ).alias("mae"),
    )


# ---------------------------------------------------------------------------
# Seasonal-residual anomaly detection — the composition the decompose
# query exists for: residual = observed − trend (centered 7-day MA) −
# weekday effect, then the robust MAD screen (anomaly_mad_events'
# device) over the residual series. Residuals ROUND to 2 dp before the
# median/MAD order statistics so both engines rank IDENTICAL doubles
# (the percentile interpolations differ in expression form, hence the
# 6-dp rounds on med/mad — the rfm threshold discipline). A zero MAD
# (> half the residuals identical) yields an empty report, guarded in
# both engines. Day-domain end to end below the daily grouped sum.
# ---------------------------------------------------------------------------
_SRA_K = 3.0


@register(
    "seasonal_residual_anomalies",
    oracle=f"""
        WITH daily AS (
            -- o_orderdate IS NOT NULL (r11 nulls probe, latent sibling of
            -- seasonal_decompose_weekday): the NULL day_epoch row would
            -- lead Spark's centered 7-day window and trail DuckDB's
            SELECT {_EPOCH_DAY_DUCK} AS day_epoch,
                   SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS cents
            FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
        ),
        tr AS (
            SELECT day_epoch, cents, cents / 100.0 AS rev,
                   -- keep the 7-day window sum as an exact BIGINT; trend
                   -- (sum7/700) and the weekday effect derive from it
                   -- without ROUND(AVG(double)) midpoint flips — the
                   -- seasonal_decompose_weekday device
                   CASE WHEN COUNT(*) OVER w = 7
                        THEN SUM(cents) OVER w
                        ELSE NULL END AS sum7
            FROM daily
            WINDOW w AS (ORDER BY day_epoch
                         ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        ),
        eff AS (
            SELECT CAST((day_epoch + 4) % 7 AS BIGINT) AS weekday,
                   FLOOR(SUM(7 * cents - sum7) * 1.0e4 / 7.0e0
                         / COUNT(*) + 0.5e0) / 1.0e6 AS effect
            FROM tr WHERE sum7 IS NOT NULL GROUP BY 1
        ),
        res AS (
            SELECT t.day_epoch, t.rev,
                   ROUND(t.rev - t.sum7 / 700.0e0 - e.effect, 2) AS residual
            FROM tr t
            JOIN eff e ON e.weekday = CAST((t.day_epoch + 4) % 7 AS BIGINT)
            WHERE t.sum7 IS NOT NULL
        ),
        m AS (
            SELECT ROUND(quantile_cont(residual, 0.5), 6) AS med FROM res
        ),
        md AS (
            SELECT ROUND(quantile_cont(ABS(res.residual - m.med), 0.5), 6)
                   AS mad
            FROM res CROSS JOIN m
        )
        SELECT res.day_epoch, res.rev, res.residual,
               ROUND(ABS(res.residual - m.med) / md.mad, 4) AS score
        FROM res CROSS JOIN m CROSS JOIN md
        WHERE md.mad > 0
          AND ABS(res.residual - m.med) / md.mad > {_SRA_K}
    """,
    tags=("timeseries", "anomaly", "seasonal"),
)
def seasonal_residual_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    )
    daily = orders.groupBy(
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("timestamp_ntz"))
        .cast("bigint")
        .alias("day_epoch")
    ).agg(
        F.sum(F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")).alias(
            "cents"
        )
    )
    w = Window.orderBy("day_epoch").rowsBetween(-3, 3)
    tr = daily.select(
        "day_epoch",
        "cents",
        (F.col("cents") / 100.0).alias("rev"),
        F.when(
            F.count(F.lit(1)).over(w) == 7,
            F.sum("cents").over(w),
        ).alias("sum7"),
    ).filter(F.col("sum7").isNotNull()).localCheckpoint(eager=False)
    # ^ day-domain; consumed by the weekday-effect aggregate AND the
    # residual join — one materialization, not two orders scans
    eff = tr.groupBy(
        ((F.col("day_epoch") + 4) % 7).cast("bigint").alias("weekday")
    ).agg(
        F.expr(
            "FLOOR(SUM(7 * cents - sum7) * 1.0e4 / 7.0e0"
            " / COUNT(*) + 0.5e0) / 1.0e6"
        ).alias("effect")
    )
    res = (
        tr.withColumn(
            "weekday", ((F.col("day_epoch") + 4) % 7).cast("bigint")
        )
        .join(F.broadcast(eff), "weekday")
        .select(
            "day_epoch",
            "rev",
            F.round(
                F.col("rev") - F.expr("sum7 / 700.0e0") - F.col("effect"), 2
            ).alias("residual"),
        )
        # day-domain; consumed by the median, the MAD, and the final scan
        .localCheckpoint(eager=False)
    )
    m = res.agg(
        F.round(F.expr("percentile(residual, 0.5)"), 6).alias("med")
    )
    md = (
        res.crossJoin(F.broadcast(m))
        .agg(
            F.round(
                F.expr("percentile(ABS(residual - med), 0.5)"), 6
            ).alias("mad")
        )
    )
    dev = F.abs(F.col("residual") - F.col("med"))
    return (
        res.crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(md))
        .filter((F.col("mad") > 0) & (dev / F.col("mad") > _SRA_K))
        .select(
            "day_epoch",
            "rev",
            "residual",
            F.round(dev / F.col("mad"), 4).alias("score"),
        )
    )


# ---------------------------------------------------------------------------
# Spearman rank correlation between daily revenue and daily order count
# — the nonparametric companion to corr_lineitem_moments (Pearson on
# raw values): ranks are robust to the revenue's heavy tail. Order
# counts tie heavily, so ties take AVERAGE ranks (RANK() + (t−1)/2 —
# the 1-6Σd²/n(n²−1) shortcut is tie-invalid and NOT used). Ranks are
# exact half-integers ≤ the day count, so every moment sum is exact in
# a double regardless of summation order; ρ is one fixed-parenthesis
# Pearson expression on the rank moments. Day-domain end to end below
# the daily grouped sum; zero-variance degenerates to NULL via the
# exact MIN=MAX guard.
# ---------------------------------------------------------------------------
@register(
    "spearman_corr_daily",
    oracle=f"""
        WITH daily AS (
            -- o_orderdate/o_totalprice IS NOT NULL (r11 nulls probe): the
            -- series is over dated, priced orders — a day whose only
            -- orders carry no price would rank its NULL x at opposite
            -- ends of the engines' rank order
            SELECT {_EPOCH_DAY_DUCK} AS day_epoch,
                   SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS x,
                   CAST(COUNT(*) AS BIGINT) AS y
            FROM orders
            WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
            GROUP BY 1
        ),
        ranked AS (
            SELECT
                RANK() OVER (ORDER BY x)
                  + (COUNT(*) OVER (PARTITION BY x) - 1) / 2.0 AS rx,
                RANK() OVER (ORDER BY y)
                  + (COUNT(*) OVER (PARTITION BY y) - 1) / 2.0 AS ry
            FROM daily
        ),
        mom AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(rx) AS sx, SUM(ry) AS sy, SUM(rx * ry) AS sxy,
                   SUM(rx * rx) AS sxx, SUM(ry * ry) AS syy,
                   CAST(MIN(rx) = MAX(rx) AS INT) AS x_const,
                   CAST(MIN(ry) = MAX(ry) AS INT) AS y_const
            FROM ranked
        )
        SELECT n AS n_days,
               -- + 0.0e0 normalizes IEEE -0.0 (the crosscorr bug-42
               -- class: a zero rank-covariance reaches the round as
               -- ±1e-18 depending on engine fp association)
               CASE WHEN x_const = 1 OR y_const = 1 THEN NULL ELSE
               ROUND((sxy / n - (sx / n) * (sy / n))
                     / SQRT((sxx / n - (sx / n) * (sx / n))
                            * (syy / n - (sy / n) * (sy / n))), 6) + 0.0e0
               END AS spearman_rho
        FROM mom
    """,
    tags=("timeseries", "stats", "correlation"),
)
def spearman_corr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull() & F.col("o_totalprice").isNotNull()
    )
    daily = orders.groupBy(
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("timestamp_ntz"))
        .cast("bigint")
        .alias("day_epoch")
    ).agg(
        F.sum(F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")).alias("x"),
        F.count(F.lit(1)).cast("bigint").alias("y"),
    )
    def _avg_rank(col: str):
        return F.rank().over(Window.orderBy(col)) + (
            F.count(F.lit(1)).over(Window.partitionBy(col)) - 1
        ) / 2.0

    ranked = daily.select(
        _avg_rank("x").alias("rx"), _avg_rank("y").alias("ry")
    )
    mom = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
        (F.min("rx") == F.max("rx")).cast("int").alias("x_const"),
        (F.min("ry") == F.max("ry")).cast("int").alias("y_const"),
    )
    mean = lambda c: F.col(c) / F.col("n")  # noqa: E731
    rho = (F.col("sxy") / F.col("n") - mean("sx") * mean("sy")) / F.sqrt(
        (F.col("sxx") / F.col("n") - mean("sx") * mean("sx"))
        * (F.col("syy") / F.col("n") - mean("sy") * mean("sy"))
    )
    return mom.select(
        F.col("n").alias("n_days"),
        F.when(
            (F.col("x_const") == 1) | (F.col("y_const") == 1),
            F.lit(None).cast("double"),
        )
        .otherwise(F.round(rho, 6) + F.lit(0.0))  # -0.0 normalization
        .alias("spearman_rho"),
    )


# ---------------------------------------------------------------------------
# New-vs-returning revenue split — the customer-acquisition daily view
# every commerce dashboard leads with: an order on its customer's FIRST
# order day is "new" revenue, everything later "returning". One
# customer-keyed MIN aggregate joins back onto the fact scan (equi-join
# on the customer key — both sides fact-scaled, no broadcast
# assumption); revenue stays exact cents; distinct-customer counts are
# engine-exact COUNT(DISTINCT CASE ...). Day-domain output.
# ---------------------------------------------------------------------------
@register(
    "new_vs_returning_revenue",
    oracle=f"""
        WITH o AS (
            SELECT o_custkey, {_EPOCH_DAY_DUCK} AS day_epoch,
                   CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
            FROM orders
        ),
        fst AS (
            SELECT o_custkey, MIN(day_epoch) AS first_day FROM o GROUP BY 1
        )
        SELECT o.day_epoch,
               CAST(SUM(CASE WHEN o.day_epoch = f.first_day
                             THEN o.cents ELSE 0 END) AS BIGINT) / 100.0
                   AS rev_new,
               CAST(SUM(CASE WHEN o.day_epoch > f.first_day
                             THEN o.cents ELSE 0 END) AS BIGINT) / 100.0
                   AS rev_returning,
               CAST(COUNT(DISTINCT CASE WHEN o.day_epoch = f.first_day
                                        THEN o.o_custkey END) AS BIGINT)
                   AS n_new_customers,
               CAST(COUNT(DISTINCT CASE WHEN o.day_epoch > f.first_day
                                        THEN o.o_custkey END) AS BIGINT)
                   AS n_returning_customers
        FROM o JOIN fst f ON f.o_custkey = o.o_custkey
        GROUP BY 1
    """,
    tags=("revenue", "cohort", "product-metric"),
)
def new_vs_returning_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("timestamp_ntz"))
        .cast("bigint")
        .alias("day_epoch"),
        F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)").alias("cents"),
    )
    fst = o.groupBy("o_custkey").agg(F.min("day_epoch").alias("first_day"))
    is_new = F.col("day_epoch") == F.col("first_day")
    is_ret = F.col("day_epoch") > F.col("first_day")
    return (
        o.join(fst, "o_custkey")
        .groupBy("day_epoch")
        .agg(
            (
                F.sum(F.when(is_new, F.col("cents")).otherwise(0)).cast(
                    "bigint"
                )
                / 100.0
            ).alias("rev_new"),
            (
                F.sum(F.when(is_ret, F.col("cents")).otherwise(0)).cast(
                    "bigint"
                )
                / 100.0
            ).alias("rev_returning"),
            F.countDistinct(F.when(is_new, F.col("o_custkey")))
            .cast("bigint")
            .alias("n_new_customers"),
            F.countDistinct(F.when(is_ret, F.col("o_custkey")))
            .cast("bigint")
            .alias("n_returning_customers"),
        )
    )


# ---------------------------------------------------------------------------
# Next-event bigram model accuracy (round-6 wave): the eval twin of
# markov_transition_events. Train on even user_ids — per prev_type the
# predicted next is the argmax transition count (count DESC, type ASC
# tiebreak — both engines deterministic); evaluate top-1 accuracy on odd
# users' transitions. The model is a ≤types-row relation (broadcast);
# the only fact-sized work is the per-user LAG window each half already
# pays. Output: per-prev-type accuracy + the prediction itself.
# ---------------------------------------------------------------------------
@register(
    "session_next_event_accuracy",
    oracle="""
        WITH t AS (
            -- ts/event_type IS NOT NULL (r11 nulls probe): the markov
            -- chain convention — untimestamped events have no order,
            -- typeless events are no state
            SELECT user_id, event_type,
                   LAG(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS prev_type
            FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
        ),
        train AS (
            SELECT prev_type, event_type, COUNT(*) AS c
            FROM t WHERE prev_type IS NOT NULL AND user_id % 2 = 0
            GROUP BY 1, 2
        ),
        model AS (
            SELECT prev_type, event_type AS predicted FROM (
                SELECT prev_type, event_type,
                       ROW_NUMBER() OVER (PARTITION BY prev_type
                           ORDER BY c DESC, event_type ASC) AS r
                FROM train
            ) WHERE r = 1
        )
        SELECT t.prev_type,
               m.predicted,
               CAST(COUNT(*) AS BIGINT) AS n_test,
               CAST(SUM(CASE WHEN t.event_type = m.predicted
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
               ROUND(SUM(CASE WHEN t.event_type = m.predicted
                              THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
                   AS accuracy
        FROM t JOIN model m ON m.prev_type = t.prev_type
        WHERE t.prev_type IS NOT NULL AND t.user_id % 2 = 1
        GROUP BY 1, 2
    """,
    tags=("events", "ml", "eval"),
)
def session_next_event_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts", "event_id")
        .filter(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
    )
    lag_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = ev.withColumn("prev_type", F.lag("event_type").over(lag_w)).where(
        F.col("prev_type").isNotNull()
    )
    train = (
        t.where(F.col("user_id") % 2 == 0)
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # types × types relation: the rank window is domain-bounded
    best_w = Window.partitionBy("prev_type").orderBy(
        F.desc("c"), F.asc("event_type")
    )
    model = (
        train.withColumn("r", F.row_number().over(best_w))
        .where(F.col("r") == 1)
        .select("prev_type", F.col("event_type").alias("predicted"))
    )
    test = t.where(F.col("user_id") % 2 == 1)
    hit = F.when(F.col("event_type") == F.col("predicted"), 1).otherwise(0)
    return (
        test.join(F.broadcast(model), "prev_type")
        .groupBy("prev_type", "predicted")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(hit).cast("bigint").alias("n_correct"),
            F.round(F.sum(hit) * 1.0 / F.count(F.lit(1)), 6).alias("accuracy"),
        )
    )


# ---------------------------------------------------------------------------
# Lorenz curve by customer decile (round-6 wave): cumulative share of
# revenue held by the bottom d/10 of customers — the 10-point curve the
# Gini coefficient integrates, and the operational view ("bottom 50%
# hold 9%") behind it. Deciles come from the range-bucketed ROW_NUMBER
# (operators/packing.py — no single-task sort of the customer relation)
# via the pure-integer formula (rn·10 + n − 1) DIV n, so the decile
# boundary can never ride a float ceil; revenue stays exact cents and
# the final cumsum runs over the 10-row decile relation.
# ---------------------------------------------------------------------------
@register(
    "lorenz_curve_deciles",
    oracle="""
        WITH cust AS (
            SELECT o_custkey,
                   CAST(ROUND(SUM(o_totalprice) * 100, 0) AS BIGINT)
                       AS rev_cents
            FROM orders GROUP BY 1
        ),
        r AS (
            SELECT rev_cents,
                   ROW_NUMBER() OVER (ORDER BY rev_cents ASC, o_custkey ASC)
                       AS rn,
                   COUNT(*) OVER () AS n
            FROM cust
        ),
        d AS (
            SELECT (rn * 10 + n - 1) // n AS decile,
                   CAST(SUM(rev_cents) AS BIGINT) AS cents,
                   CAST(COUNT(*) AS BIGINT) AS n_customers
            FROM r GROUP BY 1
        ),
        t AS (SELECT CAST(SUM(cents) AS BIGINT) AS total FROM d)
        SELECT decile, n_customers,
               cents / 100.0 AS revenue,
               -- FLOOR device: the cumulative share is a ratio of exact
               -- integers whose double can sit exactly ON a 1e-6
               -- repr-tie where the engines' native ROUND split
               -- (probe-found, tiny seed 131); NULLIF guards the
               -- all-zero-revenue corpus
               FLOOR(CAST(SUM(cents) OVER (ORDER BY decile
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          AS DOUBLE)
                     * 1.0e6 / NULLIF(t.total, 0) + 0.5e0) / 1.0e6
                   AS lorenz_cum_share
        FROM d CROSS JOIN t
    """,
    tags=("agg", "window", "concentration"),
)
def lorenz_curve_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        F.expr("CAST(ROUND(SUM(o_totalprice) * 100, 0) AS BIGINT)").alias(
            "rev_cents"
        )
    )
    r = range_bucketed_rank(
        cust,
        "rev_cents",
        ascending=True,
        tiebreak=("o_custkey",),
        with_rank=True,
        with_row_number=True,
        dedupe_input=True,
    )
    d = r.groupBy(
        F.expr("(rn * 10 + n_part - 1) DIV n_part").alias("decile")
    ).agg(
        F.sum("rev_cents").cast("bigint").alias("cents"),
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
    )
    t = d.agg(F.sum("cents").cast("bigint").alias("total"))
    # 10-row decile relation: the unpartitioned cumsum here is bounded
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return d.crossJoin(F.broadcast(t)).select(
        "decile",
        "n_customers",
        (F.col("cents") / 100.0).alias("revenue"),
        # FLOOR device over the exact-integer ratio — see oracle note
        (
            F.floor(
                F.sum("cents").over(w).cast("double") * 1.0e6
                / F.nullif(F.col("total"), F.lit(0))
                + 0.5
            )
            / 1.0e6
        ).alias("lorenz_cum_share"),
    )


# ---------------------------------------------------------------------------
# Holt–Winters additive forecast of daily purchase revenue (Holt 1957,
# Winters 1960; season m = 7): the missing member of the forecasting
# family (seasonal-naive backtest, EWMA chart, Croston) — level, trend
# AND weekly seasonality with a 7-day-ahead forecast. All smoothing
# constants are 1/2 EXACTLY, and the coupled (l, b, s) recursion runs in
# the SAME op order in both engines, so every state is bit-identical —
# no libm anywhere.
#
# Scale shape: the ONLY fact-sized work is the daily grouped cents sum.
# The recursion's state is DAY-DOMAIN-bounded (days don't grow with
# volume), so Spark collects the ~30-row daily series and solves on the
# driver — the markov/k-means-seed pattern; the oracle runs the same
# recursion as a RECURSIVE CTE joined to the indexed day relation,
# carrying the rotating 7-slot seasonal vector as columns. Init:
# l0 = mean(x1..x7), b0 = (mean(x8..x14) − l0)/7, s_i = x_i − l0
# (explicit left-associated sums — aggregate order would be
# engine-dependent). Series shorter than 15 days -> empty result.
# ---------------------------------------------------------------------------
def _hw_oracle() -> str:
    x = lambda i: f"MAX(CASE WHEN i = {i} THEN x END)"  # noqa: E731
    l0 = f"(((((({x(1)} + {x(2)}) + {x(3)}) + {x(4)}) + {x(5)}) + {x(6)}) + {x(7)}) / 7.0"
    m2 = f"(((((({x(8)} + {x(9)}) + {x(10)}) + {x(11)}) + {x(12)}) + {x(13)}) + {x(14)}) / 7.0"
    return f"""
        WITH RECURSIVE d AS (
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i,
                   CAST(cents AS DOUBLE) / 100.0 AS x
            FROM (
                -- ts/value IS NOT NULL (r11 nulls probe): the demand
                -- series is over timestamped, valued purchases — a NULL
                -- day would lead Spark's collect order and trail
                -- DuckDB's, and an all-NULL-value day has no point
                SELECT epoch_ns(ts) // {_DAY_NS} AS day,
                       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT))
                            AS BIGINT) AS cents
                FROM events
                WHERE event_type = 'purchase'
                  AND ts IS NOT NULL AND value IS NOT NULL
                GROUP BY 1
            )
        ),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM d),
        init AS (
            SELECT 7 AS i, {l0} AS l, ({m2} - ({l0})) / 7.0 AS b,
                   {x(1)} - ({l0}) AS s0, {x(2)} - ({l0}) AS s1,
                   {x(3)} - ({l0}) AS s2, {x(4)} - ({l0}) AS s3,
                   {x(5)} - ({l0}) AS s4, {x(6)} - ({l0}) AS s5,
                   {x(7)} - ({l0}) AS s6
            FROM d WHERE i <= 14
        ),
        rec AS (
            SELECT * FROM init
            UNION ALL
            SELECT i, lnew AS l,
                   0.5 * (lnew - l) + 0.5 * b AS b,
                   s1 AS s0, s2 AS s1, s3 AS s2, s4 AS s3, s5 AS s4,
                   s6 AS s5,
                   0.5 * (x - lnew) + 0.5 * s0 AS s6
            FROM (
                SELECT d.i, d.x, r.l, r.b, r.s0, r.s1, r.s2, r.s3, r.s4,
                       r.s5, r.s6,
                       0.5 * (d.x - r.s0) + 0.5 * (r.l + r.b) AS lnew
                FROM rec r JOIN d ON d.i = r.i + 1
            )
        ),
        fin AS (
            SELECT r.* FROM rec r CROSS JOIN n WHERE r.i = n.nd AND n.nd >= 15
        )
        SELECT CAST(h AS BIGINT) AS h,
               ROUND(l + h * b + CASE ((h - 1) % 7)
                     WHEN 0 THEN s0 WHEN 1 THEN s1 WHEN 2 THEN s2
                     WHEN 3 THEN s3 WHEN 4 THEN s4 WHEN 5 THEN s5
                     ELSE s6 END, 6) AS forecast,
               ROUND(l, 6) AS level, ROUND(b, 6) AS trend
        FROM fin CROSS JOIN (SELECT unnest(generate_series(1, 7)) AS h)
    """


@register(
    "holt_winters_daily",
    oracle=_hw_oracle(),
    tags=("timeseries", "forecast", "events"),
)
def holt_winters_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase")
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
    )
    daily = (
        ev.groupBy(F.expr(f"ts DIV {_DAY_NS}").alias("day"))
        .agg(
            F.sum(F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)"))
            .cast("bigint")
            .alias("cents")
        )
        .orderBy("day")
    )
    # DAY-DOMAIN collect (~30 rows at any volume — the markov pattern):
    # the fact-sized daily aggregate above stays distributed
    xs = [r["cents"] / 100.0 for r in daily.collect()]
    schema = "h bigint, forecast double, level double, trend double"
    if len(xs) < 15:
        return values_df(spark, [], schema)
    l, b, s = _hw_solve(xs)
    # HALF_UP like the oracle's ROUND — Python round() is half-to-even
    # and diverges on exact 6-dp midpoints (the advisor-flagged class)
    from etl_pipeline_spark.utils.rounding import round6_half_up

    rows = [
        (
            h,
            round6_half_up(l + h * b + s[(h - 1) % 7]),
            round6_half_up(l),
            round6_half_up(b),
        )
        for h in range(1, 8)
    ]
    return values_df(spark, rows, schema)


def _hw_solve(xs: list[float]) -> tuple[float, float, list[float]]:
    """The additive Holt-Winters recursion (m=7, all constants 1/2) in
    the exact op order the oracle's recursive CTE uses — bit-identical
    states. Returns (level, trend, seasonal[0..6] for the next 7 days)."""
    l = (((((xs[0] + xs[1]) + xs[2]) + xs[3]) + xs[4]) + xs[5] + xs[6]) / 7.0
    m2 = (((((xs[7] + xs[8]) + xs[9]) + xs[10]) + xs[11]) + xs[12] + xs[13]) / 7.0
    b = (m2 - l) / 7.0
    s = [xs[i] - l for i in range(7)]
    for x in xs[7:]:
        ln = 0.5 * (x - s[0]) + 0.5 * (l + b)
        b = 0.5 * (ln - l) + 0.5 * b
        s = s[1:] + [0.5 * (x - ln) + 0.5 * s[0]]
        l = ln
    return l, b, s


# ---------------------------------------------------------------------------
# Theil index decomposition of customer revenue inequality by nation
# (Theil 1967; the information-theoretic member of the concentration
# family next to Gini/Lorenz/HHI, and the only one that decomposes
# EXACTLY into within-group + between-group terms):
#   T = (1/n) sum_i (x_i/mu) ln(x_i/mu)
#     = sum_g s_g T_g  +  sum_g s_g ln((mu_g/mu))        (s_g = revenue share)
# Per-customer revenue in exact integer cents; each group term needs
# only (n_g, sum_g, sum_g x ln x) — one customer-keyed aggregate, one
# nation-domain finish. ln() of cents ratios rounds at the final 6 dp
# (the ANOVA convention). Zero-revenue customers drop (x ln x -> 0
# limit, stated); single-nation or zero-total edge -> NULL decomposition.
# ---------------------------------------------------------------------------
@register(
    "theil_index_decomposition",
    oracle="""
        WITH cust AS (
            SELECT c.c_custkey, n.n_name,
                   CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT))
                        AS BIGINT) AS cents
            FROM orders o
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            GROUP BY 1, 2
        ),
        g AS (
            SELECT n_name, CAST(COUNT(*) AS BIGINT) AS ng,
                   CAST(SUM(cents) AS BIGINT) AS sg,
                   SUM(CAST(cents AS DOUBLE)
                       * LN(CAST(cents AS DOUBLE))) AS sxlx
            FROM cust WHERE cents > 0 GROUP BY 1
        ),
        tot AS (
            SELECT CAST(SUM(ng) AS BIGINT) AS n,
                   CAST(SUM(sg) AS BIGINT) AS s,
                   SUM(sxlx) AS sxlx
            FROM g
        ),
        terms AS (
            SELECT
                SUM((CAST(g.sg AS DOUBLE) / t.s)
                    * (g.sxlx / g.sg
                       - LN(CAST(g.sg AS DOUBLE) / g.ng))) AS t_within,
                SUM((CAST(g.sg AS DOUBLE) / t.s)
                    * LN((CAST(g.sg AS DOUBLE) / g.ng)
                         / (CAST(t.s AS DOUBLE) / t.n))) AS t_between,
                CAST(MAX(t.n) AS BIGINT) AS n,
                CAST(COUNT(*) AS BIGINT) AS n_groups
            FROM g CROSS JOIN tot t
        )
        SELECT n AS n_customers, n_groups,
               ROUND(t_within + t_between, 6) AS theil_total,
               ROUND(t_within, 6) AS theil_within,
               ROUND(t_between, 6) AS theil_between,
               CASE WHEN t_within + t_between <= 0 THEN NULL
                    ELSE ROUND(t_between / (t_within + t_between), 6) END
                   AS between_share
        FROM terms
    """,
    tags=("stats", "inequality", "concentration"),
)
def theil_index_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    cust_dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cust = (
        orders.join(cust_dim, orders.o_custkey == cust_dim.c_custkey)
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "n_name")
        .agg(
            F.sum(F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"))
            .cast("bigint")
            .alias("cents")
        )
        .where(F.col("cents") > 0)
    )
    x = F.col("cents").cast("double")
    g = cust.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("ng"),
        F.sum("cents").cast("bigint").alias("sg"),
        F.sum(x * F.log(x)).alias("sxlx"),
    ).localCheckpoint(eager=False)
    # ^ nation-sized (25 rows); consumed by the grand total AND the term
    # aggregate — one materialization, not two orders-customer joins
    tot = g.agg(
        F.sum("ng").cast("bigint").alias("n"),
        F.sum("sg").cast("bigint").alias("s"),
        F.sum("sxlx").alias("sxlx_t"),
    )
    share = F.col("sg").cast("double") / F.col("s")
    mu_g = F.col("sg").cast("double") / F.col("ng")
    mu = F.col("s").cast("double") / F.col("n")
    terms = g.crossJoin(F.broadcast(tot)).agg(  # one-row total side
        F.sum(share * (F.col("sxlx") / F.col("sg") - F.log(mu_g))).alias(
            "t_within"
        ),
        F.sum(share * F.log(mu_g / mu)).alias("t_between"),
        F.max("n").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
    )
    tt = F.col("t_within") + F.col("t_between")
    return terms.select(
        F.col("n").alias("n_customers"),
        "n_groups",
        F.round(tt, 6).alias("theil_total"),
        F.round("t_within", 6).alias("theil_within"),
        F.round("t_between", 6).alias("theil_between"),
        F.when(tt <= 0, F.lit(None))
        .otherwise(F.round(F.col("t_between") / tt, 6))
        .alias("between_share"),
    )
