"""Event-time window aggregations, batch form (SURVEY.md §2.8).

The reference is pure batch with no event-time operators; these queries
define the *semantics* of the streaming surface (tumbling / sliding /
session windows) in batch form so they are DuckDB-oracle-checkable. The
live Structured Streaming counterparts (watermarks, `window()`,
session_window, streaming sinks) live in `etl_pipeline_spark.streaming`
and are asserted equal to these batch plans in tests.

`events.ts` arrives as epoch **nanoseconds** (see sources/star.py); all
window math is integer epoch arithmetic — `ts DIV window_ns` — which is
timezone-proof and bit-exact across engines. (`FLOOR(ts / 3.6e12)` would be
wrong: ts ≈ 1.7e18 exceeds double's 2^53 integer range.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_pipeline_spark.plans.registry import register
from etl_pipeline_spark.sources.star import load_table

_HOUR_NS = 3_600_000_000_000
_M15_NS = 900_000_000_000
_M30_NS = 1_800_000_000_000


# --------------------------------------------------------------------------
# Tumbling 1h windows: count + value sum per (window, event_type).
# Streaming analog: groupBy(window(ts, '1 hour'), event_type).
# --------------------------------------------------------------------------
@register(
    "events_tumbling_1h",
    oracle=f"""
        SELECT
            (epoch_ns(ts) // {_HOUR_NS}) * 3600 AS win_start_epoch,
            event_type,
            COUNT(*)             AS n_events,
            ROUND(SUM(value), 2) AS total_value
        FROM events
        GROUP BY 1, 2
    """,
    tags=("streaming", "window", "agg"),
)
def events_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    win = (F.col("ts") / F.lit(_HOUR_NS)).cast("bigint") * 3600  # ts ≥ 0 → div == floor-div
    return (
        ev.select(F.expr(f"(ts div {_HOUR_NS}) * 3600").alias("win_start_epoch"), "event_type", "value")
        .groupBy("win_start_epoch", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


# --------------------------------------------------------------------------
# Sliding windows (30 min length, 15 min step): each event belongs to 2
# windows → explode the window starts, then aggregate. This is exactly how
# Spark's window(ts, '30 minutes', '15 minutes') expands rows.
# --------------------------------------------------------------------------
@register(
    "events_sliding_30m15m",
    oracle=f"""
        WITH expanded AS (
            SELECT ((epoch_ns(ts) // {_M15_NS}) - k) * 900 AS win_start_epoch,
                   event_type, value
            FROM events, (SELECT unnest(generate_series(0, 1)) AS k)
            WHERE ((epoch_ns(ts) // {_M15_NS}) - k) * 900 >= 0
        )
        SELECT win_start_epoch, event_type,
               COUNT(*)             AS n_events,
               ROUND(SUM(value), 2) AS total_value
        FROM expanded
        GROUP BY 1, 2
    """,
    tags=("streaming", "window", "agg"),
)
def events_sliding_30m15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    expanded = (
        ev.select("ts", "event_type", "value", F.explode(F.expr("sequence(0, 1)")).alias("k"))
        .select(
            (((F.expr(f"ts div {_M15_NS}")) - F.col("k")) * 900).alias("win_start_epoch"),
            "event_type",
            "value",
        )
        .filter(F.col("win_start_epoch") >= 0)
    )
    return expanded.groupBy("win_start_epoch", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


# --------------------------------------------------------------------------
# Sessionization (30 min inactivity gap) per user: the lag/cumulative-sum
# formulation — a window scan, no self-join. Streaming analog:
# session_window(ts, '30 minutes') with watermark.
# --------------------------------------------------------------------------
@register(
    "events_sessionize_30m",
    oracle=f"""
        WITH seq AS (
            SELECT user_id, event_id, epoch_ns(ts) AS t,
                   value,
                   CASE WHEN epoch_ns(ts) - LAG(epoch_ns(ts)) OVER w > {_M30_NS}
                        OR LAG(epoch_ns(ts)) OVER w IS NULL
                        THEN 1 ELSE 0 END AS new_session
            -- ts IS NOT NULL (r11 nulls probe): an untimestamped event has
            -- no place on the gap timeline — Spark opens a spurious session
            -- for it at the partition head (NULLS FIRST), DuckDB absorbs it
            -- at the tail (NULLS LAST)
            FROM events WHERE ts IS NOT NULL
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
        ),
        tagged AS (
            SELECT user_id, t, value,
                   SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY t, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_nr
            FROM seq
        )
        SELECT user_id,
               CAST(session_nr AS BIGINT) AS session_nr,
               MIN(t) // 1000000000 AS session_start_epoch,
               MAX(t) // 1000000000 AS session_end_epoch,
               COUNT(*)             AS n_events,
               ROUND(SUM(value), 2) AS total_value
        FROM tagged
        GROUP BY user_id, session_nr
    """,
    tags=("streaming", "window", "session"),
)
def events_sessionize_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize_30m(load_table(spark, sf_dir, "events"))


def sessionize_30m(ev: DataFrame) -> DataFrame:
    """Gap-based sessionization over (user_id, event_id, ts int64-ns,
    value). BOTH windows tie-break on event_id: with the cumulative
    session window ordered by ts alone, duplicate timestamps straddling a
    session boundary land in either session depending on engine-internal
    row order — nondeterministic at scale and divergent between engines
    (fuzz-found; tests/test_engine_fuzz.py pins ties + exact-30m gaps).
    NULL-ts events are dropped (r11 nulls probe): they cannot sit on the
    gap timeline, and the engines seat them at opposite partition ends."""
    ev = ev.filter(F.col("ts").isNotNull())
    order_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(order_w)
    new_session = F.when(prev.isNull() | ((F.col("ts") - prev) > _M30_NS), 1).otherwise(0)
    cum_w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = ev.select(
        "user_id", "event_id", "ts", "value", new_session.alias("new_session")
    ).select(
        "user_id", "ts", "value", F.sum("new_session").over(cum_w).alias("session_nr")
    )
    return tagged.groupBy("user_id", "session_nr").agg(
        F.expr("min(ts) div 1000000000").alias("session_start_epoch"),
        F.expr("max(ts) div 1000000000").alias("session_end_epoch"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


# --------------------------------------------------------------------------
# As-of join (event-sequence form): for each purchase, the same user's most
# recent prior 'view' — the classic point-in-time lookup Spark lacks as a
# builtin, expressed as a conditional running-max window (no join at all;
# one window scan). ts stays int64 ns → tz-proof, exact.
# --------------------------------------------------------------------------
@register(
    "asof_purchase_last_view",
    oracle="""
        SELECT event_id, user_id,
               (t - last_view_t) // 1000000000 AS seconds_since_view
        FROM (
            SELECT event_id, user_id, event_type, epoch_ns(ts) AS t,
                   MAX(CASE WHEN event_type = 'view' THEN epoch_ns(ts) END) OVER (
                       PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS last_view_t
            -- ts IS NOT NULL (r11 nulls probe, latent sibling of the
            -- sessionize fix): a NULL ts would lead Spark's running-max
            -- frame and trail DuckDB's
            FROM events WHERE ts IS NOT NULL
        )
        WHERE event_type = 'purchase' AND last_view_t IS NOT NULL
    """,
    tags=("streaming", "window", "asof"),
)
def asof_purchase_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_view = F.max(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    return (
        ev.select("event_id", "user_id", "event_type", "ts", last_view.alias("last_view_t"))
        .filter((F.col("event_type") == "purchase") & F.col("last_view_t").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.expr("(ts - last_view_t) div 1000000000").alias("seconds_since_view"),
        )
    )


# --------------------------------------------------------------------------
# Interval (range) join — click attribution: clicks by the same user within
# the hour before each purchase. A naive range predicate would plan as a
# nested-loop join; operators/rangejoin.py turns it into a hash equi-join on
# (user, time-bin) with the exact range as residual — the Flink-interval-
# join / Databricks-range-join strategy in plain DataFrame ops. Oracle is
# the naive theta join (DuckDB handles sf0.01 fine; Spark gets the plan
# that survives 100 TB).
# --------------------------------------------------------------------------
@register(
    "range_join_click_attribution",
    oracle=f"""
        SELECT p.event_id AS purchase_id,
               CAST(COUNT(*) AS BIGINT) AS n_clicks,
               ROUND(SUM(c.value), 2)   AS click_value
        FROM events p
        JOIN events c
          ON c.user_id = p.user_id
         AND c.event_type = 'click'
         AND epoch_ns(c.ts) >= epoch_ns(p.ts) - {_HOUR_NS}
         AND epoch_ns(c.ts) <= epoch_ns(p.ts)
        WHERE p.event_type = 'purchase'
        GROUP BY 1
    """,
    tags=("streaming", "rangejoin"),
)
def range_join_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_pipeline_spark.operators.rangejoin import bucketed_interval_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
    )
    joined = bucketed_interval_join(
        purchases,
        clicks,
        left_ts="p_ts",
        right_ts="c_ts",
        lower_offset=-_HOUR_NS,
        upper_offset=0,
        bucket_width=_HOUR_NS,
        equi_keys=(("p_user", "c_user"),),
    )
    return joined.groupBy("purchase_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clicks"),
        F.round(F.sum("c_value"), 2).alias("click_value"),
    )


# --------------------------------------------------------------------------
# Resample + forward fill (operators/timeseries.py) — per-user 6h activity
# grid, last observed `value` carried forward across silent buckets. Grid
# math in epoch seconds (bucket_start = bucket * step), deterministic
# last-observation ties broken by event_id.
# --------------------------------------------------------------------------
_H6_NS = 21_600_000_000_000


@register(
    "resample_ffill_user_6h",
    oracle=f"""
        WITH obs AS (
            SELECT user_id, epoch_ns(ts) // {_H6_NS} AS bucket, value
            FROM (
                SELECT user_id, ts, value, event_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY user_id, epoch_ns(ts) // {_H6_NS}
                           ORDER BY epoch_ns(ts) // 1000000000 DESC, event_id DESC) AS rn
                FROM events
                WHERE user_id < 40
            )
            WHERE rn = 1
        ),
        spans AS (
            SELECT user_id, MIN(bucket) AS lo, MAX(bucket) AS hi FROM obs GROUP BY 1
        ),
        grid AS (
            SELECT user_id, unnest(generate_series(lo, hi)) AS bucket FROM spans
        )
        SELECT user_id,
               bucket * 21600 AS bucket_start,
               ROUND(last_value(value IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS value
        FROM grid LEFT JOIN obs USING (user_id, bucket)
    """,
    tags=("streaming", "timeseries", "window"),
)
def resample_ffill_user_6h(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_pipeline_spark.operators.timeseries import resample_ffill

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 40)
        .select("user_id", (F.col("ts") / 1_000_000_000).cast("bigint").alias("ts_s"),
                "value", "event_id")
    )
    out = resample_ffill(ev, "user_id", "ts_s", "value", step=21_600, order_col="event_id")
    return out.select("user_id", "bucket_start", F.round("value", 2).alias("value"))


# --------------------------------------------------------------------------
# SCD Type-2 dimension: 'error' events are treated as state changes per
# user; consecutive changes become half-open validity intervals (LEAD
# window — one shuffle on the key, cost ∝ change volume, never snapshot
# volume). The point-in-time lookup joins purchases to the version valid
# at purchase time: key equality drives a hash join, the interval test is
# a residual predicate — no nested loop, no interval explosion.
# --------------------------------------------------------------------------
@register(
    "scd2_state_at_purchase",
    oracle="""
        WITH changes AS (
            SELECT user_id, epoch_ns(ts) AS cts, MAX(value) AS state_value
            FROM events WHERE event_type = 'error'
            GROUP BY 1, 2
        ),
        dim AS (
            SELECT user_id, state_value, cts AS valid_from,
                   LEAD(cts) OVER (PARTITION BY user_id ORDER BY cts) AS valid_to
            FROM changes
        ),
        facts AS (
            SELECT event_id, user_id, epoch_ns(ts) AS fts, value
            FROM events WHERE event_type = 'purchase'
        )
        SELECT f.event_id, f.user_id, f.fts // 1000 AS purchase_ts_us,
               ROUND(d.state_value, 2) AS state_value,
               ROUND(f.value, 2) AS purchase_value,
               CAST(d.valid_to IS NULL AS INT) AS at_current_state
        FROM facts f
        JOIN dim d ON d.user_id = f.user_id
                  AND d.valid_from <= f.fts
                  AND (d.valid_to IS NULL OR f.fts < d.valid_to)
    """,
    tags=("streaming", "scd2", "join"),
)
def scd2_state_at_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_pipeline_spark.operators.timeseries import scd2_build, scd2_lookup

    ev = load_table(spark, sf_dir, "events")
    changes = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("state_value"))
    )
    dim = scd2_build(changes, "user_id", "ts", ["state_value"])
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    return scd2_lookup(facts, dim, "user_id", "ts").select(
        "event_id",
        "user_id",
        F.expr("ts div 1000").alias("purchase_ts_us"),
        F.round("state_value", 2).alias("state_value"),
        F.round("value", 2).alias("purchase_value"),
        F.col("is_current").cast("int").alias("at_current_state"),
    )


# --------------------------------------------------------------------------
# Windowed heavy hitters — the READ path of the streaming count-min sketch
# (streaming/frequency.py::windowed_cms_cells). The cell relation built
# here in batch — (win_start_epoch, d, bucket, cnt), 6 h tumbling windows,
# depth 3 × width 256, digest-chunk hashing — is exactly what the
# Structured Streaming aggregate maintains incrementally (equality pinned
# per-window in test_streaming.py); reading estimates is then pure
# arithmetic over the drained cells: min over depth rows per (window,
# candidate key), support-filtered, annotated with the exact count (the
# candidate-pruned scan only — same semi-join discipline as
# cms_heavy_hitters) and the CMS overestimate guarantee as a checkable
# column. State stays ≤ windows × depth × width cells at any event volume.
# --------------------------------------------------------------------------
_H6_NS = 21_600_000_000_000
_WHH_DEPTH, _WHH_WIDTH = 3, 256
_WHH_SUPPORT, _WHH_SAMPLE = 4, 500


def _whh_oracle() -> str:
    from etl_pipeline_spark.operators.sketch import hex8_at_expr

    def bucket(d: int) -> str:
        return f"{hex8_at_expr('CAST(user_id AS VARCHAR)', d)} % {_WHH_WIDTH}"

    win = f"(epoch_ns(ts) // {_H6_NS}) * 21600"
    cell_rows = "\n            UNION ALL ".join(
        f"SELECT {win} AS w, {d} AS d, {bucket(d)} AS bucket FROM events"
        for d in range(_WHH_DEPTH)
    )
    probe_rows = "\n            UNION ALL ".join(
        f"SELECT user_id, {d} AS d, {bucket(d)} AS bucket FROM cand"
        for d in range(_WHH_DEPTH)
    )
    return f"""
        WITH cells AS (
            SELECT w, d, bucket, COUNT(*) AS cnt FROM (
            {cell_rows}
            ) GROUP BY 1, 2, 3
        ),
        cand AS (
            SELECT DISTINCT user_id FROM events WHERE event_id <= {_WHH_SAMPLE}
        ),
        probe_cells AS (
            {probe_rows}
        ),
        wins AS (SELECT DISTINCT {win} AS w FROM events),
        est AS (
            SELECT p.w, p.user_id, MIN(COALESCE(c.cnt, 0)) AS est
            FROM (SELECT wins.w, pc.user_id, pc.d, pc.bucket
                  FROM wins CROSS JOIN probe_cells pc) p
            LEFT JOIN cells c
              ON c.w = p.w AND c.d = p.d AND c.bucket = p.bucket
            GROUP BY 1, 2
        ),
        ex AS (
            SELECT {win} AS w, user_id, CAST(COUNT(*) AS BIGINT) AS n_exact
            FROM events
            WHERE user_id IN (SELECT user_id FROM cand)
            GROUP BY 1, 2
        )
        SELECT e.w AS win_start_epoch, e.user_id,
               CAST(e.est AS BIGINT) AS est,
               COALESCE(x.n_exact, CAST(0 AS BIGINT)) AS n_exact,
               CAST(e.est >= COALESCE(x.n_exact, 0) AS INT) AS is_overestimate
        FROM est e
        LEFT JOIN ex x ON x.w = e.w AND x.user_id = e.user_id
        WHERE e.est >= {_WHH_SUPPORT}
    """


def windowed_cms_cells_batch(
    ev: DataFrame,
    key_col: str = "user_id",
    depth: int = _WHH_DEPTH,
    width: int = _WHH_WIDTH,
    win_ns: int = _H6_NS,
) -> DataFrame:
    """Batch twin of streaming/frequency.py::windowed_cms_cells —
    (win_start_epoch, d, bucket, cnt) over epoch-ns `ts`, digest projected
    below the explode (no subexpression elimination under Generate).
    test_streaming.py pins this equal to the drained streaming cells."""
    from etl_pipeline_spark.operators.sketch import _digest_sql, digest_chunk_sql

    win = F.expr(f"(ts div {win_ns}) * {win_ns // 1_000_000_000}")
    key_sql = f"CAST({key_col} AS STRING)"
    depth_cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("d"),
                    F.expr(digest_chunk_sql(d, width)).alias("bucket"),
                )
                for d in range(depth)
            ]
        )
    ).alias("cell")
    return (
        ev.select(win.alias("win_start_epoch"), F.expr(_digest_sql(key_sql, 0)).alias("m0"))
        .select("win_start_epoch", depth_cells)
        .select("win_start_epoch", "cell.d", "cell.bucket")
        .groupBy("win_start_epoch", "d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "windowed_heavy_hitters",
    oracle=_whh_oracle(),
    tags=("streaming", "sketch", "heavy-hitters", "window"),
)
def windowed_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_pipeline_spark.operators.sketch import _digest_sql, digest_chunk_sql

    ev = load_table(spark, sf_dir, "events")
    win = F.expr(f"(ts div {_H6_NS}) * 21600")
    key_sql = "CAST(user_id AS STRING)"
    depth_cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("d"),
                    F.expr(digest_chunk_sql(d, _WHH_WIDTH)).alias("bucket"),
                )
                for d in range(_WHH_DEPTH)
            ]
        )
    ).alias("cell")
    cells = windowed_cms_cells_batch(ev)
    cand = ev.filter(F.col("event_id") <= _WHH_SAMPLE).select("user_id").distinct()
    wins = ev.select(win.alias("win_start_epoch")).distinct()
    probe_cells = (
        cand.select("user_id", F.expr(_digest_sql(key_sql, 0)).alias("m0"))
        .select("user_id", depth_cells)
        .select("user_id", "cell.d", "cell.bucket")
    )
    est = (
        wins.crossJoin(F.broadcast(probe_cells))
        .join(cells, ["win_start_epoch", "d", "bucket"], "left")
        .select(
            "win_start_epoch", "user_id", F.coalesce("cnt", F.lit(0)).alias("cnt")
        )
        .groupBy("win_start_epoch", "user_id")
        .agg(F.min("cnt").alias("est"))
        .filter(F.col("est") >= _WHH_SUPPORT)
    )
    exact = (
        ev.join(F.broadcast(cand), "user_id", "semi")
        .groupBy(win.alias("win_start_epoch"), "user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_exact"))
    )
    return (
        est.join(exact, ["win_start_epoch", "user_id"], "left")
        .withColumn("n_exact", F.coalesce("n_exact", F.lit(0).cast("bigint")))
        .select(
            "win_start_epoch",
            "user_id",
            F.col("est").cast("bigint").alias("est"),
            "n_exact",
            (F.col("est") >= F.col("n_exact")).cast("int").alias("is_overestimate"),
        )
    )


# --------------------------------------------------------------------------
# Windowed quantiles from histogram state — the read path of the
# streaming distribution sketch: streaming/drift.py::value_histogram
# maintains the same windows × bins cell state incrementally (keyed per
# event_type there, global-range here).
# Per 6h window: p50/p90/p99 of `value` interpolated from equal-width bin
# counts over the GLOBAL [min, max] range (one 1-row aggregate,
# broadcast). All post-scan arithmetic runs on windows × bins rows —
# never on events — so the state is bounded at any event volume, the
# same property the mergeable histogram sketch (`quantile_sketch_values`)
# provides unwindowed.
# --------------------------------------------------------------------------
_WQ_BINS = 32
_WQ_QS = (0.5, 0.9, 0.99)


def _wq_oracle() -> str:
    win = f"(epoch_ns(ts) // {_H6_NS}) * 21600"
    q_vals = ", ".join(f"(CAST({q} AS DOUBLE))" for q in _WQ_QS)
    return f"""
        WITH stats AS (
            SELECT MIN(value) AS lo, MAX(value) AS hi FROM events
        ),
        cells AS (
            SELECT {win} AS w,
                   CASE WHEN s.hi = s.lo THEN 0
                        ELSE LEAST({_WQ_BINS - 1}, GREATEST(0,
                             CAST(FLOOR((e.value - s.lo)
                                  / ((s.hi - s.lo) / {_WQ_BINS}.0)) AS INT)))
                   END AS bin,
                   COUNT(*) AS cnt
            FROM events e, stats s
            GROUP BY 1, 2
        ),
        cum AS (
            SELECT w, bin, cnt,
                   SUM(cnt) OVER (PARTITION BY w ORDER BY bin) AS cum,
                   SUM(cnt) OVER (PARTITION BY w) AS n
            FROM cells
        ),
        covering AS (
            SELECT w, q, bin, cnt, cum, n,
                   ROW_NUMBER() OVER (PARTITION BY w, q ORDER BY bin) AS r
            FROM cum, (SELECT unnest(ARRAY[{q_vals}]) AS q)
            WHERE cum >= q * n
        )
        SELECT c.w AS win_start_epoch, c.q,
               CAST(c.n AS BIGINT) AS n_events,
               -- portable half-up at 6 dp: native ROUND() tie semantics
               -- differ between engines on interpolated values
               FLOOR((CASE WHEN s.hi = s.lo THEN s.lo
                           ELSE s.lo + ((s.hi - s.lo) / {_WQ_BINS}.0)
                                * (c.bin + (c.q * c.n - (c.cum - c.cnt)) / c.cnt)
                      END) * 1e6 + 0.5) / 1e6 AS est
        FROM covering c, stats s
        WHERE c.r = 1
    """


@register(
    "windowed_quantiles",
    oracle=_wq_oracle(),
    tags=("streaming", "sketch", "quantile", "window"),
)
def windowed_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    win = F.expr(f"(ts div {_H6_NS}) * 21600")
    stats = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    bin_col = F.expr(
        f"CASE WHEN hi = lo THEN 0"
        f" ELSE LEAST({_WQ_BINS - 1}, GREATEST(0,"
        f" CAST(FLOOR((value - lo) / ((hi - lo) / {_WQ_BINS}.0)) AS INT)))"
        f" END"
    )
    cells = (
        ev.crossJoin(F.broadcast(stats))
        .groupBy(win.alias("w"), bin_col.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cum = cells.select(
        "w",
        "bin",
        "cnt",
        F.sum("cnt").over(Window.partitionBy("w").orderBy("bin")).alias("cum"),
        F.sum("cnt").over(Window.partitionBy("w")).alias("n"),
    )
    qs = F.explode(F.array(*[F.lit(float(q)) for q in _WQ_QS])).alias("q")
    covering = (
        cum.select("w", "bin", "cnt", "cum", "n", qs)
        .filter(F.col("cum") >= F.col("q") * F.col("n"))
        .withColumn(
            "r",
            F.row_number().over(Window.partitionBy("w", "q").orderBy("bin")),
        )
        .filter(F.col("r") == 1)
    )
    est = (
        f"CASE WHEN hi = lo THEN lo"
        f" ELSE lo + ((hi - lo) / {_WQ_BINS}.0)"
        f" * (bin + (q * n - (cum - cnt)) / cnt)"
        f" END"
    )
    # portable half-up at 6 dp — see the oracle comment
    return covering.crossJoin(F.broadcast(stats)).select(
        F.col("w").alias("win_start_epoch"),
        "q",
        F.col("n").cast("bigint").alias("n_events"),
        F.expr(f"FLOOR(({est}) * 1e6 + 0.5) / 1e6").alias("est"),
    )


# --------------------------------------------------------------------------
# Bounce rate per day — the canonical product-analytics readout over the
# 30-min sessionization above: share of sessions with exactly one event,
# keyed by the session's START day. Same lag/cumsum device (user-keyed
# windows only); everything after the per-session aggregate is a
# day-domain relation; the rate is one exact-int division.
# --------------------------------------------------------------------------
@register(
    "session_bounce_rate",
    oracle=f"""
        WITH seq AS (
            SELECT user_id, event_id, epoch_ns(ts) AS t,
                   CASE WHEN epoch_ns(ts) - LAG(epoch_ns(ts)) OVER w > {_M30_NS}
                        OR LAG(epoch_ns(ts)) OVER w IS NULL
                        THEN 1 ELSE 0 END AS new_session
            -- ts IS NOT NULL (r11 nulls probe): same drop-at-use rule as
            -- events_sessionize_30m — the shared sessionize_30m helper
            -- applies it Spark-side
            FROM events WHERE ts IS NOT NULL
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
        ),
        tagged AS (
            SELECT user_id, t,
                   SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY t, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS session_nr
            FROM seq
        ),
        sessions AS (
            SELECT user_id, session_nr,
                   MIN(t) // {_M30_NS * 48} AS start_day,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM tagged GROUP BY 1, 2
        )
        SELECT start_day,
               CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_bounce,
               ROUND(CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                          AS DOUBLE) / COUNT(*), 6) AS bounce_rate
        FROM sessions GROUP BY 1
    """,
    tags=("streaming", "session", "product-metric"),
)
def session_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL-ts drop (r11 nulls probe) — same rule as sessionize_30m
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    order_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(order_w)
    new_session = F.when(
        prev.isNull() | ((F.col("ts") - prev) > _M30_NS), 1
    ).otherwise(0)
    # event_id tie-break like sessionize_30m: ties straddling a boundary
    # must land deterministically (fuzz-found class, round 8)
    cum_w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = ev.select(
        "user_id", "event_id", "ts", new_session.alias("new_session")
    ).select(
        "user_id", "ts", F.sum("new_session").over(cum_w).alias("session_nr")
    )
    day_ns = _M30_NS * 48  # 30 min × 48 = 24 h, shared constant both engines
    sessions = tagged.groupBy("user_id", "session_nr").agg(
        F.expr(f"min(ts) div {day_ns}").alias("start_day"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    bounce = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0)).cast(
        "bigint"
    )
    return sessions.groupBy("start_day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        bounce.alias("n_bounce"),
        F.round(
            bounce.cast("double") / F.count(F.lit(1)), 6
        ).alias("bounce_rate"),
    )
