"""Round-6 wave-15: distribution-comparison, corpus-growth, calibration,
and spatial-join analytics.

Beyond-reference components (the reference pipeline — a fetch/stage/load
ETL, reference: etl/pipeline.py — has no analytics surface); each is the
Spark-first expression of a standard published method:

- lead/lag cross-correlation (Box & Jenkins, Time Series Analysis §11):
  does today's view count predict purchases L days out? One fact scan to
  daily counts, then every lag is a day-domain self-join — the lag table
  is 8 rows, broadcast.
- Wasserstein-1 / earth-mover distance between two event-type value
  distributions (Villani, Optimal Transport §1; the drift metric that
  sees *where* mass moved, complementing ks_test_purchase_view's sup-gap
  and the PSI's binned ratio): W1 = ∫|CDF_A − CDF_B| dx on the exact
  cents histogram — the integral runs over the bounded VALUE DOMAIN
  (distinct cents), never over rows — the funnel-histogram discipline.
- Heaps'-law vocabulary growth (Heaps 1978): V(N) ≈ K·N^β measured at 10
  corpus prefixes. Prefix thresholds are pure integer arithmetic on
  max(doc_id) (no percentile, engine-identical); prefix totals are
  map-side-combined conditional aggregates (10 groups out per task); β
  is the ln-ln OLS slope over the 10-point relation.
- lexical diversity per language: type-token ratio + hapax share
  (Baayen, Word Frequency Distributions §1) — one term-keyed count.
- Brier score of the bigram next-event model (Brier 1950; the
  calibration companion to session_next_event_accuracy's top-1 hit
  rate) with Laplace-1 smoothing over the observed type domain. The
  per-group mean decomposes into pure integer sums (see the in-query
  derivation), so Spark and the oracle agree bit-for-bit.
- exact nearest-POI spatial join via grid bucketing
  (operators/spatial.py::grid_nearest_join): ring-1 candidate equi-join
  with the provable cell_size exactness guard and the dimension-sized
  broadcast fallback. Coordinates are integer hashes of TPC-H keys so
  squared distances are exact integers in both engines.
- blocking quality for the ER candidate generator (Christen, Data
  Matching §7.2: reduction ratio + pairs completeness) — grades the
  candidate SET that entity_resolution_customers closes over, reusing
  the same pair builder so rule and eval can never drift.

Parity rules as elsewhere: integer cores (counts, cents, squared
distances), IEEE-exact ratio arithmetic, ln() rounded at 6 dp before
tiny-relation moments, ratios rounded at 6 dp last.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_pipeline_spark.plans.registry import register
from etl_pipeline_spark.sources.star import load_table

_DAY_NS = 86_400_000_000_000


# ---------------------------------------------------------------------------
# Cross-correlation of daily view counts vs purchase counts at lags 0..7:
# ccf(L) = Pearson r between (views on day d, purchases on day d+L).
# The only fact-sized work is the single grouped count; pairs/moments run
# on the (days × 8) relation. Counts are exact bigints, so every moment
# sum is exact; r follows the spearman_corr_daily fixed-parenthesis
# moment form with the exact MIN=MAX zero-variance guard.
# ---------------------------------------------------------------------------
@register(
    "crosscorr_daily_lags",
    oracle=f"""
        WITH daily AS (
            SELECT epoch_ns(ts) // {_DAY_NS} AS day,
                   CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                        AS BIGINT) AS v,
                   CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                        END) AS BIGINT) AS p
            FROM events GROUP BY 1
        ),
        lags AS (SELECT unnest(generate_series(0, 7)) AS lag),
        pairs AS (
            SELECT l.lag, a.v AS x, b.p AS y
            FROM lags l CROSS JOIN daily a
            JOIN daily b ON b.day = a.day + l.lag
        ),
        mom AS (
            SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
                   SUM(x * x) AS sxx, SUM(y * y) AS syy,
                   CAST(MIN(x) = MAX(x) AS INT) AS xc,
                   CAST(MIN(y) = MAX(y) AS INT) AS yc
            FROM pairs GROUP BY 1
        )
        SELECT CAST(lag AS BIGINT) AS lag, n AS n_days,
               -- + 0.0e0 normalizes IEEE -0.0: a zero covariance reaches
               -- the round as ±1e-18 depending on engine fp association,
               -- and '-0.0' vs '0.0' splits the stringified hash (probe
               -- seed 719, r11 — the quantile-slope class)
               CASE WHEN xc = 1 OR yc = 1 THEN NULL ELSE
               ROUND((sxy / n - (sx / n) * (sy / n))
                     / SQRT((sxx / n - (sx / n) * (sx / n))
                            * (syy / n - (sy / n) * (sy / n))), 6) + 0.0e0
               END AS ccf
        FROM mom
    """,
    tags=("timeseries", "correlation", "events"),
)
def crosscorr_daily_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr(f"ts DIV {_DAY_NS}").alias("day")
    ).agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("bigint")
        .alias("v"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("p"),
    )
    lags = spark.range(0, 8).select(F.col("id").alias("lag"))
    a = daily.select(F.col("day").alias("da"), F.col("v").alias("x"))
    b = daily.select(F.col("day").alias("db"), F.col("p").alias("y"))
    pairs = (
        a.crossJoin(F.broadcast(lags))  # day-domain × 8 rows
        # b is the day-domain count relation — bounded, broadcast
        .join(F.broadcast(b), F.col("db") == F.col("da") + F.col("lag"))
    )
    mom = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        (F.min("x") == F.max("x")).cast("int").alias("xc"),
        (F.min("y") == F.max("y")).cast("int").alias("yc"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    r = (F.col("sxy") / n - (sx / n) * (sy / n)) / F.sqrt(
        (F.col("sxx") / n - (sx / n) * (sx / n))
        * (F.col("syy") / n - (sy / n) * (sy / n))
    )
    return mom.select(
        F.col("lag").cast("bigint").alias("lag"),
        F.col("n").alias("n_days"),
        # + 0.0 normalizes -0.0 — see the oracle note (probe 719, r11)
        F.when((F.col("xc") == 1) | (F.col("yc") == 1), F.lit(None)).otherwise(
            F.round(r, 6) + F.lit(0.0)
        ).alias("ccf"),
    )


# ---------------------------------------------------------------------------
# Wasserstein-1 distance between the view and purchase value
# distributions: W1 = ∫ |CDF_view(x) − CDF_purchase(x)| dx. Values round
# to exact integer cents, both histograms build in ONE grouped pass, and
# the CDF windows run over the distinct-cents GRID — bounded by the value
# domain, not the row count (the funnel-histogram discipline), so the
# unpartitioned window is domain-sized at any fact volume. Counts and
# cumulative counts are exact bigints; the final sum of exact-ratio terms
# rounds at 6 dp (partial-agg-order jitter ~1e-12 « the round).
# ---------------------------------------------------------------------------
@register(
    "wasserstein_value_drift",
    oracle="""
        WITH h AS (
            SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS v,
                   CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                        AS BIGINT) AS ca,
                   CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                        END) AS BIGINT) AS cb
            -- value IS NOT NULL (r11 nulls probe): the ECDFs integrate
            -- over reported values — a NULL cents group would lead
            -- Spark's cumulative order and trail DuckDB's
            FROM events
            WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL
            GROUP BY 1
        ),
        tot AS (
            SELECT CAST(SUM(ca) AS BIGINT) AS na,
                   CAST(SUM(cb) AS BIGINT) AS nb
            FROM h
        ),
        cdf AS (
            SELECT v,
                   SUM(ca) OVER (ORDER BY v) AS cca,
                   SUM(cb) OVER (ORDER BY v) AS ccb,
                   LEAD(v) OVER (ORDER BY v) AS nxt
            FROM h
        )
        SELECT t.na AS n_view, t.nb AS n_purchase,
               ROUND(SUM(ABS(c.cca * 1.0 / t.na - c.ccb * 1.0 / t.nb)
                         * (c.nxt - c.v)) / 100.0, 6) AS w1_distance
        FROM cdf c CROSS JOIN tot t
        WHERE c.nxt IS NOT NULL
        GROUP BY 1, 2
    """,
    tags=("stats", "drift", "events"),
)
def wasserstein_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "purchase")
        & F.col("value").isNotNull()
    )
    h = ev.groupBy(
        F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)").alias("v")
    ).agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("bigint")
        .alias("ca"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("cb"),
    )
    tot = h.agg(
        F.sum("ca").cast("bigint").alias("na"),
        F.sum("cb").cast("bigint").alias("nb"),
    )
    # distinct-cents grid: the value DOMAIN, bounded at any row count
    w = Window.orderBy("v")
    cdf = h.select(
        "v",
        F.sum("ca").over(w).alias("cca"),
        F.sum("cb").over(w).alias("ccb"),
        F.lead("v").over(w).alias("nxt"),
    ).where(F.col("nxt").isNotNull())
    term = F.abs(
        F.col("cca") * 1.0 / F.col("na") - F.col("ccb") * 1.0 / F.col("nb")
    ) * (F.col("nxt") - F.col("v"))
    return (
        cdf.crossJoin(F.broadcast(tot))  # one-row total side
        .groupBy("na", "nb")
        .agg(F.round(F.sum(term) / 100.0, 6).alias("w1_distance"))
        .select(
            F.col("na").alias("n_view"),
            F.col("nb").alias("n_purchase"),
            "w1_distance",
        )
    )


# ---------------------------------------------------------------------------
# Heaps'-law vocabulary growth: distinct-vocab size V and token count N at
# 10 doc-id prefixes of the corpus, plus the ln-ln OLS slope β (V ≈ K·N^β,
# β≈0.4-0.6 for natural text — a drifting β is a corpus-mix alarm).
# Prefix thresholds are (max_id·i) DIV 10 — integer arithmetic, identical
# in both engines, no percentile. Token totals and first-seen terms fan
# out over the broadcast 10-row threshold relation and collapse via
# map-side combine (10 groups), so the shuffle is 10 rows per task; the
# term first-seen aggregate is the one term-keyed shuffle (the TF-IDF
# cost). β's moments run on the 10-row points relation with ln() rounded
# at 6 dp first (the ANOVA convention).
# ---------------------------------------------------------------------------
@register(
    "heaps_vocab_growth",
    oracle="""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents
        ),
        doc_tok AS (
            SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT)
                       AS n_tok
            FROM documents
        ),
        mx AS (SELECT MAX(doc_id) AS max_id FROM documents),
        thr AS (
            SELECT d AS decile, (max_id * d) // 10 AS thr
            FROM (SELECT unnest(generate_series(1, 10)) AS d) CROSS JOIN mx
        ),
        n_i AS (
            SELECT t.decile, CAST(SUM(d.n_tok) AS BIGINT) AS n_tokens
            FROM doc_tok d JOIN thr t ON d.doc_id <= t.thr
            GROUP BY 1
        ),
        fs AS (SELECT term, MIN(doc_id) AS first_doc FROM toks GROUP BY 1),
        v_i AS (
            SELECT t.decile, CAST(COUNT(*) AS BIGINT) AS vocab
            FROM fs JOIN thr t ON fs.first_doc <= t.thr
            GROUP BY 1
        ),
        pts AS (
            SELECT n.decile, n.n_tokens, v.vocab,
                   ROUND(LN(n.n_tokens), 6) AS lx,
                   ROUND(LN(v.vocab), 6) AS ly
            FROM n_i n JOIN v_i v ON v.decile = n.decile
        ),
        mom AS (
            SELECT COUNT(*) AS n, SUM(lx) AS sx, SUM(ly) AS sy,
                   SUM(lx * ly) AS sxy, SUM(lx * lx) AS sxx,
                   CAST(MIN(lx) = MAX(lx) AS INT) AS xc
            FROM pts
        )
        SELECT CAST(p.decile AS BIGINT) AS decile, p.n_tokens, p.vocab,
               CASE WHEN m.xc = 1 THEN NULL ELSE
               ROUND((m.sxy / m.n - (m.sx / m.n) * (m.sy / m.n))
                     / (m.sxx / m.n - (m.sx / m.n) * (m.sx / m.n)), 6) + 0.0
               END AS heaps_beta
        FROM pts p CROSS JOIN mom m
    """,
    tags=("text", "corpus", "regression"),
)
def heaps_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    doc_tok = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_tok")
    )
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    mx = docs.agg(F.max("doc_id").alias("max_id"))
    thr = (
        spark.range(1, 11)
        .select(F.col("id").alias("decile"))
        .crossJoin(F.broadcast(mx))  # one-row max side
        .select("decile", F.expr("(max_id * decile) DIV 10").alias("thr"))
        # 10 rows, consumed by both decile probes — don't re-run MAX(doc_id)
        .localCheckpoint(eager=False)
    )
    n_i = (
        doc_tok.crossJoin(F.broadcast(thr))  # 10-row threshold side
        .where(F.col("doc_id") <= F.col("thr"))
        .groupBy("decile")
        .agg(F.sum("n_tok").cast("bigint").alias("n_tokens"))
    )
    fs = toks.groupBy("term").agg(F.min("doc_id").alias("first_doc"))
    v_i = (
        fs.crossJoin(F.broadcast(thr))  # 10-row threshold side
        .where(F.col("first_doc") <= F.col("thr"))
        .groupBy("decile")
        .agg(F.count(F.lit(1)).cast("bigint").alias("vocab"))
    )
    pts = (
        n_i.join(F.broadcast(v_i), "decile")  # 10-row sides
        .select(
            "decile",
            "n_tokens",
            "vocab",
            F.round(F.log("n_tokens"), 6).alias("lx"),
            F.round(F.log("vocab"), 6).alias("ly"),
        )
        # 10 rows, consumed by the moment aggregate AND the final select —
        # without this both lineages re-tokenize the corpus (guide §5)
        .localCheckpoint(eager=False)
    )
    mom = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
        (F.min("lx") == F.max("lx")).cast("int").alias("xc"),
    )
    n, sx = F.col("n"), F.col("sx")
    beta = (F.col("sxy") / n - (sx / n) * (F.col("sy") / n)) / (
        F.col("sxx") / n - (sx / n) * (sx / n)
    )
    return pts.crossJoin(F.broadcast(mom)).select(  # one-row moment side
        F.col("decile").cast("bigint").alias("decile"),
        "n_tokens",
        "vocab",
        # + 0.0 normalizes IEEE -0.0 (a tiny negative slope rounds to
        # -0.0 or +0.0 depending on engine summation order)
        F.when(F.col("xc") == 1, F.lit(None)).otherwise(F.round(beta, 6) + 0.0)
        .alias("heaps_beta"),
    )


# ---------------------------------------------------------------------------
# Lexical diversity per language: type-token ratio and hapax-legomena
# share — the fast corpus-health pair (a falling TTR flags boilerplate
# flooding; a collapsing hapax share flags template/bot text). One
# term-keyed count, then a language-domain aggregate.
# ---------------------------------------------------------------------------
@register(
    "lexical_diversity_by_lang",
    oracle="""
        WITH toks AS (
            SELECT lang, unnest(string_split(text, ' ')) AS term
            FROM documents
        ),
        tc AS (
            SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS c
            FROM toks GROUP BY 1, 2
        )
        SELECT lang,
               CAST(SUM(c) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               ROUND(COUNT(*) * 1.0 / SUM(c), 6) AS ttr,
               CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_hapax,
               ROUND(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1.0
                     / COUNT(*), 6) AS hapax_share
        FROM tc GROUP BY 1
    """,
    tags=("text", "corpus", "quality"),
)
def lexical_diversity_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    tc = (
        docs.select("lang", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    hapax = F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
    return tc.groupBy("lang").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.round(F.count(F.lit(1)) * 1.0 / F.sum("c"), 6).alias("ttr"),
        hapax.cast("bigint").alias("n_hapax"),
        F.round(hapax * 1.0 / F.count(F.lit(1)), 6).alias("hapax_share"),
    )


# ---------------------------------------------------------------------------
# Brier score of the Laplace-1-smoothed bigram next-event model, per
# context (train even users, test odd — session_next_event_accuracy's
# split). With T = tot_prev + K and all test transitions in a group
# sharing T, the group-mean Brier collapses to pure integer sums:
#   mean = (ssq + K − m)/T² − 2·S/n/T + 1
# where ssq = Σ_observed(c+1)², m = observed next-types, S = Σ_test
# (c(prev,actual)+1), n = test count — every division an exact-integer
# ratio, so both engines agree bit-for-bit before the final round. The
# only fact-sized work is the per-user LAG each half already pays; model
# and per-context stats are type-domain relations, broadcast.
# ---------------------------------------------------------------------------
@register(
    "brier_next_event_model",
    oracle="""
        WITH t AS (
            -- ts/event_type IS NOT NULL (r11 nulls probe): the markov
            -- chain convention — untimestamped events have no order,
            -- typeless events are no state; kk filters identically so the
            -- state count matches the chain's alphabet
            SELECT user_id, event_type,
                   LAG(event_type) OVER (PARTITION BY user_id
                       ORDER BY epoch_ns(ts), event_id) AS prev_type
            FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
        ),
        kk AS (
            SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k
            FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
        ),
        train AS (
            SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS c
            FROM t WHERE prev_type IS NOT NULL AND user_id % 2 = 0
            GROUP BY 1, 2
        ),
        prev_stats AS (
            SELECT prev_type, CAST(SUM(c) AS BIGINT) AS tot,
                   CAST(COUNT(*) AS BIGINT) AS m,
                   CAST(SUM((c + 1) * (c + 1)) AS BIGINT) AS ssq
            FROM train GROUP BY 1
        ),
        test AS (
            SELECT tt.prev_type, CAST(COALESCE(tr.c, 0) + 1 AS BIGINT) AS num
            FROM t tt LEFT JOIN train tr
              ON tr.prev_type = tt.prev_type
             AND tr.event_type = tt.event_type
            WHERE tt.prev_type IS NOT NULL AND tt.user_id % 2 = 1
        ),
        g AS (
            SELECT prev_type, CAST(COUNT(*) AS BIGINT) AS n_test,
                   CAST(SUM(num) AS BIGINT) AS s
            FROM test GROUP BY 1
        )
        SELECT g.prev_type, g.n_test,
               ROUND((p.ssq + kk.k - p.m) * 1.0
                         / ((p.tot + kk.k) * (p.tot + kk.k))
                     - 2.0 * g.s / g.n_test / (p.tot + kk.k) + 1.0, 6)
                   AS brier
        FROM g JOIN prev_stats p ON p.prev_type = g.prev_type
        CROSS JOIN kk
    """,
    tags=("events", "ml", "eval"),
)
def brier_next_event_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts", "event_id")
        .filter(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
    )
    kk = ev.agg(F.countDistinct("event_type").cast("bigint").alias("k"))
    lag_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = ev.withColumn("prev_type", F.lag("event_type").over(lag_w)).where(
        F.col("prev_type").isNotNull()
    )
    train = (
        t.where(F.col("user_id") % 2 == 0)
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    prev_stats = train.groupBy("prev_type").agg(
        F.sum("c").cast("bigint").alias("tot"),
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum((F.col("c") + 1) * (F.col("c") + 1)).cast("bigint").alias("ssq"),
    )
    test = (
        t.where(F.col("user_id") % 2 == 1)
        .join(
            F.broadcast(train),  # type-domain model side
            ["prev_type", "event_type"],
            "left",
        )
        .select(
            "prev_type",
            (F.coalesce(F.col("c"), F.lit(0)) + 1).cast("bigint").alias("num"),
        )
    )
    g = test.groupBy("prev_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.sum("num").cast("bigint").alias("s"),
    )
    tt = F.col("tot") + F.col("k")
    brier = (
        (F.col("ssq") + F.col("k") - F.col("m")) * 1.0 / (tt * tt)
        - 2.0 * F.col("s") / F.col("n_test") / tt
        + 1.0
    )
    return (
        g.join(F.broadcast(prev_stats), "prev_type")
        .crossJoin(F.broadcast(kk))  # one-row K side
        .select("prev_type", "n_test", F.round(brier, 6).alias("brier"))
    )


# ---------------------------------------------------------------------------
# Exact nearest-POI join via grid bucketing: every order
# gets its nearest supplier-POI in a synthetic 10000×10000 integer plane
# (coordinates are integer hashes of TPC-H keys — exact in both engines).
# The Spark side is operators/spatial.py::grid_nearest_join (ring-1
# candidate equi-join + cell-size exactness guard + dimension-sized
# broadcast fallback); the oracle is the brute-force argmin with the same
# (dist², poi_id) tie-break. At scale the fact side never shuffles beyond
# its scan: candidates come from a broadcast 9×POI relation.
# ---------------------------------------------------------------------------
_GRID_CELL = 625  # 16×16 grid over the 10000² plane


@register(
    "grid_nearest_poi",
    oracle="""
        WITH pts AS (
            SELECT CAST(o_orderkey AS BIGINT) AS pt_id,
                   CAST((o_custkey * 7919 + o_orderkey) % 10000 AS BIGINT)
                       AS x,
                   CAST((o_orderkey * 104729) % 10000 AS BIGINT) AS y
            FROM orders
        ),
        poi AS (
            SELECT CAST(s_suppkey AS BIGINT) AS poi_id,
                   CAST((s_suppkey * 3571) % 10000 AS BIGINT) AS px,
                   CAST((s_suppkey * 9973) % 10000 AS BIGINT) AS py
            FROM supplier
        ),
        alld AS (
            SELECT p.pt_id, q.poi_id,
                   (p.x - q.px) * (p.x - q.px)
                 + (p.y - q.py) * (p.y - q.py) AS d2
            FROM pts p CROSS JOIN poi q
        ),
        m AS (SELECT pt_id, MIN(d2) AS dist2 FROM alld GROUP BY 1)
        SELECT a.pt_id, CAST(MIN(a.poi_id) AS BIGINT) AS poi_id,
               CAST(m.dist2 AS BIGINT) AS dist2
        FROM alld a JOIN m ON m.pt_id = a.pt_id AND a.d2 = m.dist2
        GROUP BY a.pt_id, m.dist2
    """,
    tags=("spatial", "join", "operators"),
)
def grid_nearest_poi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_pipeline_spark.operators.spatial import grid_nearest_join

    pts = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("bigint").alias("pt_id"),
        ((F.col("o_custkey") * 7919 + F.col("o_orderkey")) % 10000)
        .cast("bigint")
        .alias("x"),
        ((F.col("o_orderkey") * 104729) % 10000).cast("bigint").alias("y"),
    )
    poi = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("bigint").alias("poi_id"),
        ((F.col("s_suppkey") * 3571) % 10000).cast("bigint").alias("px"),
        ((F.col("s_suppkey") * 9973) % 10000).cast("bigint").alias("py"),
    )
    out = grid_nearest_join(pts, poi, cell_size=_GRID_CELL)
    return out.select(
        F.col("pt_id").cast("bigint").alias("pt_id"),
        F.col("poi_id").cast("bigint").alias("poi_id"),
        F.col("dist2").cast("bigint").alias("dist2"),
    )


# ---------------------------------------------------------------------------
# Blocking quality for the ER candidate generator: reduction ratio (how
# much of the n(n−1)/2 comparison space the blocking rules prune) and
# pairs completeness (what share of true duplicate pairs survive into the
# candidate set). Truth = the injected (k, k+SHIFT) variant pairs the ER
# corpus is built from. Reuses relational_analytics._er_candidate_pairs —
# the SAME pair builder entity_resolution_customers closes over — so the
# graded candidate set can never drift from the resolver's.
# ---------------------------------------------------------------------------
def _blocking_oracle() -> str:
    from etl_pipeline_spark.plans.relational_analytics import (
        _ER_PAIR_CTES,
        _ER_SHIFT,
    )

    return f"""
        WITH {_ER_PAIR_CTES},
        truth AS (
            SELECT c_custkey AS a, c_custkey + {_ER_SHIFT} AS b
            FROM customer WHERE c_custkey % 3 = 0
        ),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_records FROM corpus),
        cc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates FROM cand),
        tf AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_truth,
                   CAST(COUNT(k.src) AS BIGINT) AS n_found
            FROM truth t LEFT JOIN cand k ON k.src = t.a AND k.dst = t.b
        )
        SELECT nn.n_records, tf.n_truth, cc.n_candidates, tf.n_found,
               ROUND(tf.n_found * 1.0 / tf.n_truth, 6) AS pairs_completeness,
               ROUND(1.0 - cc.n_candidates * 2.0
                     / (nn.n_records * (nn.n_records - 1.0)), 6)
                   AS reduction_ratio
        FROM nn CROSS JOIN cc CROSS JOIN tf
    """


@register(
    "blocking_quality_er",
    oracle=_blocking_oracle(),
    tags=("dedup", "er", "eval"),
)
def blocking_quality_er(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_pipeline_spark.plans.relational_analytics import (
        _ER_SHIFT,
        _er_candidate_pairs,
    )

    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    # consumed twice (candidate count + truth probe); candidate-set-sized,
    # so one materialization beats re-running the two-rule pair builder
    # (18 customer scans in the lazy plan — guide §5)
    pairs = _er_candidate_pairs(spark, sf_dir).localCheckpoint(eager=False)
    nn = cust.agg(
        (
            F.count(F.lit(1))
            + F.sum(F.when(F.col("c_custkey") % 3 == 0, 1).otherwise(0))
        )
        .cast("bigint")
        .alias("n_records")
    )
    cc = pairs.agg(F.count(F.lit(1)).cast("bigint").alias("n_candidates"))
    truth = cust.where(F.col("c_custkey") % 3 == 0).select(
        F.col("c_custkey").alias("a"),
        (F.col("c_custkey") + _ER_SHIFT).alias("b"),
    )
    tf = (
        truth.join(
            pairs,
            (pairs.id_a == truth.a) & (pairs.id_b == truth.b),
            "left",
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_truth"),
            F.count("id_a").cast("bigint").alias("n_found"),
        )
    )
    return (
        nn.crossJoin(cc)  # one-row aggregates throughout
        .crossJoin(tf)
        .select(
            "n_records",
            "n_truth",
            "n_candidates",
            "n_found",
            F.round(F.col("n_found") * 1.0 / F.col("n_truth"), 6).alias(
                "pairs_completeness"
            ),
            F.round(
                1.0
                - F.col("n_candidates")
                * 2.0
                / (F.col("n_records") * (F.col("n_records") - 1.0)),
                6,
            ).alias("reduction_ratio"),
        )
    )
