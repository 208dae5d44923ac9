"""Round-4 wave-4: the LLM corpus-curation compositions — the end-to-end
funnel, DSIR importance selection, and CCNet perplexity bucketing.

These compose the engine's curation primitives the way production
pretraining pipelines chain them (RedPajama/Dolma-shape):

- `corpus_curation_e2e` — ONE query walking the whole funnel:
  input → Gopher rules → exact dedup → near-dup drop → hash sample,
  reporting per-stage survivor counts. Every stage is the registered
  operator's logic (rule flags from the gopher filter, md5 keep-first,
  exact-Jaccard pairs over the shared shingle relation, deterministic
  hash threshold), composed lazily — Catalyst sees one plan;
- `dsir_importance_select` — Data Selection via Importance Resampling
  (Xie et al. 2023, arXiv:2302.03169): score every document by the
  average log-ratio of target-domain vs corpus unigram likelihoods
  (Laplace-smoothed), select the top-k. The target LM here is the 'en'
  slice (the high-quality-domain stand-in); both LMs are token-keyed
  count relations, scoring is one token join + per-doc aggregate,
  selection is TakeOrderedAndProject;
- `ccnet_perplexity_buckets` — CCNet's head/middle/tail split (Wenzek
  et al. 2020, arXiv:1911.00359): per language, documents rank into
  perplexity terciles under the corpus bigram LM (reusing the
  bigram_perplexity cross-entropy relation); bucket stats out. Rank
  cutoffs are integer comparisons (3·rn ≤ n), exact in both engines.

Floats round 6 dp on identical parenthesization; complete-output DuckDB
oracles throughout (the funnel oracle chains the same stage CTEs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_pipeline_spark.operators.sampling import hash_bucket_sql
from etl_pipeline_spark.plans.registry import register
from etl_pipeline_spark.sources.star import load_table

# ---------------------------------------------------------------------------
# End-to-end curation funnel. Near-dup stage uses the single-pass greedy
# rule — drop every doc that near-duplicates a SMALLER-id survivor —
# which is the standard LSH-dedup keep-min-representative shape without
# the iterative chain resolution (that full closure is
# dedup_cluster_assign / dedup_canonical_pick). Sampling is a
# deterministic 50% hash threshold (the temperature-weighted variant is
# temperature_sampled_mix). Stage counts land in one 5-row result.
# ---------------------------------------------------------------------------
_CUR_SAMPLE_BUCKETS = 5000  # of 10_000 → 50% keep


def _curation_oracle() -> str:
    from etl_pipeline_spark.plans.corpus_quality import (
        gopher_keep_predicate_duck,
    )
    from etl_pipeline_spark.plans.llm import _JACCARD_PAIRS_DUCK

    sample = f"{hash_bucket_sql('doc_id', 'cur')} < {_CUR_SAMPLE_BUCKETS}"
    return f"""
        WITH s1 AS (
            SELECT doc_id, text FROM documents WHERE {gopher_keep_predicate_duck()}
        ),
        firsts AS (
            SELECT md5(text) AS h, MIN(doc_id) AS keep_id
            FROM s1 GROUP BY md5(text)
        ),
        s2 AS (
            SELECT s1.doc_id FROM s1
            JOIN firsts f ON f.h = md5(s1.text) AND f.keep_id = s1.doc_id
        ),
        pairs AS ({_JACCARD_PAIRS_DUCK}),
        dropped AS (
            SELECT DISTINCT p.doc_b AS doc_id FROM pairs p
            JOIN s2 a ON a.doc_id = p.doc_a
            JOIN s2 b ON b.doc_id = p.doc_b
        ),
        s3 AS (
            SELECT doc_id FROM s2
            WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
        ),
        s4 AS (SELECT doc_id FROM s3 WHERE {sample}),
        n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
        stages AS (
            SELECT 0 AS stage_idx, 'input' AS stage,
                   (SELECT n FROM n0) AS n_docs
            UNION ALL SELECT 1, 'quality_rules',
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM s1)
            UNION ALL SELECT 2, 'exact_dedup',
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM s2)
            UNION ALL SELECT 3, 'near_dedup',
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM s3)
            UNION ALL SELECT 4, 'sampled',
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM s4)
        )
        SELECT stage_idx, stage, n_docs,
               -- NULLIF: an EMPTY corpus has no defined stage fractions —
               -- NULL, not an ANSI 0-divide / fabricated NaN (empty-input
               -- probe, r11)
               ROUND(n_docs * 1.0 / NULLIF((SELECT n FROM n0), 0), 6)
                   AS frac_of_input
        FROM stages
    """


@register(
    "corpus_curation_e2e",
    oracle=_curation_oracle(),
    tags=("llm", "dedup", "quality", "sampling", "e2e"),
)
def corpus_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_pipeline_spark.plans.corpus_quality import quality_filter_gopher
    from etl_pipeline_spark.plans.llm import _jaccard_pairs

    # Stage membership as PER-DOC BOOLEAN FLAGS built up in one lineage,
    # then every count from a SINGLE aggregate — five independently
    # unioned stage counts would re-run the whole upstream funnel per
    # branch (Spark shares no subtrees across union arms: ~10 document
    # scans; the bootstrap query plan-guards the same rule).
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    g = quality_filter_gopher(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("keep1")
    )
    # the flag relation is SLIM (doc_id, h, keep1 — text dropped after
    # hashing) and localCheckpoint'ed because it feeds two consumers:
    # DataFrame reuse duplicates logical subtrees, and runtime exchange
    # reuse only dedupes from the first shuffle up — without the barrier
    # the funnel re-scanned documents ~12x (measured; the CC/pagerank
    # operators apply the same discipline to their round state)
    flagged = (
        docs.select("doc_id", F.md5("text").alias("h"))
        .join(g, "doc_id")
        .localCheckpoint(eager=True)
    )
    firsts = (
        flagged.filter(F.col("keep1") == 1)
        .groupBy("h")
        .agg(F.min("doc_id").alias("keep_id"))
    )
    f2 = (
        flagged.join(firsts, "h", "left")
        .withColumn(
            "keep2",
            ((F.col("keep1") == 1) & (F.col("doc_id") == F.col("keep_id")))
            .cast("int"),
        )
        .select("doc_id", "keep1", "keep2")
        .localCheckpoint(eager=True)
    )
    pairs = _jaccard_pairs(spark, sf_dir, threshold=0.5).select("doc_a", "doc_b")
    survivors2 = f2.filter(F.col("keep2") == 1).select("doc_id")
    dropped = (
        pairs.join(survivors2.withColumnRenamed("doc_id", "doc_a"), "doc_a", "semi")
        .join(survivors2.withColumnRenamed("doc_id", "doc_b"), "doc_b", "semi")
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("is_dropped", F.lit(1))
    )
    f3 = (
        f2.join(dropped, "doc_id", "left")
        .withColumn(
            "keep3",
            ((F.col("keep2") == 1) & F.col("is_dropped").isNull()).cast("int"),
        )
        .withColumn(
            "keep4",
            (
                (F.col("keep3") == 1)
                & F.expr(
                    f"{hash_bucket_sql('doc_id', 'cur')} < {_CUR_SAMPLE_BUCKETS}"
                )
            ).cast("int"),
        )
    )
    # COALESCE: stage SUMs over an EMPTY corpus are NULL, the oracle's
    # per-stage COUNTs are 0 (empty-input probe, r11)
    agg = f3.agg(
        F.count(F.lit(1)).cast("bigint").alias("n0"),
        F.coalesce(F.sum("keep1"), F.lit(0)).cast("bigint").alias("n1"),
        F.coalesce(F.sum("keep2"), F.lit(0)).cast("bigint").alias("n2"),
        F.coalesce(F.sum("keep3"), F.lit(0)).cast("bigint").alias("n3"),
        F.coalesce(F.sum("keep4"), F.lit(0)).cast("bigint").alias("n4"),
    )
    stages = agg.select(
        F.expr(
            "explode(array("
            " struct(0 AS stage_idx, 'input' AS stage, n0 AS n_docs),"
            " struct(1 AS stage_idx, 'quality_rules' AS stage, n1 AS n_docs),"
            " struct(2 AS stage_idx, 'exact_dedup' AS stage, n2 AS n_docs),"
            " struct(3 AS stage_idx, 'near_dedup' AS stage, n3 AS n_docs),"
            " struct(4 AS stage_idx, 'sampled' AS stage, n4 AS n_docs)))"
        ).alias("s"),
        F.col("n0"),
    )
    return stages.select(
        "s.stage_idx",
        "s.stage",
        "s.n_docs",
        # NULLIF mirrors the oracle: empty corpus → NULL fractions
        F.round(
            F.col("s.n_docs") * 1.0 / F.nullif(F.col("n0").cast("double"), F.lit(0.0)), 6
        ).alias("frac_of_input"),
    )


# ---------------------------------------------------------------------------
# DSIR importance selection. score(doc) = avg over tokens of
# ln(p_target(w) / p_source(w)) with Laplace smoothing over the SHARED
# vocabulary (so OOV-in-target tokens get the floor, and the ratio is
# defined everywhere). Target = the 'en' slice; source = the corpus.
# Token LMs are count relations (token-keyed shuffle joins — vocabulary
# unbounded); the doc score is one grouped aggregate; selection is
# orderBy+limit = TakeOrderedAndProject.
# ---------------------------------------------------------------------------
_DSIR_K = 500


@register(
    "dsir_importance_select",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
            FROM documents
        ),
        src AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY 1),
        tgt AS (
            SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM toks
            WHERE lang = 'en' GROUP BY 1
        ),
        tots AS (
            SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM src) AS n_src,
                   (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) FROM tgt) AS n_tgt,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM src) AS v
        ),
        scored AS (
            SELECT t.doc_id, MIN(t.lang) AS lang,
                   CAST(COUNT(*) AS BIGINT) AS n_toks,
                   ROUND(SUM(LN(((COALESCE(g.c, 0) + 1.0) / (tots.n_tgt + tots.v))
                               / ((s.c + 1.0) / (tots.n_src + tots.v))))
                         / COUNT(*), 6) AS dsir_weight
            FROM toks t
            JOIN src s ON s.term = t.term
            LEFT JOIN tgt g ON g.term = t.term
            CROSS JOIN tots
            GROUP BY t.doc_id
        )
        SELECT doc_id, lang, n_toks, dsir_weight FROM scored
        ORDER BY dsir_weight DESC, doc_id ASC
        LIMIT {_DSIR_K}
    """,
    tags=("llm", "sampling", "lm", "curation"),
)
def dsir_importance_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    toks = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("term")
    )
    src = toks.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    tgt = (
        toks.filter(F.col("lang") == "en")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    tots = (
        src.agg(
            F.sum("c").cast("bigint").alias("n_src"),
            F.count(F.lit(1)).cast("bigint").alias("v"),
        )
        .crossJoin(
            tgt.agg(F.coalesce(F.sum("c"), F.lit(0)).cast("bigint").alias("n_tgt"))
        )
    )
    s = src.withColumnRenamed("c", "c_src")
    g = tgt.withColumnRenamed("c", "c_tgt")
    scored = (
        toks.join(s, "term")
        .join(g, "term", "left")
        .crossJoin(F.broadcast(tots))
        .groupBy("doc_id")
        .agg(
            F.min("lang").alias("lang"),
            F.count(F.lit(1)).cast("bigint").alias("n_toks"),
            F.round(
                F.sum(
                    F.log(
                        ((F.coalesce("c_tgt", F.lit(0)) + 1.0)
                         / (F.col("n_tgt") + F.col("v")))
                        / ((F.col("c_src") + 1.0) / (F.col("n_src") + F.col("v")))
                    )
                )
                / F.count(F.lit(1)),
                6,
            ).alias("dsir_weight"),
        )
    )
    return (
        scored.select("doc_id", "lang", "n_toks", "dsir_weight")
        .orderBy(F.desc("dsir_weight"), F.asc("doc_id"))
        .limit(_DSIR_K)
    )


# ---------------------------------------------------------------------------
# CCNet perplexity buckets: per language, docs rank by bigram-LM
# cross-entropy (ascending — fluent first) and split into terciles.
# Cutoffs are exact integer comparisons (3·rn ≤ n, 3·rn ≤ 2n), so the
# bucket boundary never rides a float. The per-doc entropy relation is
# the shared bigram-LM CTE (text_analytics), reused verbatim.
# ---------------------------------------------------------------------------
def _ccnet_oracle() -> str:
    from etl_pipeline_spark.plans.text_analytics import _PERDOC_CE_DUCK

    return f"""
        WITH {_PERDOC_CE_DUCK},
        ranked AS (
            SELECT p.doc_id, d.lang, p.cross_entropy,
                   ROW_NUMBER() OVER (PARTITION BY d.lang
                       ORDER BY p.cross_entropy ASC, p.doc_id ASC) AS rn,
                   COUNT(*) OVER (PARTITION BY d.lang) AS n
            FROM perdoc p JOIN documents d ON d.doc_id = p.doc_id
        ),
        bucketed AS (
            SELECT lang, cross_entropy,
                   CASE WHEN 3 * rn <= n THEN 'head'
                        WHEN 3 * rn <= 2 * n THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM ranked
        )
        SELECT lang, bucket,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               -- per-doc cross_entropy is 6-dp ROUNDED upstream (the
               -- round-before-accumulate rule), i.e. a 1e-6 LATTICE —
               -- so its mean is the exact-sum FLOOR class, NOT the
               -- transcendental convention (sweep-found: a bucket mean
               -- landed on a 6-dp tie once the NULL-body plants shifted
               -- membership). MIN/MAX pick existing lattice values and
               -- stay exact under ROUND.
               FLOOR(SUM(CAST(ROUND(cross_entropy * 1.0e6, 0) AS BIGINT))
                     * 1.0e0 / COUNT(*) + 0.5e0) / 1.0e6 AS mean_ce,
               ROUND(MIN(cross_entropy), 6) AS min_ce,
               ROUND(MAX(cross_entropy), 6) AS max_ce
        FROM bucketed
        GROUP BY lang, bucket
    """


@register(
    "ccnet_perplexity_buckets",
    oracle=_ccnet_oracle(),
    tags=("llm", "text", "quality", "curation"),
)
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_pipeline_spark.plans.text_analytics import (
        bigram_perplexity_quality,
    )

    ce = bigram_perplexity_quality(spark, sf_dir).select(
        "doc_id", "cross_entropy"
    )
    langs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    w = Window.partitionBy("lang").orderBy(
        F.asc("cross_entropy"), F.asc("doc_id")
    )
    wn = Window.partitionBy("lang")
    ranked = (
        ce.join(langs, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wn))
    )
    bucket = (
        F.when(3 * F.col("rn") <= F.col("n"), "head")
        .when(3 * F.col("rn") <= 2 * F.col("n"), "middle")
        .otherwise("tail")
    )
    return (
        ranked.withColumn("bucket", bucket)
        .groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            # exact-lattice mean — see the oracle note (sweep-found tie)
            F.expr(
                "FLOOR(SUM(CAST(ROUND(cross_entropy * 1.0e6, 0) AS BIGINT))"
                " * 1.0e0 / COUNT(*) + 0.5e0) / 1.0e6"
            ).alias("mean_ce"),
            F.round(F.min("cross_entropy"), 6).alias("min_ce"),
            F.round(F.max("cross_entropy"), 6).alias("max_ce"),
        )
    )


