"""Hash-split invariants: determinism, exhaustiveness, growth-stability,
stratified rates, and shuffle-freedom of the physical plan."""

from __future__ import annotations

from etl_pipeline_spark.operators.sampling import assign_splits, stratified_sample

_W = {"train": 0.8, "valid": 0.1, "test": 0.1}


def _ids(spark, n, start=0):
    return spark.range(start, start + n).withColumnRenamed("id", "doc_id")


def test_split_deterministic_and_exhaustive(spark):
    df = assign_splits(_ids(spark, 2000), "doc_id", _W, seed="t")
    a = {r.doc_id: r.split for r in df.collect()}
    b = {r.doc_id: r.split for r in assign_splits(_ids(spark, 2000), "doc_id", _W, seed="t").collect()}
    assert a == b  # rerun-identical
    assert set(a.values()) == {"train", "valid", "test"}
    frac = sum(1 for v in a.values() if v == "train") / len(a)
    assert 0.75 < frac < 0.85  # ~weights


def test_labels_stable_under_corpus_growth(spark):
    small = {r.doc_id: r.split for r in assign_splits(_ids(spark, 500), "doc_id", _W, seed="t").collect()}
    big = {r.doc_id: r.split for r in assign_splits(_ids(spark, 5000), "doc_id", _W, seed="t").collect()}
    assert all(big[k] == v for k, v in small.items())


def test_seed_changes_assignment(spark):
    a = {r.doc_id: r.split for r in assign_splits(_ids(spark, 1000), "doc_id", _W, seed="t").collect()}
    b = {r.doc_id: r.split for r in assign_splits(_ids(spark, 1000), "doc_id", _W, seed="u").collect()}
    assert a != b


def test_stratified_rates(spark):
    from pyspark.sql import functions as F

    df = _ids(spark, 4000).withColumn(
        "lang", F.when(F.col("doc_id") % 2 == 0, "en").otherwise("zh")
    )
    kept = stratified_sample(df, "doc_id", "lang", {"en": 0.5, "zh": 0.1}, seed="t")
    counts = {r.lang: r.n for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert 800 < counts["en"] < 1200  # ~50% of 2000
    assert 120 < counts["zh"] < 280  # ~10% of 2000


def test_no_shuffle_in_plan(spark):
    df = assign_splits(_ids(spark, 100), "doc_id", _W, seed="t")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_weighted_sample_deterministic_and_biased(spark):
    from pyspark.sql import Row

    from etl_pipeline_spark.operators.sampling import weighted_sample

    # 100 light rows (w=1) + 10 heavy rows (w=1000)
    df = spark.createDataFrame(
        [Row(id=i, w=1.0) for i in range(100)]
        + [Row(id=100 + i, w=1000.0) for i in range(10)]
    )
    s1 = sorted(r.id for r in weighted_sample(df, "id", "w", k=10).collect())
    s2 = sorted(r.id for r in weighted_sample(df, "id", "w", k=10).collect())
    assert s1 == s2 and len(s1) == 10  # deterministic, exact k
    # heavy rows (9% of population, >99% of weight) should dominate the sample
    assert sum(1 for i in s1 if i >= 100) >= 7
    # a different seed draws a different sample
    s3 = sorted(r.id for r in weighted_sample(df, "id", "w", k=10, seed="other").collect())
    assert s3 != s1
