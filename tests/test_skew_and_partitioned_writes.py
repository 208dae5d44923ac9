"""Salted-join correctness + spread, and partition-pruned reads of
partitioned table writes."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_spark.operators.skew import salted_join


def test_salted_join_matches_plain_join(spark):
    # skewed fact: 90% of rows share key 1
    fact = spark.createDataFrame(
        [(1 if i % 10 else i % 7 + 2, i, float(i)) for i in range(2000)],
        "k bigint, row_id bigint, v double",
    )
    dim = spark.createDataFrame(
        [(k, f"dim_{k}") for k in range(1, 10)], "k bigint, label string"
    )
    plain = fact.join(dim, "k").select("row_id", "label")
    salted = salted_join(fact, dim, "k", n_salts=8, tiebreak="row_id").select("row_id", "label")
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_salt_spreads_hot_key(spark):
    fact = spark.createDataFrame([(1, i) for i in range(1000)], "k bigint, row_id bigint")
    salted = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col("row_id").cast("string")), F.lit(8)).cast("int")
    )
    buckets = salted.groupBy("__salt").count().collect()
    assert len(buckets) == 8  # the single hot key occupies all salt buckets
    assert max(r["count"] for r in buckets) < 1000 * 0.3  # no bucket dominates


def test_partitioned_write_prunes(spark, tmp_path):
    from etl_pipeline_spark.sources.star import load_table
    from tests.conftest import SF_DIR

    orders = load_table(spark, SF_DIR, "orders")
    path = str(tmp_path / "orders_part")
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    back = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F")
    plan = back._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # the status predicate prunes partitions instead of scanning + filtering
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan
    assert back.count() == orders.filter("o_orderstatus = 'F'").count()
