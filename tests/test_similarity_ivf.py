"""IVF index correctness: full-probe equivalence with brute force, planted
near-pair recall at partial probe, determinism of the trained quantizer."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_spark.operators.similarity import (
    assign_ivf_cells,
    cosine_topk,
    ivf_topk,
    train_ivf_centroids,
)
from etl_pipeline_spark.sources.star import load_table
from tests.conftest import SF_DIR


def test_full_probe_equals_brute_force(spark):
    """nprobe == ncells searches every cell → must equal the exact path."""
    emb = load_table(spark, SF_DIR, "embeddings")
    exact = {
        (r.query_id, r.rank): r.neighbor_id
        for r in cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=3).collect()
    }
    ivf = {
        (r.query_id, r.rank): r.neighbor_id
        for r in ivf_topk(emb, F.col("vec_id") < 5, ncells=4, nprobe=4, k=3).collect()
    }
    assert ivf == exact


def test_planted_pair_recall(spark):
    """The testdata plants exactly one embedding pair with cosine in
    [0.5, 0.8); both members must surface each other as top-1 even at
    partial probe (they land in the same cell)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    pair = (
        cosine_topk(emb, emb, k=1)
        .filter(F.col("cosine") >= 0.5)
        .select("query_id", "neighbor_id")
        .collect()
    )
    assert len(pair) == 2  # both directions of the one planted pair
    a, b = pair[0].query_id, pair[0].neighbor_id
    got = {
        r.query_id: r.neighbor_id
        for r in ivf_topk(
            emb, F.col("vec_id").isin(a, b), ncells=8, nprobe=2, k=1
        ).collect()
    }
    assert got[a] == b and got[b] == a


def test_quantizer_deterministic_and_partitions_all(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    c1 = train_ivf_centroids(emb, ncells=8)
    c2 = train_ivf_centroids(emb, ncells=8)
    assert c1 == c2  # no RNG anywhere → bit-identical retrain
    cells = assign_ivf_cells(emb, c1).groupBy("cell").count().collect()
    assert sum(r["count"] for r in cells) == emb.count()
    assert all(0 <= r.cell < 8 for r in cells)


def test_cell_partitioned_corpus_prunes_scan(spark, tmp_path):
    """The 100 TB layout: corpus written partitioned by IVF cell. A probe
    that filters on cell ids must show partition pruning in the scan (only
    nprobe/ncells of the files read), not a full-corpus scan."""
    emb = load_table(spark, SF_DIR, "embeddings")
    cents = train_ivf_centroids(emb, ncells=8)
    path = str(tmp_path / "emb_by_cell")
    assign_ivf_cells(emb, cents).write.partitionBy("cell").mode("overwrite").parquet(path)

    probed = spark.read.parquet(path).filter(F.col("cell").isin(2, 5))
    plan = probed._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    part_filters = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "cell" in part_filters  # pruning happens at planning, not runtime
    cells_read = {r.cell for r in probed.select("cell").distinct().collect()}
    assert cells_read <= {2, 5}
