"""Python Data Source: partition-per-layer read + observable filter pushdown
against the file-served fake server."""

from __future__ import annotations

import json
from pathlib import Path

import pytest


@pytest.fixture()
def server_dir(tmp_path) -> Path:
    d = tmp_path / "server"
    d.mkdir()
    (d / "service.json").write_text(json.dumps({"layers": [{"id": 0}, {"id": 3}]}))
    for lid, n in ((0, 30), (3, 10)):
        (d / f"layer{lid}.json").write_text(json.dumps({"maxRecordCount": 7}))
        feats = [
            {
                "type": "Feature",
                "properties": {"fid": i, "layer": lid},
                "geometry": {"type": "Point", "coordinates": [10.0 + i * 0.5, 55.0 + lid]},
            }
            for i in range(n)
        ]
        (d / f"layer{lid}_features.json").write_text(json.dumps(feats))
    return d


def _read(spark, server_dir):
    from etl_pipeline_spark.sources.rest_datasource import PagedRestDataSource

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(PagedRestDataSource)
    return (
        spark.read.format("paged_rest")
        .option("service_url", "https://fake/FeatureServer")
        .option("transport_factory", "file")
        .option("transport_dir", str(server_dir))
        .load()
    )


def test_reads_all_layers_paginated(spark, server_dir):
    df = _read(spark, server_dir)
    assert df.count() == 40  # 30 + 10 across two partitions (layers)
    assert df.rdd.getNumPartitions() == 2
    # pagination honored maxRecordCount=7: 30→5 pages, 10→2 pages
    logs = [json.loads(p.read_text()) for p in (server_dir / "query_log").iterdir()]
    assert len(logs) == 5 + 2


def test_filter_pushdown_reaches_server(spark, server_dir):
    df = _read(spark, server_dir).filter("fid >= 10 AND fid <= 15 AND x >= 14.0")
    rows = df.collect()
    # only layer 0 carries fid 10..15 (layer 3 stops at fid 9); their x
    # values 15.0..17.5 all clear the bbox bound
    assert {r.fid for r in rows} == set(range(10, 16))
    assert len(rows) == 6
    logs = [json.loads(p.read_text()) for p in (server_dir / "query_log").iterdir()]
    # the server saw the where clause and bbox — pushdown happened
    assert any("fid >= 10" in l["where"] and "fid <= 15" in l["where"] for l in logs)
    assert any(l["bbox"] is not None and l["bbox"].startswith("14.0,") for l in logs)
    # and served only the matching rows, not the full layer
    assert all(l["matched"] <= 6 for l in logs)


def test_unsupported_filter_still_correct(spark, server_dir):
    # props LIKE is not pushable → Spark applies it after the scan
    df = _read(spark, server_dir).filter("fid < 4 AND props LIKE '%\"layer\": 3%'")
    rows = df.collect()
    assert {r.fid for r in rows} == {0, 1, 2, 3}
    assert all(json.loads(r.props)["layer"] == 3 for r in rows)
