"""Geometry kernel validation (T1/T2).

The TM projection is validated without pyproj by (a) round-trip closure to
sub-micrometer, (b) the central-meridian invariant E == false easting, and
(c) comparing the central-meridian northing against a *numerically
integrated* GRS80 meridian arc (independent of the Krüger series).
"""

from __future__ import annotations

import json

import numpy as np
import pytest

from etl_pipeline_spark.functions.geo import (
    bbox_filter,
    clip_polygons,
    clip_ring_bbox,
    reproject,
    ring_area,
    tm_forward,
    tm_inverse,
)


def test_roundtrip_closure():
    rng = np.random.default_rng(7)
    lon = rng.uniform(11.0, 24.0, 500)  # Sweden-ish extent
    lat = rng.uniform(55.0, 69.0, 500)
    for epsg in (3006, 3010):
        e, n = tm_forward(lon, lat, epsg)
        lon2, lat2 = tm_inverse(e, n, epsg)
        assert np.max(np.abs(lon2 - lon)) < 1e-9  # ~0.1 µm
        assert np.max(np.abs(lat2 - lat)) < 1e-9


def test_central_meridian_invariants():
    # On the central meridian the easting equals the false easting exactly
    e, n = tm_forward(np.array([15.0]), np.array([60.0]), 3006)
    assert abs(e[0] - 500_000.0) < 1e-6

    # Northing = k0 × meridian arc, checked against numerical integration of
    # the meridian-curvature radius M(φ) = a(1-e²)/(1-e²sin²φ)^(3/2)
    a, f = 6378137.0, 1 / 298.257222101
    e2 = f * (2 - f)
    phi = np.linspace(0.0, np.radians(60.0), 2_000_001)
    m = a * (1 - e2) / np.power(1 - e2 * np.sin(phi) ** 2, 1.5)
    arc = getattr(np, "trapezoid", np.trapz)(m, phi)
    assert abs(n[0] - 0.9996 * arc) < 1e-3  # < 1 mm


def test_known_offsets_direction():
    # East of the central meridian → E > FE; north increases with latitude
    e1, n1 = tm_forward(np.array([18.06]), np.array([59.33]), 3006)  # Stockholm
    e2, n2 = tm_forward(np.array([18.06]), np.array([63.0]), 3006)
    assert e1[0] > 500_000.0
    assert n2[0] > n1[0]
    # Sanity envelope for Stockholm's SWEREF99 TM coordinates
    assert 600_000 < e1[0] < 700_000
    assert 6_500_000 < n1[0] < 6_650_000


def test_reproject_dataframe(spark):
    df = spark.createDataFrame(
        [(1, 18.06, 59.33), (2, 15.0, 60.0)], "id bigint, lon double, lat double"
    )
    out = reproject(df, "lon", "lat", "EPSG:4326", "EPSG:3006").orderBy("id").collect()
    e, n = tm_forward(np.array([18.06]), np.array([59.33]), 3006)
    assert out[0].x_out == pytest.approx(e[0], abs=1e-6)
    assert out[0].y_out == pytest.approx(n[0], abs=1e-6)
    assert out[1].x_out == pytest.approx(500_000.0, abs=1e-6)
    # TM → TM goes through geographic
    df2 = spark.createDataFrame([(1, float(e[0]), float(n[0]))], "id bigint, e double, n double")
    back = reproject(df2, "e", "n", 3006, 3010).collect()[0]
    e10, n10 = tm_forward(np.array([18.06]), np.array([59.33]), 3010)
    assert back.x_out == pytest.approx(e10[0], abs=1e-5)
    assert back.y_out == pytest.approx(n10[0], abs=1e-5)


def test_unsupported_crs_refused(spark):
    df = spark.createDataFrame([(1.0, 2.0)], "x double, y double")
    with pytest.raises(ValueError, match="unsupported CRS"):
        reproject(df, "x", "y", 4326, 9999)


def test_clip_ring_square():
    # unit square clipped by half-overlapping bbox → quarter square
    ring = [[0, 0], [2, 0], [2, 2], [0, 2]]
    clipped = clip_ring_bbox(np.array(ring), (1.0, 1.0, 3.0, 3.0))
    assert ring_area(clipped) == pytest.approx(1.0)
    # disjoint bbox → empty
    assert len(clip_ring_bbox(np.array(ring), (5.0, 5.0, 6.0, 6.0))) == 0
    # fully inside → unchanged area
    inner = clip_ring_bbox(np.array(ring), (-1.0, -1.0, 9.0, 9.0))
    assert ring_area(inner) == pytest.approx(4.0)


def test_clip_polygons_dataframe(spark):
    rows = [
        (1, json.dumps([[0, 0], [2, 0], [2, 2], [0, 2]])),   # overlaps AOI
        (2, json.dumps([[10, 10], [11, 10], [11, 11], [10, 11]])),  # outside
        (3, None),                                            # null geometry
    ]
    df = spark.createDataFrame(rows, "id bigint, ring string")
    out = {r.id: r for r in clip_polygons(df, "ring", (1.0, 1.0, 3.0, 3.0)).collect()}
    assert out[1].clipped_area == pytest.approx(1.0)
    assert json.loads(out[1].clipped_json)  # valid ring back
    assert out[2].clipped_json is None and out[2].clipped_area == 0.0
    assert out[3].clipped_json is None


def test_point_clip_is_pushed_down(spark):
    from etl_pipeline_spark.sources.star import load_table
    from tests.conftest import SF_DIR

    li = load_table(spark, SF_DIR, "lineitem")
    clipped = bbox_filter(li, "l_quantity", "l_extendedprice", (10, 1000, 20, 40000))
    plan = clipped._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PushedFilters" in plan and "GreaterThanOrEqual(l_quantity,10.0" in plan


def test_point_in_polygon_concave(spark):
    from pyspark.sql import Row
    from etl_pipeline_spark.functions.geo import points_in_polygon

    # concave pentagon with a notch at the top: (2,3) sits in the notch
    ring = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (2.0, 2.0), (0.0, 4.0)]
    pts = spark.createDataFrame(
        [
            Row(pid=1, x=1.0, y=0.5),   # inside
            Row(pid=2, x=2.0, y=3.0),   # in the notch → outside
            Row(pid=3, x=0.5, y=3.4),   # inside the left arm
            Row(pid=4, x=0.5, y=3.6),   # above the left arm → outside
            Row(pid=5, x=5.0, y=1.0),   # right of everything
            Row(pid=6, x=3.9, y=3.0),   # inside the right arm
        ]
    )
    got = sorted(r.pid for r in points_in_polygon(pts, "x", "y", ring).collect())
    assert got == [1, 3, 6]


def test_pip_sql_predicate_agrees_with_udf(spark):
    from pyspark.sql import Row
    from etl_pipeline_spark.functions.geo import pip_sql_predicate, points_in_polygon

    ring = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (2.0, 2.0), (0.0, 4.0)]
    rows = [
        Row(pid=i, x=float(xi) / 3.0, y=float(yi) / 7.0)
        for i, (xi, yi) in enumerate((a, b) for a in range(-3, 16) for b in range(-3, 31))
    ]
    pts = spark.createDataFrame(rows)
    pts.createOrReplaceTempView("pip_pts")
    via_udf = sorted(r.pid for r in points_in_polygon(pts, "x", "y", ring).collect())
    via_sql = sorted(
        r.pid
        for r in spark.sql(
            f"SELECT pid FROM pip_pts WHERE {pip_sql_predicate('x', 'y', ring)}"
        ).collect()
    )
    assert via_udf == via_sql and len(via_udf) > 50
