"""Grid-bucketed exact nearest-neighbor join.

The classic spatial-join device the reference has no analog for (its
spatial surface stops at clip/reproject; reference: etl/pipeline.py
geoprocessing step) but any geo-enriched warehouse needs: assign both
sides to square grid cells, join each point only to POIs in its 3x3
cell neighborhood, and fall back to the dimension-sized broadcast scan
ONLY for points whose ring-1 candidate set cannot prove the true
nearest neighbor.

Exactness guard: a point's 3x3 neighborhood result is provably the
global nearest iff the best ring-1 distance is <= cell_size — any POI
outside the 3x3 block is separated from the point by at least one full
cell along some axis, hence strictly farther than cell_size. Points
that fail the guard (empty neighborhood, or best candidate beyond one
cell) re-scan the full POI relation via broadcast — bounded work
because POIs are dimension-sized by contract.

At 100 TB the candidate join is an equi-join on (cell_x, cell_y) with
the small side broadcast: fact-side rows each meet ~9 * K / cells
candidates, which collapse map-side to one row per point before the
operator's single point-keyed exchange (no fact-vs-fact join anywhere
— the fallback population is carved out of the same aggregate, not
re-joined). The fallback is the (measured-tiny) fraction of points in
POI-sparse regions. All arithmetic is integer (squared distances) — no
float comparisons anywhere, so Spark and any oracle agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipeline_spark.utils.parallelism import fan_out_scan


def grid_nearest_join(
    points: DataFrame,
    pois: DataFrame,
    *,
    cell_size: int,
    point_id: str = "pt_id",
    poi_id: str = "poi_id",
) -> DataFrame:
    """Exact nearest POI per point.

    ``points``: (point_id, x, y) with integer coordinates.
    ``pois``: (poi_id, px, py) with integer coordinates, dimension-sized
    (broadcast twice: expanded to neighbor cells, and as the fallback).
    Ties on squared distance break to the smallest ``poi_id``.

    Returns (point_id, poi_id, dist2).
    """
    cs = int(cell_size)
    guard2 = cs * cs

    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    # POI replicated to its 9 neighbor cells: a 9x dimension-sized relation.
    poi_cells = (
        pois.select(
            poi_id,
            "px",
            "py",
            F.explode(offsets).alias("o"),
        )
        .select(
            poi_id,
            "px",
            "py",
            (F.expr(f"px DIV {cs}") + F.col("o.dx")).alias("cx"),
            (F.expr(f"py DIV {cs}") + F.col("o.dy")).alias("cy"),
        )
    )
    # the ring-1 candidate min-agg is the scan stage's compute on the
    # point side — fan a 1-split input out first (guide §2.5)
    pts = fan_out_scan(points.select(point_id, "x", "y")).select(
        point_id,
        "x",
        "y",
        F.expr(f"x DIV {cs}").alias("cx"),
        F.expr(f"y DIV {cs}").alias("cy"),
    )
    d2 = (F.col("x") - F.col("px")) * (F.col("x") - F.col("px")) + (
        F.col("y") - F.col("py")
    ) * (F.col("y") - F.col("py"))
    # LEFT join so candidate-less points survive with a NULL best (they
    # route to the fallback); struct-min = (dist2 ASC, poi_id ASC), the
    # deterministic tie-break. Keying the groupBy by (id, x, y) keeps the
    # coordinates available for the fallback rescan WITHOUT a second
    # fact-sized join — the whole operator costs ONE point-keyed shuffle
    # (map-side-combined: ~9 candidates collapse to 1 row per point
    # before the exchange).
    ring1 = (
        pts.join(F.broadcast(poi_cells), ["cx", "cy"], "left")
        .select(
            point_id,
            "x",
            "y",
            F.struct(d2.alias("d2"), F.col(poi_id).alias("pid")).alias("c"),
        )
        .groupBy(point_id, "x", "y")
        .agg(F.min("c").alias("best"))
        .select(
            point_id,
            "x",
            "y",
            F.col("best.d2").alias("d2"),
            F.col("best.pid").alias("pid"),
        )
    )
    resolved = ring1.filter(F.col("d2") <= guard2)
    # Points whose ring-1 best cannot be proven global (or with no ring-1
    # candidate at all): dimension-sized broadcast rescan, exact by scan.
    fallback = (
        ring1.filter((F.col("d2").isNull()) | (F.col("d2") > guard2))
        .select(point_id, "x", "y")
        .crossJoin(F.broadcast(pois))
        .select(point_id, F.struct(d2.alias("d2"), F.col(poi_id).alias("pid")).alias("c"))
        .groupBy(point_id)
        .agg(F.min("c").alias("best"))
        .select(point_id, F.col("best.d2").alias("d2"), F.col("best.pid").alias("pid"))
    )
    return (
        resolved.select(point_id, "d2", "pid")
        .unionByName(fallback)
        .select(point_id, F.col("pid").alias(poi_id), F.col("d2").alias("dist2"))
    )
