"""GeoJSON FeatureCollection normalizer (SURVEY.md §2.2 L2).

The reference converts GeoJSON files via ArcPy with the geometry type
*sampled from the first 10 features* (etl/loaders/geojson_loader.py:37-43) —
a confirmed correctness hole for mixed-type files (§2.9 bug 5). Here:

- `spark.read.json(multiLine)` parses the FeatureCollection on executors;
- features explode into rows: properties struct + geometry (type kept as a
  column, coordinates kept as a raw JSON string — arbitrary nesting depth
  doesn't fit a fixed Spark type, and downstream geometry kernels parse it
  lazily);
- geometry-type detection aggregates over ALL rows
  (`groupBy(geom_type).count()`), and `dominant_geometry_type` implements
  the reference's POLYGON-default-with-warning rule deterministically;
- representative x/y are extracted from the first coordinate pair so bbox
  predicates (S9) and the WGS84 sniff rule (S10) run as plain range
  predicates, pushed down by Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType

# GeoJSON type → staging geometry class, the reference's hard mapping table
# (etl/loaders/geojson_loader.py:59-66).
GEOJSON_TO_STAGED_TYPE = {
    "Point": "POINT",
    "MultiPoint": "MULTIPOINT",
    "LineString": "POLYLINE",
    "MultiLineString": "POLYLINE",
    "Polygon": "POLYGON",
    "MultiPolygon": "POLYGON",
}


_EMPTY_FC_SCHEMA = (
    "geom_type string, coordinates_json string, x double, y double, crs_name string"
)


def _struct_field(struct: StructType, name: str) -> StructType | None:
    """The field's type if it exists AND is a struct, else None — inferred
    JSON schemas degrade absent/all-null objects to StringType."""
    if name in struct.names and isinstance(struct[name].dataType, StructType):
        return struct[name].dataType
    return None


def load_feature_collection(spark: SparkSession, path: str) -> DataFrame:
    """Read a GeoJSON FeatureCollection file into one row per feature.

    Degenerate-input contract (fuzz-pinned, tests/test_parser_fuzz.py):
    non-JSON bytes or JSON without a ``features`` array raise
    ``ValueError`` (pre-fix: raw AnalysisException off the
    ``_corrupt_record`` schema); SPEC-LEGAL degenerates parse instead of
    crashing — an empty ``features`` array (inferred as array<string>,
    no element struct) returns an empty frame with the canonical
    geometry columns, and files whose features all carry ``null``
    geometry / no properties yield NULL geom_type/x/y rows.
    """
    raw = spark.read.option("multiLine", "true").json(path)
    ftype = raw.schema["features"].dataType if "features" in raw.columns else None
    if ftype is None:
        raise ValueError(f"{path}: not a GeoJSON FeatureCollection (no 'features' array)")
    elem = ftype.elementType if isinstance(ftype, ArrayType) else None
    if not isinstance(elem, StructType):
        # legal empty collection: [] infers as array<string>
        return spark.createDataFrame([], _EMPTY_FC_SCHEMA)

    crs_props = None
    if "crs" in raw.columns and isinstance(raw.schema["crs"].dataType, StructType):
        crs_props = _struct_field(raw.schema["crs"].dataType, "properties")
    crs_col = (
        F.coalesce(F.col("crs.properties.name"), F.lit(None).cast("string"))
        if crs_props is not None and "name" in crs_props.names
        else F.lit(None).cast("string")
    )
    feats = raw.select(crs_col.alias("crs_name"), F.explode("features").alias("feature"))

    geom = _struct_field(elem, "geometry")  # None when absent or all-null
    props = _struct_field(elem, "properties")
    null_str = F.lit(None).cast("string")
    geom_type = (
        F.col("feature.geometry.type")
        if geom is not None and "type" in geom.names
        else null_str
    )
    coords_json = (
        F.to_json(F.col("feature.geometry.coordinates"))
        if geom is not None and "coordinates" in geom.names
        else null_str
    )
    # coordinates survive schema merge as strings (mixed nesting depths), so
    # the first numeric pair may be wrapped in quotes/brackets — tolerate them
    pair_re = '(-?[0-9.]+)["\\\\s]*,["\\\\s\\\\[]*(-?[0-9.]+)'
    # nullif('') + try_cast: a feature with no numeric pair (or a null
    # geometry) yields NULL x/y instead of an ANSI cast error.
    x = F.expr("try_cast(nullif(regexp_extract(_cj, '" + pair_re + "', 1), '') AS double)")
    y = F.expr("try_cast(nullif(regexp_extract(_cj, '" + pair_re + "', 2), '') AS double)")
    cols = [F.col("feature.properties.*")] if props is not None else []
    return (
        feats.withColumn("_cj", coords_json)
        .select(
            *cols,
            geom_type.alias("geom_type"),
            F.col("_cj").alias("coordinates_json"),
            x.alias("x"),
            y.alias("y"),
            F.col("crs_name"),
        )
    )


def geometry_type_histogram(features: DataFrame) -> DataFrame:
    """Geometry types over ALL rows — replaces the 10-feature sample."""
    return features.groupBy("geom_type").agg(F.count(F.lit(1)).alias("n_features"))


def dominant_geometry_type(features: DataFrame) -> tuple[str, bool]:
    """Returns (staged_type, is_mixed). Mixed files resolve to POLYGON —
    the reference's documented fallback — but report mixedness explicitly
    instead of a log warning."""
    hist = {r["geom_type"]: r["n_features"] for r in geometry_type_histogram(features).collect()}
    staged = {GEOJSON_TO_STAGED_TYPE.get(t, "POLYGON") for t in hist}
    if len(staged) == 1:
        return next(iter(staged)), False
    return "POLYGON", True


def wgs84_plausible(features: DataFrame) -> bool:
    """S10 sniff over all rows: every coordinate within lon/lat bounds."""
    out = features.agg(
        F.min((F.abs(F.col("x")) <= 180) & (F.abs(F.col("y")) <= 90)).alias("all_in_range")
    ).collect()[0]
    return bool(out["all_in_range"])
