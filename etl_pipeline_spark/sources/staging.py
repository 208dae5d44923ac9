"""Staging coordinator (SURVEY.md §2.2 L1, S2, S4): archive extraction and
config-driven format dispatch into DataFrames.

Reference: per-source dispatch on normalized ``staged_data_type``
(etl/loaders/filegdb.py:65-189) with a recursive-glob fallback when config
is silent (:349-429); zip extraction (etl/utils/io.py:87-91); staged-type
inference from format/extension (etl/handlers/file.py:271-287).

Here dispatch returns DataFrames (the staging store is the Spark catalog /
parquet, not a FileGDB), and inference is an explicit, testable function.
"""

from __future__ import annotations

import zipfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from etl_pipeline_spark.sources.geojson import load_feature_collection
from etl_pipeline_spark.sources.gpkg import stage_gpkg


def extract_zip(archive: str, dest: str) -> list[str]:
    """S2: extract into dest, returning extracted paths. Nested archives are
    the caller's loop (mirrors the reference's nested-zip handling)."""
    out = []
    with zipfile.ZipFile(archive) as zf:
        for member in zf.namelist():
            # zip-slip guard: refuse absolute/traversal member paths
            target = Path(dest) / member
            if not target.resolve().is_relative_to(Path(dest).resolve()):
                raise ValueError(f"refusing unsafe zip member path: {member!r}")
            zf.extract(member, dest)
            out.append(str(target))
    return out


def infer_staged_type(filename: str, download_format: str | None = None) -> str:
    """S4: staged-type inference — explicit format wins, then extension
    (etl/handlers/file.py:271-287)."""
    fmt = (download_format or "").lower()
    if fmt in ("gpkg", "geojson"):
        return fmt
    if fmt in ("shp", "shapefile"):
        return "shapefile_collection"
    suffix = Path(filename).suffix.lower()
    if suffix == ".gpkg":
        return "gpkg"
    if suffix in (".geojson", ".json"):
        return "geojson"
    if suffix in (".shp", ".zip"):
        return "shapefile_collection"
    return "geojson"


def glob_stageable_files(root: str) -> list[str]:
    """L1 fallback: recursive glob for stageable payloads when config gives
    no staged type (filegdb.py:349-429). GeoJSON + JSON + GPKG, `unionByName`
    of the two JSON globs in the reference becomes one sorted list."""
    r = Path(root)
    files = (
        list(r.rglob("*.geojson")) + list(r.rglob("*.json")) + list(r.rglob("*.gpkg"))
    )
    return sorted(str(p) for p in files)


def stage_path(
    spark: SparkSession,
    path: str,
    staged_type: str | None = None,
    include: tuple[str, ...] = (),
) -> dict[str, DataFrame]:
    """Dispatch one staged payload into named DataFrames (fc-name → df)."""
    st = staged_type or infer_staged_type(path)
    stem = Path(path).stem
    if st == "geojson":
        return {stem: load_feature_collection(spark, path)}
    if st == "gpkg":
        staged, _missing = stage_gpkg(spark, path, include)
        return staged
    if st == "shapefile_collection":
        from etl_pipeline_spark.sources.shapefile import read_shapefile, stage_shapefile_dir

        p = Path(path)
        if p.is_dir():
            return stage_shapefile_dir(spark, path)
        return {stem: read_shapefile(spark, path)}
    raise ValueError(f"unknown staged type {st!r}")
