"""GeoPackage (SQLite) staging loader (SURVEY.md §2.2 L3).

The reference copies GPKG feature classes through ArcPy with a 3-strategy
name fallback (etl/loaders/gpkg_loader.py:24-77) and include-filtering
(:193-218). A GeoPackage is just SQLite with spec'd catalog tables, so this
loader needs no GDAL: the stdlib ``sqlite3`` reads the catalog
(``gpkg_contents``) and the feature tables.

Kept semantics:
- feature-class listing from ``gpkg_contents`` (falling back to
  ``sqlite_master`` for bare SQLite files);
- ``main.`` prefix stripping (gpkg_loader.py:21,127);
- case-insensitive include filter (the semi-join semantics, :193-218).

Scale path: small/medium tables read on the driver into Arrow and
parallelize; large tables read *on executors* partitioned by rowid ranges
(``load_table_distributed``) — each task opens the file and scans its slice,
so a 100 GB GeoPackage becomes N parallel range scans with no driver
materialization. (On a cluster the .gpkg must be on shared/local storage per
executor — the same constraint any non-splittable local format has.)
"""

from __future__ import annotations

import os
import re
import sqlite3
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_MAIN_PREFIX = re.compile(r"^main\.", re.IGNORECASE)


def strip_main_prefix(name: str) -> str:
    return _MAIN_PREFIX.sub("", name)


def _connect_ro(gpkg_path: str) -> sqlite3.Connection:
    """Read-only connection with a staging-grade contract (fuzz-pinned,
    tests/test_parser_fuzz.py): a missing path raises FileNotFoundError —
    plain ``sqlite3.connect`` would silently CREATE an empty database
    file, leaving a corrupt artifact in the staging area — and the
    mode=ro URI guarantees no loader code path can mutate the source."""
    if not os.path.exists(gpkg_path):
        raise FileNotFoundError(f"GeoPackage not found: {gpkg_path}")
    return sqlite3.connect(f"file:{gpkg_path}?mode=ro", uri=True)


def list_feature_classes(gpkg_path: str) -> list[str]:
    """Feature classes from gpkg_contents; plain tables when the file is
    bare SQLite (the reference's accessibility-validation fallback).
    Non-SQLite bytes raise ValueError, not a raw sqlite3.DatabaseError."""
    with _connect_ro(gpkg_path) as con:
        try:
            rows = con.execute(
                "SELECT table_name FROM gpkg_contents WHERE data_type = 'features'"
            ).fetchall()
        except sqlite3.OperationalError:
            try:
                rows = con.execute(
                    "SELECT name FROM sqlite_master WHERE type='table' "
                    "AND name NOT LIKE 'sqlite_%' AND name NOT LIKE 'gpkg_%'"
                ).fetchall()
            except sqlite3.DatabaseError as exc:
                raise ValueError(f"not a SQLite/GeoPackage file: {gpkg_path}") from exc
        except sqlite3.DatabaseError as exc:
            raise ValueError(f"not a SQLite/GeoPackage file: {gpkg_path}") from exc
    return [strip_main_prefix(r[0]) for r in rows]


def select_feature_classes(
    gpkg_path: str, include: tuple[str, ...] = ()
) -> tuple[list[str], list[str]]:
    """(selected, missing) under the case-insensitive include filter."""
    found = list_feature_classes(gpkg_path)
    if not include:
        return found, []
    lower = {f.lower(): f for f in found}
    wanted = [strip_main_prefix(i).lower() for i in include]
    selected = [lower[w] for w in wanted if w in lower]
    missing = [i for i, w in zip(include, wanted) if w not in lower]
    return selected, missing


def _table_columns(gpkg_path: str, table: str) -> list[tuple[str, str]]:
    with _connect_ro(gpkg_path) as con:
        info = con.execute(f'PRAGMA table_info("{table}")').fetchall()
    return [(r[1], (r[2] or "").upper()) for r in info]


def load_table(spark: SparkSession, gpkg_path: str, table: str) -> DataFrame:
    """Driver-side read (config-scale tables): sqlite3 → pandas → DataFrame.
    Geometry BLOBs survive as binary columns."""
    with _connect_ro(gpkg_path) as con:
        pdf = pd.read_sql_query(f'SELECT * FROM "{table}"', con)
    for col in pdf.columns:
        if pdf[col].dtype == object:
            vals = pdf[col].dropna()
            if not vals.empty and isinstance(vals.iloc[0], (bytes, memoryview)):
                pdf[col] = pdf[col].map(lambda v: bytes(v) if v is not None else None)
    return spark.createDataFrame(pdf)


def load_table_distributed(
    spark: SparkSession, gpkg_path: str, table: str, num_partitions: int = 16
) -> DataFrame:
    """Executor-side partitioned read: split the rowid range into
    ``num_partitions`` slices, each scanned by its own task."""
    with _connect_ro(gpkg_path) as con:
        lo, hi = con.execute(f'SELECT MIN(rowid), MAX(rowid) FROM "{table}"').fetchone()
    if lo is None:
        return load_table(spark, gpkg_path, table).limit(0)
    step = max(1, (hi - lo + 1) // num_partitions)
    bounds = [(s, min(s + step - 1, hi)) for s in range(lo, hi + 1, step)]
    ranges = spark.createDataFrame(bounds, "lo bigint, hi bigint").repartition(len(bounds))

    path, tbl = gpkg_path, table  # close over plain strings only

    def _scan(batches):
        import sqlite3 as _sq

        import pandas as _pd

        for pdf in batches:
            for _, row in pdf.iterrows():
                # mode=ro mirrors the driver-side contract: no executor
                # can create or mutate the source file
                with _sq.connect(f"file:{path}?mode=ro", uri=True) as con:
                    part = _pd.read_sql_query(
                        f'SELECT * FROM "{tbl}" WHERE rowid BETWEEN ? AND ?',
                        con,
                        params=(int(row["lo"]), int(row["hi"])),
                    )
                for col in part.columns:
                    if part[col].dtype == object:
                        vals = part[col].dropna()
                        if not vals.empty and isinstance(vals.iloc[0], (bytes, memoryview)):
                            part[col] = part[col].map(
                                lambda v: bytes(v) if v is not None else None
                            )
                yield part

    schema = load_table(spark, gpkg_path, table).limit(0).schema
    return ranges.mapInPandas(_scan, schema=schema)


def stage_gpkg(
    spark: SparkSession, gpkg_path: str, include: tuple[str, ...] = ()
) -> tuple[dict[str, DataFrame], list[str]]:
    """L3 end-to-end: select + load every feature class; returns
    ({fc_name: DataFrame}, missing_includes)."""
    selected, missing = select_feature_classes(gpkg_path, include)
    return {fc: load_table(spark, gpkg_path, fc) for fc in selected}, missing
