"""Shapefile staging loader (SURVEY.md §2.2 L4) — pure-Python ESRI parser.

The reference shells out to ArcPy `CopyFeatures` for `.shp` collections
(etl/loaders/shapefile_loader.py:56-219). No GDAL/pyogrio lives in this
container, so this module parses the two public formats directly:

- `.shp` (ESRI Shapefile spec, 1998): 100-byte header (file code 9994,
  shape type), then records of big-endian record headers + little-endian
  shapes. Supported shapes: Null (0), Point (1), PolyLine (3), Polygon (5),
  MultiPoint (8) — the types the reference's sources ship.
- `.dbf` (dBase III): 32-byte header + 32-byte field descriptors,
  fixed-width latin-1 records; C/N/F/L/D field types.

Records parse on the driver (staging shapefiles are config-scale); for bulk
collections, `stage_shapefile_dir` parallelizes *across files* — the natural
shapefile unit of parallelism, since the format itself is not splittable
without the `.shx` offset index.
"""

from __future__ import annotations

import json
import struct
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

SHAPE_TYPES = {0: "Null", 1: "Point", 3: "LineString", 5: "Polygon", 8: "MultiPoint"}


def _read_dbf(path: Path) -> list[dict]:
    """dBase III attribute records (deleted rows skipped).

    Malformed input contract (fuzz-pinned, tests/test_parser_fuzz.py):
    structural violations raise ``ValueError``; a record COUNT that
    overclaims the file is capped to the bytes actually present (common
    in the wild, and an unchecked u32 count is a billion-iteration
    hang); junk in numeric fields degrades to NULL like every DBF
    reader, never a crash.
    """
    if not path.exists():
        return []
    data = path.read_bytes()
    if len(data) < 32:
        raise ValueError(f"{path}: truncated DBF header ({len(data)} bytes)")
    n_records = struct.unpack_from("<I", data, 4)[0]
    header_size = struct.unpack_from("<H", data, 8)[0]
    record_size = struct.unpack_from("<H", data, 10)[0]
    fields = []
    off = 32
    while off < header_size - 1 and off < len(data) and data[off] != 0x0D:
        if off + 17 > len(data):
            raise ValueError(f"{path}: truncated DBF field descriptor at {off}")
        name = data[off : off + 11].split(b"\x00")[0].decode("latin-1")
        ftype = chr(data[off + 11])
        length = data[off + 16]
        fields.append((name, ftype, length))
        off += 32
    # never trust the header's count past the bytes that exist
    avail = max(0, len(data) - header_size)
    n_records = min(n_records, avail // max(record_size, 1))
    records = []
    base = header_size
    for i in range(n_records):
        rec = data[base + i * record_size : base + (i + 1) * record_size]
        if not rec or rec[0:1] == b"*":  # deletion flag
            continue
        row, pos = {}, 1
        for name, ftype, length in fields:
            raw = rec[pos : pos + length].decode("latin-1").strip()
            pos += length
            if ftype in ("N", "F"):
                try:
                    row[name] = float(raw) if raw not in ("", "*") else None
                except ValueError:  # junk digits → NULL, not a crash
                    row[name] = None
                if row[name] is not None and ftype == "N" and "." not in raw:
                    row[name] = int(row[name])
            elif ftype == "L":
                row[name] = raw.upper() in ("T", "Y") if raw else None
            else:  # C, D and anything else → string
                row[name] = raw or None
        records.append(row)
    return records


def _read_shp(path: Path) -> list[dict]:
    """Geometry records: type, representative x/y, parts as ring JSON.

    Malformed input contract (fuzz-pinned, tests/test_parser_fuzz.py):
    every structural violation — truncated header, record extending past
    the file, non-positive record length (the unchecked case is an
    infinite loop: the offset stops advancing), part/point counts whose
    coordinates don't fit in the record — raises ``ValueError`` naming
    the offset, never a raw ``struct.error`` and never a hang. The
    staging coordinator treats ValueError as reject-this-file.
    """
    data = path.read_bytes()
    if len(data) < 100:
        raise ValueError(f"{path}: truncated shapefile header ({len(data)} bytes)")
    file_code = struct.unpack_from(">i", data, 0)[0]
    if file_code != 9994:
        raise ValueError(f"{path} is not a shapefile (file code {file_code})")
    # header file length is in 16-bit words
    file_len = struct.unpack_from(">i", data, 24)[0] * 2
    if file_len > len(data):
        raise ValueError(
            f"{path}: truncated shapefile (header claims {file_len} bytes, "
            f"file has {len(data)})"
        )
    shapes = []
    off = 100
    while off < file_len:
        if off + 12 > file_len:
            raise ValueError(f"{path}: truncated record header at offset {off}")
        _recno, content_len = struct.unpack_from(">ii", data, off)
        off += 8
        rec_end = off + content_len * 2
        if content_len < 2 or rec_end > file_len:
            raise ValueError(
                f"{path}: malformed record at offset {off - 8} "
                f"(content length {content_len} words)"
            )
        shape_type = struct.unpack_from("<i", data, off)[0]
        geom: dict = {"geom_type": SHAPE_TYPES.get(shape_type, f"Unknown{shape_type}")}
        if shape_type == 1:  # Point
            if off + 20 > rec_end:
                raise ValueError(f"{path}: truncated Point record at offset {off}")
            x, y = struct.unpack_from("<dd", data, off + 4)
            geom.update(x=x, y=y, rings_json=None)
        elif shape_type in (3, 5):  # PolyLine / Polygon
            if off + 44 > rec_end:
                raise ValueError(f"{path}: truncated shape record at offset {off}")
            num_parts, num_points = struct.unpack_from("<ii", data, off + 36)
            pts_off = off + 44 + 4 * num_parts
            if num_parts < 0 or num_points < 0 or pts_off + 16 * num_points > rec_end:
                raise ValueError(
                    f"{path}: part/point counts ({num_parts}/{num_points}) "
                    f"exceed record at offset {off}"
                )
            parts = struct.unpack_from(f"<{num_parts}i", data, off + 44)
            pts = struct.unpack_from(f"<{2 * num_points}d", data, pts_off)
            coords = [[pts[2 * i], pts[2 * i + 1]] for i in range(num_points)]
            rings = [
                coords[parts[p] : (parts[p + 1] if p + 1 < num_parts else num_points)]
                for p in range(num_parts)
            ]
            geom.update(
                x=coords[0][0] if coords else None,
                y=coords[0][1] if coords else None,
                rings_json=json.dumps(rings),
            )
        elif shape_type == 8:  # MultiPoint
            if off + 40 > rec_end:
                raise ValueError(f"{path}: truncated MultiPoint record at offset {off}")
            num_points = struct.unpack_from("<i", data, off + 36)[0]
            if num_points < 0 or off + 40 + 16 * num_points > rec_end:
                raise ValueError(
                    f"{path}: point count ({num_points}) exceeds record at offset {off}"
                )
            pts = struct.unpack_from(f"<{2 * num_points}d", data, off + 40)
            coords = [[pts[2 * i], pts[2 * i + 1]] for i in range(num_points)]
            geom.update(
                x=coords[0][0] if coords else None,
                y=coords[0][1] if coords else None,
                rings_json=json.dumps([coords]),
            )
        else:  # Null or unsupported → attributes-only row
            geom.update(x=None, y=None, rings_json=None)
        shapes.append(geom)
        off = rec_end
    return shapes


def read_shapefile(spark: SparkSession, shp_path: str) -> DataFrame:
    """One DataFrame per shapefile: dbf attributes + geom_type/x/y/rings."""
    shp = Path(shp_path)
    shapes = _read_shp(shp)
    attrs = _read_dbf(shp.with_suffix(".dbf"))
    rows = []
    for i, geom in enumerate(shapes):
        row = dict(attrs[i]) if i < len(attrs) else {}
        row.update(geom)
        rows.append(row)
    if not rows:
        return spark.createDataFrame(
            [], "geom_type string, x double, y double, rings_json string"
        )
    # stable column order: attributes (dbf order) then geometry columns
    cols = list(rows[0].keys())
    return spark.createDataFrame([tuple(r.get(c) for c in cols) for r in rows]).toDF(*cols)


def find_shapefiles(root: str) -> list[str]:
    """Recursive *.shp discovery (shapefile_loader.py:56-110), sorted for
    deterministic staging order."""
    return sorted(str(p) for p in Path(root).rglob("*.shp"))


def stage_shapefile_dir(spark: SparkSession, root: str) -> dict[str, DataFrame]:
    """L4: every shapefile under root → named DataFrame (parallel unit =
    file; the format is unsplittable without .shx)."""
    return {Path(p).stem: read_shapefile(spark, p) for p in find_shapefiles(root)}
