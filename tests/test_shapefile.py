"""Shapefile parser test: write spec-conformant .shp/.dbf bytes, read back."""

from __future__ import annotations

import json
import struct
from pathlib import Path

from etl_pipeline_spark.sources.shapefile import find_shapefiles, read_shapefile
from etl_pipeline_spark.sources.staging import stage_path


def _shp_bytes(records: list[bytes]) -> bytes:
    """ESRI .shp container: 100-byte header + given record contents."""
    body = b""
    for i, content in enumerate(records, start=1):
        body += struct.pack(">ii", i, len(content) // 2) + content
    total_words = (100 + len(body)) // 2
    header = struct.pack(">iiiiiii", 9994, 0, 0, 0, 0, 0, total_words)
    header += struct.pack("<ii", 1000, 1)  # version, shape type (unused globally here)
    header += struct.pack("<8d", 0, 0, 0, 0, 0, 0, 0, 0)  # bbox + ranges
    return header + body


def _point(x: float, y: float) -> bytes:
    return struct.pack("<idd", 1, x, y)


def _polygon(rings: list[list[tuple[float, float]]]) -> bytes:
    pts = [p for ring in rings for p in ring]
    parts, acc = [], 0
    for ring in rings:
        parts.append(acc)
        acc += len(ring)
    out = struct.pack("<i", 5)
    out += struct.pack("<4d", 0, 0, 10, 10)  # bbox
    out += struct.pack("<ii", len(rings), len(pts))
    out += struct.pack(f"<{len(parts)}i", *parts)
    out += struct.pack(f"<{2*len(pts)}d", *[v for p in pts for v in p])
    return out


def _dbf_bytes(fields: list[tuple[str, str, int]], rows: list[tuple]) -> bytes:
    header_size = 32 + 32 * len(fields) + 1
    record_size = 1 + sum(l for _, _, l in fields)
    out = struct.pack("<B3BIHH20x", 3, 24, 1, 1, len(rows), header_size, record_size)
    for name, ftype, length in fields:
        out += name.encode().ljust(11, b"\x00") + ftype.encode()
        out += b"\x00" * 4 + bytes([length]) + b"\x00" * 15
    out += b"\x0d"
    for row in rows:
        out += b" "
        for (name, ftype, length), val in zip(fields, row):
            s = ("" if val is None else str(val))[:length]
            out += s.rjust(length).encode("latin-1") if ftype == "N" else s.ljust(length).encode("latin-1")
    return out


def _write_fixture(dirpath: Path, name: str) -> Path:
    shp = dirpath / f"{name}.shp"
    shp.write_bytes(
        _shp_bytes(
            [
                _point(17.5, 59.25),
                _polygon([[(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]]),
            ]
        )
    )
    (dirpath / f"{name}.dbf").write_bytes(
        _dbf_bytes(
            [("NAMN", "C", 20), ("AREAL", "N", 8)],
            [("Åker väg", 12), ("Sjöyta", 340)],
        )
    )
    return shp


def test_read_shapefile(spark, tmp_path):
    shp = _write_fixture(tmp_path, "marker")
    df = read_shapefile(spark, str(shp))
    rows = df.collect()
    assert len(rows) == 2
    point, poly = rows
    assert point.geom_type == "Point" and point.x == 17.5 and point.y == 59.25
    assert point.NAMN == "Åker väg" and point.AREAL == 12
    assert poly.geom_type == "Polygon" and poly.AREAL == 340
    ring = json.loads(poly.rings_json)[0]
    assert ring[0] == [0.0, 0.0] and len(ring) == 5


def test_stage_dispatch_shapefile(spark, tmp_path):
    _write_fixture(tmp_path, "lager")
    (tmp_path / "nested").mkdir()
    _write_fixture(tmp_path / "nested", "inner")
    assert [Path(p).stem for p in find_shapefiles(str(tmp_path))] == ["lager", "inner"] or [
        Path(p).stem for p in find_shapefiles(str(tmp_path))
    ] == ["inner", "lager"]
    staged = stage_path(spark, str(tmp_path), "shapefile_collection")
    assert sorted(staged) == ["inner", "lager"]
    assert staged["lager"].count() == 2


def test_bad_file_refused(spark, tmp_path):
    bad = tmp_path / "x.shp"
    bad.write_bytes(b"\x00" * 128)
    import pytest

    with pytest.raises(ValueError, match="not a shapefile"):
        read_shapefile(spark, str(bad))
