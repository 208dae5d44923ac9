"""Paged REST API as a first-class Spark data source (Python Data Source
API, Spark 4) — SURVEY.md §4 "custom work #2".

The reference fetches REST layers with driver-side thread pools
(etl/handlers/rest_api.py:329-457); registered as a DataSource the same
protocol becomes:

    spark.dataSource.register(PagedRestDataSource)
    df = (spark.read.format("paged_rest")
          .option("service_url", url)
          .option("transport_factory", "pkg.module:factory")
          .load()
          .filter("x BETWEEN 16 AND 19 AND fid >= 10"))

- **partition per layer** → executor-side pagination (the thread pool
  disappears; a 50-layer service scans as 50 parallel tasks);
- **filter pushdown** (`pushFilters`, Spark 4.1): range/equality predicates
  on `fid` become a server-side `where` clause; `x`/`y` bounds become the
  bbox envelope — exactly the manual pushdown the reference builds by hand
  (rest_api.py:189-209), now driven by Catalyst;
- the HTTP transport is built lazily from a `module:callable` option so the
  reader pickles cleanly to executors (the callable receives the options
  dict and returns a Transport).

`file_transport` serves canned JSON from a directory and applies
where/bbox/offset server-side — a faithful stand-in for a live ArcGIS
endpoint in tests (and records what the "server" was asked, so pushdown is
observable).
"""

from __future__ import annotations

import json
import re
from collections.abc import Iterator
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql.datasource import DataSource, DataSourceReader, EqualTo, Filter, InputPartition

from etl_pipeline_spark.sources.fetchers import RestApiFetcher
from etl_pipeline_spark.utils.udfpickle import pickle_module_by_value

# the reader (and the fetcher it drives) execute on Python workers that may
# not have this package on sys.path — ship both modules by value
pickle_module_by_value("etl_pipeline_spark.sources.fetchers")
pickle_module_by_value(__name__)

try:  # Spark 4.1 filter classes
    from pyspark.sql.datasource import (
        GreaterThan,
        GreaterThanOrEqual,
        LessThan,
        LessThanOrEqual,
    )

    _RANGE_FILTERS = True
except ImportError:  # pragma: no cover - older API: only EqualTo available
    _RANGE_FILTERS = False

DEFAULT_SCHEMA = "fid bigint, x double, y double, props string"


@dataclass
class _LayerPartition(InputPartition):
    layer_id: int


# Built-in factories resolve WITHOUT an import: Python workers receive this
# module by value (no sys.path entry), and cloudpickle ships this dict —
# and the factories it references — along with the reader. External
# factories use "module:callable" and must be importable on the workers.
_BUILTIN_FACTORIES: dict = {}


def _load_factory(spec: str):
    if spec in _BUILTIN_FACTORIES:
        return _BUILTIN_FACTORIES[spec]
    mod_name, _, fn_name = spec.partition(":")
    import importlib

    return getattr(importlib.import_module(mod_name), fn_name)


class PagedRestReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = dict(options)
        self.where_parts: list[str] = []
        self.bbox = {"xmin": None, "ymin": None, "xmax": None, "ymax": None}
        # resolve the factory on the DRIVER: the callable (not the import
        # path) ships to executors, so they never import by module name
        self._factory = _load_factory(self.options["transport_factory"])

    # -------------------------------------------------- filter pushdown
    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            if not self._try_push(f):
                yield f  # unsupported → Spark re-applies it

    def _try_push(self, f: Filter) -> bool:
        ops = {EqualTo: "="}
        if _RANGE_FILTERS:
            ops.update(
                {
                    GreaterThan: ">",
                    GreaterThanOrEqual: ">=",
                    LessThan: "<",
                    LessThanOrEqual: "<=",
                }
            )
        op = ops.get(type(f))
        if op is None or len(f.attribute) != 1:
            return False
        col, val = f.attribute[0], f.value
        if col == "fid" and isinstance(val, (int, float)):
            self.where_parts.append(f"fid {op} {val}")
            return True
        if col in ("x", "y") and isinstance(val, (int, float)) and op in (">=", "<=", ">", "<"):
            side = ("min" if op.startswith(">") else "max")
            self.bbox[f"{col}{side}"] = float(val)
            return True
        return False

    # ------------------------------------------------------- partitions
    def _transport(self):
        return self._factory(self.options)

    def partitions(self) -> list[InputPartition]:
        ids_opt = self.options.get("layer_ids")
        if ids_opt:
            return [_LayerPartition(int(i)) for i in ids_opt.split(",")]
        meta = self._transport().get_json(self.options["service_url"], {"f": "json"})
        layers = [int(l["id"]) for l in meta.get("layers", [])] or [0]
        return [_LayerPartition(i) for i in layers]

    # ------------------------------------------------------------- read
    def read(self, partition: _LayerPartition) -> Iterator[tuple]:
        bbox = None
        if any(v is not None for v in self.bbox.values()):
            bbox = (
                self.bbox["xmin"] if self.bbox["xmin"] is not None else -1e9,
                self.bbox["ymin"] if self.bbox["ymin"] is not None else -1e9,
                self.bbox["xmax"] if self.bbox["xmax"] is not None else 1e9,
                self.bbox["ymax"] if self.bbox["ymax"] is not None else 1e9,
            )
        fetcher = RestApiFetcher(
            self._transport(),
            self.options["service_url"],
            where=" AND ".join(self.where_parts) or "1=1",
            bbox=bbox,
        )
        for feat in fetcher.fetch_layer(partition.layer_id):
            props = feat.get("properties", {})
            coords = (feat.get("geometry") or {}).get("coordinates") or [None, None]
            yield (
                props.get("fid"),
                coords[0],
                coords[1],
                json.dumps(props, ensure_ascii=False, sort_keys=True),
            )


class PagedRestDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "paged_rest"

    def schema(self) -> str:
        return self.options.get("schema", DEFAULT_SCHEMA)

    def reader(self, schema) -> PagedRestReader:
        return PagedRestReader(self.options)


# --------------------------------------------------------------------------
# File-served transport: a canned "ArcGIS server" on disk that honors
# where/bbox/pagination server-side and logs every query it answers.
# Layout: {dir}/service.json, {dir}/layer{N}.json, {dir}/layer{N}_features.json
# --------------------------------------------------------------------------
_CMP = {
    "=": lambda a, b: a == b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
}
_WHERE_RE = re.compile(r"(\w+)\s*(>=|<=|=|>|<)\s*(-?[0-9.]+)")


class FileServedTransport:
    def __init__(self, base_dir: str):
        self.base = Path(base_dir)

    def _log(self, entry: dict) -> None:
        import os
        import uuid

        logdir = self.base / "query_log"
        logdir.mkdir(exist_ok=True)
        (logdir / f"{os.getpid()}_{uuid.uuid4().hex}.json").write_text(json.dumps(entry))

    def get_json(self, url: str, params: dict | None = None) -> dict:
        params = params or {}
        if url.endswith("/query"):
            layer_id = url.rstrip("/query").rsplit("/", 1)[-1]
            feats = json.loads((self.base / f"layer{layer_id}_features.json").read_text())
            where = params.get("where", "1=1")
            kept = []
            for f in feats:
                ok = True
                for col, op, val in _WHERE_RE.findall(where):
                    if col == "1":
                        continue
                    have = f.get("properties", {}).get(col)
                    ok = ok and have is not None and _CMP[op](float(have), float(val))
                if ok and "geometry" in params:
                    xmin, ymin, xmax, ymax = (float(v) for v in params["geometry"].split(","))
                    cx, cy = f["geometry"]["coordinates"][:2]
                    ok = xmin <= cx <= xmax and ymin <= cy <= ymax
                if ok:
                    kept.append(f)
            off = int(params.get("resultOffset", 0))
            cnt = int(params.get("resultRecordCount", 1000))
            page = kept[off : off + cnt]
            self._log(
                {"layer": layer_id, "where": where, "bbox": params.get("geometry"),
                 "served": len(page), "matched": len(kept)}
            )
            return {"features": page, "exceededTransferLimit": off + len(page) < len(kept)}
        if re.search(r"/\d+$", url):
            lid = url.rsplit("/", 1)[-1]
            return json.loads((self.base / f"layer{lid}.json").read_text())
        return json.loads((self.base / "service.json").read_text())

    def head_headers(self, url: str) -> dict:
        return {}


def file_transport(options: dict) -> FileServedTransport:
    """transport_factory entry point: serve from option `transport_dir`."""
    return FileServedTransport(options["transport_dir"])


_BUILTIN_FACTORIES["file"] = file_transport
