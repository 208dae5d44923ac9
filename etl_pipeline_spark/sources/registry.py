"""Source registry — the config data model (SURVEY.md §1.4, F2 fixture).

The reference loads 53 YAML-configured sources into frozen dataclasses
(etl/models.py:42-128) and dispatches handlers per `type`. Here the registry
is a driver-side model that (a) validates config, (b) becomes a small
DataFrame dimension for include/enabled semi-joins, and (c) maps
`staged_data_type` to the `spark.read` format dispatch.

Include lists appear both as real lists and semicolon-joined strings
(etl/models.py:17-32) — both parse here. YAML input is optional (PyYAML is
not a guaranteed dependency); dict/JSON input always works.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

VALID_TYPES = ("file", "rest_api", "ogc_api", "atom_feed")
VALID_STAGED = ("gpkg", "geojson", "shapefile_collection", None)


def parse_include(value: object) -> tuple[str, ...]:
    """Accept list, semicolon-joined string, or None."""
    if value is None:
        return ()
    if isinstance(value, str):
        return tuple(p.strip() for p in value.split(";") if p.strip())
    if isinstance(value, (list, tuple)):
        return tuple(str(v).strip() for v in value if str(v).strip())
    raise TypeError(f"include must be list/str/None, got {type(value).__name__}")


@dataclass(frozen=True)
class SourceConfig:
    name: str
    authority: str
    type: str
    url: str = ""
    enabled: bool = True
    staged_data_type: str | None = None
    include: tuple[str, ...] = field(default=())
    priority: int = 50

    def __post_init__(self) -> None:
        if not self.name:
            raise ValueError("source name must be non-empty")
        if self.type not in VALID_TYPES:
            raise ValueError(f"source {self.name!r}: type {self.type!r} not in {VALID_TYPES}")
        if self.staged_data_type not in VALID_STAGED:
            raise ValueError(
                f"source {self.name!r}: staged_data_type {self.staged_data_type!r} "
                f"not in {VALID_STAGED}"
            )
        if not 1 <= self.priority <= 100:
            raise ValueError(f"source {self.name!r}: priority must be 1-100")


def load_sources(raw: list[dict] | str) -> list[SourceConfig]:
    """From a list of dicts, a JSON string, or a YAML string (if PyYAML is
    importable). Returns enabled-first, priority-descending order — the
    reference's scheduling order."""
    if isinstance(raw, str):
        try:
            parsed = json.loads(raw)
        except json.JSONDecodeError:
            try:
                import yaml  # optional dependency
            except ImportError as exc:
                raise ValueError("string config is not JSON and PyYAML is unavailable") from exc
            parsed = yaml.safe_load(raw)
        raw = parsed.get("sources", parsed) if isinstance(parsed, dict) else parsed
    sources = [
        SourceConfig(
            name=d["name"],
            authority=d.get("authority", ""),
            type=d["type"],
            url=d.get("url", ""),
            enabled=bool(d.get("enabled", True)),
            staged_data_type=d.get("staged_data_type"),
            include=parse_include(d.get("include")),
            priority=int(d.get("priority", 50)),
        )
        for d in raw
    ]
    return sorted(sources, key=lambda s: (not s.enabled, -s.priority, s.name))


def sources_dimension(spark: SparkSession, sources: list[SourceConfig]) -> DataFrame:
    """The registry as a broadcast-sized dimension for include/enabled joins."""
    return spark.createDataFrame(
        [
            (s.name, s.authority, s.type, s.url, s.enabled, s.staged_data_type,
             list(s.include), s.priority)
            for s in sources
        ],
        "name string, authority string, type string, url string, enabled boolean, "
        "staged_data_type string, include array<string>, priority int",
    )
