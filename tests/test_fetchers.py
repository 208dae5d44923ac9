"""Fetcher protocol semantics (S1-S11) with a fake transport — mirrors the
reference's mocked-HTTP integration tests (tests/integration/ in the ref)."""

from __future__ import annotations

import json

import pytest

from etl_pipeline_spark.sources.fetchers import (
    OgcApiFetcher,
    RestApiFetcher,
    atom_resource_urls,
    normalize_crs_uri,
    true_filename,
    write_landing_json,
)
from etl_pipeline_spark.utils.resilience import (
    CircuitBreaker,
    CircuitOpenError,
    RetryPolicy,
    retry_call,
)


class FakeTransport:
    """Programmable transport: url(+params) → canned JSON; records calls."""

    def __init__(self, routes, headers=None):
        self.routes = routes
        self.headers = headers or {}
        self.calls = []

    def get_json(self, url, params=None):
        self.calls.append((url, dict(params or {})))
        for matcher, payload in self.routes:
            if matcher(url, params or {}):
                return payload(url, params or {}) if callable(payload) else payload
        raise AssertionError(f"no route for {url} {params}")

    def head_headers(self, url):
        return self.headers.get(url, {})


# ---------------------------------------------------------------- REST (S5-S7)
def _rest_transport(n_features=12, page_size=5):
    """Service with 1 layer; layer metadata page_size; paged query results."""

    def is_service(url, params):
        return url.endswith("/FeatureServer") and params.get("f") == "json"

    def is_layer_meta(url, params):
        return url.endswith("/FeatureServer/3") and params.get("f") == "json"

    def is_query(url, params):
        return url.endswith("/3/query")

    def query_payload(url, params):
        off = params["resultOffset"]
        cnt = params["resultRecordCount"]
        feats = [
            {"type": "Feature", "properties": {"fid": i}}
            for i in range(off, min(off + cnt, n_features))
        ]
        return {
            "features": feats,
            "exceededTransferLimit": off + len(feats) < n_features,
        }

    return FakeTransport(
        [
            (is_service, {"layers": [{"id": 3, "name": "roads"}], "maxRecordCount": 5000}),
            (is_layer_meta, {"maxRecordCount": page_size}),
            (is_query, query_payload),
        ]
    )


def test_rest_pagination_loop(tmp_path):
    t = _rest_transport(n_features=12, page_size=5)
    f = RestApiFetcher(t, "https://x/FeatureServer", where="typ='road'", out_fields="fid,name")
    assert f.resolve_layers() == [3]
    feats = f.fetch_layer(3)
    assert [ft["properties"]["fid"] for ft in feats] == list(range(12))
    assert f.pages_fetched == 3  # 5 + 5 + 2
    # pushdown params reach the server on every page
    q = [p for (u, p) in t.calls if u.endswith("/query")]
    assert all(p["where"] == "typ='road'" and p["outFields"] == "fid,name" for p in q)


def test_rest_bbox_pushdown_and_landing(tmp_path):
    t = _rest_transport(n_features=3, page_size=5)
    f = RestApiFetcher(t, "https://x/FeatureServer", bbox=(17.0, 59.0, 18.0, 60.0))
    out = f.fetch_all(str(tmp_path), "roads")
    q = [p for (u, p) in t.calls if u.endswith("/query")]
    assert q[0]["geometry"] == "17.0,59.0,18.0,60.0"
    assert q[0]["spatialRel"] == "esriSpatialRelIntersects"
    doc = json.loads(out[3].read_text())
    assert len(doc["features"]) == 3
    # idempotence: second fetch skips the write (same path, no error)
    assert f.fetch_all(str(tmp_path), "roads")[3] == out[3]


def test_rest_max_record_count_resolution():
    t = _rest_transport()
    assert RestApiFetcher(t, "u", max_record_count=77).resolve_max_records({}) == 77
    f = RestApiFetcher(t, "u")
    assert f.resolve_max_records({"maxRecordCount": 800}) == 800
    assert f.resolve_max_records({"maxRecordCount": 10**6}) == 5000  # capped at default
    assert f.resolve_max_records({}) == 2000  # fallback
    assert f.resolve_max_records({"maxRecordCount": 0}) == 2000


def test_rest_featureserver_fallback():
    t = FakeTransport([(lambda u, p: True, {})])
    assert RestApiFetcher(t, "https://x/FeatureServer").resolve_layers() == [0]


# ---------------------------------------------------------------- OGC (S8-S9)
def _ogc_transport():
    base = "https://api/ogc"
    items1 = {
        "features": [{"properties": {"i": 1}}, {"properties": {"i": 2}}],
        "links": [{"rel": "next", "href": "items?limit=2&offset=2"}],
    }
    items2 = {"features": [{"properties": {"i": 3}}], "links": []}
    return FakeTransport(
        [
            (
                lambda u, p: u == f"{base}/collections",
                {"collections": [{"id": "Lakes"}, {"id": "roads"}]},
            ),
            (lambda u, p: "offset=2" in u, items2),
            (lambda u, p: "/collections/Lakes/items" in u, items1),
        ]
    )


def test_ogc_include_filter_and_missing():
    f = OgcApiFetcher(_ogc_transport(), "https://api/ogc", include=("lakes", "rivers"))
    selected, missing = f.select_collections()
    assert selected == ["Lakes"]  # case-insensitive include match
    assert missing == ["rivers"]  # configured ∖ found anti-set


def test_ogc_link_pagination_and_bbox():
    t = _ogc_transport()
    f = OgcApiFetcher(
        t, "https://api/ogc", include=("Lakes",), bbox=(16, 58, 19, 61), bbox_crs="EPSG:3006"
    )
    feats = f.fetch_collection("Lakes")
    assert [ft["properties"]["i"] for ft in feats] == [1, 2, 3]
    assert f.pages_fetched == 2
    first_url = t.calls[0][0] if "/items" in t.calls[0][0] else t.calls[1][0]
    assert "bbox=16,58,19,61" in first_url
    assert "EPSG%2F0%2F3006" in first_url  # normalized CRS URI, percent-encoded


def test_normalize_crs_uri():
    assert normalize_crs_uri("CRS84").endswith("OGC/1.3/CRS84")
    assert normalize_crs_uri("EPSG:3006").endswith("EPSG/0/3006")
    assert normalize_crs_uri("3010").endswith("EPSG/0/3010")
    assert normalize_crs_uri("http://www.opengis.net/def/crs/EPSG/9.9.1/4326").endswith(
        "EPSG/0/4326"
    )


# ---------------------------------------------------------------- Atom (S11)
ATOM = """<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom">
  <entry><link rel="enclosure" href="https://d/a.zip"/><link href="https://d/ignored"/></entry>
  <entry><link href="https://d/b.gpkg"/></entry>
  <entry><link rel="enclosure" href="https://d/a.zip"/></entry>
</feed>"""


def test_atom_dedupe():
    assert atom_resource_urls(ATOM) == ["https://d/a.zip", "https://d/b.gpkg"]


# ------------------------------------------------------- filenames (S3) + S1
def test_true_filename_variants():
    t = FakeTransport([], headers={
        "https://a": {"Content-Disposition": "attachment; filename*=UTF-8''sv%C3%A5r%20fil.gpkg"},
        "https://b": {"Content-Disposition": 'attachment; filename="plain.zip"'},
    })
    assert true_filename(t, "https://a") == "svår fil.gpkg"
    assert true_filename(t, "https://b") == "plain.zip"
    assert true_filename(t, "https://host/path/to/data%20set.json?x=1") == "data set.json"


def test_landing_idempotence(tmp_path):
    p1 = write_landing_json(str(tmp_path), "x", {"v": 1})
    p2 = write_landing_json(str(tmp_path), "x", {"v": 2})  # skipped
    assert p1 == p2 and json.loads(p1.read_text()) == {"v": 1}
    write_landing_json(str(tmp_path), "x", {"v": 3}, overwrite=True)
    assert json.loads(p1.read_text()) == {"v": 3}


# ----------------------------------------------------------- resilience (R1/R2)
def test_retry_backoff_sequence():
    delays = []
    attempts = {"n": 0}

    def flaky():
        attempts["n"] += 1
        if attempts["n"] < 4:
            raise ConnectionError("nope")
        return "ok"

    out = retry_call(
        flaky,
        RetryPolicy(max_attempts=5, base_delay=2.0, factor=2.0, max_delay=120.0),
        sleep=delays.append,
    )
    assert out == "ok"
    assert delays == [2.0, 4.0, 8.0]  # base * factor^(n-1)


def test_retry_unrecoverable_raises_immediately():
    with pytest.raises(ValueError):
        retry_call(lambda: (_ for _ in ()).throw(ValueError("fatal")), sleep=lambda d: None)


def test_circuit_breaker_states():
    now = {"t": 0.0}
    cb = CircuitBreaker(failure_threshold=2, recovery_timeout=60, clock=lambda: now["t"])

    def boom():
        raise ConnectionError("x")

    for _ in range(2):
        with pytest.raises(ConnectionError):
            cb.call(boom)
    assert cb.state == "OPEN"
    with pytest.raises(CircuitOpenError):
        cb.call(lambda: "fine")
    now["t"] = 61.0  # recovery timeout elapsed → HALF_OPEN probe allowed
    assert cb.state == "HALF_OPEN"
    assert cb.call(lambda: "fine") == "fine"
    assert cb.state == "CLOSED"
