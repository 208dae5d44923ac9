"""Drive the new library surfaces through public package imports, fresh process."""
import json, sys, tempfile, os
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

wh = tempfile.mkdtemp()
spark = (SparkSession.builder.master("local[4]").appName("surface-drive")
         .config("spark.sql.warehouse.dir", wh)
         .config("spark.sql.session.timeZone", "Asia/Kolkata")  # hostile half-hour offset tz
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

# 1. sinks: replace → truncate_and_load → append through the catalog
from etl_pipeline_spark.sinks import replace, truncate_and_load, append, discover_tables
spark.sql("CREATE DATABASE sde_demo")
df = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, name string")
print("replace:", replace(df, "sde_demo.fc"))
print("truncate_and_load:", truncate_and_load(spark.createDataFrame([(9, "z")], "id bigint, name string"), "sde_demo.fc"))
print("append:", append(spark.createDataFrame([(10, "y")], "id bigint, name string"), "sde_demo.fc"))
print("table rows:", sorted((r.id, r.name) for r in spark.table("sde_demo.fc").collect()))
print("discover:", discover_tables(spark, "sde_demo"))

# 2. geojson normalizer on a file written here
from etl_pipeline_spark.sources.geojson import load_feature_collection, dominant_geometry_type
p = os.path.join(tempfile.mkdtemp(), "fc.geojson")
open(p, "w").write(json.dumps({"type": "FeatureCollection", "features": [
    {"type": "Feature", "properties": {"id": 1, "name": "Å"}, "geometry": {"type": "Point", "coordinates": [17.5, 59.1]}},
    {"type": "Feature", "properties": {"id": 2, "name": "B"}, "geometry": {"type": "LineString", "coordinates": [[17.0, 59.0], [17.2, 59.2]]}}]}))
fc = load_feature_collection(spark, p)
print("geojson rows:", [(r["id"], r.geom_type, r.x, r.y) for r in fc.orderBy("id").collect()])
print("dominant:", dominant_geometry_type(fc))

# 3. streaming drain equals batch under hostile tz
from etl_pipeline_spark.streaming import events_stream, tumbling_counts
from etl_pipeline_spark.streaming.windows import run_available_now
from etl_pipeline_spark.plans.streaming_batch import events_tumbling_1h
got = run_available_now(tumbling_counts(events_stream(spark, "/root/testdata/sf0.001")), "t1")
want = events_tumbling_1h(spark, "/root/testdata/sf0.001")
gp = got.toPandas().sort_values(["win_start_epoch", "event_type"]).reset_index(drop=True)
wp = want.toPandas().sort_values(["win_start_epoch", "event_type"]).reset_index(drop=True)
print("streaming==batch:", gp.equals(wp[gp.columns]), f"({len(gp)} windows)")
assert gp.equals(wp[gp.columns])

# 4. multimodal decode through mapInPandas
from etl_pipeline_spark.operators import media_table_from_documents, decode_media
from etl_pipeline_spark.sources.star import load_table
media = media_table_from_documents(load_table(spark, "/root/testdata/sf0.001", "documents").limit(5))
feats = decode_media(media, codec="fake").collect()
print("media feats:", [(r.media_id, r.kind, r.n_bytes, r.width) for r in feats])

# probe: append with wrong schema must refuse
try:
    append(spark.createDataFrame([(1, "x", 2.0)], "id bigint, name string, junk double"), "sde_demo.fc")
    print("PROBE FAIL: bad append accepted")
    sys.exit(1)
except ValueError as e:
    print("probe bad-append refused:", e)
print("ALL SURFACE DRIVES OK")

# 5. geo kernel through public imports (fresh process, executor pickling probe)
from etl_pipeline_spark.functions.geo import reproject, clip_polygons
geo_df = spark.createDataFrame([(1, 18.06, 59.33)], "id bigint, lon double, lat double")
r = reproject(geo_df, "lon", "lat", "EPSG:4326", "EPSG:3006").collect()[0]
print("reproject stockholm:", round(r.x_out, 1), round(r.y_out, 1))
assert 600000 < r.x_out < 700000 and 6500000 < r.y_out < 6650000
clip_df = spark.createDataFrame([(1, "[[0,0],[2,0],[2,2],[0,2]]")], "id bigint, ring string")
c = clip_polygons(clip_df, "ring", (1.0, 1.0, 3.0, 3.0)).collect()[0]
print("clip area:", c.clipped_area)
assert abs(c.clipped_area - 1.0) < 1e-9

# 6. fetcher flow → landing zone → spark.read.json → normalizer (full ingest path)
from etl_pipeline_spark.sources.fetchers import RestApiFetcher
class FakeTransport:
    def get_json(self, url, params=None):
        params = params or {}
        if url.endswith("/FeatureServer"):
            return {"layers": [{"id": 0}]}
        if url.endswith("/FeatureServer/0"):
            return {"maxRecordCount": 2}
        off = params["resultOffset"]
        feats = [{"type": "Feature", "properties": {"fid": i, "namn": "Åker väg"},
                  "geometry": {"type": "Point", "coordinates": [17.0 + i, 59.0]}}
                 for i in range(off, min(off + 2, 5))]
        return {"features": feats, "exceededTransferLimit": off + len(feats) < 5}
    def head_headers(self, url):
        return {}

import tempfile as _tf
landing = _tf.mkdtemp()
f = RestApiFetcher(FakeTransport(), "https://x/FeatureServer", where="1=1")
paths = f.fetch_all(landing, "roads")
print("landing files:", {k: v.name for k, v in paths.items()}, "pages:", f.pages_fetched)
from etl_pipeline_spark.sources.geojson import load_feature_collection
fc = load_feature_collection(spark, str(paths[0]))
print("ingested rows:", fc.count(), "cols:", fc.columns)
assert fc.count() == 5
print("FULL INGEST PATH OK")
