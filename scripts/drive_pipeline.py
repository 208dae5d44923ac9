"""Fresh-process drive of the 4-phase pipeline through public imports."""
import sys, tempfile
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[4]").appName("pipe-drive")
         .config("spark.sql.warehouse.dir", tempfile.mkdtemp())
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from etl_pipeline_spark.pipeline import Pipeline, PipelineConfig
from etl_pipeline_spark.sources.registry import SourceConfig

class T:
    def get_json(self, url, params=None):
        params = params or {}
        if url.endswith("/FeatureServer"): return {"layers": [{"id": 0}]}
        if url.endswith("/FeatureServer/0"): return {"maxRecordCount": 4}
        off = params.get("resultOffset", 0)
        feats = [{"type": "Feature", "properties": {"fid": i, "namn": f"Väg {i}"},
                  "geometry": {"type": "Point", "coordinates": [16.0 + i * 0.5, 59.0]}}
                 for i in range(off, min(off + 4, 9))]
        return {"features": feats, "exceededTransferLimit": off + len(feats) < 9}
    def head_headers(self, url): return {}

cfg = PipelineConfig(landing_dir=tempfile.mkdtemp(), production_db="prod_drive",
                     aoi_bbox=(16.2, 58.0, 30.0, 61.0), target_epsg=3006)
pipe = Pipeline(spark, cfg, transport=T())
summary = pipe.run([SourceConfig(name="Vägar", authority="TRV", type="rest_api", url="https://x/FeatureServer")])
print(summary.dump())
out = spark.table("prod_drive.trv_vagar_layer0")
print("rows:", out.count(), "cols:", out.columns)
assert out.count() == 8  # fid 0 (lon 16.0) clipped out
print("metrics df:", summary.to_df(spark).groupBy("phase","status").count().collect())
print("PIPELINE DRIVE OK")
