import sys, json, tempfile
from pathlib import Path
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
    .config("spark.sql.python.filterPushdown.enabled", "true")
    .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
d = Path(tempfile.mkdtemp())
(d / "service.json").write_text(json.dumps({"layers": [{"id": 0}]}))
(d / "layer0.json").write_text(json.dumps({"maxRecordCount": 4}))
(d / "layer0_features.json").write_text(json.dumps([
    {"type": "Feature", "properties": {"fid": i},
     "geometry": {"type": "Point", "coordinates": [10.0 + i, 55.0]}} for i in range(9)]))
from etl_pipeline_spark.sources.rest_datasource import PagedRestDataSource
spark.dataSource.register(PagedRestDataSource)
df = (spark.read.format("paged_rest")
      .option("service_url", "https://fake/FeatureServer")
      .option("transport_factory", "file")
      .option("transport_dir", str(d)).load().filter("fid >= 5"))
print(df.collect())
logs = [json.loads(p.read_text()) for p in (d / "query_log").iterdir()]
print("server saw:", logs[0]["where"])
assert df.count() == 4 and "fid >= 5" in logs[0]["where"]
print("DS DRIVE OK")
