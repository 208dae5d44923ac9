from etl_pipeline_spark.sources.star import TABLES, load_table, load_tables  # noqa: F401
