from etl_pipeline_spark.plans.registry import REGISTRY, all_oracles, all_queries  # noqa: F401
