from etl_pipeline_spark.functions.naming import (  # noqa: F401
    generate_fc_name,
    sanitize_name,
    slugify,
    unique_names,
)
