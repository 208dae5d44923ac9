from etl_pipeline_spark.sinks.writers import (  # noqa: F401
    LoadReport,
    append,
    discover_tables,
    merge_upsert,
    replace,
    truncate_and_load,
    validate_before_load,
    write_json_collection,
)
