from etl_pipeline_spark.sinks.writers import (  # noqa: F401
    LoadReport,
    append,
    append_evolve,
    discover_tables,
    merge_upsert,
    replace,
    truncate_and_load,
    validate_before_load,
    write_json_collection,
)
