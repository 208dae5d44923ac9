from etl_pipeline_spark.streaming.windows import (  # noqa: F401
    events_stream,
    sessionized,
    sliding_sums,
    tumbling_counts,
)
