from etl_pipeline_spark.utils.resilience import (  # noqa: F401
    CircuitBreaker,
    CircuitOpenError,
    RetryPolicy,
    retry_call,
)
