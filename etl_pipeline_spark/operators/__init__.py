from etl_pipeline_spark.operators.multimodal import (  # noqa: F401
    MEDIA_FEATURE_SCHEMA,
    MEDIA_SCHEMA,
    decode_media,
    fake_decode_batch,
    media_table_from_documents,
)
