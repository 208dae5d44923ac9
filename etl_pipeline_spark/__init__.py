"""etl_pipeline_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference ETL system (1kimnet/ETL-pipeline, surveyed in
SURVEY.md): source scans with predicate/projection pushdown, staging loaders,
string/naming transform kernel, lookup/semi/anti joins, dedup, pagination,
write-mode sinks — plus large-scale training-data operators (MinHash-LSH
dedup, similarity search, text analysis, multimodal plumbing) and a
Structured Streaming surface.

Everything is declared through the DataFrame/SQL API so Catalyst handles
pushdown, pruning, join strategy and AQE; Python UDFs appear only where the
built-in operators genuinely cannot express the semantics (and then always
Arrow-vectorized).
"""

__version__ = "0.1.0"

from etl_pipeline_spark.session import get_spark  # noqa: F401
