"""scats_transis_kinesis_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference SCATS→Transis→Kinesis ETL (see SURVEY.md), re-expressed on the
Spark DataFrame / SQL / Structured Streaming stack:

- ``session``    — tuned SparkSession builder (AQE, UTC, Arrow).
- ``schemas``    — explicit StructTypes for every record family.
- ``sources``    — batch/stream loaders + null-delimited XML ingestion.
- ``functions``  — scalar column functions (timestamps, portable hashing).
- ``operators``  — projection/flatten/aggregation/relational + extension
  operators (dedup, similarity search, text analysis, multimodal).
- ``streaming``  — watermarked window pipeline, Kinesis-envelope sink with
  bounded subset retry, job-audit query listener.
- ``plans``      — the query registry consumed by ``__spark_entry__``.
"""

__version__ = "0.1.0"
