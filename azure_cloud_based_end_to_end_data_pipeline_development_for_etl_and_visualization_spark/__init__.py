"""PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the capabilities of the reference
repo ``Himanshi-Yadav-2705/Azure-Cloud-Based-End-to-End-Data-Pipeline-
Development-for-ETL-and-Visualization`` (a Databricks medallion ETL pipeline:
CSV -> bronze parquet -> silver parquet -> gold Delta star schema with SCD
Type-1 merges and incremental loads), extended with the operators a
large-scale training-data pipeline needs (dedup, similarity search,
multimodal columns, text analysis, streaming windows).

Everything here is stock open-source PySpark (DataFrame / SQL / Structured
Streaming); no Databricks runtime, no dbutils, no Unity Catalog.

Package layout (SURVEY.md section 7):

- ``session``    SparkSession factory (AQE on, local-mode tuned)
- ``sources``    parquet/csv IO, SQL-over-path, testdata loaders, ingestion
- ``operators``  relational ops, dedup family, similarity search, windows
- ``functions``  column-expression helpers (text analysis, vector math)
- ``plans``      medallion pipeline: dims, fact, SCD1 merge (portable)
- ``streaming``  structured-streaming windows / watermark / file ingest
- ``multimodal`` binary-column (image/audio) plumbing with stubbed decode
"""

__version__ = "0.1.0"
