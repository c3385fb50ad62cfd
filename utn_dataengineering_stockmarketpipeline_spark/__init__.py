"""PySpark-native analytics engine with the capabilities of
``raguirre-wsc/UTN-DataEngineering-StockMarketPipeline``.

The reference is a pandas+Postgres stock-market ETL pipeline; this package
re-expresses every operator it performs (see SURVEY.md §2) as idiomatic
Spark DataFrame / SQL plans, plus the large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns)
that a 100 TB deployment needs.

Layout:
  session     SparkSession factory with scale-tuned defaults
  schemas     explicit StructTypes (reference warehouse DDL parity)
  sources/    parquet loaders, pluggable REST ingestion, watermark state
  functions/  scalar/hashing/vector column expressions (JVM-side)
  operators/  transforms, SCD-0 merge, windows, dedup, similarity, text,
              multimodal
  plans/      derived reference tables + the query catalog (the driver
              contract: every query has a DuckDB oracle where expressible)
  streaming/  Structured Streaming ingest with exactly-once SCD-0 sink
"""

__version__ = "0.1.0"
