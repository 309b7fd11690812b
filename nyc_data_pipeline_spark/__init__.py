"""nyc_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the reference pipeline (catekui/NYC_data_pipeline: a
Kafka -> Spark Structured Streaming -> Postgres -> dashboard ETL stack),
re-expressed as declarative DataFrame/SQL plans that Catalyst optimizes,
plus the full relational operator surface (joins, windows, set ops,
rollups) and large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns) the reference
lacks.

Design rules (enforced throughout):
- DataFrame/SQL first; Catalyst owns parse/analyze/optimize/execute.
- Built-in `pyspark.sql.functions` in the hot path; Pandas UDFs only
  where built-ins genuinely cannot express the semantics.
- Every operator ships with a DuckDB-oracle SQL twin for correctness
  and is designed for 100 TB scale: broadcast the small side, push
  filters to the scan, keep aggregation partial, avoid driver loops.
"""

__version__ = "0.1.0"
