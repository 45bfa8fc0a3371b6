"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference ETL pipeline (dataengineerankur/postgres-etl-pipeline),
re-expressed Spark-first.

Layout
------
- ``session``     SparkSession builder (UTC, ANSI, AQE) — SURVEY §4.2
- ``schemas``     every StructType the reference's data model implies — SURVEY §1.2
- ``datagen``     seeded POS-transaction generator + fault-injection variants — SURVEY §2.1 S7
- ``checks``      validation/data-quality combinators V1–V8 — SURVEY §2.6
- ``operators``   relational + dedup + similarity + text + multimodal ops — SURVEY §2, §7 Phase 5
- ``connectors``  sources (JSON/NDJSON/parquet/JDBC) and sinks (atomic write, keyed upsert)
- ``pipelines``   grocery (§3.1) and retail (§3.2) pipelines as composed DataFrame stages
- ``streaming``   Structured Streaming jobs (watermark, dedupe, windowed marts) — SURVEY §2.8
- ``queries``     the query catalog consumed by ``__spark_entry__.py`` (driver contract)
"""

__version__ = "0.1.0"
