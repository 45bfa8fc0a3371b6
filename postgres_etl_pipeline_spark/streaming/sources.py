"""Streaming sources (SURVEY §2.8).

File-source streams are the engine's twin of the reference's per-run
artifact directories (``io_utils.py:38-57``): each run drops one more file
into the watched directory, and the stream picks it up as a micro-batch.
``maxFilesPerTrigger=1`` reproduces run-at-a-time processing; at 100 TB the
same code points at an object-store prefix and Spark tracks seen-files in
the checkpoint (compaction via ``maxFileAge`` / ``cleanSource``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import STG_TRANSACTIONS_SCHEMA

# events.parquet carries TIMESTAMP(NANOS); see queries.read_events for why
# the conversion must be exact integer division (double mantissa overflow).
EVENTS_NANOS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.LongType(), True),  # epoch nanos via nanosAsLong
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def stream_parquet(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Parquet file-source stream with an explicit schema (streams never
    infer: contract-first, SURVEY §1.3).

    The file source only watches directories; a path ending in ``.parquet``
    is split into (dir, pathGlobFilter) so single-file testdata tables can
    be replayed as streams too.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if path.endswith(".parquet"):
        directory, _, fname = path.rpartition("/")
        reader = reader.option("pathGlobFilter", fname)
        path = directory
    return reader.parquet(path)


def stream_events(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Stream the driver ``events`` table (replay of a bounded event log).

    Same nanos handling as the batch reader (queries.read_events): read ns
    as LongType, convert with integer ``DIV 1000`` → timestamp_micros. No
    session conf needed here: file streams take an explicit user schema
    (EVENTS_NANOS_SCHEMA declares ts as LongType), so no footer-driven
    schema inference happens and nanosAsLong never applies — verified by
    draining with the conf unset.
    """
    ev = stream_parquet(
        spark, f"{sf_dir}/events.parquet", EVENTS_NANOS_SCHEMA, max_files_per_trigger
    )
    return ev.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))


def stream_ndjson_txns(
    spark: SparkSession, staged_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """NDJSON stream of staged grocery transactions (reference staging IR,
    ``grocery_validate_dag.py:65-79`` — one JSON object per line)."""
    reader = spark.readStream.schema(STG_TRANSACTIONS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.json(staged_dir)
