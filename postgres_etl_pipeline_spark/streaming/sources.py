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

# events.parquet has carried TIMESTAMP(NANOS) in some driver generations and
# TIMESTAMP(MICROS) in others; the batch reader (queries.read_events) adapts
# by inspecting the resolved dtype, but a file STREAM takes a forced schema,
# so the unit must be probed from a parquet footer up front (driver-side,
# one footer — at 100 TB you probe one object of the prefix, not the data).


def _events_ts_schema(path: str) -> tuple[T.StructType, bool]:
    """Return (read schema, is_nanos) for an events parquet file/dir.

    NANOS parquet can't be read as a Spark timestamp (PARQUET_TYPE_ILLEGAL)
    → read the raw int64 as LongType and convert with exact integer DIV
    (epoch-nanos overflow double's mantissa; never route through a float).
    MICROS parquet reads natively as TimestampNTZ.
    """
    import glob as _glob
    import pyarrow.parquet as _pq

    probe = path if path.endswith(".parquet") else next(
        iter(sorted(_glob.glob(f"{path}/*.parquet")))
    )
    unit = _pq.ParquetFile(probe).schema_arrow.field("ts").type.unit
    is_nanos = unit == "ns"
    ts_type = T.LongType() if is_nanos else T.TimestampNTZType()
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", ts_type, True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )
    return schema, is_nanos


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

    Unit-adaptive twin of the batch reader (queries.read_events): NANOS
    parquet is read as LongType and converted with integer ``DIV 1000`` →
    timestamp_micros; MICROS parquet reads natively as TimestampNTZ and is
    cast to (session-UTC) timestamp. No session conf needed here: file
    streams take an explicit user schema, so no footer-driven schema
    inference happens and nanosAsLong never applies — verified by draining
    with the conf unset.
    """
    path = f"{sf_dir}/events.parquet"
    schema, is_nanos = _events_ts_schema(path)
    ev = stream_parquet(spark, path, schema, max_files_per_trigger)
    if is_nanos:
        return ev.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return ev.withColumn("ts", F.col("ts").cast("timestamp"))


def stream_ndjson_txns(
    spark: SparkSession, staged_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """NDJSON stream of staged grocery transactions (reference staging IR,
    ``grocery_validate_dag.py:65-79`` — one JSON object per line)."""
    reader = spark.readStream.schema(STG_TRANSACTIONS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.json(staged_dir)
