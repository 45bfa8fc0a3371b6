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
# so the unit must be probed up front (driver-side, footers only — at
# 100 TB Spark's schema resolution reads one footer of the prefix, not the
# data).


def _events_ts_schema(
    spark: SparkSession, path: str
) -> tuple[T.StructType, bool]:
    """Return (stream read schema, is_nanos) for an events parquet path.

    FS-AGNOSTIC probe (round-3/4 advice): the unit is taken from a BATCH
    read's resolved schema under scoped ``nanosAsLong`` — the exact
    mechanism the batch reader (queries.read_events) uses — so the probe
    works wherever Spark can read: local files, ``file:``/``s3a:``/
    ``hdfs:`` URIs, directories (including Spark-written directories NAMED
    ``*.parquet``), and multi-file prefixes with mixed footers. The
    previous ``glob.glob`` + pyarrow footer peek was local-FS-only, raised
    ``IsADirectoryError`` on dir-named-parquet layouts, and died with an
    opaque ``StopIteration`` on empty directories.

    NANOS parquet can't be read as a Spark timestamp (PARQUET_TYPE_ILLEGAL)
    → under ``nanosAsLong`` it resolves as LongType, which is exactly the
    type the stream must force (convert with exact integer DIV — epoch-
    nanos overflow double's mantissa; never route through a float). MICROS
    parquet resolves natively as TimestampNTZ.

    An unreadable path (empty directory, nothing to probe) raises a clear
    ValueError instead of propagating schema-inference internals.
    """
    from pyspark.errors import AnalysisException

    from ..session import scoped_conf

    try:
        with scoped_conf(spark, {"spark.sql.legacy.parquet.nanosAsLong": "true"}):
            schema = spark.read.parquet(path).schema
    except AnalysisException as e:
        raise ValueError(
            f"cannot probe events timestamp unit at {path!r}: no readable "
            "parquet footer there (empty directory, or path does not exist)"
        ) from e
    if "ts" not in schema.fieldNames():
        raise ValueError(
            f"cannot probe events timestamp unit at {path!r}: resolved "
            f"schema has no 'ts' column (found {schema.fieldNames()})"
        )
    is_nanos = isinstance(schema["ts"].dataType, T.LongType)
    return schema, is_nanos


def _is_directory(spark: SparkSession, path: str) -> bool | None:
    """True/False when the path's filesystem can answer, None when the path
    does not exist (or the FS probe fails) — via the Hadoop FileSystem API,
    so any configured scheme (file/hdfs/s3a/...) answers, not just the
    driver-local OS view."""
    try:
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        return bool(fs.getFileStatus(hpath).isDirectory())
    except Exception:
        return None


def stream_parquet(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Parquet file-source stream with an explicit schema (streams never
    infer: contract-first, SURVEY §1.3).

    The file source only watches directories; a path ending in ``.parquet``
    that is actually a FILE is split into (dir, pathGlobFilter) so
    single-file testdata tables can be replayed as streams too. A
    DIRECTORY named ``*.parquet`` (Spark's own write layout) is watched
    directly — the suffix alone doesn't decide (round-4 advice), the
    filesystem does.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if path.endswith(".parquet") and _is_directory(spark, path) is not True:
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
    schema, is_nanos = _events_ts_schema(spark, path)
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
