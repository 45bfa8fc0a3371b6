"""Time-series catalog: hypertable-style gap-filled resampling (LOCF) and
continuous-aggregate rollups over the ``events`` table.

Oracle notes: DuckDB reads events.ts as TIMESTAMP_NS — cast to plain
TIMESTAMP before date arithmetic so both engines bucket in microseconds;
buckets are emitted as formatted strings (never raw timestamps, see
tests/oracle_harness.py conventions); the daily mean is computed as
exact-decimal sum ÷ count so partial-agg order can't move the hash.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators.timeseries import resample_locf, rollup_resampled
from .queries import read_events, register

_FMT = "%Y-%m-%d %H:%M:%S"

_LOCF_ORACLE = f"""
    WITH ev AS (
      SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS ts FROM events
    ), ranked AS (
      SELECT user_id, date_trunc('hour', ts) AS bucket, value,
             row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM ev
    ), obs AS (
      SELECT user_id, bucket, value AS obs FROM ranked WHERE rn = 1
    ), span AS (
      SELECT user_id, date_trunc('hour', min(ts)) AS lo,
             date_trunc('hour', max(ts)) AS hi
      FROM ev GROUP BY user_id
    ), grid AS (
      SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
      FROM span
    ), filled AS (
      SELECT g.user_id, g.bucket,
             last_value(o.obs IGNORE NULLS)
               OVER (PARTITION BY g.user_id ORDER BY g.bucket) AS value,
             CASE WHEN o.obs IS NULL THEN 1 ELSE 0 END AS is_gap
      FROM grid g LEFT JOIN obs o
        ON g.user_id = o.user_id AND g.bucket = o.bucket
    )
"""


@register(
    "events_hourly_locf",
    _LOCF_ORACLE
    + f"""
    SELECT user_id, strftime(bucket, '{_FMT}') AS bucket_s, value,
           CAST(is_gap AS INT) AS is_gap
    FROM filled
    """,
    survey="§1.1 Streams/time-series gap: hypertable-style regularized"
    " series — per-user hourly grid (sequence+explode), last event per"
    " bucket (max_by, one combined shuffle), gaps carried forward by a"
    " per-key LOCF window (operators/timeseries.resample_locf)",
    tags=("timeseries",),
)
def events_hourly_locf(spark, sf_dir):
    ev = read_events(spark, sf_dir).select("user_id", "event_id", "ts", "value")
    r = resample_locf(
        ev, ["user_id"], "ts", "value", step="1 hour", tie_break=["event_id"]
    )
    return r.select(
        "user_id",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket_s"),
        "value",
        F.col("is_gap").cast("int").alias("is_gap"),
    )


@register(
    "events_daily_rollup_locf",
    _LOCF_ORACLE
    + """
    SELECT user_id, strftime(date_trunc('day', bucket), '%Y-%m-%d') AS day,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*)
                AS DOUBLE) AS avg_value,
           CAST(SUM(is_gap) AS BIGINT) AS n_gaps,
           count(*) AS n_buckets
    FROM filled
    GROUP BY user_id, day
    """,
    survey="§2.5 extension: continuous aggregate over the regularized"
    " series — daily rollup of the hourly LOCF grid; mean is decimal-sum ÷"
    " count (operators/timeseries.rollup_resampled, comparable across keys"
    " because every day aggregates a full regular grid)",
    tags=("timeseries",),
)
def events_daily_rollup_locf(spark, sf_dir):
    ev = read_events(spark, sf_dir).select("user_id", "event_id", "ts", "value")
    r = resample_locf(
        ev, ["user_id"], "ts", "value", step="1 hour", tie_break=["event_id"]
    )
    daily = r.groupBy(
        "user_id", F.date_trunc("day", F.col("bucket")).alias("bucket")
    ).agg(
        (
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        )
        .cast("double")
        .alias("avg_value"),
        F.sum("is_gap").cast("long").alias("n_gaps"),
        F.count(F.lit(1)).alias("n_buckets"),
    )
    return daily.select(
        "user_id",
        F.date_format("bucket", "yyyy-MM-dd").alias("day"),
        "avg_value",
        "n_gaps",
        "n_buckets",
    )


@register(
    "events_user_ewma",
    """
    SELECT user_id,
           round(list_reduce(list(value ORDER BY ts, event_id),
                             (acc, x) -> 0.75*acc + 0.25*x), 6) AS ewma,
           count(*) AS n_events
    FROM events GROUP BY user_id
    """,
    survey="§2.9: batch applyInPandas (grouped map) — per-user EWMA, a"
    " sequential recursion no SQL window expresses"
    " (operators/timeseries.grouped_ewma); α=0.25 has an exact binary"
    " complement so the Spark fold and DuckDB's list_reduce agree"
    " bit-for-bit",
    tags=("timeseries",),
)
def events_user_ewma(spark, sf_dir):
    from .operators.timeseries import grouped_ewma

    ev = read_events(spark, sf_dir).select("user_id", "event_id", "ts", "value")
    out = grouped_ewma(
        ev, ["user_id"], "ts", "value", alpha=0.25, tie_break=["event_id"]
    )
    return out.select(
        "user_id", F.round("ewma", 6).alias("ewma"), "n_events"
    )
