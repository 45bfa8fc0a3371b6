"""resample_locf semantics on a hand-built frame: grid bounds, gap
flagging, carry-forward, and deterministic within-bucket tie-break."""

from __future__ import annotations

import datetime as dt

from postgres_etl_pipeline_spark.operators.timeseries import (
    resample_locf,
    rollup_resampled,
)


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_locf_fills_gaps_and_bounds_grid(spark):
    df = spark.createDataFrame(
        [
            ("u1", 1, _ts(0, 10), 10.0),
            ("u1", 2, _ts(3, 5), 40.0),   # hours 1,2 are gaps
            ("u2", 3, _ts(5, 0), 7.0),    # single-bucket key
        ],
        "k string, eid int, ts timestamp, v double",
    )
    out = resample_locf(df, ["k"], "ts", "v", "1 hour", tie_break=["eid"])
    rows = {(r.k, r.bucket.hour): (r.value, r.is_gap) for r in out.collect()}
    assert rows == {
        ("u1", 0): (10.0, 0),
        ("u1", 1): (10.0, 1),
        ("u1", 2): (10.0, 1),
        ("u1", 3): (40.0, 0),
        ("u2", 5): (7.0, 0),
    }


def test_locf_bucket_takes_last_event_with_tie_break(spark):
    df = spark.createDataFrame(
        [
            ("u1", 1, _ts(0, 30), 1.0),
            ("u1", 2, _ts(0, 30), 2.0),  # same ts: higher eid wins
            ("u1", 3, _ts(0, 10), 9.0),  # earlier ts: never wins
        ],
        "k string, eid int, ts timestamp, v double",
    )
    out = resample_locf(df, ["k"], "ts", "v", "1 hour", tie_break=["eid"]).collect()
    assert len(out) == 1 and out[0].value == 2.0 and out[0].is_gap == 0


def test_rollup_over_regular_grid(spark):
    df = spark.createDataFrame(
        [
            ("u1", 1, dt.datetime(2024, 1, 1, 22), 4.0),
            ("u1", 2, dt.datetime(2024, 1, 2, 1), 8.0),  # crosses midnight
        ],
        "k string, eid int, ts timestamp, v double",
    )
    hourly = resample_locf(df, ["k"], "ts", "v", "1 hour", tie_break=["eid"])
    daily = {
        r.bucket.day: (r.avg_value, r.n_gaps, r.n_buckets)
        for r in rollup_resampled(hourly, ["k"], "bucket", "value").collect()
    }
    # day 1: hours 22,23 → values 4,4 (23 is a carried gap)
    assert daily[1] == (4.0, 1, 2)
    # day 2: hours 0,1 → 4 carried, then 8
    assert daily[2] == (6.0, 1, 2)
