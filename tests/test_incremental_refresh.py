"""Incremental partitioned-mart maintenance (connectors/sinks.overwrite_partitions).

Asserts the property that makes partition overwrite the O(changed-days)
scale path: refreshing one partition must leave every other partition's
FILES untouched (same paths, same bytes), not just the same logical rows.
"""

from __future__ import annotations

import glob
import os
import tempfile

from pyspark.sql import functions as F

from postgres_etl_pipeline_spark.connectors.sinks import overwrite_partitions


def _files(path):
    return {
        p: os.path.getmtime(p)
        for p in glob.glob(f"{path}/**/*.parquet", recursive=True)
    }


def test_overwrite_replaces_only_touched_partition(spark):
    path = tempfile.mkdtemp(prefix="mart_inc_") + "/mart"
    base = spark.createDataFrame(
        [("2024-01-01", 1, 100), ("2024-01-02", 1, 200), ("2024-01-03", 2, 300)],
        "day string, store_id int, revenue int",
    )
    base.write.partitionBy("day").parquet(path)
    before = _files(path)
    assert {d for d in os.listdir(path) if d.startswith("day=")} == {
        "day=2024-01-01",
        "day=2024-01-02",
        "day=2024-01-03",
    }

    # corrected rows for day 2 only
    fix = spark.createDataFrame(
        [("2024-01-02", 1, 250), ("2024-01-02", 3, 50)],
        "day string, store_id int, revenue int",
    )
    overwrite_partitions(fix, path, ["day"])

    after = _files(path)
    untouched_before = {p: m for p, m in before.items() if "day=2024-01-02" not in p}
    untouched_after = {p: m for p, m in after.items() if "day=2024-01-02" not in p}
    # identical file paths AND mtimes for days 1 and 3 — they were not rewritten
    assert untouched_before == untouched_after

    # str(): partition-column type inference reads day=2024-01-01 back as DATE
    got = {
        (str(r.day), r.store_id): r.revenue
        for r in spark.read.parquet(path).collect()
    }
    assert got == {
        ("2024-01-01", 1): 100,
        ("2024-01-02", 1): 250,
        ("2024-01-02", 3): 50,
        ("2024-01-03", 2): 300,
    }


def test_static_overwrite_would_drop_other_partitions(spark):
    """Contrast case documenting WHY the dynamic option matters: a plain
    overwrite of a partitioned path drops partitions absent from the batch."""
    path = tempfile.mkdtemp(prefix="mart_static_") + "/mart"
    base = spark.createDataFrame(
        [("2024-01-01", 1, 100), ("2024-01-02", 1, 200)],
        "day string, store_id int, revenue int",
    )
    base.write.partitionBy("day").parquet(path)
    fix = spark.createDataFrame(
        [("2024-01-02", 1, 250)], "day string, store_id int, revenue int"
    )
    fix.write.mode("overwrite").partitionBy("day").parquet(path)
    days = {str(r.day) for r in spark.read.parquet(path).select("day").distinct().collect()}
    assert days == {"2024-01-02"}  # day 1 destroyed — the anti-pattern
