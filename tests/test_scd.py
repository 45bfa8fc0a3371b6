"""SCD2 operator semantics (operators/scd.py).

The version history must be a deterministic function of the snapshot log:
consecutive duplicates collapse, changes chain valid_from/valid_to with no
gaps or overlaps, merge is idempotent, and as-of lookups return exactly one
version per key.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from postgres_etl_pipeline_spark.operators.scd import (
    scd2_as_of,
    scd2_compress,
    scd2_merge,
)


def _ts(s):
    return datetime.fromisoformat(s)


def _snapshots(spark, rows):
    return spark.createDataFrame(
        rows, "store_id string, region string, ts timestamp"
    )


def test_compress_collapses_consecutive_duplicates(spark):
    snaps = _snapshots(
        spark,
        [
            ("SFO-001", "west", _ts("2024-01-01")),
            ("SFO-001", "west", _ts("2024-02-01")),  # no change: collapses
            ("SFO-001", "central", _ts("2024-03-01")),
            ("SFO-001", "west", _ts("2024-04-01")),  # back-and-forth = new version
        ],
    )
    hist = scd2_compress(snaps, ["store_id"], ["region"], "ts").orderBy("version")
    rows = hist.collect()
    assert [(r.region, r.version) for r in rows] == [
        ("west", 1),
        ("central", 2),
        ("west", 3),
    ]
    # contiguous validity chain: each valid_to == next valid_from, last open
    assert rows[0].valid_to == rows[1].valid_from
    assert rows[1].valid_to == rows[2].valid_from
    assert rows[2].valid_to is None


def test_merge_idempotent_and_closes_versions(spark):
    current = scd2_compress(
        _snapshots(spark, [("NYC-014", "east", _ts("2024-01-01"))]),
        ["store_id"],
        ["region"],
        "ts",
    )
    changes = _snapshots(
        spark,
        [
            ("NYC-014", "east", _ts("2024-06-01")),   # unchanged → no-op
            ("AUS-002", "south", _ts("2024-06-01")),  # new key → version 1
        ],
    )
    merged = scd2_merge(current, changes, ["store_id"], ["region"], "ts")
    got = {(r.store_id, r.version): (r.region, r.valid_to) for r in merged.collect()}
    assert got == {
        ("NYC-014", 1): ("east", None),
        ("AUS-002", 1): ("south", None),
    }

    # a real change closes the open version and appends version 2
    change2 = _snapshots(spark, [("NYC-014", "central", _ts("2024-07-01"))])
    merged2 = scd2_merge(merged, change2, ["store_id"], ["region"], "ts")
    nyc = {r.version: (r.region, r.valid_to) for r in
           merged2.filter(F.col("store_id") == "NYC-014").collect()}
    assert nyc[1] == ("east", _ts("2024-07-01"))
    assert nyc[2] == ("central", None)

    # re-applying the same batch changes nothing (idempotent)
    merged3 = scd2_merge(merged2, change2, ["store_id"], ["region"], "ts")
    assert sorted(merged3.collect()) == sorted(merged2.collect())


def test_as_of_returns_one_version_per_key(spark):
    snaps = _snapshots(
        spark,
        [
            ("SFO-001", "west", _ts("2024-01-01")),
            ("SFO-001", "central", _ts("2024-03-01")),
            ("NYC-014", "east", _ts("2024-02-01")),
        ],
    )
    hist = scd2_compress(snaps, ["store_id"], ["region"], "ts")
    at_feb = scd2_as_of(hist, _ts("2024-02-15"))
    assert {(r.store_id, r.region) for r in at_feb.collect()} == {
        ("SFO-001", "west"),
        ("NYC-014", "east"),
    }
    # boundary: as-of exactly at a change ts sees the NEW version (half-open)
    at_mar = scd2_as_of(hist, _ts("2024-03-01"))
    assert {(r.store_id, r.region) for r in at_mar.collect()} == {
        ("SFO-001", "central"),
        ("NYC-014", "east"),
    }
