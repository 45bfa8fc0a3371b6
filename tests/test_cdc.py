"""CDC changelog-apply semantics (operators/cdc.py): last change per key
wins, terminal deletes remove the key, delete-then-reinsert survives, and
a snapshot unions in as below-log inserts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postgres_etl_pipeline_spark.operators import cdc as C


def _log(spark, rows):
    return spark.createDataFrame(
        rows, "k long, seq long, op string, val string"
    )


def _state(df):
    return {r.k: (r.op, r.val) for r in df.collect()}


def test_last_change_wins_and_terminal_delete_removes(spark):
    log = _log(
        spark,
        [
            (1, 1, "I", "a"),
            (1, 2, "U", "b"),          # survives as U/b
            (2, 1, "I", "x"),
            (2, 2, "D", None),         # removed
            (3, 1, "I", "only"),       # plain insert survives
        ],
    )
    out = _state(C.apply_changelog(log, ["k"], [F.col("seq")]))
    assert out == {1: ("U", "b"), 3: ("I", "only")}


def test_delete_then_reinsert_survives(spark):
    log = _log(
        spark,
        [(7, 1, "I", "v1"), (7, 2, "D", None), (7, 3, "I", "v2")],
    )
    out = _state(C.apply_changelog(log, ["k"], [F.col("seq")]))
    assert out == {7: ("I", "v2")}


def test_update_then_delete_removes(spark):
    # the %21 == 0 case of the catalog entry, isolated
    log = _log(
        spark,
        [(21, 1, "I", "a"), (21, 2, "U", "b"), (21, 3, "D", None)],
    )
    assert C.apply_changelog(log, ["k"], [F.col("seq")]).count() == 0


def test_snapshot_applies_below_log(spark):
    snap = spark.createDataFrame([(1, "old"), (2, "keep")], "k long, val string")
    base = C.snapshot_as_inserts(snap, seq_col="seq")
    log = _log(spark, [(1, 5, "U", "new"), (3, 6, "I", "born")]).select(
        "k", "val", "seq", "op"
    )
    merged = base.select("k", "val", "seq", "op").unionByName(log)
    out = _state(
        C.apply_changelog(merged, ["k"], [F.col("seq")]).select("k", "op", "val")
    )
    assert out == {1: ("U", "new"), 2: ("I", "keep"), 3: ("I", "born")}


def test_requires_keys(spark):
    log = _log(spark, [(1, 1, "I", "a")])
    with pytest.raises(ValueError):
        C.apply_changelog(log, [], [F.col("seq")])


def test_result_is_partitioning_invariant(spark):
    rows = [(k, s, "U" if s > 1 else "I", f"v{s}") for k in range(20) for s in (1, 2, 3)]
    log = _log(spark, rows)
    a = _state(C.apply_changelog(log.repartition(1), ["k"], [F.col("seq")]))
    b = _state(C.apply_changelog(log.repartition(13, "val"), ["k"], [F.col("seq")]))
    assert a == b and len(a) == 20
