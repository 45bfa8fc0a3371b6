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


# ---------------------------------------------------------------------------
# cdc_merge_parquet / run_cdc_sink — the delete-capable K5 sink
# ---------------------------------------------------------------------------


def _live(spark, path):
    from postgres_etl_pipeline_spark.connectors.sinks import read_cdc_table

    return {r.k: r.val for r in read_cdc_table(spark, path).collect()}


def test_cdc_merge_batches_and_tombstones(spark, tmp_path):
    from postgres_etl_pipeline_spark.connectors.sinks import cdc_merge_parquet

    target = str(tmp_path / "cdc_table")
    b1 = _log(spark, [(1, 1, "I", "a"), (2, 2, "I", "b"), (3, 3, "I", "c")])
    cdc_merge_parquet(spark, b1, target, ["k"], ["seq"])
    assert _live(spark, target) == {1: "a", 2: "b", 3: "c"}

    b2 = _log(spark, [(1, 4, "U", "a2"), (2, 5, "D", None)])
    cdc_merge_parquet(spark, b2, target, ["k"], ["seq"])
    assert _live(spark, target) == {1: "a2", 3: "c"}
    # the delete is STORED as a tombstone, not dropped
    stored = {r.k: r.op for r in spark.read.parquet(target).collect()}
    assert stored == {1: "U", 2: "D", 3: "I"}


def test_cdc_merge_redelivery_is_noop_and_no_resurrection(spark, tmp_path):
    from postgres_etl_pipeline_spark.connectors.sinks import cdc_merge_parquet

    target = str(tmp_path / "cdc_table")
    b1 = _log(spark, [(1, 1, "I", "old"), (2, 1, "I", "x")])
    b2 = _log(spark, [(1, 2, "U", "new"), (2, 2, "D", None)])
    cdc_merge_parquet(spark, b1, target, ["k"], ["seq"])
    cdc_merge_parquet(spark, b2, target, ["k"], ["seq"])
    assert _live(spark, target) == {1: "new"}

    # redeliver the OLD batch after the new one: the stored seq-2 states
    # (including the tombstone for k=2) must win — no regression, no
    # resurrection
    cdc_merge_parquet(spark, b1, target, ["k"], ["seq"])
    assert _live(spark, target) == {1: "new"}
    # and re-applying the newest batch is idempotent
    cdc_merge_parquet(spark, b2, target, ["k"], ["seq"])
    assert _live(spark, target) == {1: "new"}


def test_cdc_stream_sink_multi_batch(spark, tmp_path):
    import json

    from postgres_etl_pipeline_spark.streaming.runner import run_cdc_sink

    src = tmp_path / "src"
    src.mkdir()
    a = [{"k": 1, "seq": 1, "op": "I", "val": "a"},
         {"k": 2, "seq": 2, "op": "I", "val": "b"}]
    b = [{"k": 1, "seq": 3, "op": "U", "val": "a2"},
         {"k": 2, "seq": 4, "op": "D", "val": None},
         {"k": 3, "seq": 5, "op": "I", "val": "c"}]
    for name, rows, off in (("a.ndjson", a, -60), ("b.ndjson", b, 0)):
        p = src / name
        p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
        import os, time

        t = time.time() + off
        os.utime(p, (t, t))

    target = str(tmp_path / "cdc_stream_table")
    stream = (
        spark.readStream.schema("k long, seq long, op string, val string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    run_cdc_sink(
        stream, target, keys=["k"], order_by=["seq"],
        checkpoint=str(tmp_path / "ckpt"),
    )
    assert _live(spark, target) == {1: "a2", 3: "c"}

    # fresh-checkpoint replay of the whole stream: keyed sequence merge
    # makes it a no-op (effectively-once), deletes stay deleted
    stream2 = (
        spark.readStream.schema("k long, seq long, op string, val string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    run_cdc_sink(
        stream2, target, keys=["k"], order_by=["seq"],
        checkpoint=str(tmp_path / "ckpt2"),
    )
    assert _live(spark, target) == {1: "a2", 3: "c"}


def test_cdc_tombstone_compaction_drops_only_expired(spark, tmp_path):
    """Verdict r06 item 7: tombstones older than the redelivery horizon are
    GC'd (the table shrinks); tombstones at/after the horizon survive and
    still defeat a late pre-delete redelivery."""
    from postgres_etl_pipeline_spark.connectors.sinks import (
        cdc_merge_parquet,
        compact_cdc_tombstones,
    )

    target = str(tmp_path / "cdc_table")
    b1 = _log(spark, [(1, 1, "I", "a"), (2, 1, "I", "b"), (3, 1, "I", "c")])
    # k=2 deleted early (seq 2, below the horizon), k=3 deleted late (seq 9)
    b2 = _log(spark, [(2, 2, "D", None), (3, 9, "D", None)])
    cdc_merge_parquet(spark, b1, target, ["k"], ["seq"])
    cdc_merge_parquet(spark, b2, target, ["k"], ["seq"])
    assert {r.k: r.op for r in spark.read.parquet(target).collect()} == {
        1: "I", 2: "D", 3: "D",
    }

    # horizon 5: nothing with seq < 5 can ever be redelivered again —
    # k=2's tombstone (seq 2) is dead weight and goes; k=3's (seq 9) stays
    compact_cdc_tombstones(spark, target, "seq", horizon=5)
    stored = {r.k: r.op for r in spark.read.parquet(target).collect()}
    assert stored == {1: "I", 3: "D"}  # the table SHRANK by the GC'd row
    assert _live(spark, target) == {1: "a"}


def test_cdc_late_predelete_redelivery_inside_horizon_cannot_resurrect(
    spark, tmp_path
):
    from postgres_etl_pipeline_spark.connectors.sinks import (
        cdc_merge_parquet,
        compact_cdc_tombstones,
    )

    target = str(tmp_path / "cdc_table")
    cdc_merge_parquet(
        spark, _log(spark, [(1, 6, "I", "x")]), target, ["k"], ["seq"]
    )
    cdc_merge_parquet(
        spark, _log(spark, [(1, 8, "D", None)]), target, ["k"], ["seq"]
    )
    # horizon 5 retains the seq-8 tombstone (8 >= 5)
    compact_cdc_tombstones(spark, target, "seq", horizon=5)
    # the pre-delete insert (seq 6 — inside the redeliverable range since
    # 6 >= horizon) arrives AGAIN: the retained tombstone must defeat it
    cdc_merge_parquet(
        spark, _log(spark, [(1, 6, "I", "x")]), target, ["k"], ["seq"]
    )
    assert _live(spark, target) == {}
    assert {r.op for r in spark.read.parquet(target).collect()} == {"D"}


def test_missing_target_with_orphan_swap_dir_fails_loudly(spark, tmp_path):
    """Advice r06 (medium): a crash between _swap_into_place's delete and
    rename leaves the target absent but the merged copy beside it — the
    next merge must refuse to silently reinitialize from the batch alone."""
    from postgres_etl_pipeline_spark.connectors.sinks import (
        cdc_merge_parquet,
        upsert_parquet,
    )

    target = str(tmp_path / "cdc_table")
    b1 = _log(spark, [(1, 1, "I", "a")])
    cdc_merge_parquet(spark, b1, target, ["k"], ["seq"])

    # simulate the crash window: merged copy written beside, target gone
    import shutil

    orphan = target + ".__cdc_deadbeef"
    shutil.move(target, orphan)
    with pytest.raises(IOError, match="interrupted-swap"):
        cdc_merge_parquet(spark, b1, target, ["k"], ["seq"])
    with pytest.raises(IOError, match="interrupted-swap"):
        upsert_parquet(spark, b1, target, ["k"], [F.col("seq")])

    # the documented recovery — rename the orphan into place — then the
    # merge proceeds and the stored state is intact
    shutil.move(orphan, target)
    cdc_merge_parquet(
        spark, _log(spark, [(2, 2, "I", "b")]), target, ["k"], ["seq"]
    )
    assert _live(spark, target) == {1: "a", 2: "b"}


def test_recover_interrupted_swap_restores_newest_orphan(spark, tmp_path):
    from postgres_etl_pipeline_spark.connectors.sinks import (
        cdc_merge_parquet,
        recover_interrupted_swap,
    )

    target = str(tmp_path / "cdc_table")
    # nothing to do on a genuinely fresh path
    assert recover_interrupted_swap(spark, target) is False

    cdc_merge_parquet(
        spark, _log(spark, [(1, 1, "I", "a")]), target, ["k"], ["seq"]
    )
    # target present → no-op
    assert recover_interrupted_swap(spark, target) is False

    # crash window: a stale partial orphan (older) and the completed
    # merged copy (newer), target gone
    import os
    import shutil
    import time

    stale = target + ".__cdc_00000000"
    os.makedirs(stale)
    time.sleep(0.05)
    complete = target + ".__cdc_ffffffff"
    shutil.move(target, complete)
    # rename preserves the original mtime; in the real crash timeline the
    # completed copy is the most recent WRITE, so stamp it newest
    os.utime(complete, None)

    assert recover_interrupted_swap(spark, target) is True
    assert _live(spark, target) == {1: "a"}
    assert not os.path.exists(stale)  # stale orphan cleaned up

    # and the recovered table merges normally again
    cdc_merge_parquet(
        spark, _log(spark, [(2, 2, "I", "b")]), target, ["k"], ["seq"]
    )
    assert _live(spark, target) == {1: "a", 2: "b"}


def test_recover_refuses_uncommitted_orphans(spark, tmp_path):
    """Review finding r07: an orphan WITHOUT the _SUCCESS commit marker is
    a crash-during-write partial — recovery must refuse to promote it."""
    import os

    from postgres_etl_pipeline_spark.connectors.sinks import (
        recover_interrupted_swap,
    )

    target = str(tmp_path / "cdc_table")
    junk = target + ".__merge_0badc0de"
    os.makedirs(os.path.join(junk, "_temporary"))
    with pytest.raises(IOError, match="_SUCCESS"):
        recover_interrupted_swap(spark, target)
    assert os.path.exists(junk)  # refused, not silently deleted


def test_jdbc_sql_builders_escape_string_literals():
    """Advice r08 #3: values spliced into single-quoted SQL literals are
    escaped ('' doubling), so an op marker containing a quote produces a
    well-formed literal instead of broken/injectable SQL."""
    from postgres_etl_pipeline_spark.connectors.sinks import (
        _sql_str,
        cdc_merge_sql,
    )

    assert _sql_str("D") == "D"
    assert _sql_str("D'x") == "D''x"
    assert _sql_str("'; DROP TABLE t; --") == "''; DROP TABLE t; --"

    stmt = cdc_merge_sql(
        "tgt", "stg", ["k", "v", "op", "seq"], ["k"], "seq",
        delete_op="D'x",
    )
    assert "'D''x'" in stmt and "'D'x'" not in stmt
