"""JDBC source/sink against embedded Derby (ships with Spark for the Hive
metastore) — upgrades S4 from option-plumbing-only to a live round-trip:
write via the JDBC sink, read back plain and range-partitioned, and verify
filters reach the remote side.

Derby is single-JVM/in-memory, so this proves the Spark JDBC surface
(DataFrameReader/Writer codepaths, partitioned parallel reads, pushdown),
not vendor-dialect behavior; `upsert_sql` keeps its Postgres-dialect
statement tests in test_pipelines (reference parity: grocery_lib/pg.py).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postgres_etl_pipeline_spark.connectors.sources import read_jdbc_table

URL = "jdbc:derby:memory:sparkgraft;create=true"
DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


@pytest.fixture(scope="module")
def jdbc_orders(spark, sf_small):
    o = (
        spark.read.parquet(f"{sf_small}/orders.parquet")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .limit(500)
    )
    (
        o.write.format("jdbc")
        .option("url", URL)
        .option("dbtable", "orders_jdbc")
        .option("driver", DRIVER)
        # Derby's default StringType mapping is CLOB, which its own WHERE
        # clause can't compare — pin a comparable type (vendors differ;
        # Postgres maps TEXT and needs none of this)
        .option("createTableColumnTypes", "o_orderstatus VARCHAR(4)")
        .mode("overwrite")
        .save()
    )
    return o


def test_jdbc_roundtrip_preserves_rows(spark, jdbc_orders):
    back = read_jdbc_table(spark, URL, "orders_jdbc", driver=DRIVER)
    assert back.count() == jdbc_orders.count()
    want = {r.o_orderkey for r in jdbc_orders.collect()}
    got = {r.o_orderkey for r in back.collect()}
    assert got == want


def test_jdbc_partitioned_read_splits_and_matches(spark, jdbc_orders):
    lo = jdbc_orders.agg(F.min("o_orderkey")).collect()[0][0]
    hi = jdbc_orders.agg(F.max("o_orderkey")).collect()[0][0]
    back = read_jdbc_table(
        spark,
        URL,
        "orders_jdbc",
        partition_column="o_orderkey",
        num_partitions=4,
        lower_bound=int(lo),
        upper_bound=int(hi) + 1,
        driver=DRIVER,
    )
    # the range-sliced read issues one query per partition
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == jdbc_orders.count()


def test_jdbc_filter_pushes_to_remote_where(spark, jdbc_orders):
    back = read_jdbc_table(spark, URL, "orders_jdbc", driver=DRIVER).filter(
        F.col("o_orderstatus") == "F"
    )
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "o_orderstatus" in plan.split("PushedFilters")[1][:200]
    want = jdbc_orders.filter(F.col("o_orderstatus") == "F").count()
    assert back.count() == want


def test_jdbc_requires_bounds_for_partitioned_read(spark):
    with pytest.raises(ValueError):
        read_jdbc_table(spark, URL, "orders_jdbc", partition_column="o_orderkey")


# ---------------------------------------------------------------------------
# CDC changelog → Derby MERGE (deletes included) — verdict r06 item 8
# ---------------------------------------------------------------------------

# Pin VARCHAR only for the NON-NULL comparison column: Spark's Derby
# dialect maps StringType -> CLOB, and its writer calls setNull(CLOB) for
# NULL cells — which Derby rejects against a VARCHAR column (ERROR 22005).
# Nullable payload columns therefore stay at the default CLOB mapping (no
# comparisons run on them; the MERGE only assigns), while `op` (never NULL
# in a collapsed changelog, compared against literals) gets VARCHAR.
_VTYPES = "op VARCHAR(4)"


def _chg(spark, rows):
    return spark.createDataFrame(rows, "k long, seq long, op string, val string")


def _drain(spark, df, target, **kw):
    from postgres_etl_pipeline_spark.connectors.sinks import drain_changelog_jdbc

    drain_changelog_jdbc(
        spark,
        df,
        URL,
        target,
        keys=["k"],
        seq_col="seq",
        write_options={"createTableColumnTypes": _VTYPES},
        **kw,
    )


def _table(spark, target):
    return {
        r.k: (r.op, r.val, r.seq)
        for r in read_jdbc_table(spark, URL, target, driver=DRIVER).collect()
    }


@pytest.fixture()
def derby_cdc_target(spark, request):
    """Fresh target table seeded through the same drain path (first batch
    is all inserts), unique per test."""
    target = f"cdc_target_{request.node.name[-20:].replace('[','_').replace(']','')}"
    seed = _chg(
        spark, [(1, 1, "I", "a"), (2, 1, "I", "b"), (3, 1, "I", "c")]
    )
    # bootstrap: MERGE needs the target to exist — create it by writing the
    # collapsed seed batch directly as the table
    from postgres_etl_pipeline_spark.operators.cdc import apply_changelog

    (
        apply_changelog(seed, ["k"], [F.col("seq")], keep_deletes=True)
        .write.format("jdbc")
        .option("url", URL)
        .option("dbtable", target)
        .option("createTableColumnTypes", _VTYPES)
        .mode("overwrite")
        .save()
    )
    return target


def test_cdc_jdbc_merge_applies_update_insert_delete(spark, derby_cdc_target):
    t = derby_cdc_target
    batch = _chg(
        spark,
        [
            (1, 2, "U", "a2"),     # update existing
            (2, 2, "D", None),     # delete existing
            (4, 2, "I", "d"),      # insert new
            (1, 1, "I", "a"),      # stale duplicate inside the batch:
                                   # collapse keeps only the seq-2 update
        ],
    )
    _drain(spark, batch, t)
    assert _table(spark, t) == {
        1: ("U", "a2", 2),
        3: ("I", "c", 1),
        4: ("I", "d", 2),
    }


def test_cdc_jdbc_merge_redelivered_old_batch_is_noop(spark, derby_cdc_target):
    t = derby_cdc_target
    new = _chg(spark, [(1, 5, "U", "new"), (3, 5, "D", None)])
    _drain(spark, new, t)
    want = _table(spark, t)
    assert want[1] == ("U", "new", 5) and 3 not in want

    # the ORIGINAL seed batch arrives again (at-least-once): every row is
    # older by seq, so the MERGE's seq guard makes updates no-ops... but a
    # HARD delete removed k=3's row entirely, so its redelivered insert
    # re-inserts — the documented hard_delete caveat, pinned here
    old = _chg(
        spark, [(1, 1, "I", "a"), (2, 1, "I", "b"), (3, 1, "I", "c")]
    )
    _drain(spark, old, t)
    got = _table(spark, t)
    assert got[1] == ("U", "new", 5)  # seq guard held
    assert got[3] == ("I", "c", 1)  # resurrection: inherent to hard deletes


def test_cdc_jdbc_soft_delete_survives_cross_delete_redelivery(
    spark, derby_cdc_target
):
    """hard_delete=False stores the tombstone row (cdc_merge_parquet's
    contract, relational flavor): a redelivered pre-delete insert loses to
    the stored tombstone by seq — no resurrection."""
    t = derby_cdc_target
    _drain(spark, _chg(spark, [(3, 5, "D", None)]), t, hard_delete=False)
    stored = _table(spark, t)
    assert stored[3][0] == "D"  # tombstone retained in the table

    _drain(spark, _chg(spark, [(3, 1, "I", "c")]), t, hard_delete=False)
    stored = _table(spark, t)
    assert stored[3] == ("D", None, 5)  # tombstone defeated the redelivery

    live = {k: v for k, (op, v, s) in stored.items() if op != "D"}
    assert live == {1: "a", 2: "b"}


def test_cdc_jdbc_stream_foreachbatch_applies_deletes(
    spark, derby_cdc_target, tmp_path
):
    """Changelog stream → foreachBatch → Derby MERGE, delete applied — the
    end-to-end streaming composition (the parquet twin lives in
    test_cdc.py::test_cdc_stream_sink_multi_batch)."""
    import os
    import time

    from postgres_etl_pipeline_spark.streaming.runner import run_cdc_jdbc_sink

    t = derby_cdc_target
    src = tmp_path / "chg"
    os.makedirs(src)
    _chg(spark, [(1, 2, "U", "a2"), (4, 2, "I", "d")]).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    time.sleep(1.1)  # distinct file mtimes → two micro-batches
    _chg(spark, [(2, 3, "D", None)]).coalesce(1).write.mode("append").parquet(
        str(src)
    )
    stream = spark.readStream.schema(
        "k long, seq long, op string, val string"
    ).option("maxFilesPerTrigger", 1).parquet(str(src))
    run_cdc_jdbc_sink(
        stream,
        URL,
        t,
        keys=["k"],
        seq_col="seq",
        write_options={"createTableColumnTypes": _VTYPES},
        checkpoint=str(tmp_path / "ckpt"),
    )
    assert _table(spark, t) == {
        1: ("U", "a2", 2),
        3: ("I", "c", 1),
        4: ("I", "d", 2),
    }


def test_cdc_jdbc_tombstone_gc_compacts_without_resurrection(
    spark, derby_cdc_target
):
    """Drain + GC composed on the REMOTE sink (verdict r07 item 9): the
    Derby table physically shrinks (below-horizon tombstone deleted)
    while an at-or-above-horizon tombstone is retained and keeps
    defeating a still-possible redelivered pre-delete change."""
    from postgres_etl_pipeline_spark.connectors.sinks import (
        compact_cdc_tombstones_jdbc,
    )

    t = derby_cdc_target
    # two soft deletes: k=3 at seq 5 (below the later horizon), k=2 at
    # seq 9 (at/above it)
    _drain(
        spark,
        _chg(spark, [(3, 5, "D", None), (2, 9, "D", None)]),
        t,
        hard_delete=False,
    )
    before = _table(spark, t)
    assert before[3][0] == "D" and before[2][0] == "D"
    assert len(before) == 3

    # horizon 7: "no change with seq < 7 will ever arrive again" — the
    # seq-5 tombstone is dead weight, the seq-9 one is still load-bearing
    compact_cdc_tombstones_jdbc(
        spark, URL, t, seq_col="seq", horizon=7, driver=DRIVER
    )
    after = _table(spark, t)
    assert len(after) == 2  # the table shrank
    assert 3 not in after  # below-horizon tombstone gone
    assert after[2] == ("D", None, 9)  # retained tombstone intact

    # a redelivered pre-delete change within the horizon's allowance
    # (seq 8 >= horizon) must still lose to the retained tombstone
    _drain(spark, _chg(spark, [(2, 8, "I", "b8")]), t, hard_delete=False)
    final = _table(spark, t)
    assert final[2] == ("D", None, 9)  # no resurrection
    live = {k for k, (op, v, s) in final.items() if op != "D"}
    assert live == {1}
