"""CDC changelog application (SURVEY §2.2 K5 / §2.4 J3 extension).

The reference's upsert path (``grocery_lib/pg.py:33-60``) implements
``INSERT … ON CONFLICT DO UPDATE`` — the insert/update half of change-data
capture. A production postgres ETL also tails the WAL (debezium-style) and
must *apply* full I/U/D changelogs downstream; this module is that missing
half, expressed Spark-first.

``apply_changelog`` collapses a changelog relation to final table state in
ONE key-partitioned window shuffle:

- latest change per key wins (``row_number`` over the caller's total
  sequence order, descending) — same last-write-wins contract the K5
  upsert pins, extended with an explicit op column;
- a terminal DELETE removes the key from the result entirely (the case
  plain upsert cannot express);
- non-terminal deletes are naturally overridden by any later re-insert,
  because only the latest change per key is consulted.

Scale: the shuffle is linear in changelog rows and keyed by the table key,
so per-reducer state is one key's change history — bounded by churn per
key, independent of table width or total key count. Applying a log *onto*
an existing snapshot is the same operator: union the snapshot in as
synthetic inserts sequenced strictly below the log's range (the snapshot
is by definition older than every captured change).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def apply_changelog(
    changelog: DataFrame,
    keys: list[str],
    order_by: list[Column],
    op_col: str = "op",
    delete_op: str = "D",
    keep_deletes: bool = False,
) -> DataFrame:
    """Collapse an insert/update/delete changelog to final table state.

    ``order_by`` must be a TOTAL order per key (SURVEY §2.9 caution: the
    testdata plants duplicate keys on purpose; a partial order would make
    the survivor partition-dependent). Ascending columns are expected —
    the latest (greatest) change wins; pass e.g. ``[F.col("seq")]``.

    ``keep_deletes=True`` retains a key's terminal delete as a TOMBSTONE
    row instead of dropping it — the shape an incremental CDC sink stores
    (Kafka log compaction / Delta CDF style) so that a re-delivered
    pre-delete change can never resurrect the key (see
    ``connectors.sinks.cdc_merge_parquet``).

    Returns the surviving rows minus the bookkeeping columns (``op_col``
    stays — callers often audit it; drop it at the call site if not).
    """
    if not keys:
        raise ValueError("apply_changelog requires at least one key column")
    w = Window.partitionBy(*keys).orderBy(*[c.desc() for c in order_by])
    latest = (
        changelog.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if keep_deletes:
        return latest
    return latest.filter(F.col(op_col) != F.lit(delete_op))


def snapshot_as_inserts(
    snapshot: DataFrame,
    seq_col: str,
    op_col: str = "op",
    insert_op: str = "I",
    seq_value: int = 0,
) -> DataFrame:
    """Tag a base-table snapshot as synthetic inserts below the log range,
    ready to union with a changelog for :func:`apply_changelog`."""
    return snapshot.withColumn(seq_col, F.lit(seq_value).cast("long")).withColumn(
        op_col, F.lit(insert_op)
    )
