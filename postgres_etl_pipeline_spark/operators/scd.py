"""Slowly-changing-dimension (Type 2) operators.

The reference maintains plain overwrite dims (``sql/init.sql:4-16``,
seeded with ``ON CONFLICT DO NOTHING`` — ``init.sql:47-61``), which loses
history. SCD2 versioning is the standard warehouse upgrade of that star
schema (SURVEY §1.1): every attribute change closes the current version
(``valid_to``) and opens a new one (``valid_from``), so facts can join the
dimension AS OF their event time.

Both operators are one-shuffle window computations partitioned by the
dimension key — at 100 TB the shuffle is by key (no skew: dimension keys
are near-unique) and each key's timeline is tiny, so the window state per
task is bounded regardless of total scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# sentinel for "current version" in string-formatted outputs; NULL valid_to
# is the storage representation
OPEN_END = "9999-12-31 00:00:00"


def scd2_compress(
    snapshots: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str,
    tie_break: list[str] | None = None,
) -> DataFrame:
    """Collapse an ordered attribute-snapshot log into SCD2 version history.

    Consecutive snapshots with identical ``attr_cols`` merge into one
    version; a change opens a new version. Output columns: key_cols +
    attr_cols + ``valid_from`` (timestamp), ``valid_to`` (timestamp, NULL
    for the current version), ``version`` (1-based per key).

    Ordering must be total: pass ``tie_break`` columns when ``ts_col`` can
    tie within a key (the window result is otherwise nondeterministic).
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (tie_break or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    changed = (
        snapshots.withColumn("__prev", F.lag(attrs).over(w))
        .filter(F.col("__prev").isNull() | (F.col("__prev") != attrs))
        .drop("__prev")
    )
    # windows over the change rows only: version numbers and valid_to chain
    # skip the collapsed duplicates
    wc = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        changed.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(wc))
        .withColumn("version", F.row_number().over(wc).cast("long"))
        .select(*key_cols, *attr_cols, "valid_from", "valid_to", "version")
    )


def scd2_merge(
    current: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    eff_col: str = "valid_from",
) -> DataFrame:
    """Apply a batch of new attribute snapshots to an SCD2 dimension.

    ``current`` is the existing version table (output shape of
    :func:`scd2_compress`); ``changes`` carries key_cols + attr_cols +
    ``eff_col`` (effective timestamp of each new snapshot). The merged
    history is recomputed per key: unchanged re-deliveries collapse away
    (idempotent — re-applying the same batch is a no-op), real changes
    close the open version and append, and brand-new keys open at
    version 1.

    This is the engine's answer to the reference's ``ON CONFLICT DO
    NOTHING`` dim seeding (``init.sql:47-61``) when history must be kept;
    the K5 last-write-wins upsert (connectors.sinks.upsert_parquet) remains
    the SCD1 path.
    """
    cur = current.select(
        *key_cols, *attr_cols, F.col("valid_from").alias("__ts")
    )
    new = changes.select(*key_cols, *attr_cols, F.col(eff_col).alias("__ts"))
    return scd2_compress(
        cur.unionByName(new), key_cols, attr_cols, "__ts"
    ).withColumnRenamed("__ts", "valid_from")


def scd2_as_of(history: DataFrame, ts) -> DataFrame:
    """Point-in-time view of an SCD2 dimension: the version live at ``ts``
    (half-open [valid_from, valid_to) intervals, NULL valid_to = open)."""
    return history.filter(
        (F.col("valid_from") <= F.lit(ts))
        & (F.col("valid_to").isNull() | (F.col("valid_to") > F.lit(ts)))
    )
