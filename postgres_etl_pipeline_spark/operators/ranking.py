"""Distributed global ranking — the scale-safe replacement for
``Window.orderBy(...)`` (which Spark executes as Exchange SinglePartition:
every row through ONE task — the definitive 100x scale-killer).

Pattern (the "approx-quantile cutpoints + join" plan the catalog docstrings
prescribed): one ``approxQuantile`` pass yields ~k value cutpoints, embedded
as LITERALS so every downstream job sees identical boundaries (range
repartitioning's sampled boundaries, by contrast, can differ between the
count job and the final job — the z-order flake class). Rows bucket by
cutpoint comparison (order-consistent: ties share a bucket), rank within
buckets via a PARTITIONED window, and per-bucket offsets — at most k rows —
are collected once and re-broadcast as a literal map. Global rank =
within-bucket row_number + offset[bucket]. Shuffle cost: one hash exchange
on the bucket id (~n/k rows per task) + two O(k)-row driver scalars; no
stage ever sees more than one bucket.

Determinism: the final rank depends only on the total ordering
``(value_col, *tie_cols)``, never on where the cutpoints landed, so
approxQuantile's approximation affects balance, not results.

Input contract: ``df`` must be DETERMINISTIC across jobs — the plan is
evaluated three times (approxQuantile, the bucket-stats collect, the final
ranked plan), and a plan containing ``rand()``/sampling/order-dependent id
generation can hand the final job different rows than the ones the
offsets were computed from (silently wrong or null ranks). Cache or
``localCheckpoint`` such inputs first; parquet-backed plans (every catalog
call site) are deterministic as-is.

NULL values in ``value_col`` take the dedicated ``-1`` bucket, ranked
before every non-null bucket and ordered among themselves by
``tie_cols`` — exactly ``Window.orderBy``'s default ASC NULLS FIRST.
(approxQuantile drops nulls, so without the guard a null value would
produce a null bucket id — a runtime "null map key" error downstream.)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RankedFrame:
    """``df`` + ``_rank`` (1-based global row_number under the total
    ordering) and the driver-side facts downstream expressions need."""

    df: DataFrame                      # input cols + _bkt + _rank
    n_total: int                       # total row count
    first_keys: dict[int, tuple]       # bucket -> first row's key tuple
    buckets: list[int]                 # non-empty buckets, ascending


def _bucket_expr(value: str | Column, cuts: list) -> Column:
    """Order-consistent bucket id: number of cutpoints strictly below the
    value. Literal comparisons — folded into whole-stage codegen."""
    v = F.col(value) if isinstance(value, str) else value
    b: Column = F.lit(0)
    for c in cuts:
        b = b + (v > F.lit(c)).cast("int")
    return b


def _assemble(
    b: DataFrame,
    value_col: str,
    tie_cols: list[str],
    offsets: dict[int, int],
    first_keys: dict[int, tuple],
    n_total: int,
) -> RankedFrame:
    if not offsets:  # empty input: rank column still needs a valid plan
        ranked = b.withColumn("_rank", F.lit(None).cast("long"))
        return RankedFrame(ranked, 0, {}, [])
    off_map = F.create_map(
        *[F.lit(x) for bkt, off in offsets.items() for x in (bkt, off)]
    )
    w = Window.partitionBy("_bkt").orderBy(value_col, *tie_cols)
    ranked = b.withColumn(
        "_rank",
        (F.row_number().over(w) + off_map[F.col("_bkt")]).cast("long"),
    )
    return RankedFrame(ranked, n_total, first_keys, sorted(offsets))


def global_rank(
    df: DataFrame,
    value_col: str,
    tie_cols: list[str],
    key_cols: list[str] | None = None,
    n_buckets: int | None = None,
    rel_err: float = 1e-3,
    coarse: Column | None = None,
    coarse_max_keys: int = 100_000,
) -> RankedFrame:
    """Attach a 1-based global rank under ``ORDER BY value_col, *tie_cols``
    without any single-partition exchange.

    ``key_cols`` (default ``tie_cols``) are the columns captured per bucket
    for boundary expressions (global first row, next-row handoff for lead).
    The ordering must be total (tie_cols break all ties) — with a total
    order, rank == row_number == dense_rank, and percent_rank/cume_dist
    are pure arithmetic over (rank, n_total).

    Two driver-pass strategies (results identical — rank depends only on
    the total order, never on bucket placement):

    - default: approxQuantile cutpoints (pass 1) + per-bucket stats
      (pass 2). Works on any numeric column, guaranteed bucket balance.
    - ``coarse=<Column>`` (round-4 advice fold): ONE histogram pass.
      ``coarse`` must be a NON-DECREASING function of ``value_col`` with
      a bounded number of distinct values (e.g. ``F.floor(col)`` for
      domain-bounded money columns, a date for timestamps): a single
      map-side-combined aggregate per coarse key yields counts + first
      keys, and the driver derives cut values, offsets, and bucket firsts
      from the histogram alone — halving the pre-passes. Bucket balance
      is bounded below by the heaviest single coarse key (a hot key makes
      a fat bucket), which is the trade against the quantile path.
      NaN values (which coarse maps mangle — ``floor(NaN)`` is 0) are
      detected on the value column in the same pass and take a dedicated
      TOP bucket, matching Spark's NaN-sorts-last total order.
    """
    spark = df.sparkSession
    k = n_buckets or spark.sparkContext.defaultParallelism
    keys = key_cols if key_cols is not None else list(tie_cols)
    order_struct = F.struct(value_col, *tie_cols)

    if coarse is not None:
        # NaN values silently break the non-decreasing-map contract
        # (advice r05): floor(NaN) is 0 in Spark, which would bucket NaN
        # rows near the BOTTOM while the window order puts NaN LAST. NaN
        # is therefore detected on the VALUE column inside the same
        # histogram pass (the coarse key is masked to NULL for NaN rows)
        # and routed to a dedicated top bucket, mirroring nulls' bucket -1.
        vtype = df.schema[value_col].dataType.simpleString()
        nan_pred = (
            F.isnan(F.col(value_col)) if vtype in ("float", "double") else F.lit(False)
        )
        hist = (
            df.groupBy(
                nan_pred.alias("_nan"),
                F.when(~nan_pred, coarse).alias("_ck"),
            )
            .agg(
                F.count(F.lit(1)).alias("_cnt"),
                F.min_by(F.struct(*keys), order_struct).alias("_first"),
            )
            .collect()
        )
        if len(hist) > coarse_max_keys:
            raise ValueError(
                f"coarse key has {len(hist)} distinct values "
                f"(> coarse_max_keys={coarse_max_keys}); pick a coarser map"
            )
        nulls = [r for r in hist if not r["_nan"] and r["_ck"] is None]
        nans = [r for r in hist if r["_nan"]]
        rows = sorted(
            (r for r in hist if not r["_nan"] and r["_ck"] is not None),
            key=lambda r: r["_ck"],
        )
        offsets: dict[int, int] = {}
        first_keys: dict[int, tuple] = {}
        acc = 0
        if nulls:  # NULLS FIRST: the whole null group is bucket -1
            offsets[-1] = 0
            first_keys[-1] = tuple(nulls[0]["_first"])
            acc = nulls[0]["_cnt"]
        n_nonnull = sum(r["_cnt"] for r in rows)
        target = max(1, -(-n_nonnull // k))  # ceil
        cuts: list = []
        bucket, in_bucket = 0, 0
        for i, r in enumerate(rows):
            if in_bucket == 0:
                offsets[bucket] = acc
                first_keys[bucket] = tuple(r["_first"])
            in_bucket += r["_cnt"]
            acc += r["_cnt"]
            if in_bucket >= target and i < len(rows) - 1:
                cuts.append(r["_ck"])
                bucket += 1
                in_bucket = 0
        nan_bucket = len(cuts) + 1  # strictly after every cutpoint bucket
        if nans:
            offsets[nan_bucket] = acc
            first_keys[nan_bucket] = tuple(nans[0]["_first"])
            acc += sum(r["_cnt"] for r in nans)
        b = df.withColumn(
            "_bkt",
            F.when(F.col(value_col).isNull(), F.lit(-1))
            .when(nan_pred, F.lit(nan_bucket))
            .otherwise(_bucket_expr(coarse, cuts)),
        )
        return _assemble(b, value_col, tie_cols, offsets, first_keys, acc)

    probs = [i / k for i in range(1, k)]
    cuts = sorted(set(df.stat.approxQuantile(value_col, probs, rel_err)))
    # NULLS FIRST: nulls get bucket -1 (approxQuantile ignores them and the
    # cutpoint comparison would yield a NULL bucket id otherwise)
    b = df.withColumn(
        "_bkt",
        F.when(F.col(value_col).isNull(), F.lit(-1)).otherwise(
            _bucket_expr(value_col, cuts)
        ),
    )
    stats = (
        b.groupBy("_bkt")
        .agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.min_by(F.struct(*keys), order_struct).alias("_first"),
        )
        .collect()
    )  # ≤ k rows — a driver scalar, same class as approxQuantile itself
    stats.sort(key=lambda r: r["_bkt"])
    offsets = {}
    first_keys = {}
    acc = 0
    for r in stats:
        offsets[r["_bkt"]] = acc
        acc += r["_cnt"]
        first_keys[r["_bkt"]] = tuple(r["_first"])
    return _assemble(b, value_col, tie_cols, offsets, first_keys, acc)


def ntile_expr(rank: Column, n_total: int, n_tiles: int) -> Column:
    """``ntile(n_tiles)`` as arithmetic over a precomputed global rank:
    the first ``n_total % n_tiles`` tiles get ``n_total // n_tiles + 1``
    rows, the rest one fewer (Spark/DuckDB/Postgres ntile semantics).
    All operands are Python ints — constant-folded literals."""
    q, rem = divmod(n_total, n_tiles)
    big = (q + 1) * rem  # rows living in the oversized leading tiles
    small_tile = (  # guard q == 0 (n_total < n_tiles): branch never taken
        F.lit(rem) + F.floor((rank - F.lit(big) - 1) / F.lit(max(q, 1))) + 1
    )
    return (
        F.when(rank <= F.lit(big), F.floor((rank - 1) / F.lit(q + 1)) + 1)
        .otherwise(small_tile)
        .cast("int")
    )
