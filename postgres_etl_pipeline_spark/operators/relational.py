"""Relational parity operators (SURVEY §2.3–§2.5).

Each function is a pure DataFrame→DataFrame transform; Catalyst owns the
physical strategy. Scale notes are inline: what shuffles, what broadcasts,
what prunes.

Cross-engine determinism note (the driver hash-compares us against DuckDB):
SUM over doubles is order-dependent in IEEE-754, and Spark's partial/final
aggregation order differs run to run. Every money/measure aggregate therefore
casts to DECIMAL first (exact, order-independent), then casts the final
result back to DOUBLE. This is also the Postgres-parity behavior: the
reference keeps money in integer cents (``sql/init.sql:24-25,39``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Exact, order-independent sum of a 2-decimal measure column.
# DECIMAL(18,2) covers sums up to 10^16 cents — far beyond 100 TB of rows
# per group; Spark widens the sum accumulator to DECIMAL(28,2) anyway.
def dsum(col: str | Column, alias: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(18,2)")).cast("double").alias(alias)


def dsum_expr(col: Column, alias: str) -> Column:
    return F.sum(col).cast("double").alias(alias)


def money(col: str | Column) -> Column:
    """Cast a 2-dp double measure to exact decimal for arithmetic."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,2)")


def typed_projection(df: DataFrame, casts: dict[str, str]) -> DataFrame:
    """P1 — typed projection: cast a set of columns, keep names.

    Reference: dbt staging model casts every source column
    (``dbt_retail/models/staging/stg_transactions.sql:22-42``).
    Uses ANSI ``cast`` (errors on bad data, Postgres parity); callers that
    want null-on-failure pass ``try_cast`` via :func:`tolerant_projection`.
    Scale: pure map-side narrow op, stays in whole-stage codegen.
    """
    return df.select(
        *[
            F.col(c).cast(t).alias(c) if c in casts else F.col(c)
            for c, t in ((c, casts.get(c)) for c in df.columns)
        ]
    )


def tolerant_projection(df: DataFrame, casts: dict[str, str]) -> DataFrame:
    """P1 variant — try_cast: uncastable values become NULL (quarantine path
    counts them instead of failing; SURVEY §2.9 caution 1)."""
    return df.select(
        *[
            F.try_cast(F.col(c), t).alias(c) if c in casts else F.col(c)
            for c, t in ((c, casts.get(c)) for c in df.columns)
        ]
    )


def day_bucket(ts_col: str | Column) -> Column:
    """P2 — ``date_trunc('day', ts)::date``
    (reference ``mart_daily_sales.sql:8``)."""
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return F.to_date(F.date_trunc("day", c))


def safe_div(num: Column, den: Column) -> Column:
    """P3 — division with div-by-zero guard: ``num / nullif(den, 0)``.

    The reference's ``logic_bug`` scenario injects ``amount_cents / 0``
    (``stg_transactions.sql:30-32``); the correct form guards with nullif.
    Under ANSI mode plain ``/0`` raises (Postgres parity) — this returns NULL.
    """
    return num / F.nullif(den, F.lit(0))


def derived_revenue(qty: str = "quantity", price: str = "unit_price_cents") -> Column:
    """P4 — ``revenue_cents = quantity * unit_price_cents`` as BIGINT
    (reference ``sql/init.sql:39``)."""
    return (F.col(qty).cast("long") * F.col(price).cast("long")).alias(
        "revenue_cents"
    )


def star_join(
    fact: DataFrame,
    dims: dict[str, DataFrame],
    *,
    broadcast_dims: bool = True,
) -> DataFrame:
    """J1 — star join: fact ⋈ each dim on its natural key.

    Reference declares (never codes) ``stg_transactions ⋈ dim_store ⋈
    dim_product`` producing the denormalized fact (``sql/init.sql:33-44``).
    Scale: dims are broadcast (no shuffle of the 100 TB fact side); Catalyst
    would usually pick this itself under autoBroadcastJoinThreshold, but we
    hint explicitly because at 100 TB a mistaken sort-merge join of the fact
    table is catastrophic. ``dims`` maps join-key → dim DataFrame.
    """
    out = fact
    for key, dim in dims.items():
        d = F.broadcast(dim) if broadcast_dims else dim
        out = out.join(d, key, "inner")
    return out


def dedupe_last_write_wins(
    df: DataFrame, keys: list[str], order_by: list[Column]
) -> DataFrame:
    """K5/J3 — keyed-upsert semantics as a batch dedupe.

    The reference's loader applies rows sequentially with ``INSERT … ON
    CONFLICT (run_id, txn_id) DO UPDATE`` so intra-batch duplicate keys end
    last-row-wins (``grocery_lib/pg.py:33-60``). Batch equivalent: row_number
    over an explicit deterministic ordering, keep rn=1 (SURVEY §2.9 caution 5).

    Scale: one hash shuffle on ``keys``; with AQE skew-join splitting a hot
    key still spreads. Prefer this over ``dropDuplicates`` (which keeps an
    arbitrary row — non-deterministic under retries).
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def daily_sales_mart(
    txns: DataFrame,
    ts_col: str = "transaction_ts",
    amount_col: str = "amount_cents",
    qty_col: str = "quantity",
    group_extra: list[str] = ("store_id",),
) -> DataFrame:
    """A1 — the reference's flagship query: daily sales mart.

    ``GROUP BY date_trunc('day', ts)::date, store_id`` with count(*),
    sum(amount), sum(quantity) (``dbt_retail/models/marts/
    mart_daily_sales.sql:6-15``). Catalyst compiles this to partial+final
    hash aggregation (map-side combine) — the shuffle only carries one row
    per (day, store) per input partition.
    """
    return txns.groupBy(
        day_bucket(ts_col).alias("day"), *group_extra
    ).agg(
        F.count(F.lit(1)).alias("txns"),
        F.sum(qty_col).cast("long").alias("units"),
        F.sum(F.col(amount_col).cast("long")).alias("gross_amount_cents"),
    )


def topk_per_group(
    df: DataFrame, group: list[str], order_by: list[Column], k: int
) -> DataFrame:
    """Top-k rows per group via rank over a deterministic ordering.

    Scale: Spark pushes a per-partition top-k (WindowGroupLimit) below the
    shuffle since 3.5, so each map task only emits k rows per group.
    Tie-break columns must make the ordering total or results are
    non-deterministic across runs.
    """
    w = Window.partitionBy(*group).orderBy(*order_by)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_vals: dict[str, str],
) -> DataFrame:
    """As-of join: for each left row, the right row with the greatest
    ``right_ts`` ≤ ``left_ts`` within the same ``on`` keys (LEFT semantics:
    unmatched left rows keep NULLs).

    Spark has no native as-of join; the scalable formulation is union +
    ordered window, NOT a range join: tag right rows 0 / left rows 1, union,
    then ``last(value, ignoreNulls)`` over (keys ORDER BY ts, tag ROWS
    UNBOUNDED PRECEDING). One shuffle keyed by ``on`` — never the quadratic
    per-key cross product an inequality join would plan, and no per-key
    state blowup (the window is running-last, O(1) per row).

    ``right_vals`` maps right column → output alias. Ties on ``right_ts``
    resolve to the same carried value only if the value is functionally
    determined by the ts (sort is not total otherwise) — pass the ts itself
    or dedupe the right side first for strict determinism.
    """
    tag = F.lit(0)
    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        tag.alias("__tag"),
        *[F.col(src).alias(dst) for src, dst in right_vals.items()],
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
    )
    for dst in right_vals.values():
        l = l.withColumn(dst, F.lit(None).cast(dict(r.dtypes)[dst]))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts"), F.col("__tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "*",
        *[
            F.last(dst, ignorenulls=True).over(w).alias(f"__f_{dst}")
            for dst in right_vals.values()
        ],
    )
    out = filled.filter(F.col("__tag") == 1)
    for dst in right_vals.values():
        out = out.drop(dst).withColumnRenamed(f"__f_{dst}", dst)
    return out.drop("__ts", "__tag")


def range_self_join_pairs(
    df: DataFrame,
    key: str,
    ts_col: str,
    window_s: int,
    id_col: str,
) -> DataFrame:
    """Pairs of rows with the same ``key`` whose timestamps lie within
    ``window_s`` seconds (id_a < id_b, each pair exactly once).

    Scale: a naive ``|a.ts - b.ts| <= w`` condition gives Spark no equi-key
    → nested-loop per key. This bucketizes time into ``window_s``-wide
    epochs and equi-joins on (key, bucket) with the LEFT side exploded to
    the three adjacent buckets; the band filter then trims. Shuffle stays
    linear in rows × 3; each qualifying pair is found exactly once (the
    right row's bucket is fixed, and it appears once in the left's exploded
    neighborhood).
    """
    us = F.unix_micros(F.col(ts_col))
    win_us = int(window_s) * 1_000_000
    bucket = F.floor(us / F.lit(win_us)).cast("long")
    a = df.select(
        F.col(key).alias("k"),
        F.col(id_col).alias("id_a"),
        us.alias("us_a"),
        F.explode(
            F.array(bucket - 1, bucket, bucket + 1)
        ).alias("bucket"),
    )
    b = df.select(
        F.col(key).alias("k"),
        F.col(id_col).alias("id_b"),
        us.alias("us_b"),
        bucket.alias("bucket"),
    )
    return (
        a.join(b, ["k", "bucket"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("us_a") - F.col("us_b")) <= F.lit(win_us))
        )
        .select(F.col("k").alias(key), "id_a", "id_b", "us_a", "us_b")
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for SKEWED group keys.

    A hot key concentrates its rows in one reducer; salting splits each key
    into ``salt_buckets`` sub-groups (phase 1, shuffle keyed by
    (key, salt)), then merges the partials (phase 2 — at most
    ``salt_buckets`` rows per key, trivially balanced).

    ``aggs`` maps output column → (function, input column) for the
    decomposable aggregates this supports: sum / count / min / max.
    (avg must be derived as sum/count by the caller; non-decomposable
    aggregates can't be salted.) Spark's AQE skew handling covers JOINS,
    not aggregations — partial aggregation usually absorbs agg skew, but
    when a high-cardinality accumulator (e.g. collect-like or distinct
    pre-agg) defeats map-side combine, this is the explicit fix.
    """
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    first_fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for out, (fn, _col) in aggs.items():
        if fn not in first_fn:
            raise ValueError(f"non-decomposable aggregate: {fn}")
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[first_fn[fn](c).alias(out) for out, (fn, c) in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[merge_fn[fn](out).alias(out) for out, (fn, _c) in aggs.items()]
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    other_key: str | None = None,
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-safe large⋈large equi-join: salt the skewed side, REPLICATE the
    other side across all salt values.

    A hot join key sends all its rows to one reducer; salting appends a
    random bucket to the skewed side's key and joins against the other side
    exploded ``salt_buckets`` times, so the hot key's rows spread over
    ``salt_buckets`` reducers. Cost: the other side's shuffle volume
    × salt_buckets — use only when the other side is much smaller than the
    skew concentration (classic fact⋈mid-size-dim skew).

    AQE's skew-join split (on in this engine's sessions) handles most cases
    by splitting oversized partitions at runtime; this explicit form exists
    for the cases AQE can't see — a skewed SHUFFLE_HASH side, or skew
    appearing only after upstream operators inflate a partition. Result
    equivalence vs the plain join is asserted in tests.
    """
    ok = other_key or key
    salted = skewed.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    replicated = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    cond = (salted[key] == replicated[ok]) & (
        salted["__salt"] == replicated["__salt"]
    )
    return salted.join(replicated, cond).drop("__salt")
