"""Advanced relational catalog: operators beyond the reference's surface
that a complete engine must offer (SURVEY §2.4/§2.5 notes on what the
reference lacks — "we still get them free from Spark" — made concrete and
oracle-checked): as-of join, banded range join, cube/grouping sets, pivot,
scalar subquery, interpolated percentiles, lag/lead gaps, ntile.

Oracle conventions follow queries.py: alias every computed column
identically on both sides, decimal-cast double sums, never emit raw
timestamps (strftime both sides), keep window orderings total.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .operators.relational import asof_join, dsum, range_self_join_pairs
from .queries import read_events, register, t

_FMT = "%Y-%m-%d %H:%M:%S"


@register(
    "asof_click_attribution",
    f"""
    WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
         v AS (SELECT * FROM events WHERE event_type = 'view')
    SELECT c.event_id AS click_id,
           c.user_id,
           strftime(c.ts, '{_FMT}') AS click_ts,
           strftime(v.ts, '{_FMT}') AS view_ts
    FROM c ASOF LEFT JOIN v
      ON c.user_id = v.user_id AND v.ts <= c.ts
    """,
    survey="§2.4 gap: as-of join (click→latest prior view attribution);"
    " union+ordered-window formulation, one shuffle",
    tags=("adv", "join", "bench"),
)
def asof_click_attribution(spark, sf_dir):
    ev = read_events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts")
    )
    views = ev.filter(F.col("event_type") == "view")
    out = asof_join(
        clicks,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_vals={"ts": "view_ts_raw"},
    )
    return out.select(
        "click_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.date_format("view_ts_raw", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
    )


@register(
    "range_pairs_5min",
    """
    SELECT a.user_id, count(*) AS n_pairs
    FROM events a JOIN events b
      ON a.user_id = b.user_id AND a.event_id < b.event_id
     AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 300000000
    GROUP BY 1
    """,
    survey="§2.4 gap: range join (events within 5 min, same user) via"
    " time-bucket equi-join — linear shuffle, no per-key nested loop",
    tags=("adv", "join"),
)
def range_pairs_5min(spark, sf_dir):
    ev = read_events(spark, sf_dir)
    pairs = range_self_join_pairs(
        ev, key="user_id", ts_col="ts", window_s=300, id_col="event_id"
    )
    return pairs.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_pairs"))


@register(
    "cube_returnflag_status",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS rf,
           coalesce(l_linestatus, 'ALL') AS ls,
           count(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    survey="§2.5 gap: grouping sets / cube (partial-agg reuse across sets)",
    tags=("adv", "agg", "bench"),
)
def cube_returnflag_status(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_quantity", "qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "n",
            "qty",
        )
    )


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PIV_ALIASES = ["urgent", "high", "medium", "not_specified", "low"]


@register(
    "pivot_priority_by_year",
    """
    SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
           count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS urgent,
           count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS high,
           count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS medium,
           count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED')
             AS not_specified,
           count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS low
    FROM orders
    GROUP BY 1
    """,
    survey="§2.5 gap: pivot (explicit value list — single-pass, no second"
    " distinct-scan job)",
    tags=("adv", "agg"),
)
def pivot_priority_by_year(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    piv = (
        o.groupBy(F.year("o_orderdate").cast("long").alias("yr"))
        .pivot("o_orderpriority", _PRIORITIES)
        .count()
    )
    renamed = piv
    for src, dst in zip(_PRIORITIES, _PIV_ALIASES):
        renamed = renamed.withColumnRenamed(src, dst)
    # pivot leaves combinations with no rows as NULL; FILTER counts give 0
    return renamed.select(
        "yr", *[F.coalesce(F.col(d), F.lit(0)).alias(d) for d in _PIV_ALIASES]
    )


@register(
    "orders_above_global_avg",
    """
    SELECT o_orderpriority,
           count(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
    GROUP BY 1
    """,
    survey="§2.5 gap: scalar subquery (global avg broadcast back into the"
    " filter — two passes, no driver round-trip)",
    tags=("adv", "agg"),
)
def orders_above_global_avg(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    avg = o.agg(F.avg("o_totalprice").alias("__avg"))
    return (
        o.crossJoin(F.broadcast(avg))
        .filter(F.col("o_totalprice") > F.col("__avg"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice", "total"))
    )


@register(
    "price_percentiles_by_brand",
    """
    SELECT p_brand,
           round(quantile_cont(p_retailprice, 0.5), 4) AS p50,
           round(quantile_cont(p_retailprice, 0.9), 4) AS p90
    FROM part
    GROUP BY 1
    """,
    survey="§2.5 gap: exact interpolated percentiles (sort-based; at scale"
    " prefer approx_percentile sketches — rows-only twin below)",
    tags=("adv", "agg"),
)
def price_percentiles_by_brand(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    return p.groupBy("p_brand").agg(
        F.round(F.percentile("p_retailprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("p_retailprice", F.lit(0.9)), 4).alias("p90"),
    )


# The sketch VALUES are engine-specific (Greenwald-Khanna / HLL++ have
# no DuckDB expression), but each sketch PUBLISHES a deterministic error
# bound — so the entry emits the invariant-audit relation (the r10
# semdedup discipline, verdict r10 item 5): Spark VERIFIES every approx
# value against the exact answer within the documented bound and emits
# one row per property; the oracle is the constant SQL stating those
# truths plus an exactly-computable context column. A hash-green row
# certifies the bounds actually held over real sketch output —
# value-level evidence stays in tests/test_sketches.py.
_APPROX_PCTL_INVARIANT_ORACLE = """
    SELECT i.invariant, TRUE AS holds,
           CAST((SELECT count(DISTINCT p_brand) FROM part) AS BIGINT)
             AS n_brands
    FROM (
      SELECT unnest([
        'distinct_within_rsd_bound',
        'p50_within_rank_bound',
        'p90_within_rank_bound'
      ]) AS invariant
    ) i
    """


@register(
    "approx_percentiles_by_brand",
    _APPROX_PCTL_INVARIANT_ORACLE,
    survey="§2.5: approx_percentile — the 100 TB percentile path (KLL-style"
    " sketch, one pass, mergeable partials; no global sort). Round 11"
    " (verdict r10 item 5): driver-checked via the INVARIANT ORACLE —"
    " every per-brand approx percentile is audited against the exact"
    " rank window the sketch's accuracy parameter guarantees"
    " (rank error ≤ N/accuracy), and approx_count_distinct against its"
    " rsd bound; the emitted relation is the audit, hash-pinned against"
    " the constant SQL stating it",
    tags=("adv", "agg", "sketch"),
)
def approx_percentiles_by_brand(spark, sf_dir):
    """Per-brand approx_percentile(0.5/0.9, accuracy=100) and
    approx_count_distinct(rsd=0.05), AUDITED: the value the sketch
    returns must occupy a rank within eps*N (+1 discreteness slack) of
    the target rank in its group's exact order, and the HLL++ estimate
    must sit within 5*rsd of the exact distinct count. bool_and over
    all brands per property; empty input holds vacuously (matching the
    oracle's constant TRUE over n_brands=0)."""
    p = t(spark, sf_dir, "part")
    acc = 100  # rank error bound: eps = 1/accuracy of each group's N
    rsd = 0.05
    approx = p.groupBy("p_brand").agg(
        F.approx_percentile("p_retailprice", F.lit(0.5), F.lit(acc))
        .alias("p50"),
        F.approx_percentile("p_retailprice", F.lit(0.9), F.lit(acc))
        .alias("p90"),
        F.approx_count_distinct("p_partkey", rsd).alias("nd_approx"),
        F.count_distinct("p_partkey").alias("nd_exact"),
        F.count(F.lit(1)).alias("n"),
    )
    # one joined pass computes the rank interval each returned value
    # occupies in its group's exact order: [count(< v) + 1, count(<= v)]
    lt = lambda v: F.sum(  # noqa: E731
        (F.col("p_retailprice") < F.col(v)).cast("long")
    )
    le = lambda v: F.sum(  # noqa: E731
        (F.col("p_retailprice") <= F.col(v)).cast("long")
    )
    j = (
        p.select("p_brand", "p_retailprice")
        .join(F.broadcast(approx), "p_brand")
        .groupBy("p_brand")
        .agg(
            F.first("n").alias("n"),
            F.first("nd_approx").alias("nd_approx"),
            F.first("nd_exact").alias("nd_exact"),
            lt("p50").alias("lo50"), le("p50").alias("hi50"),
            lt("p90").alias("lo90"), le("p90").alias("hi90"),
        )
    )

    def rank_ok(q, lo, hi):
        # the value's occupied rank interval must intersect the
        # guaranteed window [q*n - eps*n - 1, q*n + eps*n + 1]
        target = F.lit(q) * F.col("n")
        slack = F.col("n") / F.lit(float(acc)) + F.lit(1.0)
        return (F.col(lo) + F.lit(1) <= target + slack) & (
            F.col(hi) >= target - slack
        )

    nd_ok = (
        F.abs(F.col("nd_approx") - F.col("nd_exact"))
        <= F.lit(5.0 * rsd) * F.col("nd_exact") + F.lit(1.0)
    )
    audit = j.agg(
        F.coalesce(F.bool_and(rank_ok(0.5, "lo50", "hi50")), F.lit(True))
        .alias("ok50"),
        F.coalesce(F.bool_and(rank_ok(0.9, "lo90", "hi90")), F.lit(True))
        .alias("ok90"),
        F.coalesce(F.bool_and(nd_ok), F.lit(True)).alias("oknd"),
        F.count(F.lit(1)).cast("long").alias("n_brands"),
    )

    def row(name, col):
        return audit.select(
            F.lit(name).alias("invariant"),
            F.col(col).alias("holds"),
            F.col("n_brands"),
        )

    return (
        row("distinct_within_rsd_bound", "oknd")
        .unionByName(row("p50_within_rank_bound", "ok50"))
        .unionByName(row("p90_within_rank_bound", "ok90"))
    )


@register(
    "customer_order_gaps",
    """
    WITH g AS (
      SELECT o_custkey, o_orderdate,
             lag(o_orderdate) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) AS prev
      FROM orders
    )
    SELECT o_custkey,
           count(*) AS n_orders,
           CAST(count(prev) AS BIGINT) AS n_gaps,
           CAST(SUM(CAST((epoch_us(o_orderdate) - epoch_us(prev)) / 1000000
                         AS BIGINT)) AS BIGINT) AS total_gap_s
    FROM g
    GROUP BY 1
    """,
    survey="§2.5 gap: lag/lead over a total per-key ordering (order"
    " inter-arrival gaps)",
    tags=("adv", "window"),
)
def customer_order_gaps(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = o.select(
        "o_custkey",
        "o_orderdate",
        F.lag("o_orderdate").over(w).alias("prev"),
    )
    # parquet dates are TIMESTAMP_NTZ; cast → TIMESTAMP is identity under
    # the UTC session zone and is what unix_micros requires
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    gap_s = ((us("o_orderdate") - us("prev")) / F.lit(1_000_000)).cast("long")
    return g.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count("prev").alias("n_gaps"),
        F.sum(gap_s).cast("long").alias("total_gap_s"),
    )


@register(
    "customer_balance_quartiles",
    """
    WITH q AS (
      SELECT c_custkey, c_acctbal,
             ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
      FROM customer
    )
    SELECT quartile,
           count(*) AS n,
           round(min(c_acctbal), 2) AS min_bal,
           round(max(c_acctbal), 2) AS max_bal
    FROM q
    GROUP BY 1
    """,
    survey="§2.5 gap: ntile ranking over a total order — computed scale-"
    " safely via operators.ranking.global_rank (approx-quantile literal"
    " cutpoints → bucketed row_number + offset map; no single-partition"
    " exchange) + ntile_expr arithmetic; the oracle keeps the exact global"
    " window as the twin",
    tags=("adv", "window"),
)
def customer_balance_quartiles(spark, sf_dir):
    from .operators.ranking import global_rank, ntile_expr

    c = t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    # ONE-pass coarse mode (see supplier_window_stats): floor(acctbal) is
    # domain-bounded, halving the driver pre-passes
    rf = global_rank(
        c, "c_acctbal", ["c_custkey"], coarse=F.floor(F.col("c_acctbal"))
    )
    if rf.n_total == 0:
        return spark.createDataFrame(
            [], "quartile int, n long, min_bal double, max_bal double"
        )
    q = rf.df.withColumn("quartile", ntile_expr(F.col("_rank"), rf.n_total, 4))
    return q.groupBy("quartile").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
    )


@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           count(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price,
           round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*), 4) AS avg_qty,
           round(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)
                 / count(*), 4) AS avg_disc
    FROM lineitem
    GROUP BY 1, 2
    """,
    survey="§2.5: TPC-H Q1-shaped pricing summary (multi-measure hash-agg;"
    " avg derived from exact decimal sums so it is partition-invariant)",
    tags=("adv", "agg", "bench"),
)
def pricing_summary(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    sq = F.sum(F.col("l_quantity").cast("decimal(18,2)"))
    sp = F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
    sd = F.sum(F.col("l_discount").cast("decimal(18,4)"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        n.alias("n"),
        sq.cast("double").alias("sum_qty"),
        sp.cast("double").alias("sum_price"),
        F.round(sq.cast("double") / n, 4).alias("avg_qty"),
        F.round(sd.cast("double") / n, 4).alias("avg_disc"),
    )


@register(
    "union_active_parties",
    """
    SELECT party, count(*) AS n FROM (
      SELECT 'cust:' || CAST(o_custkey AS VARCHAR) AS party FROM orders
      UNION ALL
      SELECT 'supp:' || CAST(l_suppkey AS VARCHAR) AS party FROM lineitem
    ) GROUP BY 1
    """,
    survey="§2.5 gap: set operation — UNION ALL of two differently-shaped"
    " relations normalized to one schema (unionByName)",
    tags=("adv", "setop"),
)
def union_active_parties(spark, sf_dir):
    o = t(spark, sf_dir, "orders").select(
        F.concat(F.lit("cust:"), F.col("o_custkey").cast("string")).alias("party")
    )
    li = t(spark, sf_dir, "lineitem").select(
        F.concat(F.lit("supp:"), F.col("l_suppkey").cast("string")).alias("party")
    )
    return o.unionByName(li).groupBy("party").agg(F.count(F.lit(1)).alias("n"))


@register(
    "moving_avg_monthly_revenue",
    """
    WITH m AS (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS mon,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      FROM orders
      GROUP BY 1
    )
    SELECT mon, rev,
           round(avg(rev) OVER (ORDER BY mon
                                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
                 4) AS rev_ma3
    FROM m
    """,
    survey="§2.5 gap: window frame clause (3-month trailing average over a"
    " pre-aggregated series — frame runs over months, not raw rows)",
    tags=("adv", "window"),
)
def moving_avg_monthly_revenue(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("mon")
    ).agg(dsum("o_totalprice", "rev"))
    w = Window.orderBy("mon").rowsBetween(-2, Window.currentRow)
    return m.select("mon", "rev", F.round(F.avg("rev").over(w), 4).alias("rev_ma3"))


# --- full-pipeline entries ---------------------------------------------------
# Inputs come from the seeded datagen, not the sf_dir tables — but the
# generator is deterministic pure Python (datagen.transactions_payload,
# crc32-seeded), so the ORACLE inlines the exact same source rows as SQL
# VALUES and recomputes the full chain (dedupe → star join → daily agg)
# independently in DuckDB. This converts both end-to-end §3 pipelines from
# rows-only smoke checks into hash-level correctness evidence.


def _grocery_mart_oracle() -> str:
    """Self-contained DuckDB twin of the §3.1 chain for the catalog run
    (run_id='run-catalog', scenario='ok', n=40): same seeded source rows
    inlined as VALUES, then last-write-wins dedupe on (run_id, txn_id) →
    star join to the seed dims (``sql/init.sql:47-61``) → revenue_cents →
    daily mart (``mart_daily_sales.sql:6-15`` shape + region)."""
    from .datagen import DIM_PRODUCTS_ROWS, DIM_STORES_ROWS, transactions_payload

    payload = transactions_payload("run-catalog", "ok", 40)
    txn_vals = ",\n      ".join(
        "('{}', '{}', '{}', {}, {}, TIMESTAMP '{}')".format(
            t["txn_id"], t["store_id"], t["sku"], t["quantity"],
            t["unit_price_cents"], t["event_time"].replace("+00:00", "").replace("T", " "),
        )
        for t in payload["transactions"]
    )
    store_vals = ", ".join(f"('{sid}', '{region}')" for sid, _, region, _ in DIM_STORES_ROWS)
    sku_vals = ", ".join(f"('{sku}', '{cat}')" for sku, cat, _, _ in DIM_PRODUCTS_ROWS)
    return f"""
    WITH txns(txn_id, store_id, sku, quantity, unit_price_cents, event_time) AS (
      VALUES {txn_vals}
    ),
    dim_store(store_id, region) AS (VALUES {store_vals}),
    dim_product(sku, category) AS (VALUES {sku_vals}),
    deduped AS (
      SELECT * FROM txns
      QUALIFY row_number() OVER (
        PARTITION BY txn_id ORDER BY event_time DESC) = 1
    ),
    fct AS (
      SELECT d.*, s.region,
             CAST(d.quantity AS BIGINT) * d.unit_price_cents AS revenue_cents
      FROM deduped d
      JOIN dim_store s USING (store_id)
      JOIN dim_product p USING (sku)
    )
    SELECT strftime(date_trunc('day', event_time), '%Y-%m-%d') AS day,
           store_id, region,
           count(*) AS txns,
           CAST(SUM(quantity) AS BIGINT) AS units,
           CAST(SUM(revenue_cents) AS BIGINT) AS gross_amount_cents
    FROM fct
    GROUP BY 1, 2, 3
    """


def _retail_mart_oracle() -> str:
    """DuckDB twin of the §3.2 dbt chain ('ok' scenario): the literal seed
    rows (``retail_seed_dag.py:105-113``) → typed staging casts
    (``stg_transactions.sql:22-42``) → daily mart (``mart_daily_sales.sql``)."""
    from .pipelines.retail import SEED_ROWS

    vals = ",\n      ".join(
        f"('{r[0]}', {r[1]}, '{r[2]}', {r[3]}, TIMESTAMP '{r[4]}')" for r in SEED_ROWS
    )
    return f"""
    WITH src(transaction_id, store_id, amount_cents, quantity, transaction_ts) AS (
      VALUES {vals}
    ),
    stg AS (
      SELECT CAST(transaction_id AS VARCHAR) AS transaction_id,
             CAST(store_id AS INTEGER) AS store_id,
             CAST(amount_cents AS INTEGER) AS amount_cents,
             CAST(quantity AS INTEGER) AS quantity,
             transaction_ts
      FROM src
    )
    SELECT strftime(date_trunc('day', transaction_ts), '%Y-%m-%d') AS day,
           store_id,
           count(*) AS txns,
           CAST(SUM(quantity) AS BIGINT) AS units,
           CAST(SUM(CAST(amount_cents AS BIGINT)) AS BIGINT) AS gross_amount_cents
    FROM stg
    GROUP BY 1, 2
    """


@register(
    "grocery_pipeline_mart",
    _grocery_mart_oracle(),
    survey="§3.1 end-to-end: generate → validate → stage → star join → mart"
    " (driver-visible hash check of the whole grocery chain against an"
    " independently recomputed DuckDB twin over the same seeded rows)",
    tags=("pipeline",),
)
def grocery_pipeline_mart(spark, sf_dir):
    import tempfile

    from .pipelines import grocery

    base = tempfile.mkdtemp(prefix="grocery_q_")
    res = grocery.run(spark, base, "run-catalog", "ok")
    return res.mart.withColumn("day", F.col("day").cast("string"))


@register(
    "retail_pipeline_mart",
    _retail_mart_oracle(),
    survey="§3.2 end-to-end: seed → typed staging → daily mart → quality"
    " gates (dbt-chain twin, hash-checked against inlined seed rows)",
    tags=("pipeline",),
)
def retail_pipeline_mart(spark, sf_dir):
    from .pipelines import retail

    res = retail.run(spark, "ok")
    return res.mart.withColumn("day", F.col("day").cast("string"))


@register(
    "sql_exists_in_subqueries",
    """
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 100000)
      AND c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 1)
    GROUP BY 1
    """,
    survey="§2.4/§2.5: the SQL entry point — correlated EXISTS + IN"
    " subqueries, decorrelated by Catalyst into semi joins",
    tags=("adv", "sql"),
)
def sql_exists_in_subqueries(spark, sf_dir):
    for name in ("customer", "orders", "nation"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"sqlq_{name}")
    return spark.sql(
        """
        SELECT c_mktsegment, count(*) AS n_customers
        FROM sqlq_customer c
        WHERE EXISTS (SELECT 1 FROM sqlq_orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 100000)
          AND c_nationkey IN (SELECT n_nationkey FROM sqlq_nation
                              WHERE n_regionkey = 1)
        GROUP BY c_mktsegment
        """
    )


@register(
    "q3_shipping_priority",
    """
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15'
      AND l.l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY 1, 3, 4
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    survey="§2.4: TPC-H Q3 shape — selective 3-way join, grouped revenue,"
    " global top-10 (TakeOrderedAndProject, no full sort)",
    tags=("adv", "join", "bench"),
)
def q3_shipping_priority(spark, sf_dir):
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1995-03-15")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1995-03-15")
    rev = F.sum(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    ).cast("double")
    # format-after-aggregate (round 13, the daily_sales_mart pattern):
    # group on the day-TRUNCATED timestamp — the per-row date_format ran
    # on every surviving fact row and widened the partial-agg shuffle key
    # from 8 bytes to a 10-char string (guide §2.3); the string is
    # rendered on the aggregated rows only. date_trunc('day') →
    # 'yyyy-MM-dd' is injective under the fixed UTC session, so the
    # groups — and the output — are unchanged.
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "l_orderkey",
            F.date_trunc("day", "o_orderdate").alias("_od"),
            "o_orderpriority",
        )
        .agg(rev.alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("_od", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "q7_nation_volume",
    """
    SELECT n.n_name AS cust_nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS yr,
           count(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS volume
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1, 2
    """,
    survey="§2.4: TPC-H Q7 shape — 4-way join, revenue volume by customer"
    " nation × year (dims broadcast, fact never shuffled pre-agg)",
    tags=("adv", "join"),
)
def q7_nation_volume(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    vol = F.sum(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    ).cast("double")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("cust_nation"),
            F.year("o_orderdate").cast("long").alias("yr"),
        )
        .agg(F.count(F.lit(1)).alias("n_items"), vol.alias("volume"))
    )


@register(
    "collect_priorities_per_segment",
    """
    SELECT c.c_mktsegment,
           array_to_string(list_sort(list(DISTINCT o.o_orderpriority)), ',')
             AS priorities,
           count(*) AS n_orders
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
    survey="§2.5 gap: collection aggregate (collect_set → sorted array; the"
    " canonical ordering makes it hash-comparable across engines)",
    tags=("adv", "agg"),
)
def collect_priorities_per_segment(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            # string-join the sorted array: engine-portable representation
            # (array cells render differently across drivers/pandas)
            F.array_join(F.array_sort(F.collect_set("o_orderpriority")), ",").alias(
                "priorities"
            ),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "from_json_typed_props",
    """
    SELECT CAST(json_extract(props, '$.k') AS INTEGER) % 10 AS k_mod,
           count(*) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT)
             AS k_sum
    FROM events
    WHERE json_extract(props, '$.k') IS NOT NULL
    GROUP BY 1
    """,
    survey="§2.3 P8 typed: from_json into a StructType (schema-on-read over"
    " a JSONB-style column) vs string-path extraction",
    tags=("adv", "json"),
)
def from_json_typed_props(spark, sf_dir):
    from .queries import read_events

    ev = read_events(spark, sf_dir)
    parsed = ev.select(
        F.from_json("props", "k INT").alias("p")
    ).filter(F.col("p.k").isNotNull())
    return parsed.groupBy((F.col("p.k") % 10).alias("k_mod")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("p.k").cast("long").alias("k_sum"),
    )


@register(
    "rolling_7d_revenue",
    """
    WITH d AS (
      SELECT o_orderpriority, date_trunc('day', o_orderdate) AS d,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
      FROM orders GROUP BY 1, 2
    )
    SELECT o_orderpriority, strftime(d, '%Y-%m-%d') AS day,
           CAST(rev_dec AS DOUBLE) AS daily_rev,
           CAST(SUM(rev_dec) OVER (
                  PARTITION BY o_orderpriority ORDER BY d
                  RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS rev_7d
    FROM d
    """,
    survey="§2.5 gap: RANGE window frame over time (trailing 7 calendar"
    " days, not 7 rows — gap days shrink the frame); sums stay DECIMAL"
    " through the frame so DuckDB's segment-tree accumulation and Spark's"
    " running frame can't drift; Spark expresses the interval frame as"
    " rangeBetween(-6, 0) over epoch-days",
    tags=("adv", "window"),
)
def rolling_7d_revenue(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    base = o.groupBy(
        "o_orderpriority", F.date_trunc("day", "o_orderdate").alias("d")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev_dec"))
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")))
        .rangeBetween(-6, Window.currentRow)
    )
    return base.select(
        "o_orderpriority",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("rev_dec").cast("double").alias("daily_rev"),
        F.sum("rev_dec").over(w).cast("double").alias("rev_7d"),
    )


# Estimates are engine-specific, but the DataSketches HLL publishes a
# relative-error bound — the invariant-audit discipline again (verdict
# r10 item 5): Spark checks every per-day estimate AND the
# union-of-sketches estimate against exact distinct counts within a
# deterministic tolerance, emitting one row per property; the oracle is
# the constant SQL stating them with the exactly-computable day count.
_HLL_INVARIANT_ORACLE = """
    SELECT i.invariant, TRUE AS holds,
           CAST((SELECT count(DISTINCT date_trunc('day', ts)) FROM events)
                AS BIGINT) AS n_days
    FROM (
      SELECT unnest([
        'daily_estimate_within_rel_error',
        'merged_estimate_within_rel_error'
      ]) AS invariant
    ) i
    """


@register(
    "hll_daily_users",
    _HLL_INVARIANT_ORACLE,
    survey="§2.5 extension: mergeable distinct-count sketches — daily HLL"
    " sketch of user_id (Apache DataSketches via hll_sketch_agg); the"
    " 100 TB pattern is sketch-per-partition once, union at query time"
    " (re-aggregation without re-scanning raw data). Round 11 (verdict"
    " r10 item 5): driver-checked via the INVARIANT ORACLE — every"
    " per-day estimate and the hll_union_agg merge are audited within"
    " the sketch's relative-error bound against exact distincts,"
    " hash-pinned against the constant SQL stating it",
    tags=("adv", "sketch"),
)
def hll_daily_users(spark, sf_dir):
    """Daily HLL sketches of user_id, AUDITED: each day's estimate must
    sit within 10x the sketch's standard relative error (lgConfigK=12 →
    rsd ≈ 1.04/√4096 ≈ 1.6%; the 10x margin keeps a deterministic
    check deterministic-by-construction for fixed data — HLL register
    merges are max(), so the estimate is partitioning-independent) of
    the exact distinct count, and the UNION of the daily sketches
    (re-aggregation without re-scanning — the sketch's raison d'être)
    within the same bound of the global exact count. Empty input holds
    vacuously, matching the oracle's constants."""
    ev = read_events(spark, sf_dir).select(
        F.date_trunc("day", "ts").alias("d"), "user_id"
    )
    tol = 10.0 * 1.04 / (4096.0 ** 0.5)
    daily = ev.groupBy("d").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count_distinct("user_id").alias("nd"),
    )
    day_ok = (
        F.abs(F.hll_sketch_estimate("sk") - F.col("nd"))
        <= F.lit(tol) * F.col("nd") + F.lit(1.0)
    )
    a = daily.agg(
        F.coalesce(F.bool_and(day_ok), F.lit(True)).alias("daily_ok"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_est"),
    )
    total = ev.agg(F.count_distinct("user_id").alias("nd_total"))
    audit = a.crossJoin(F.broadcast(total)).select(
        "daily_ok",
        "n_days",
        F.coalesce(
            F.abs(F.col("merged_est") - F.col("nd_total"))
            <= F.lit(tol) * F.col("nd_total") + F.lit(1.0),
            F.lit(True),  # empty input: no sketches to merge
        ).alias("merged_ok"),
    )

    def row(name, col):
        return audit.select(
            F.lit(name).alias("invariant"),
            F.col(col).alias("holds"),
            F.col("n_days"),
        )

    return row("daily_estimate_within_rel_error", "daily_ok").unionByName(
        row("merged_estimate_within_rel_error", "merged_ok")
    )
