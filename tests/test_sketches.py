"""HLL sketch properties the catalog's rows-only `hll_daily_users` entry
relies on: mergeability (union of partial sketches == sketch of the whole)
and bounded relative error vs exact distinct counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_etl_pipeline_spark.queries import read_events


def test_hll_union_of_daily_equals_whole_and_bounds_error(spark, sf_small):
    ev = read_events(spark, sf_small).select(
        F.date_trunc("day", "ts").alias("d"), "user_id"
    )
    daily = ev.groupBy("d").agg(F.hll_sketch_agg("user_id").alias("sk"))

    merged_est = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e")
    ).collect()[0].e
    whole_est = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("e")
    ).collect()[0].e
    exact = ev.agg(F.count_distinct("user_id").alias("n")).collect()[0].n

    # mergeability: unioning daily partials must reproduce the whole-data
    # sketch exactly (same lgK, same underlying registers)
    assert merged_est == whole_est
    # default lgConfigK=12 → σ ≈ 1.6%; 5% is a conservative 3σ bound
    assert abs(merged_est - exact) / exact < 0.05


def test_hll_daily_error_bound_per_day(spark, sf_small):
    ev = read_events(spark, sf_small).select(
        F.date_trunc("day", "ts").alias("d"), "user_id"
    )
    est = {
        r.d: r.e
        for r in ev.groupBy("d")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("e"))
        .collect()
    }
    exact = {
        r.d: r.n
        for r in ev.groupBy("d").agg(F.count_distinct("user_id").alias("n")).collect()
    }
    assert est.keys() == exact.keys()
    for d, n in exact.items():
        assert abs(est[d] - n) / n < 0.05, f"day {d}: est {est[d]} vs exact {n}"
