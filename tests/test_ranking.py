"""operators.ranking — distributed global rank / ntile arithmetic.

The contract: identical RESULTS to the exact single-partition global
window, with a PLAN that never routes the big input through an
Exchange SinglePartition (the 100x scale-killer the module replaces).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from postgres_etl_pipeline_spark.operators.ranking import (
    global_rank,
    ntile_expr,
)


def _vals(spark, vals):
    return spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "k long, v double"
    ).repartition(8)


class TestGlobalRank:
    def test_matches_exact_window_with_duplicate_values(self, spark):
        vals = [5, 1, 1, 3, 3, 3, 9, 0, 5, 5, 2, 7, 7, 4, 4] * 20
        df = _vals(spark, vals)
        rf = global_rank(df, "v", ["k"], n_buckets=4)
        got = {(r.k, r._rank) for r in rf.df.select("k", "_rank").collect()}
        w = Window.orderBy("v", "k")
        exp = {
            (r.k, r.rn)
            for r in df.select("k", F.row_number().over(w).alias("rn")).collect()
        }
        assert got == exp
        assert rf.n_total == len(vals)

    def test_empty_input(self, spark):
        rf = global_rank(_vals(spark, []), "v", ["k"])
        assert rf.n_total == 0 and rf.df.count() == 0

    def test_single_row(self, spark):
        rf = global_rank(_vals(spark, [42]), "v", ["k"])
        assert [r._rank for r in rf.df.collect()] == [1]

    def test_first_keys_and_bucket_order(self, spark):
        rf = global_rank(_vals(spark, [10, 30, 20, 40]), "v", ["k"], n_buckets=2)
        # global first row is the minimum under (v, k): k=0 (v=10)
        assert rf.first_keys[rf.buckets[0]] == (0,)

    def test_coarse_mode_matches_exact_window(self, spark):
        """One-pass coarse mode (round-4 advice fold) must equal the exact
        global window — duplicates included, any coarse granularity."""
        vals = [5.5, 1.25, 1.75, 3.0, 3.0, 9.9, 0.1, 5.5, 2.2, 7.0] * 30
        df = _vals(spark, vals)
        rf = global_rank(
            df, "v", ["k"], n_buckets=4, coarse=F.floor(F.col("v"))
        )
        got = {(r.k, r._rank) for r in rf.df.select("k", "_rank").collect()}
        w = Window.orderBy("v", "k")
        exp = {
            (r.k, r.rn)
            for r in df.select("k", F.row_number().over(w).alias("rn")).collect()
        }
        assert got == exp
        assert rf.n_total == len(vals)

    def test_coarse_mode_nulls_and_first_keys(self, spark):
        rows = [(0, 5.0), (1, None), (2, 1.0), (3, None), (4, 3.5)]
        df = spark.createDataFrame(rows, "k long, v double").repartition(4)
        rf = global_rank(
            df, "v", ["k"], n_buckets=2, coarse=F.floor(F.col("v"))
        )
        got = {(r.k, r._rank) for r in rf.df.select("k", "_rank").collect()}
        w = Window.orderBy(F.col("v").asc_nulls_first(), "k")
        exp = {
            (r.k, r.rn)
            for r in df.select("k", F.row_number().over(w).alias("rn")).collect()
        }
        assert got == exp
        assert rf.buckets[0] == -1
        assert rf.first_keys[-1] == (1,)  # first null row by tie order

    def test_coarse_mode_nan_routes_to_top_bucket(self, spark):
        """NaN breaks Python's sorted() and Spark's cutpoint comparison, so
        coarse mode routes NaN rows to a dedicated TOP bucket (advice r05)
        — matching Spark's total order, where NaN sorts after every value
        (and after +Inf), exactly like nulls get bucket -1 at the front."""
        nan = float("nan")
        rows = [(0, 5.0), (1, nan), (2, 1.0), (3, None), (4, nan), (5, 3.5), (6, 9.0)]
        df = spark.createDataFrame(rows, "k long, v double").repartition(4)
        rf = global_rank(df, "v", ["k"], n_buckets=2, coarse=F.floor(F.col("v")))
        got = {(r.k, r._rank) for r in rf.df.select("k", "_rank").collect()}
        w = Window.orderBy(F.col("v").asc_nulls_first(), "k")
        exp = {
            (r.k, r.rn)
            for r in df.select("k", F.row_number().over(w).alias("rn")).collect()
        }
        assert got == exp
        assert rf.buckets[0] == -1          # nulls first
        assert rf.first_keys[rf.buckets[-1]] == (1,)  # NaN bucket is LAST

    def test_coarse_mode_bounds_distinct_keys(self, spark):
        df = _vals(spark, range(1000))
        with pytest.raises(ValueError, match="coarse_max_keys"):
            global_rank(
                df, "v", ["k"], coarse=F.col("v"), coarse_max_keys=10
            )

    def test_coarse_mode_runs_one_pre_pass_action(self, spark, monkeypatch):
        """The whole point of coarse mode: ONE driver action (the histogram
        collect) before the final plan, and NO approxQuantile call — vs
        the default path's quantile + stats pair."""
        # patch the CLASSIC implementation class — pyspark.sql.DataFrame is
        # the abstract facade in Spark 4 and its collect is overridden
        from pyspark.sql.classic.dataframe import DataFrame as DF
        from pyspark.sql.classic.dataframe import DataFrameStatFunctions

        collects, quantiles = [], []
        orig_collect = DF.collect
        monkeypatch.setattr(
            DF, "collect", lambda self: (collects.append(1), orig_collect(self))[1]
        )
        monkeypatch.setattr(
            DataFrameStatFunctions,
            "approxQuantile",
            lambda self, *a, **kw: quantiles.append(1) or [],
        )
        df = _vals(spark, range(500))
        global_rank(df, "v", ["k"], coarse=F.floor(F.col("v") / 10))
        assert collects == [1] and quantiles == []

    def test_nulls_rank_first_like_exact_window(self, spark):
        """NULL values take the -1 bucket and reproduce ASC NULLS FIRST —
        the exact Window.orderBy semantics (round-4 advice: approxQuantile
        drops nulls, so an unguarded bucket expr would yield null bucket
        ids and a 'null map key' runtime error)."""
        rows = [(0, 5.0), (1, None), (2, 1.0), (3, None), (4, 3.0), (5, 2.0)]
        df = spark.createDataFrame(rows, "k long, v double").repartition(4)
        rf = global_rank(df, "v", ["k"], n_buckets=3)
        got = {(r.k, r._rank) for r in rf.df.select("k", "_rank").collect()}
        w = Window.orderBy(F.col("v").asc_nulls_first(), "k")
        exp = {
            (r.k, r.rn)
            for r in df.select("k", F.row_number().over(w).alias("rn")).collect()
        }
        assert got == exp
        assert rf.buckets[0] == -1  # the null bucket leads the offset order

    def test_no_single_partition_exchange_in_plan(self, spark):
        df = _vals(spark, range(1000))
        rf = global_rank(df, "v", ["k"], n_buckets=8)
        plan = rf.df._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan
        assert "Window" in plan  # partitioned window did the ranking


class TestNtileExpr:
    @pytest.mark.parametrize("n,k", [(1, 4), (2, 4), (3, 4), (4, 4), (5, 4),
                                     (7, 4), (101, 4), (12, 5), (60, 7)])
    def test_matches_builtin_ntile(self, spark, n, k):
        df = _vals(spark, range(n))
        rf = global_rank(df, "v", ["k"], n_buckets=4)
        got = dict(
            rf.df.select(
                "k", ntile_expr(F.col("_rank"), rf.n_total, k).alias("t")
            ).collect()
        )
        w = Window.orderBy("v", "k")
        exp = dict(df.select("k", F.ntile(k).over(w).alias("t")).collect())
        assert got == exp


class TestCatalogQueriesScaleShape:
    """The two rewritten catalog entries must keep a SinglePartition-free
    plan (their oracles pin result parity vs the exact global window)."""

    @pytest.mark.parametrize(
        "name",
        [
            "customer_balance_quartiles",
            "supplier_window_stats",
            "token_budget_packing",
        ],
    )
    def test_no_single_partition_exchange(self, spark, sf_small, name):
        from postgres_etl_pipeline_spark.queries import REGISTRY, queries

        queries()
        df = REGISTRY[name].fn(spark, sf_small)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan
