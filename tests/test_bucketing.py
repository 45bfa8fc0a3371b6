"""Bucketed co-located joins: the pay-shuffle-once-at-write layout must
join with NO exchange on either side (plan-level assertion), and results
must equal the plain shuffled join."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_etl_pipeline_spark.connectors.sinks import write_bucketed
from postgres_etl_pipeline_spark.queries import t


def test_bucketed_join_has_no_exchange(spark, sf_small, tmp_path):
    li = t(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = t(spark, sf_small, "orders").select("o_orderkey", "o_orderpriority")
    write_bucketed(
        li, "b_lineitem", str(tmp_path / "li"), ["l_orderkey"], 8,
        sort_cols=["l_orderkey"],
    )
    write_bucketed(
        o.withColumnRenamed("o_orderkey", "l_orderkey"),
        "b_orders", str(tmp_path / "o"), ["l_orderkey"], 8,
        sort_cols=["l_orderkey"],
    )
    try:
        # MERGE hint: at test scale Catalyst would broadcast the small side
        # (disabling bucketing); the layout exists for the 100 TB case where
        # BOTH sides are too big to broadcast — force that join strategy
        joined = (
            spark.table("b_lineitem")
            .hint("MERGE")
            .join(spark.table("b_orders").hint("MERGE"), "l_orderkey")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # same answer as the shuffled join over the raw frames
        expect = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority").count()
        )
        got = joined.groupBy("o_orderpriority").count()
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expect.collect()))
    finally:
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_partitioned_write_prunes_partitions(spark, sf_small, tmp_path):
    # K9's partitioning lever: a day-partitioned mart must turn a day filter
    # into PartitionFilters (scan skips other days entirely)
    from postgres_etl_pipeline_spark.queries import read_events

    ev = read_events(spark, sf_small).withColumn(
        "day", F.to_date(F.date_trunc("day", "ts")).cast("string")
    )
    path = str(tmp_path / "events_by_day")
    ev.write.mode("overwrite").partitionBy("day").parquet(path)

    some_day = ev.select("day").first().day
    q = spark.read.parquet(path).filter(F.col("day") == some_day)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(day" in plan, plan
    # pruning is semantic too: counts match the unpartitioned filter
    assert q.count() == ev.filter(F.col("day") == some_day).count()


class TestSchemaEvolution:
    def test_merge_schema_unions_old_and_new_writers(self, spark, tmp_path):
        from postgres_etl_pipeline_spark.connectors.sources import (
            read_parquet_evolving,
        )

        path = str(tmp_path / "evolving")
        spark.range(3).selectExpr("id", "id * 2 AS a").write.parquet(path)
        spark.range(3, 5).selectExpr(
            "id", "id * 2 AS a", "'new' AS b"
        ).write.mode("append").parquet(path)
        df = read_parquet_evolving(spark, path)
        assert set(df.columns) == {"id", "a", "b"}
        rows = {r.id: (r.a, r.b) for r in df.collect()}
        assert rows[0] == (0, None)      # old files surface b as NULL
        assert rows[4] == (8, "new")
        # a plain read without the helper sees ONE footer's schema — the
        # property that silently drops new columns and motivates the helper
        plain = spark.read.parquet(path)
        assert set(plain.columns) <= {"id", "a", "b"}

    def test_expected_contract_conforms_and_fails_loud(self, spark, tmp_path):
        from pyspark.sql import types as T

        from postgres_etl_pipeline_spark.connectors.sources import (
            read_parquet_evolving,
        )

        path = str(tmp_path / "c")
        spark.range(2).selectExpr("id", "'x' AS extra").write.parquet(path)
        want = T.StructType([T.StructField("id", T.LongType())])
        df = read_parquet_evolving(spark, path, want)
        assert df.columns == ["id"]  # extras dropped, contract order
        bad = T.StructType(
            [T.StructField("id", T.LongType()), T.StructField("nope", T.StringType())]
        )
        import pytest as _pytest

        with _pytest.raises(ValueError, match="nope"):
            read_parquet_evolving(spark, path, bad)

    def test_incompatible_types_rejected_widenings_conformed(self, spark, tmp_path):
        """Castable-but-incompatible on-disk types (string vs LongType) are
        REJECTED, not silently coerced into NULLs (advice r05); safe
        widenings (int->long) ARE conformed — that's the one type change
        parquet writers legitimately evolve through."""
        from pyspark.sql import types as T

        from postgres_etl_pipeline_spark.connectors.sources import (
            read_parquet_evolving,
        )

        import pytest as _pytest

        path = str(tmp_path / "ty")
        spark.range(3).selectExpr(
            "CAST(id AS INT) AS id", "CAST(id AS STRING) AS v"
        ).write.parquet(path)
        # string on disk vs long contract: reject at analysis, never coerce
        bad = T.StructType(
            [T.StructField("id", T.LongType()), T.StructField("v", T.LongType())]
        )
        with _pytest.raises(ValueError, match="v: string vs contract bigint"):
            read_parquet_evolving(spark, path, bad)
        # int on disk vs long contract: safe widening, conformed via cast
        ok = T.StructType([T.StructField("id", T.LongType())])
        df = read_parquet_evolving(spark, path, ok)
        assert df.schema["id"].dataType == T.LongType()
        assert sorted(r.id for r in df.collect()) == [0, 1, 2]
