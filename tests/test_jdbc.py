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
