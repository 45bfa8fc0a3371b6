"""Skew-safe salted join equivalence and range-layout data skipping."""

from __future__ import annotations

import glob
import tempfile

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from postgres_etl_pipeline_spark.connectors.sinks import write_range_layout
from postgres_etl_pipeline_spark.operators.relational import salted_join


def test_salted_join_equals_plain_join(spark, sf_small):
    li = spark.read.parquet(f"{sf_small}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = spark.read.parquet(f"{sf_small}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    plain = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
    )
    salted = (
        salted_join(li, o, "l_orderkey", "o_orderkey", salt_buckets=8)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
    )
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_salted_join_skewed_synthetic(spark):
    # one hot key carrying 10k rows + 100 cold keys; salted result must
    # exactly match the plain join including duplicate multiplicity
    hot = spark.range(10000).select(F.lit(7).alias("k"), F.col("id").alias("v"))
    cold = spark.range(100).select((F.col("id") + 100).alias("k"), F.col("id").alias("v"))
    left = hot.union(cold)
    right = spark.range(200).select(F.col("id").alias("rk"), (F.col("id") * 2).alias("rv"))
    plain = left.join(right, left.k == right.rk).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("rv").alias("s")
    )
    salted = salted_join(left, right, "k", "rk", salt_buckets=4).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("rv").alias("s")
    )
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_range_layout_files_have_disjoint_stats(spark, sf_small):
    o = spark.read.parquet(f"{sf_small}/orders.parquet")
    path = tempfile.mkdtemp(prefix="range_layout_") + "/orders_ranged"
    write_range_layout(o, path, ["o_orderkey"], n_files=8)

    ranges = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "o_orderkey"
            )
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        if mins:
            ranges.append((min(mins), max(maxs)))
    assert len(ranges) > 1  # actually split across files
    # file ranges must be pairwise disjoint — the property that makes
    # min/max pruning skip whole files for point/range predicates
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, f"overlapping file ranges ({lo1},{hi1}) vs ({lo2},{hi2})"

    # round-trip integrity
    assert spark.read.parquet(path).count() == o.count()
