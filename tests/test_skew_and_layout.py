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


def _file_ranges(path: str, col: str) -> list[tuple]:
    out = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            c = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == col
            )
            mins.append(c.statistics.min)
            maxs.append(c.statistics.max)
        if mins:
            out.append((min(mins), max(maxs)))
    return sorted(out)


def test_layout_boundaries_are_deterministic_across_runs(spark, tmp_path):
    """Round-2 flake class: repartitionByRange re-samples split points per
    execution. The writers now use literal quantile cutpoints + explicit
    bucket routing — two writes of the same input must produce IDENTICAL
    per-file value ranges, for both the 1-D range layout and the z-order
    layout."""
    from postgres_etl_pipeline_spark.connectors.sinks import (
        write_range_layout,
        write_zorder_layout,
    )

    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    write_range_layout(o, str(tmp_path / "r1"), ["o_orderkey"], n_files=8)
    write_range_layout(o, str(tmp_path / "r2"), ["o_orderkey"], n_files=8)
    r1 = _file_ranges(str(tmp_path / "r1"), "o_orderkey")
    r2 = _file_ranges(str(tmp_path / "r2"), "o_orderkey")
    assert r1 == r2 and len(r1) > 1

    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).cast("int").alias("x"),
        (F.col("id") / 64).cast("int").alias("y"),
    )
    write_zorder_layout(grid, str(tmp_path / "z1"), ["x", "y"], n_files=8, bits=6)
    write_zorder_layout(grid, str(tmp_path / "z2"), ["x", "y"], n_files=8, bits=6)
    assert _file_ranges(str(tmp_path / "z1"), "x") == _file_ranges(
        str(tmp_path / "z2"), "x"
    )
    assert _file_ranges(str(tmp_path / "z1"), "y") == _file_ranges(
        str(tmp_path / "z2"), "y"
    )


def test_zorder_value_interleaves_bits(spark):
    from postgres_etl_pipeline_spark.connectors.sinks import zorder_value

    df = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3), (0, 0)], "a int, b int"
    )
    got = {
        (r.a, r.b): r.z
        for r in df.select("a", "b", zorder_value(["a", "b"], bits=4).alias("z")).collect()
    }
    # a's bits land at even positions, b's at odd: z(a,b) = Σ a_i·4^i + 2·b_i·4^i
    assert got == {(1, 1): 3, (2, 1): 6, (3, 3): 15, (0, 0): 0}


def test_zorder_layout_prunes_2d_boxes_better_than_1d_range(spark, tmp_path):
    from postgres_etl_pipeline_spark.connectors.sinks import (
        write_range_layout,
        write_zorder_layout,
    )

    grid = spark.range(256 * 256).select(
        (F.col("id") % 256).cast("int").alias("x"),
        (F.col("id") / 256).cast("int").alias("y"),
    )

    def files_matching_box(path, x_hi, y_hi):
        n = 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            stats = {}
            for rg in range(md.num_row_groups):
                for i in range(md.num_columns):
                    c = md.row_group(rg).column(i)
                    lohi = stats.setdefault(c.path_in_schema, [1 << 60, -1])
                    lohi[0] = min(lohi[0], c.statistics.min)
                    lohi[1] = max(lohi[1], c.statistics.max)
            if stats["x"][0] <= x_hi and stats["y"][0] <= y_hi:
                n += 1
        return n

    zpath, rpath = str(tmp_path / "z"), str(tmp_path / "r")
    write_zorder_layout(grid, zpath, ["x", "y"], n_files=16, bits=8)
    write_range_layout(grid, rpath, ["x"], n_files=16)

    # the box [0,63]² is 1/16 of the space: the x-range layout matches every
    # file covering x≤63 (each spans all y); z-order confines it to the
    # file(s) owning the low z range
    z_match = files_matching_box(zpath, 63, 63)
    r_match = files_matching_box(rpath, 63, 63)
    assert z_match < r_match
    assert z_match <= 2


def test_compact_files_reduces_count_and_preserves_data(spark, tmp_path):
    from postgres_etl_pipeline_spark.connectors.sinks import compact_files

    path = str(tmp_path / "frag")
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    o.repartition(40).write.parquet(path)
    assert len(glob.glob(f"{path}/*.parquet")) == 40

    before = o.count()
    n = compact_files(spark, path, target_mb=128, sort_cols=["o_orderkey"])
    files = glob.glob(f"{path}/*.parquet")
    assert len(files) == n == 1
    after = spark.read.parquet(path)
    assert after.count() == before
    # sort layout re-established: single file's min/max == global min/max,
    # and rows inside are ordered
    keys = [r.o_orderkey for r in after.select("o_orderkey").collect()]
    assert keys == sorted(keys)


class TestTrainingShards:
    def test_deterministic_across_runs_and_partitionings(self, spark, tmp_path):
        from postgres_etl_pipeline_spark.connectors.sinks import (
            write_training_shards,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        m1 = write_training_shards(docs, str(tmp_path / "a"), n_shards=8)
        m2 = write_training_shards(
            docs.repartition(13), str(tmp_path / "b"), n_shards=8
        )
        # assignment is a pure function of doc_id: identical manifests no
        # matter how the input was partitioned
        assert m1 == m2
        assert m1["total_rows"] == docs.count()
        assert set(m1["shards"]) == set(range(8))

    def test_one_file_per_shard_and_readback(self, spark, tmp_path):
        from postgres_etl_pipeline_spark.connectors.sinks import (
            write_training_shards,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        path = str(tmp_path / "s")
        m = write_training_shards(docs, path, n_shards=4)
        for sid in range(4):
            files = glob.glob(f"{path}/__shard={sid}/*.parquet")
            assert len(files) == 1  # identity routing: one task owns a shard
            got = spark.read.parquet(f"{path}/__shard={sid}")
            assert got.count() == m["shards"][sid]["rows"]
        # every doc lands in exactly one shard
        back = spark.read.parquet(path)
        assert back.select("doc_id").distinct().count() == m["total_rows"]

    def test_empty_shards_present_in_manifest(self, spark, tmp_path):
        """A zero-row shard writes no __shard=K directory (parquet has no
        empty partition dirs) but MUST still appear in the manifest with
        rows=0 (advice r05): loaders address shards by index and need to
        distinguish 'empty' from 'missing/corrupt'."""
        from postgres_etl_pipeline_spark.connectors.sinks import (
            write_training_shards,
        )

        docs = (
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .limit(3)
        )
        m = write_training_shards(docs, str(tmp_path / "e"), n_shards=64)
        assert set(m["shards"]) == set(range(64))
        assert m["total_rows"] == 3
        empties = [s for s, v in m["shards"].items() if v["rows"] == 0]
        assert len(empties) >= 61  # 3 rows can occupy at most 3 shards
        assert all(m["shards"][s] == {"rows": 0, "content_hash": 0} for s in empties)

    def test_manifest_detects_content(self, spark, tmp_path):
        import json

        from postgres_etl_pipeline_spark.connectors.sinks import (
            write_training_shards,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        path = str(tmp_path / "m")
        m = write_training_shards(docs, path, n_shards=2)
        on_disk = json.load(open(f"{path}/_manifest.json"))
        assert on_disk["total_rows"] == m["total_rows"]
        assert {int(k) for k in on_disk["shards"]} == {0, 1}
        # dropping docs changes the content hash of the affected shard
        m_small = write_training_shards(
            docs.filter(F.col("doc_id") % 7 != 0), str(tmp_path / "m2"), 2
        )
        assert any(
            m["shards"][s]["content_hash"] != m_small["shards"][s]["content_hash"]
            for s in m["shards"]
        )
