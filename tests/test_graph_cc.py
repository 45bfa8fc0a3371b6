"""Connected-components semantics (operators/graph.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_etl_pipeline_spark.operators.graph import (
    connected_components,
    dedup_keep_filter,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_chain_and_separate_components(spark):
    # 1-2-3-4 chain (diameter 3: exercises multi-round propagation),
    # {10, 11} pair, and a self-contained triangle {20, 21, 22}
    cc = connected_components(
        _edges(
            spark,
            [(2, 1), (2, 3), (4, 3), (10, 11), (20, 21), (21, 22), (20, 22)],
        )
    )
    got = {r.node: r.component for r in cc.collect()}
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
    }


def test_empty_edges(spark):
    cc = connected_components(_edges(spark, []))
    assert cc.count() == 0


def test_duplicate_and_reversed_edges_are_harmless(spark):
    cc = connected_components(
        _edges(spark, [(1, 2), (2, 1), (1, 2), (2, 3)])
    )
    got = {r.node: r.component for r in cc.collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_keep_filter_drops_non_representatives(spark):
    docs = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (9, "z")], "doc_id long, text string"
    )
    cc = connected_components(_edges(spark, [(1, 2), (2, 3)]))
    kept = dedup_keep_filter(docs, cc)
    assert {r.doc_id for r in kept.collect()} == {1, 9}
    # isolated doc 9 (no edges) passes through untouched
    assert kept.filter(F.col("doc_id") == 9).count() == 1
