"""The public Column-function surface: every export is importable, returns
a Column, and behaves through the facade exactly as through its home
module (guards against the facade drifting from the implementations)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from postgres_etl_pipeline_spark import functions as PF


def test_all_exports_exist_and_build_columns(spark):
    for name in PF.__all__:
        assert hasattr(PF, name), name
    assert isinstance(PF.safe_div(F.lit(1), F.lit(2)), Column)
    assert isinstance(PF.day_bucket(F.lit("2024-01-01").cast("timestamp")), Column)
    assert isinstance(PF.tokens(F.lit("a b")), Column)
    assert isinstance(PF.cosine(F.lit([1.0]), F.lit([1.0])), Column)


def test_facade_functions_compute(spark):
    df = spark.createDataFrame(
        [("a b  c", 10, 0), ("x", 4, 2)], "text string, num int, den int"
    )
    out = df.select(
        PF.token_count("text").alias("n_tok"),
        PF.safe_div(F.col("num"), F.col("den")).alias("ratio"),
        PF.fingerprint("text").alias("fp"),
    ).collect()
    assert [r.n_tok for r in out] == [3, 1]
    assert out[0].ratio is None and out[1].ratio == 2.0
    assert all(len(r.fp) == 32 for r in out)  # md5 hex
