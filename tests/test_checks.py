"""Validation combinators V1-V8 (SURVEY §2.6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postgres_etl_pipeline_spark import checks as C


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [(1, "a", None), (2, None, "x"), (3, "c", "y")], ["id", "s", "t"]
    )


def test_required_fields(df):
    ok = C.required_fields(df, ["id"])
    assert ok.ok
    bad = C.required_fields(df, ["s", "t"])
    assert not bad.ok and bad.violations == 2
    assert any("$.s" in m for m in bad.samples)


def test_required_fields_missing_column(df):
    r = C.required_fields(df, ["nope"])
    assert not r.ok and "missing from schema" in r.samples[0]


def test_not_null_single_pass(df):
    r = C.not_null(df, ["s", "t"])
    assert not r.ok and r.violations == 2


def test_non_empty(spark, df):
    assert C.non_empty(df).ok
    assert not C.non_empty(df.filter(F.lit(False))).ok


def test_canary(df):
    assert C.canary_min_rows(df, 3).ok
    r = C.canary_min_rows(df, 10)
    assert not r.ok and "too_few_rows" in r.samples[0]


def test_schema_version(spark):
    v1 = spark.createDataFrame([(1,)], ["schema_version"])
    assert C.schema_version_is(v1, 1).ok
    assert not C.schema_version_is(v1, 2).ok
    assert not C.schema_version_is(v1.drop("schema_version"), 1).ok


def test_enforce_aggregates_sorted_first_5(df):
    with pytest.raises(C.DataContractError) as e:
        C.enforce(
            C.required_fields(df, ["s", "t"]),
            C.canary_min_rows(df, 99),
        )
    assert "violation(s)" in str(e.value)


def test_artifacts_exist(tmp_path):
    p = tmp_path / "x.json"
    p.write_text("{}")
    assert C.artifacts_exist([str(p)]).ok
    r = C.artifacts_exist([str(p), str(tmp_path / "missing.json")])
    assert not r.ok and "missing artifact" in r.samples[0]


def test_ngram_udtf_lateral_join(spark):
    from postgres_etl_pipeline_spark.operators.text import ngram_udtf

    spark.udtf.register("ngrams", ngram_udtf())
    spark.createDataFrame(
        [(1, "a b c"), (2, "x y"), (3, "")], ["doc_id", "text"]
    ).createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        "SELECT doc_id, ngram FROM udtf_docs, LATERAL ngrams(text, 2)"
    ).collect()
    got = {(r.doc_id, r.ngram) for r in rows}
    assert got == {(1, "a b"), (1, "b c"), (2, "x y")}
