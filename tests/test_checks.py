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


# --- combined single-pass gates (round-4 overhead advice) -------------------


def test_required_and_not_null_equals_separate_checks(df):
    req, nn = C.required_and_not_null(df, ["s", "t"], ["id"], extra_name="ids")
    req0 = C.required_fields(df, ["s", "t"])
    nn0 = C.not_null(df, ["id"], name="ids")
    assert (req.ok, req.violations, req.samples) == (req0.ok, req0.violations, req0.samples)
    assert (nn.ok, nn.violations, nn.samples) == (nn0.ok, nn0.violations, nn0.samples)


def test_required_and_not_null_empty_required_list(df):
    """An empty required list is a vacuous pass, not an AttributeError
    (advice r05): the combined gate must be at least as robust as the
    separate checks it replaces."""
    req, nn = C.required_and_not_null(df, [], ["id"], extra_name="ids")
    assert req.ok and req.violations == 0
    nn0 = C.not_null(df, ["id"], name="ids")
    assert (nn.ok, nn.violations) == (nn0.ok, nn0.violations)


def test_required_and_not_null_missing_schema(df):
    req, nn = C.required_and_not_null(df, ["nope"], ["id"])
    assert not req.ok and "missing from schema" in req.samples[0]


def test_not_null_and_non_empty_equals_separate_checks(spark, df):
    nn, ne = C.not_null_and_non_empty(df, ["s", "t"])
    nn0 = C.not_null(df, ["s", "t"])
    ne0 = C.non_empty(df)
    assert (nn.ok, nn.violations, nn.samples) == (nn0.ok, nn0.violations, nn0.samples)
    assert (ne.ok, ne.violations) == (ne0.ok, ne0.violations)
    empty = df.filter(F.col("id") > 99)
    nn_e, ne_e = C.not_null_and_non_empty(empty, ["s"])
    assert nn_e.ok  # vacuous pass on empty, like dbt not_null
    assert not ne_e.ok and ne_e.samples == ["$: relation is empty"]


def test_corrupt_and_shape_happy_and_failure_paths(spark):
    clean = spark.createDataFrame(
        [(1, ["a"]), (2, ["b"])], "id int, transactions array<string>"
    )
    wf, shape = C.corrupt_and_shape(clean, "transactions")
    assert wf.ok and shape.ok  # no corrupt col at all
    dirty = spark.createDataFrame(
        [(1, ["a"], None), (2, None, '{"broken'), (3, None, "oops}")],
        "id int, transactions array<string>, _corrupt_record string",
    )
    wf2, shape2 = C.corrupt_and_shape(dirty, "transactions")
    assert not wf2.ok and wf2.violations == 2
    assert any("unparseable" in s for s in wf2.samples)
    assert not shape2.ok and shape2.violations == 2
    wf3, shape3 = C.corrupt_and_shape(dirty.drop("transactions"), "transactions")
    assert not shape3.ok and "missing from payload schema" in shape3.samples[0]
