"""Pipeline e2e + the reference's scenario fault matrix (SURVEY §5.1):
every scenario either commits correct output or fails with a typed error."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from postgres_etl_pipeline_spark import checks as C
from postgres_etl_pipeline_spark import datagen as G
from postgres_etl_pipeline_spark.pipelines import grocery, retail

# --- grocery chain (SURVEY §3.1) -------------------------------------------


def test_grocery_ok_end_to_end(spark, tmp_path):
    res = grocery.run(spark, str(tmp_path), "run-100", "ok")
    assert res.staged_rows == 40
    assert res.loaded_rows == 40
    mart = res.mart.collect()
    assert len(mart) > 0
    # mart carries the star-join dims (region from dim_store)
    assert {r.region for r in mart} <= {"WEST", "EAST", "CENTRAL"}
    # reconcile artifact written
    paths = grocery.RunPaths(str(tmp_path), "run-100")
    rec = json.loads(open(paths.reconcile).read())
    assert rec == {"run_id": "run-100", "ok": True, "stg_rows": 40}


def test_grocery_upsert_idempotent_rerun(spark, tmp_path):
    a = grocery.run(spark, str(tmp_path), "run-101", "ok")
    b = grocery.run(spark, str(tmp_path), "run-101", "ok")  # retry same run
    assert a.loaded_rows == b.loaded_rows == 40  # PK upsert, no dup rows


def test_grocery_two_runs_accumulate(spark, tmp_path):
    grocery.run(spark, str(tmp_path), "run-102", "ok")
    res = grocery.run(spark, str(tmp_path), "run-103", "ok")
    assert res.loaded_rows == 80  # both runs in the staging table


def test_grocery_malformed_json_quarantined(spark, tmp_path):
    with pytest.raises(C.DataContractError, match="unparseable"):
        grocery.run(spark, str(tmp_path), "run-104", "malformed_json")


def test_grocery_partial_write_detected(spark, tmp_path):
    with pytest.raises(C.DataContractError):
        grocery.run(spark, str(tmp_path), "run-105", "partial_write")


def test_grocery_schema_drift_tolerated(spark, tmp_path):
    # P6: coalesce(unit_price_cents, unit_price) resolves the rename —
    # the run SUCCEEDS (the reference's enrich/load crashed on KeyError;
    # our engine implements the correct semantics, SURVEY §0)
    res = grocery.run(spark, str(tmp_path), "run-106", "schema_drift")
    assert res.loaded_rows == 40


def test_grocery_temporal_error_raises(spark, tmp_path):
    # run ids chosen so the 70% gate trips (deterministic)
    tripped = False
    for i in range(10):
        try:
            grocery.run(spark, str(tmp_path), f"run-te-{i}", "temporal_error")
        except G.TemporalError:
            tripped = True
            break
    assert tripped


def test_grocery_canary_fails_small_run(spark, tmp_path):
    with pytest.raises(C.DataContractError, match="too_few_rows"):
        grocery.run(spark, str(tmp_path), "run-107", "ok", n=5)


# --- retail dbt chain (SURVEY §3.2) -----------------------------------------


def test_retail_ok(spark):
    res = retail.run(spark, "ok")
    rows = {(r.day.isoformat(), r.store_id): (r.txns, r.units, r.gross_amount_cents)
            for r in res.mart.collect()}
    assert rows == {
        ("2024-01-01", 1): (2, 3, 1798),
        ("2024-01-02", 2): (1, 3, 2599),
    }
    assert all(c.ok for c in res.checks)


def test_retail_bad_data_strict_raises_like_postgres(spark):
    res = retail.run(spark, "bad_data", strict=True)
    with pytest.raises(Exception, match="CAST_INVALID_INPUT|invalid input"):
        res.mart.collect()  # ANSI cast('oops' as int) raises at execution


def test_retail_bad_data_tolerant_quarantines(spark):
    res = retail.run(spark, "bad_data", strict=False)
    stg = res.stg.collect()
    assert sum(r.amount_cents is None for r in stg) == 1  # 'oops' → NULL
    nn = C.not_null(res.stg, ["amount_cents"])
    assert not nn.ok and nn.violations == 1


def test_retail_upstream_missing_fails_non_empty_gate(spark):
    res = retail.run(spark, "upstream_missing")
    assert any(not c.ok for c in res.checks)  # assert_non_empty_mart fires


def test_retail_schema_drift_strict_raises(spark):
    with pytest.raises(LookupError, match="quantity"):
        retail.run(spark, "schema_drift", strict=True)


def test_retail_schema_drift_tolerant_coalesces(spark):
    res = retail.run(spark, "schema_drift", strict=False)
    assert res.mart.count() == 2  # qty picked up via fallback


def test_retail_logic_bug_div_by_zero_raises(spark):
    res = retail.run(spark, "logic_bug")
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO|division by zero"):
        res.mart.collect()


@pytest.mark.parametrize("scenario,exc", [
    ("model_bug", LookupError),
    ("source_bug", LookupError),
    ("syntax_bug", ValueError),
])
def test_retail_model_errors(spark, scenario, exc):
    with pytest.raises(exc):
        retail.run(spark, scenario)


def test_retail_race_partial_late_rows_arrive(spark):
    res = retail.run(spark, "race_partial")
    mart = res.mart.collect()
    # seeds give (01-01,s1) + (01-02,s2); late rows add (01-03,s2) + (01-03,s3)
    assert len(mart) == 4
    assert {r.day.isoformat() for r in mart} == {"2024-01-01", "2024-01-02", "2024-01-03"}
