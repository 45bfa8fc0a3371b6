"""O10 — perf/scale drill parity tests (validation_perf_scale_dag.py).

The reference drill's observable contract: 6-way fanout returns ok:i, a
5,000-row JSON artifact of 64-char values written atomically, a
20,000-char log line, then a deterministic RuntimeError citing the
artifact path. Here the failure additionally lands as a K10 event with
the artifact URI attached (the on_failure_callback leg)."""

from __future__ import annotations

import json

import pytest

from postgres_etl_pipeline_spark.listeners import FailureEventLog
from postgres_etl_pipeline_spark.pipelines import drill


def test_fanout_returns_ok_tokens(spark):
    assert sorted(drill.run_fanout(spark)) == [f"ok:{i}" for i in range(6)]


def test_fanout_respects_parallelism_cap(spark):
    # max_active_tasks=4 twin: the fanout job may not schedule more than
    # MAX_PARALLELISM concurrent tasks — locally that is the partition count.
    df = spark.range(0, drill.FANOUT_TASKS,
                     numPartitions=drill.MAX_PARALLELISM)
    assert df.rdd.getNumPartitions() <= drill.MAX_PARALLELISM


def test_artifact_rows_shape_and_determinism(spark):
    rows = drill.artifact_rows(spark, rows=50).collect()
    assert len(rows) == 50
    assert all(len(r["value"]) == drill.VALUE_WIDTH for r in rows)
    # deterministic across invocations (md5 chain, no rand())
    again = drill.artifact_rows(spark, rows=50).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # 64-char hex — incompressible-ish, unlike the reference's "x"*64
    assert all(set(r["value"]) <= set("0123456789abcdef") for r in rows)


def test_drill_fails_deterministically_with_artifact_and_event(
    spark, tmp_path, capsys
):
    log = FailureEventLog()
    with pytest.raises(RuntimeError, match="processing budget exceeded"):
        drill.run(spark, str(tmp_path), run_id="r1", rows=200, event_log=log)

    # artifact: correct envelope, atomic final name, no tmp residue
    arts = list(tmp_path.glob("validation_scale_runs/r1/artifacts/*"))
    assert [p.name for p in arts] == ["large_payload.json"]
    payload = json.loads(arts[0].read_text())
    assert payload["schema_version"] == 1
    assert len(payload["rows"]) == 200
    assert all(len(r["value"]) == 64 for r in payload["rows"])

    # the 20k log line was emitted
    out = capsys.readouterr().out
    assert "large_log_prefix:" + "y" * drill.LOG_LINE_WIDTH in out

    # K10: one failure event citing the artifact
    assert len(log.events) == 1
    ev = log.events[0]
    assert ev["pipeline_id"] == "validation_perf_scale"
    assert ev["status"] == "failed"
    assert ev["artifact_uris"] == [str(arts[0])]
    assert "budget exceeded" in ev["metadata"]["exception"]


def test_drill_ok_scenario_returns_result(spark, tmp_path):
    res = drill.run(spark, str(tmp_path), run_id="r2", rows=10, scenario="ok")
    assert res.fanout == [f"ok:{i}" for i in range(6)]
    assert res.artifact_rows == 10
    assert res.log_line_chars == 20_000
