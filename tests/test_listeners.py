"""K10 failure-event emission (listeners.py): batch gate + streaming
listener must both produce the notify_ardoa-shaped record."""

from __future__ import annotations

import json
import time

import pytest
from pyspark.sql import functions as F

from postgres_etl_pipeline_spark.checks import CheckResult, DataContractError
from postgres_etl_pipeline_spark.listeners import (
    FailureEventLog,
    StreamingFailureListener,
    enforce_with_events,
    failure_event,
)

REQUIRED_FIELDS = {
    "event_id", "platform", "pipeline_id", "run_id", "task_id",
    "try_number", "detected_at", "status", "artifact_uris", "metadata",
}


def test_event_shape_matches_reference_record():
    ev = failure_event("grocery", "r-1", "validate", "boom", artifact_uris=("file:///x",))
    assert REQUIRED_FIELDS <= set(ev)
    assert ev["event_id"] == "spark:grocery:r-1:validate:1"
    assert ev["status"] == "failed"
    assert ev["metadata"] == {"exception": "boom"}


def test_enforce_with_events_emits_per_failed_check_then_raises(tmp_path):
    seen = []
    path = str(tmp_path / "failures.ndjson")
    log = FailureEventLog(sink=seen.append, path=path)
    ok = CheckResult("non_empty", True)
    bad1 = CheckResult("canary", False, 1, ["$: too_few_rows n=3 min=10"])
    bad2 = CheckResult("not_null", False, 2, ["$.sku: 2 null(s)"])
    with pytest.raises(DataContractError):
        enforce_with_events(log, "grocery", "r-7", "validate", ok, bad1, bad2)
    assert [e["task_id"] for e in log.events] == [
        "validate:canary", "validate:not_null",
    ]
    assert seen == log.events
    lines = [json.loads(ln) for ln in open(path)]
    assert lines == log.events
    assert "too_few_rows" in log.events[0]["metadata"]["exception"]


def test_enforce_with_events_all_green_emits_nothing():
    log = FailureEventLog()
    enforce_with_events(log, "p", "r", "t", CheckResult("a", True))
    assert log.events == []


def test_broken_sink_never_masks_the_data_failure():
    def explode(_):
        raise RuntimeError("notifier down")

    log = FailureEventLog(sink=explode)
    with pytest.raises(DataContractError):
        enforce_with_events(
            log, "p", "r", "t", CheckResult("bad", False, 1, ["$: x"])
        )
    assert len(log.events) == 1  # event still recorded locally


def test_failing_grocery_scenario_emits_pipeline_event(spark, tmp_path):
    """K10 end-to-end: a failing pipeline SCENARIO (malformed_json) both
    raises its typed error and emits one notify-shaped failure event
    naming the failed stage and the run's artifact URIs."""
    from postgres_etl_pipeline_spark.pipelines import grocery

    log = FailureEventLog()
    with pytest.raises(DataContractError):
        grocery.run(
            spark, str(tmp_path), "run-k10", "malformed_json", event_log=log
        )
    assert len(log.events) == 1
    ev = log.events[0]
    assert ev["pipeline_id"] == "grocery"
    assert ev["run_id"] == "run-k10"
    assert ev["task_id"] == "validate_and_stage"
    assert "unparseable" in ev["metadata"]["exception"]
    assert len(ev["artifact_uris"]) == 3  # raw / staged / reconcile
    assert REQUIRED_FIELDS <= set(ev)


def test_streaming_listener_captures_query_failure(spark, tmp_path):
    (tmp_path / "in.ndjson").write_text('{"v": 1}\n')
    log = FailureEventLog()
    listener = StreamingFailureListener(log, pipeline_id="grocery_stream")
    spark.streams.addListener(listener)
    try:
        stream = (
            spark.readStream.schema("v long")
            .json(str(tmp_path))
            .select(F.assert_true(F.col("v") != 1).alias("boom"))
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("k10_failing")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        with pytest.raises(Exception):
            q.awaitTermination(60)
        # listener-bus delivery is async — poll briefly
        deadline = time.time() + 30
        while not log.events and time.time() < deadline:
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(listener)
    assert len(log.events) == 1
    ev = log.events[0]
    assert ev["pipeline_id"] == "grocery_stream"
    assert ev["status"] == "failed"
    assert ev["metadata"]["exception"]  # carries the streaming exception text
    assert REQUIRED_FIELDS <= set(ev)
