"""Perf/scale drill pipeline (SURVEY §2.7 O10): the reference's
``validation_perf_scale_dag.py`` as composed Spark stages.

The reference drill (``validation_perf_scale_dag.py:20-86``) is
fanout(6 trivial tasks) → generate_large_artifact (5,000-row JSON of
64-char values, atomic tmp+rename write, plus one 20,000-char log line) →
aggregate_and_fail (deterministic RuntimeError citing the artifact path).
Its point is to stress log excerpting / artifact fetching / context
truncation in the surrounding observability stack, with a concurrency cap
(``max_active_tasks=4``) so the drill can't starve a dev machine.

Spark-first mapping:

- **fanout** — one ``spark.range(n)`` job with ``n`` partitions: each
  task does trivial work and emits ``ok:i``, so "many tasks / many logs"
  is exercised through the actual scheduler rather than n driver-side
  callables (O8 is native task parallelism).
- **artifact** — the payload ROWS are computed distributed (range +
  md5-chain values, pure codegen: at drill scale this is one tiny job, at
  stress scale ``rows`` can be 10^9 and the same plan holds); the single
  JSON envelope file the reference promises is then assembled from the
  bounded ``rows`` collect (the drill contract caps it, exactly like the
  reference's "kept moderate to avoid OOM on dev laptops" comment) and
  written atomically via tmp + ``os.replace`` — same torn-write guarantee
  as ``io_utils``-style sinks. Deviation from the reference: values are a
  deterministic md5 chain rather than ``"x"*64`` so the artifact is
  incompressible-ish and actually stresses excerpting; same 64-char width,
  same 5,000-row default, same ``{"schema_version": 1, "rows": [...]}``
  envelope.
- **big log line** — emitted through ``print`` exactly like the reference
  (a 20,000-char ``large_log_prefix:yyyy...`` line).
- **aggregate_and_fail** — raises ``RuntimeError`` with the reference's
  message shape AND emits a K10 failure event through
  :class:`~..listeners.FailureEventLog` with the artifact URI attached,
  so the evidence-pack flow the reference drives through Airflow's
  on_failure_callback is exercised end-to-end here too.
- **concurrency cap** — ``max_parallelism`` bounds the fanout job's
  partition count (the local twin of ``max_active_tasks=4``); on a real
  cluster the same knob is a scheduler pool / job-group, the drill only
  needs the cap to exist and be respected.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..connectors.sinks import atomic_write_text
from ..listeners import FailureEventLog, failure_event

#: Reference parity constants (validation_perf_scale_dag.py:37,44,80).
DEFAULT_ROWS = 5_000
VALUE_WIDTH = 64
LOG_LINE_WIDTH = 20_000
FANOUT_TASKS = 6
MAX_PARALLELISM = 4  # max_active_tasks=4 (validation_perf_scale_dag.py:73)


def artifact_rows(spark: SparkSession, rows: int = DEFAULT_ROWS) -> DataFrame:
    """The drill payload as a distributed relation: ``(id, value)`` with
    64-char deterministic values.

    ``value = md5(id) || md5(id || ':1')`` truncated to 64 chars — pure
    codegen (no UDF, no driver loop), identical in any ANSI SQL engine, and
    incompressible enough to be an honest large-artifact stand-in. The plan
    is a ``Range`` scan → project: at ``rows=10^9`` it is still one
    shuffle-free embarrassingly-parallel stage.
    """
    sid = F.col("id").cast("string")
    return spark.range(int(rows)).select(
        F.col("id"),
        F.substring(
            F.concat(F.md5(sid), F.md5(F.concat(sid, F.lit(":1")))), 1, VALUE_WIDTH
        ).alias("value"),
    )


@dataclass
class DrillResult:
    fanout: list[str]
    artifact_path: str
    artifact_rows: int
    log_line_chars: int
    events: list[dict] = field(default_factory=list)


def run_fanout(spark: SparkSession, n: int = FANOUT_TASKS,
               max_parallelism: int = MAX_PARALLELISM) -> list[str]:
    """n trivial tasks through the real scheduler; ≤ ``max_parallelism``
    run concurrently (the drill's starvation cap)."""
    df = spark.range(0, n, numPartitions=min(int(n), int(max_parallelism)))
    return [
        f"ok:{r['id']}"
        for r in df.select(F.col("id")).collect()  # n scalar rows by contract
    ]


def generate_large_artifact(
    spark: SparkSession,
    base_dir: str,
    run_id: str,
    rows: int = DEFAULT_ROWS,
) -> str:
    """Write the large-but-deterministic JSON artifact atomically and emit
    the reference's 20,000-char log line. Returns the artifact path."""
    path = os.path.join(
        base_dir, "validation_scale_runs", run_id, "artifacts", "large_payload.json"
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    data = [
        {"id": r["id"], "value": r["value"]}
        for r in artifact_rows(spark, rows).collect()  # bounded by drill contract
    ]
    atomic_write_text(path, json.dumps({"schema_version": 1, "rows": data}))
    print("large_log_prefix:" + ("y" * LOG_LINE_WIDTH))
    return path


def aggregate_and_fail(path: str, *, pipeline_id: str, run_id: str,
                       event_log: FailureEventLog | None = None) -> None:
    """Deterministic failure citing the artifact (K10 event + raise)."""
    msg = (
        "Performance/scale drill: processing budget exceeded while "
        f"handling artifact={path}"
    )
    if event_log is not None:
        event_log.emit(
            failure_event(
                pipeline_id, run_id, task_id="aggregate_and_fail",
                exception=f"RuntimeError: {msg}", artifact_uris=(path,),
            )
        )
    raise RuntimeError(msg)


def run(
    spark: SparkSession,
    base_dir: str,
    run_id: str = "drill-0",
    rows: int = DEFAULT_ROWS,
    scenario: str = "fail",
    event_log: FailureEventLog | None = None,
) -> DrillResult:
    """fanout → artifact → aggregate_and_fail.

    ``scenario="fail"`` (the reference's only mode) always raises
    ``RuntimeError`` after emitting the K10 event — callers assert on the
    exception, the event log, and the artifact on disk. ``scenario="ok"``
    stops before the deterministic failure and returns the
    :class:`DrillResult` (O6-style dispatch so the drill's generation
    stages are composable without exception plumbing).
    """
    fan = run_fanout(spark)
    path = generate_large_artifact(spark, base_dir, run_id, rows=rows)
    result = DrillResult(
        fanout=fan,
        artifact_path=path,
        artifact_rows=rows,
        log_line_chars=LOG_LINE_WIDTH,
        events=event_log.events if event_log is not None else [],
    )
    if scenario == "fail":
        aggregate_and_fail(
            path, pipeline_id="validation_perf_scale", run_id=run_id,
            event_log=event_log,
        )
    return result
