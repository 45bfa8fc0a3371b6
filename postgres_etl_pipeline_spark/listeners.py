"""K10 — failure-event emission (SURVEY §2.2).

The reference's ``notify_ardoa.py:31-70`` posts one JSON event per failed
task: ``{event_id, platform, pipeline_id, run_id, task_id, try_number,
detected_at, status, log_uri, artifact_uris, metadata.exception}``. The
HTTP POST leg is out of scope per SURVEY §2.2; this module emits the SAME
structured record through the engine's two failure surfaces:

- batch: :func:`enforce_with_events` — the pipeline-gate twin of
  ``checks.enforce`` that records one failure event per failed
  :class:`~.checks.CheckResult` before raising;
- streaming: :class:`StreamingFailureListener` — a
  ``StreamingQueryListener`` (public PySpark API, executes on the
  listener-bus thread) capturing every query termination that carries an
  exception.

Sinks: an in-process event list, an optional callback, and an optional
NDJSON file (atomic per-line append — the driver-side artifact style of
``io_utils.py``). A deployment wires ``sink`` to its real notifier; the
event payload is already notifier-shaped.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable
from datetime import datetime, timezone

from pyspark.sql.streaming import StreamingQueryListener

from .checks import CheckResult, DataContractError, enforce


def failure_event(
    pipeline_id: str,
    run_id: str,
    task_id: str,
    exception: str,
    try_number: int = 1,
    artifact_uris: tuple[str, ...] = (),
    platform: str = "spark",
) -> dict:
    """The notify_ardoa event shape (``notify_ardoa.py:48-66``), minus the
    Airflow log-file URI (Spark has no per-task log file; the driver log is
    the equivalent and is deployment-specific)."""
    return {
        "event_id": f"{platform}:{pipeline_id}:{run_id}:{task_id}:{try_number}",
        "platform": platform,
        "pipeline_id": pipeline_id,
        "run_id": run_id,
        "task_id": task_id,
        "try_number": try_number,
        "detected_at": datetime.now(timezone.utc).isoformat(),
        "status": "failed",
        "artifact_uris": list(artifact_uris),
        "metadata": {"exception": exception},
    }


class FailureEventLog:
    """Collects failure events; optionally forwards each to ``sink`` and/or
    appends it as one NDJSON line to ``path``.

    The callback is exception-isolated exactly like the reference's POST
    (``notify_ardoa.py:68-70``): a broken notifier must never turn a
    data failure into a notifier crash.
    """

    def __init__(
        self,
        sink: Callable[[dict], None] | None = None,
        path: str | None = None,
    ) -> None:
        self.events: list[dict] = []
        self._sink = sink
        self._path = path

    def emit(self, event: dict) -> None:
        self.events.append(event)
        if self._path:
            with open(self._path, "a") as f:
                f.write(json.dumps(event, sort_keys=True) + "\n")
                f.flush()
                os.fsync(f.fileno())
        if self._sink is not None:
            try:
                self._sink(event)
            except Exception:
                pass


def enforce_with_events(
    log: FailureEventLog,
    pipeline_id: str,
    run_id: str,
    task_id: str,
    *results: CheckResult,
    artifact_uris: tuple[str, ...] = (),
) -> None:
    """``checks.enforce`` + K10: emit one failure event per failed check
    (try_number enumerates them within the task, mirroring the reference's
    one-event-per-failed-attempt), then raise the aggregated
    :class:`DataContractError`. Passing checks emit nothing and return."""
    failed = [r for r in results if not r.ok]
    for i, r in enumerate(failed, start=1):
        log.emit(
            failure_event(
                pipeline_id,
                run_id,
                task_id=f"{task_id}:{r.name}",
                exception=r.message(),
                try_number=i,
                artifact_uris=artifact_uris,
            )
        )
    enforce(*results)


class StreamingFailureListener(StreamingQueryListener):
    """Streaming K10 leg: emit a failure event whenever a streaming query
    terminates WITH an exception (normal stops emit nothing).

    Registered via ``spark.streams.addListener`` — the public PySpark
    listener API; events arrive on the listener-bus thread, so the log's
    list append is the only shared state (GIL-atomic). ``pipeline_id`` is
    the logical pipeline; run/task ids come from the query's runId/name,
    the streaming analogue of the reference's (run_id, task_id)."""

    def __init__(self, log: FailureEventLog, pipeline_id: str = "streaming") -> None:
        self._log = log
        self._pipeline_id = pipeline_id

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        if event.exception is None:
            return
        self._log.emit(
            failure_event(
                self._pipeline_id,
                run_id=str(event.runId),
                task_id=str(event.id),
                exception=str(event.exception),
            )
        )
