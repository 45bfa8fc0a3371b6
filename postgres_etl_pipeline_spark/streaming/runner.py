"""Streaming runners: drain a bounded stream and return a batch DataFrame.

``trigger(availableNow=True)`` processes everything the source currently
has (in rate-limited micro-batches if maxFilesPerTrigger is set) and then
stops — the exact semantics of the reference's run-sized batch DAG chain
(SURVEY §2.8), and restart-safe via the checkpoint. The memory sink keeps
results queryable as a table, which is how streaming queries plug into the
driver's DuckDB-oracle harness.

At 100 TB the same jobs run with ``trigger(processingTime=...)`` writing to
parquet/Delta via foreachBatch (connectors.sinks.merge_upsert for the
idempotent keyed-upsert path); only the sink/trigger choice changes, never
the transformation.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame


def run_to_memory(
    stream_df: DataFrame,
    name: str | None = None,
    output_mode: str = "complete",
    checkpoint: str | None = None,
    timeout_s: int = 300,
) -> DataFrame:
    """Run a streaming DataFrame to completion (availableNow) into a memory
    sink; return the result table as a batch DataFrame.

    complete mode replays full results each trigger, so the final table is
    the converged result regardless of micro-batch count; append/update
    callers own the batch-count semantics (see tests).
    """
    qname = name or f"q_{uuid.uuid4().hex[:12]}"
    ckpt = checkpoint or tempfile.mkdtemp(prefix=f"ckpt_{qname}_")
    q = (
        stream_df.writeStream.format("memory")
        .queryName(qname)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        # awaitTermination returns False on timeout — a PARTIAL memory table
        # must surface as a timeout, never as a silently-wrong result
        finished = q.awaitTermination(timeout_s)
        if not finished:
            raise TimeoutError(
                f"streaming drain '{qname}' did not finish within {timeout_s}s"
            )
    finally:
        if q.isActive:
            q.stop()
    return stream_df.sparkSession.table(qname)


def run_upsert_sink(
    stream_df: DataFrame,
    target_path: str,
    keys: list[str],
    order_by: list[str],
    checkpoint: str | None = None,
    timeout_s: int = 300,
) -> None:
    """Drain a bounded stream into a keyed-upsert parquet target via
    ``foreachBatch`` — the production shape of the reference's load stage
    (K5): at-least-once delivery upstream + an idempotent keyed merge per
    micro-batch = effectively-once rows (SURVEY §2.8).

    Retried or re-delivered batches re-apply as no-op updates (the merge is
    keyed), which is exactly why the sink tolerates `availableNow` restarts
    from an older checkpoint.
    """
    from pyspark.sql import functions as F

    from ..connectors.sinks import upsert_parquet

    ckpt = checkpoint or tempfile.mkdtemp(prefix="ckpt_upsert_")

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        # last-write-wins: order_by columns rank DESCENDING (newest first;
        # upsert_parquet keeps rank 1, incoming beating existing on ties)
        upsert_parquet(
            batch_df.sparkSession,
            batch_df,
            target_path,
            keys,
            [F.col(c).desc() for c in order_by],
        )

    q = (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        finished = q.awaitTermination(timeout_s)
        if not finished:
            raise TimeoutError(
                f"upsert drain to '{target_path}' did not finish within {timeout_s}s"
            )
    finally:
        if q.isActive:
            q.stop()
