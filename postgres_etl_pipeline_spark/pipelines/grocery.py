"""Grocery pipeline (SURVEY §3.1): the reference's 5-DAG chain as composed
DataFrame stages in one Spark app.

ingest → validate → stage → enrich → load (keyed upsert) → reconcile,
then the declared-but-never-coded star join + daily mart (J1 + A1) with
quality gates (V4/V5/V6). Each stage is a pure function; file artifacts are
written only where persistence is the point (raw payload, staged NDJSON,
upserted staging table) — lineage replaces the rest of the reference's
file-IR (``io_utils.py:38-57``).

Scenario dispatch (O6) reproduces SURVEY §5.1's fault matrix; every failure
surfaces as a typed ``DataContractError`` / ``TemporalError`` instead of a
stack trace in an Airflow log.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import checks as C
from .. import datagen as G
from ..connectors import sinks, sources
from ..operators.relational import (
    daily_sales_mart,
    dedupe_last_write_wins,
    derived_revenue,
    star_join,
)
from ..schemas import PAYLOAD_SCHEMA_PERMISSIVE

REQUIRED_TXN_FIELDS = [
    "event_time", "txn_id", "store_id", "sku", "quantity", "tender_type",
]  # grocery_validate_dag.py:26
CANARY_MIN_ROWS = 10  # grocery_reconcile_dag.py:31


@dataclass
class RunPaths:
    """Per-run artifact tree (``io_utils.py:38-57``)."""

    base: str
    run_id: str

    @property
    def root(self) -> str:
        return os.path.join(self.base, "grocery_runs", self.run_id)

    @property
    def raw(self) -> str:
        return os.path.join(self.root, "raw", "transactions.json")

    @property
    def staged(self) -> str:
        return os.path.join(self.root, "staged", "transactions.ndjson")

    @property
    def table(self) -> str:
        return os.path.join(self.base, "tables", "stg_transactions")

    @property
    def reconcile(self) -> str:
        return os.path.join(self.root, "out", "reconcile.json")

    @property
    def quarantine(self) -> str:
        return os.path.join(self.root, "quarantine", "corrupt")


@dataclass
class RunResult:
    run_id: str
    scenario: str
    staged_rows: int = 0
    loaded_rows: int = 0
    mart: DataFrame | None = None
    checks: list[C.CheckResult] = field(default_factory=list)


def with_retries(fn, retries: int = 2, delay_s: float = 0.0):
    """O4 — fixed-backoff retry around a source fetch (reference default:
    2 retries × 10 s on ingest, ``grocery_ingest_dag.py:70-75``; delay is
    parameterized so tests run at 0).

    Note the reference's flaky source is seeded per (run_id, scenario)
    (``mock_pos_api/app.py:15-17``), so a deterministic failure reproduces
    identically on every attempt — retries guard real transient faults, not
    the injected ones. Same semantics here.
    """
    last: Exception | None = None
    for attempt in range(retries + 1):
        try:
            return fn()
        except G.TemporalError as e:  # retryable class only
            last = e
            if delay_s and attempt < retries:  # no backoff after final try
                time.sleep(delay_s)
    raise last


def ingest(paths: RunPaths, scenario: str, n: int = 40, retries: int = 2) -> None:
    """Stage 1 (``grocery_ingest_dag.py:36-67``): fetch payload (with O4
    retries), write the raw artifact — atomically, or deliberately torn
    under partial_write."""
    raw = with_retries(
        lambda: G.transactions_raw_text(paths.run_id, scenario, n),
        retries=retries,
    )
    if scenario == "partial_write":
        # file-level torn-write race (io_utils.py:76-89): half the payload
        # hits disk, no atomic rename — the reader must quarantine it
        sinks.torn_write_text(paths.raw, raw)
    else:
        sinks.atomic_write_text(paths.raw, raw)


def validate_and_stage(
    spark: SparkSession, paths: RunPaths, scenario: str, quarantine: bool = False
) -> tuple[DataFrame, int]:
    """Stage 2 (``grocery_validate_dag.py:44-79``): schema-on-read with
    corrupt quarantine (V2), contract checks (V1), explode to staged NDJSON
    (K3/P5).

    quarantine=False reproduces the reference (fail the run on corrupt
    input); quarantine=True implements the workflow its README promised but
    never built (SURVEY §0): corrupt records are preserved to
    ``paths.quarantine`` and the run continues with the parseable rows —
    downstream gates (canary V6) still decide pass/fail.
    """
    C.enforce(C.artifacts_exist([paths.raw]))
    payload = sources.read_json_doc(spark, paths.raw, PAYLOAD_SCHEMA_PERMISSIVE)
    if quarantine:
        # cache is Spark's documented unlock for corrupt-record-only queries
        # (QUERY_ONLY_CORRUPT_RECORD_COLUMN); safe here because the payload
        # is one bounded run artifact (n ≤ 200, app.py:44). The quarantine
        # write stays distributed — no driver collect of bad records.
        payload = payload.cache()
        payload, bad = C.quarantine_split(payload)
        bad_lines = bad.select(F.col("_corrupt_record").alias("value"))
        if not bad_lines.isEmpty():
            bad_lines.write.mode("overwrite").text(paths.quarantine)
        C.enforce(C.payload_shape(payload, "transactions"))
    else:
        # V2 + V8 in ONE scan (combined-gate combinator): same results,
        # one action instead of two on the happy path
        C.enforce(*C.corrupt_and_shape(payload, "transactions"))
    txns = payload.select(
        F.col("run_id"), F.explode("transactions").alias("t")
    ).select("run_id", "t.*")
    # Drift tolerance (P6): coalesce the renamed column back, then detect.
    txns = txns.withColumn(
        "unit_price_cents", F.coalesce("unit_price_cents", "unit_price")
    ).drop("unit_price")
    # V1 + V4 + the staged row count (A4) in ONE scan — the count rides the
    # gate aggregate instead of a separate count() action over the same rows
    req, extra, staged_rows = C.required_and_not_null(
        txns, REQUIRED_TXN_FIELDS, ["unit_price_cents"],
        extra_name="drift_resolved", with_count=True,
    )
    C.enforce(req, extra)
    sinks.write_ndjson(txns, paths.staged)
    # read the staged artifact BACK: downstream jobs re-scan cheap NDJSON
    # with an exact schema instead of re-parsing the multiLine raw payload
    # per action — the stage boundary is real, as in the reference
    staged = sources.read_ndjson(spark, paths.staged, txns.schema).drop(
        "_corrupt_record"
    )
    return staged, staged_rows


def enrich(txns: DataFrame, scenario: str) -> DataFrame:
    """Stage 3 (``grocery_enrich_dag.py:16-54``): identity map + provenance
    envelope — the reference adds no fields; we add typed ones instead of a
    JSON wrapper (run metadata as columns)."""
    return txns.withColumn("scenario", F.lit(scenario)).withColumn(
        "event_time", F.to_timestamp("event_time")
    ).withColumn("inserted_at", F.current_timestamp())


def load(spark: SparkSession, enriched: DataFrame, paths: RunPaths) -> DataFrame:
    """Stage 4 (``grocery_load_dag.py:64-76`` + ``pg.py:33-60``): keyed
    upsert on (run_id, txn_id), intra-batch last-write-wins."""
    deduped = dedupe_last_write_wins(
        enriched,
        keys=["run_id", "txn_id"],
        order_by=[F.col("event_time").desc(), F.col("inserted_at").desc()],
    )
    return sinks.upsert_parquet(
        spark,
        deduped,
        paths.table,
        keys=["run_id", "txn_id"],
        order_by=[F.col("event_time").desc()],
    )


def reconcile(spark: SparkSession, paths: RunPaths, n_run: int | None = None) -> int:
    """Stage 5 (``grocery_reconcile_dag.py:16-35``): canary count for this
    run (A2 + V6), then the reconcile artifact. ``n_run`` lets the caller
    hand in a count already computed over the freshly-written table (the
    load stage's fused aggregate); ``None`` re-reads and counts here."""
    if n_run is None:
        stg = spark.read.parquet(paths.table).filter(
            F.col("run_id") == paths.run_id
        )
        n = stg.count()  # ONE count job; the canary gates on the same number
    else:
        n = n_run
    C.enforce(C.canary_threshold_count(n, CANARY_MIN_ROWS))
    sinks.atomic_write_text(
        paths.reconcile,
        json.dumps({"run_id": paths.run_id, "ok": True, "stg_rows": n}),
    )
    return n


def build_mart(spark: SparkSession, paths: RunPaths) -> DataFrame:
    """The declared capability (J1 + A1): staged txns ⋈ broadcast dims →
    fct_sales with revenue_cents → daily mart, gated by V4/V5."""
    stg = spark.read.parquet(paths.table)
    fct = star_join(
        stg,
        {"store_id": G.dim_store(spark), "sku": G.dim_product(spark)},
    ).withColumn("revenue_cents", derived_revenue())
    mart = daily_sales_mart(
        fct,
        ts_col="event_time",
        amount_col="revenue_cents",
        qty_col="quantity",
        group_extra=["store_id", "region"],
    )
    # The gate action below materializes the checkpoint, so the caller's
    # subsequent read of the mart replays a tiny cached result instead of
    # re-running scan -> broadcast join -> aggregate. Bounded: the mart is
    # day x store x region rows, never input-sized.
    mart = mart.localCheckpoint(eager=False)
    # V4 + V5 in ONE scan (was isEmpty + a null-count agg)
    C.enforce(
        *C.not_null_and_non_empty(
            mart, ["day", "store_id", "txns", "units", "gross_amount_cents"]
        )
    )
    return mart


def run(
    spark: SparkSession,
    base_dir: str,
    run_id: str,
    scenario: str = "ok",
    n: int = 40,
    quarantine: bool = False,
    event_log=None,
) -> RunResult:
    """End-to-end run (§3.1). Raises typed errors under failure scenarios —
    callers (and the scenario test matrix) assert on the error type.
    ``quarantine=True`` routes corrupt input to the quarantine sink instead
    of failing the validate stage (see validate_and_stage).

    ``event_log`` (a :class:`~.listeners.FailureEventLog`) is the K10
    failure-event leg — the on_failure_callback twin of the reference's
    ``notify_ardoa.py:34-70``: any stage failure emits ONE structured
    failure event naming the failed stage and the run's three artifact
    URIs, then the typed error propagates unchanged. The HTTP POST leg is
    out of scope per SURVEY §2.2; the event payload is notifier-shaped.
    """
    paths = RunPaths(base_dir, run_id)
    result = RunResult(run_id=run_id, scenario=scenario)
    stage = "ingest"
    try:
        ingest(paths, scenario, n)
        stage = "validate_and_stage"
        txns, result.staged_rows = validate_and_stage(
            spark, paths, scenario, quarantine=quarantine
        )
        stage = "enrich"
        enriched = enrich(txns, scenario)
        stage = "load"
        loaded = load(spark, enriched, paths)
        # total rows AND this run's rows in ONE aggregate over the
        # just-written table (was: loaded.count() + a reconcile re-count)
        counts = loaded.agg(
            F.count(F.lit(1)).alias("n_total"),
            F.coalesce(
                F.sum((F.col("run_id") == paths.run_id).cast("long")), F.lit(0)
            ).alias("n_run"),
        ).collect()[0]
        result.loaded_rows = int(counts["n_total"])
        stage = "reconcile"
        reconcile(spark, paths, n_run=int(counts["n_run"]))
        stage = "build_mart"
        result.mart = build_mart(spark, paths)
    except Exception as e:
        if event_log is not None:
            from ..listeners import failure_event

            event_log.emit(
                failure_event(
                    pipeline_id="grocery",
                    run_id=run_id,
                    task_id=stage,
                    exception=str(e),
                    artifact_uris=(
                        f"file://{paths.raw}",
                        f"file://{paths.staged}",
                        f"file://{paths.reconcile}",
                    ),
                )
            )
        raise
    return result
