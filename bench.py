"""Benchmark runner (driver contract).

Runs the headline queries (REGISTRY entries tagged "bench") at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}``

Each query is timed end-to-end (plan + execute + materialize counts via a
cheap ``count()`` action on the result — no driver-side collect of payloads).
"""

from __future__ import annotations

import json
import os
import time


def _machine_control(spark) -> float:
    """Fixed synthetic control workload (verdict r06 item 4): a
    code-independent CPU + shuffle + join mix, measured with the SAME
    warm + best-of-3 protocol as the headline queries, in the SAME
    session. Round-over-round bench deltas divide out machine weather by
    comparing against this number (r05→r06 showed the box alone drifting
    ~19% between rounds) instead of relying on a prose-note re-run of the
    previous round's commit.

    DO NOT CHANGE THIS WORKLOAD — its only value is being identical
    across rounds (version tag emitted alongside so a forced change is
    at least visible). No package code, no files: pure spark.range →
    hash/aggregate → 1000-key shuffle → broadcast-sized join, sized to
    ~0.5-1 s on 32 local cores.
    """
    from pyspark.sql import functions as F

    def run() -> None:
        base = spark.range(0, 20_000_000).select(
            (F.col("id") % 1000).alias("k"),
            F.xxhash64(F.col("id")).alias("h"),
        )
        agg = base.groupBy("k").agg(
            F.sum(F.col("h") % 97).alias("s"), F.count(F.lit(1)).alias("c")
        )
        dim = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2 + 1).alias("w")
        )
        agg.join(dim, "k").agg(F.sum(F.col("s") * F.col("w"))).collect()

    run()  # warm this plan
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return best


def _machine_control2(spark) -> tuple[float, list[float]]:
    """The ≥2 s control workload (verdict r09 item 5): the same
    code-independent CPU + shuffle + join mix as ``_machine_control``,
    4× the rows, best-of-2 — long enough that scheduler noise and a
    stray GC can't swing it the way the ~0.5 s v1 control swung
    BENCH_r09's vs_prev into a false alarm. Measured BEFORE and AFTER
    the headline set; the spread between the two is the
    bench-trustworthiness gate (see ``_control_spread``).

    DO NOT CHANGE THIS WORKLOAD — its only value is being identical
    across rounds (version tag emitted alongside)."""
    from pyspark.sql import functions as F

    def run() -> None:
        h = F.col("id")
        for _ in range(8):  # CPU-bound per-row work, zero extra memory
            h = F.xxhash64(h)
        base = spark.range(0, 640_000_000).select(
            (F.col("id") % 1000).alias("k"), h.alias("h")
        )
        agg = base.groupBy("k").agg(
            F.sum(F.col("h") % 97).alias("s"), F.count(F.lit(1)).alias("c")
        )
        dim = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2 + 1).alias("w")
        )
        agg.join(dim, "k").agg(F.sum(F.col("s") * F.col("w"))).collect()

    # TWO discarded warm runs: measured convergence on this box is
    # [3.7, 2.2, 2.06, 1.90, 2.01, 1.92, ...] — one warm run still
    # leaves ~15% of tier-2 JIT on the table, which a pre-vs-post gate
    # would misread as machine weather
    run()
    run()
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        reps.append(time.perf_counter() - t0)
    # every rep is returned, not just the best: the within-regime rep
    # spread is what the run-time gate calibration derives its bounds
    # from (verdict r10 item 7)
    return min(reps), reps


def _control_spread(pre: float, post: float) -> float:
    """Relative spread between the before- and after-headline control
    runs: |pre − post| / min(pre, post). A spread past the gate bound
    means the box's speed CHANGED during the bench (thermal, noisy
    neighbor, background IO) — any cross-round normalization computed
    under it would cry wolf, so the gate withholds the ratios instead
    (verdict r09 item 5)."""
    lo = min(pre, post)
    if lo <= 0:
        return float("inf")
    return abs(pre - post) / lo


def _control_gate_ok(
    pre: float,
    post: float,
    slow_bound: float | None = None,
    speedup_bound: float | None = None,
) -> bool:
    """Asymmetric pre/post gate. Bounds come from the RUN-TIME
    calibration when provided (:func:`_calibrate_gate_bounds` — derived
    from this run's own within-regime rep spread, verdict r10 item 7:
    the previous constants were calibrated on one box and would either
    cry wolf or sleep on a different one); the module constants remain
    the documented fail-safe defaults. Slowdowns (post > pre) gate at
    ``slow_bound`` — above it the box demonstrably changed speed
    mid-bench and every ratio would be more weather than signal.
    Speedups get ``speedup_bound`` ≥ slow_bound (deep-JIT keeps
    compiling through the headline set — benign and one-sided); beyond
    it something non-JIT happened. Either way the gate fails SAFE to
    inconclusive, never to a false ratio."""
    if slow_bound is None:
        slow_bound = CONTROL_SPREAD_BOUND
    if speedup_bound is None:
        speedup_bound = CONTROL_SPEEDUP_BOUND
    lo = min(pre, post)
    if lo <= 0:
        return False
    if post >= pre:  # box got slower during the bench — weather
        return (post - pre) / pre <= slow_bound + 1e-9
    return (pre - post) / post <= speedup_bound + 1e-9


CONTROL_SPREAD_BOUND = 0.20
CONTROL_SPEEDUP_BOUND = 0.35
# Calibration guard rails (verdict r10 item 7): the derived slowdown
# bound is 3× the observed within-regime rep spread — under the null
# (box unchanged) the pre/post min-of-3 pair cannot differ by much more
# than the reps already differ among themselves, so 3× is a generous
# envelope — floored so a freakishly quiet run cannot make the gate
# hair-triggered, capped so a noisy run cannot calibrate the gate away.
GATE_MIN_SLOW_BOUND = 0.10
GATE_MAX_SLOW_BOUND = 0.50
GATE_JIT_ALLOWANCE = 0.15  # extra one-sided room for benign deep-JIT


def _calibrate_gate_bounds(pre_reps, post_reps) -> dict:
    """Derive the pre/post gate bounds from THIS run's within-regime rep
    spread (verdict r10 item 7). Each control regime times 3 reps
    back-to-back; their relative spread ``(max−min)/min`` measures the
    box's same-regime noise right now — a quiet box earns a tight gate
    (small pre/post drift is already significant), a noisy one a wide
    gate (the same drift is expected noise). Degenerate inputs (empty
    reps, zero/negative times) fail safe to the documented constants.
    Returns the full calibration record for the bench artifact, so the
    judge sees the derived bound + evidence, not just a verdict."""

    def spread(reps):
        if not reps:
            return None
        lo = min(reps)
        if lo <= 0:
            return None
        return (max(reps) - lo) / lo

    spreads = [s for s in (spread(pre_reps), spread(post_reps)) if s is not None]
    if len(spreads) < 2:
        return {
            "slowdown_bound": CONTROL_SPREAD_BOUND,
            "speedup_bound": CONTROL_SPEEDUP_BOUND,
            "within_spread": None,
            "reps": len(pre_reps or ()) + len(post_reps or ()),
            "calibration": "fallback-constants",
        }
    s = max(spreads)
    slow = min(GATE_MAX_SLOW_BOUND, max(GATE_MIN_SLOW_BOUND, 3.0 * s))
    return {
        "slowdown_bound": round(slow, 3),
        "speedup_bound": round(slow + GATE_JIT_ALLOWANCE, 3),
        "within_spread": round(s, 4),
        "reps": len(pre_reps) + len(post_reps),
        "calibration": "3x-within-regime-rep-spread",
    }


def _streaming_floor(spark) -> float:
    """Best-of-2 wall time of draining an empty single-column file stream —
    the irreducible startup/checkpoint/drain cost every streaming entry
    carries on top of its plan."""
    import shutil
    import tempfile

    from postgres_etl_pipeline_spark.streaming import runner

    d = tempfile.mkdtemp(prefix="stream_floor_")
    try:
        spark.createDataFrame([], "id long").write.mode("overwrite").parquet(d)
        best = float("inf")
        for i in range(2):
            t0 = time.perf_counter()
            runner.run_to_memory(
                spark.readStream.schema("id long").parquet(d),
                f"floor_probe_{i}",
                "append",
                state_partitions=1,
            )
            best = min(best, time.perf_counter() - t0)
        return best
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _vs_prev_normalized(
    timings: dict[str, float],
    total: float,
    control: float,
    spread: float | None = None,
    prev: dict | None = None,
    bounds: dict | None = None,
) -> dict | None:
    """Control-normalized comparison against the LATEST ``BENCH_r*.json``
    on disk (verdict r07 item 8): the next verdict's "vs last round" as
    one generated block instead of a hand-run control protocol.

    Machine weather model: the fixed synthetic control workload scales
    with the box, so the previous round's timings re-based to TODAY's box
    are ``prev_q · (control_now / control_prev)``. A query's normalized
    ratio ``now / (prev · ctl_ratio)`` > 1 means the CODE got slower,
    < 1 faster — box drift divided out. Emitted only when the previous
    artifact carries a comparable control (same workload tag + method);
    silently absent otherwise (r01–r06 artifacts predate the control).

    SPREAD GATE (verdict r09 item 5 — BENCH_r09's vs_prev false-alarmed
    on a round whose headline code was untouched): when the before/after
    long-control pair fails ``_control_gate_ok`` (slowdown past the
    bound, or a speedup outside the measured JIT envelope), the box's
    speed changed DURING the bench, so any ratio computed from it would
    cry wolf — the block degrades to an explicit ``status:
    "inconclusive — re-run"`` instead of emitting numbers. ``spread``
    here is the (pre, post) tuple; ``prev`` is injectable for the unit
    tests; None loads the latest artifact.
    """
    import glob
    import re

    slow_b = (bounds or {}).get("slowdown_bound", CONTROL_SPREAD_BOUND)
    fast_b = (bounds or {}).get("speedup_bound", CONTROL_SPEEDUP_BOUND)
    if spread is not None and not _control_gate_ok(*spread, slow_b, fast_b):
        return {
            "status": (
                "inconclusive — control pre/post spread "
                f"{round(_control_spread(*spread), 3)} fails the gate "
                f"(slowdown bound {slow_b}, speedup bound "
                f"{fast_b}), re-run"
            ),
        }
    if prev is None:
        here = os.path.dirname(os.path.abspath(__file__))
        cands = []
        for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
            m = re.search(r"BENCH_r(\d+)\.json$", p)
            if m:
                cands.append((int(m.group(1)), p))
        if not cands:
            return None
        rnd, path = max(cands)
        try:
            with open(path) as f:
                prev = json.load(f)
        except (OSError, ValueError):
            return None
    else:
        rnd = prev.get("_round", 0)
    # the driver wraps bench.py's JSON line under "parsed" (next to rc/tail)
    prev = prev.get("parsed", prev)
    if (
        prev.get("control_workload") != "synthetic-v1"
        or prev.get("method") != "warm-best-of-3"
        or not prev.get("control_sec")
        or not control
    ):
        return None
    # prefer the ≥2 s control for the box-drift ratio once BOTH rounds
    # carry it (r11+): it is the same workload measured 10× per bench
    # (2 warm + best-of-3, pre and post), far stabler than the ~0.5 s v1
    if (
        spread is not None
        and prev.get("control2_sec")
        and prev.get("control2_workload") == "synthetic-v2-2s"
    ):
        ctl_ratio = min(spread) / prev["control2_sec"]
    else:
        ctl_ratio = control / prev["control_sec"]
    prev_q = prev.get("queries", {})
    per_query = {
        name: round(timings[name] / (prev_q[name] * ctl_ratio), 3)
        for name in timings
        if prev_q.get(name)
    }
    prev_total_shared = sum(prev_q[n] for n in per_query)
    now_total_shared = sum(timings[n] for n in per_query)
    return {
        "baseline_round": rnd,
        "control_ratio": round(ctl_ratio, 3),
        "normalized_total_ratio": round(
            now_total_shared / (prev_total_shared * ctl_ratio), 3
        )
        if prev_total_shared
        else None,
        "normalized_query_ratio": per_query,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from postgres_etl_pipeline_spark.queries import REGISTRY, queries as _load_all
    from postgres_etl_pipeline_spark.session import build_session

    _load_all()  # pull the extension catalog into REGISTRY

    spark = build_session(app_name="bench")

    bench_queries = {
        name: spec for name, spec in REGISTRY.items() if "bench" in spec.tags
    }

    timings: dict[str, float] = {}
    # Warm the JVM + parquet footers + Python/Arrow workers once (excluded
    # from timings — engine warmup, not query work).
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).count()

    # Long control BEFORE the headline set (verdict r09 item 5): the
    # before/after pair measures whether the box's speed changed DURING
    # the bench — the trustworthiness gate for every ratio below.
    control2_pre, pre_reps = _machine_control2(spark)

    # Per query: one untimed warmup run (JIT/codegen compilation for THIS
    # plan, not just the engine) then best-of-3 timed runs, back to back.
    # Round-3 showed single-shot timings swing ±30% with zero code change —
    # min over adjacent repetitions estimates steady-state cost. (Spreading
    # reps across interleaved sweeps was tried and REJECTED: accumulated
    # broadcast/GC pressure from the other plans inflated the heavy
    # queries ~2x and raised variance instead of lowering it.)
    # Effective-parallelism evidence (round 14, verdict r13 item 5):
    # at sf0.1 every headline query is fixed-overhead dominated, so
    # 8-core ≈ 32-core wall time reads as "cores ignored" when it is
    # really "nothing to parallelize". Emit the widest stage's task
    # count per query (public StatusTracker, read AFTER the timed reps —
    # the timed calls themselves are byte-identical to round 4+'s
    # method) so the scaling story is visible in the JSON itself: the
    # shuffle stages size from $SPARK_GRAFT_CPUS (session.py), so this
    # tracks the core count, and the committed SCALING_r14.md sf1 run
    # shows the wall-clock ratio following it once data dominates.
    tracker = spark.sparkContext.statusTracker()
    eff_par: dict[str, int] = {}
    total = 0.0
    for name, spec in bench_queries.items():
        spec.fn(spark, sf_dir).count()
        group = f"bench:{name}"
        spark.sparkContext.setLocalProperty("spark.jobGroup.id", group)
        b = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).count()
            b = min(b, time.perf_counter() - t0)
        spark.sparkContext.setLocalProperty("spark.jobGroup.id", None)
        max_tasks = 0
        for jid in tracker.getJobIdsForGroup(group):
            ji = tracker.getJobInfo(jid)
            for sid in ji.stageIds if ji else ():
                si = tracker.getStageInfo(sid)
                if si:
                    max_tasks = max(max_tasks, si.numTasks)
        eff_par[name] = max_tasks
        timings[name] = round(b, 3)
        total += b

    # Structured Streaming fixed-cost floor (r05 verdict item 8): drain an
    # EMPTY file-source stream (availableNow -> memory sink). Every
    # stream_* catalog entry pays at least this much in startup/drain
    # regardless of its plan, so readers of BENCH_VS_DUCKDB can separate
    # the capability's fixed cost from actual plan cost.
    floor = _streaming_floor(spark)
    control = _machine_control(spark)
    control2_post, post_reps = _machine_control2(spark)
    spread = _control_spread(control2_pre, control2_post)
    # run-time gate calibration (verdict r10 item 7): bounds derived
    # from THIS run's within-regime rep spread instead of one box's
    # hand-measured constants — emitted in full below
    gate = _calibrate_gate_bounds(pre_reps, post_reps)
    vs_prev = _vs_prev_normalized(
        timings, total, control, spread=(control2_pre, control2_post),
        bounds=gate,
    )

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                # Control-normalized per-query ratios vs the latest
                # BENCH_r{N}.json (>1 = code slower, <1 = faster; box
                # drift divided out via control_sec) — verdict r07 item 8
                **({"vs_prev": vs_prev} if vs_prev else {}),
                "streaming_floor_sec": round(floor, 3),
                # Same-session machine-weather control (fixed synthetic
                # workload, never changed): compare control_sec across
                # rounds to separate code deltas from box deltas.
                "control_sec": round(control, 3),
                "control_workload": "synthetic-v1",
                # The ≥2 s long control, measured BEFORE and AFTER the
                # headline set + the relative spread gating vs_prev
                # (verdict r09 item 5). control2_sec = min(pre, post) is
                # the steady-state estimate future rounds can normalize
                # on.
                "control2_pre_sec": round(control2_pre, 3),
                "control2_post_sec": round(control2_post, 3),
                "control2_spread": round(spread, 3),
                "control2_sec": round(min(control2_pre, control2_post), 3),
                "control2_workload": "synthetic-v2-2s",
                # Run-time gate calibration (verdict r10 item 7): the
                # derived slowdown/speedup bounds, the within-regime rep
                # spread they came from, and the rep count — the gate is
                # self-calibrating per box/run, failing safe to the
                # documented constants on degenerate reps.
                "gate": gate,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                # Widest stage's task count per query (round 14, verdict
                # r13 item 5): shows each query DOES fan out to the
                # session's core-derived partitioning even where sf0.1
                # wall time is fixed-cost bound; see SCALING_r14.md for
                # the sf1 8-vs-32-core wall-clock evidence.
                "effective_parallelism": eff_par,
                "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                # Methodology marker (round-4 advice): r01-r03 were
                # single-shot cold ("cold-single"); r04+ are per-query
                # warmup + best-of-3. Cross-round deltas are only
                # comparable within the same method.
                "method": "warm-best-of-3",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
