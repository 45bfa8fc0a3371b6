"""Empirical scaling measurement: run the headline + dedup/CC/decontam
family at sf0.1 and the replicated sf1 (scripts/make_scale_data.py),
recording wall seconds and shuffle-write bytes per query, plus star-CC
round counts on adversarial chain graphs (r05 verdict item 5).

Usage: python scripts/scale_run.py [sf1_dir]   (default /tmp/sfscale/sf1)
Writes /tmp/sfscale/results.json; SCALE.md's empirical table is authored
from that output.

Shared pair-stage caches are CLEARED before every measurement so each
query's number is self-contained (includes its own candidate mining),
not an artifact of catalog-level stage sharing.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAMILY = [
    # the 12 bench-tagged headliners are added programmatically; these are
    # the dedup/CC/decontaminate additions
    "dedup_exact_docs",
    "simhash_docs",
    "dedup_cc_clusters",
    "dedup_cc_clusters_star",
    "dedup_keep_list",
    "semantic_dedup_keep_list",
    "decontaminate_vs_eval",
    "doc_chunks_overlap",
    "incremental_dedup_new_docs",
    # round 6
    "funnel_conversion",
    "retention_cohorts",
    "inverted_index_topdocs",
    "semdedup_keep_list",
]


def shuffle_bytes(ui: str) -> tuple[int, int]:
    """(total shuffle write bytes, max single-stage shuffle write) across
    all completed stages so far."""
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        )
    )
    writes = [s.get("shuffleWriteBytes", 0) for s in stages]
    return sum(writes), max(writes, default=0)


def clear_stage_caches() -> None:
    from postgres_etl_pipeline_spark import queries_ext, queries_stream

    queries_ext._PAIR_STAGE_CACHE.clear()
    queries_stream._PROFILE_DRAIN.clear()


def chain_rounds(spark, n: int) -> int:
    """Star-CC rounds to converge on a length-n chain (diameter n-1) —
    the adversarial shape hash-to-min degrades to O(n) on. Delegates to
    graph.star_convergence_rounds so the measurement shares the exact
    production loop + signature."""
    from pyspark.sql import functions as F

    from postgres_etl_pipeline_spark.operators.graph import (
        star_convergence_rounds,
    )

    edges = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    return star_convergence_rounds(edges)


def main() -> None:
    # Usage: scale_run.py [sf1_dir] [--only name1,name2]
    # --only measures just the listed entries (appended to an existing
    # results.json) and skips the chain-rounds sweep — for adding rows
    # without re-measuring the whole family.
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfscale/sf1"
    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1].split(",")
    from postgres_etl_pipeline_spark.queries import REGISTRY, queries as load_all
    from postgres_etl_pipeline_spark.session import build_session

    load_all()
    spark = build_session(
        app_name="scale-run",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
            # shuffle accounting reads cumulative stage metrics from the UI
            # API; the default retention (1000 stages) evicts early stages
            # mid-run and makes deltas go negative
            "spark.ui.retainedStages": "100000",
            # local-mode default is a 1g JVM — the sf1 measurement runs 10×
            # the data through one process, so size the heap like the
            # per-executor memory a real cluster run would get (SCALE.md
            # deployment sketch), not like a unit test.
            "spark.driver.memory": "48g",
        },
    )
    ui = spark.sparkContext.uiWebUrl
    names = only or (
        [n for n, s in REGISTRY.items() if "bench" in s.tags] + FAMILY
    )

    results: dict = {"queries": {}, "chain_rounds": {}}
    if only and os.path.exists("/tmp/sfscale/results.json"):
        with open("/tmp/sfscale/results.json") as f:
            results = json.load(f)
    # engine warm-up
    REGISTRY["daily_sales_mart"].fn(spark, "/root/testdata/sf0.1").count()
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").count()

    for name in names:
        spec = REGISTRY[name]
        row: dict = {}
        for label, sf_dir in (("sf0.1", "/root/testdata/sf0.1"), ("sf1", sf1)):
            clear_stage_caches()
            spec.fn(spark, sf_dir).count()  # warm this plan
            best, shuffle_mb, n_rows = float("inf"), 0.0, 0
            for _ in range(2):  # best-of-2, shuffle from the best run
                clear_stage_caches()
                sh0, _ = shuffle_bytes(ui)
                t0 = time.perf_counter()
                n_rows = spec.fn(spark, sf_dir).count()
                sec = time.perf_counter() - t0
                sh1, _ = shuffle_bytes(ui)
                if sec < best:
                    best, shuffle_mb = sec, (sh1 - sh0) / 1e6
            row[label] = {
                "sec": round(best, 3),
                "rows": n_rows,
                "shuffle_mb": round(shuffle_mb, 1),
            }
        row["x"] = round(row["sf1"]["sec"] / max(row["sf0.1"]["sec"], 1e-9), 1)
        results["queries"][name] = row
        print(
            f"{name:32s} sf0.1 {row['sf0.1']['sec']:7.2f}s"
            f" ({row['sf0.1']['shuffle_mb']:8.1f} MB sh) | sf1"
            f" {row['sf1']['sec']:7.2f}s ({row['sf1']['shuffle_mb']:8.1f} MB"
            f" sh) | {row['x']:5.1f}x",
            flush=True,
        )

    for n in () if only else (10_000, 100_000, 1_000_000):
        r = chain_rounds(spark, n)
        results["chain_rounds"][n] = r
        print(f"star-CC chain n={n}: {r} rounds", flush=True)

    with open("/tmp/sfscale/results.json", "w") as f:
        json.dump(results, f, indent=2)
    print("wrote /tmp/sfscale/results.json")
    spark.stop()


if __name__ == "__main__":
    main()
