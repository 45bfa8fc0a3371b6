"""One-command per-round regeneration — the round-ops path (verdict
r12 item 4: PLANS.md went three rounds stale because regenerating it
was a separate manual step; this script makes the full artifact set one
command, so a skipped regeneration is a skipped ROUND STEP, visible in
the diff, never a silent drift).

Run AFTER the last source/catalog edit of the round:

    python scripts/round_ops.py <round-number> [--skip-plans]

Steps, in dependency order:
1. `dump_catalog_index.py`   — COVERAGE.md catalog table + counts
   (pinned by tests/test_registry_contract.py);
2. `compute_driver_window.py <round>` — DRIVER_WINDOW.json via the
   ageing rule (new entries front-load; `--check` verifies after);
   NEVER run while a pytest process is mid-run — the registry re-reads
   the window file;
3. `dump_plans.py`           — PLANS.md plan dumps for the generator's
   selection (pinned by test_plans_doc_covers_generator_selection);
   `--skip-plans` only when no plan-affecting change happened (the pin
   still fails if the SELECTION changed without a regen).

SCALE.md rows and BENCH_VS_DUCKDB.md stay separate: they are
MEASUREMENTS and need a quiet box (see the round-ops notes), while
everything here is deterministic regeneration.
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def run(script: str, *args: str) -> None:
    cmd = [sys.executable, os.path.join(HERE, script), *args]
    print(f"== {' '.join(cmd[1:])}", flush=True)
    subprocess.run(cmd, check=True, cwd=os.path.dirname(HERE))


def main() -> None:
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    if len(argv) != 1 or not argv[0].isdigit():
        sys.exit("usage: python scripts/round_ops.py <round-number> "
                 "[--skip-plans]")
    rnd = argv[0]
    run("dump_catalog_index.py")
    run("compute_driver_window.py", rnd)
    run("compute_driver_window.py", "--check")
    if "--skip-plans" not in flags:
        run("dump_plans.py")
    print("round-ops regeneration complete; remaining (quiet-box) steps: "
          "SCALE.md rows (scale_run.py), BENCH_VS_DUCKDB.md "
          "(bench_vs_duckdb.py), BENCH json (bench.py)")


if __name__ == "__main__":
    main()
