"""Regenerate DRIVER_WINDOW.json from the deterministic ageing rule.

Usage: python scripts/compute_driver_window.py [round_number]

The window is a pure function of the committed CORRECTNESS_r*.json
artifacts (see queries.compute_aged_window): 3 sentinels + the 47
least-recently-driver-verified registry entries, ties by name. Run once
per round after the previous round's CORRECTNESS file lands; the
registry-contract test fails if the committed config ever deviates from
the rule's output.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from postgres_etl_pipeline_spark.queries import (  # noqa: E402
    _SENTINELS,
    compute_aged_window,
)


def main() -> None:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else None
    window = compute_aged_window(str(ROOT))
    payload = {
        "_comment": (
            "Driver verification window (the harness checks "
            "list(queries())[:50]). DETERMINISTIC ageing rule — not an "
            "editorial list: 3 sentinels + the 47 registry entries whose "
            "latest CORRECTNESS_r*.json appearance is oldest "
            "(never-checked first), ties by name. Regenerate with "
            "scripts/compute_driver_window.py; "
            "tests/test_registry_contract.py pins the committed window "
            "to the rule's output."
        ),
        **({"round": rnd} if rnd is not None else {}),
        "rule": "aged-lrv-v1",
        "sentinels": list(_SENTINELS),
        "window": window,
    }
    out = ROOT / "DRIVER_WINDOW.json"
    out.write_text(json.dumps(payload, indent=2) + "\n")
    print(f"wrote {out} ({len(window)} names)")


if __name__ == "__main__":
    main()
