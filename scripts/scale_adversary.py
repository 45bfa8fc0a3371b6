"""df-dilution adversary measurement (SCALE.md "measured adversary" note).

Runs the near-dup miners against the INTERLEAVE-mode sf1 corpus
(scripts/make_scale_data.py ... interleave), where every base shingle's
document-frequency FRACTION is diluted by 1/factor while the corpus
grows — the input that defeats fractional max-df stop-shingle caps:
shingles that were capped at sf0.1 fall under the cap at sf1, their
posting lists join back in, and the exact-Jaccard inverted index pays
quadratic pairs on them. MinHash+LSH is structurally immune (bucket
keys are signature bands, not shingles), which is the measured argument
for it being the 100 TB path.

Usage: python scripts/scale_adversary.py [adv_dir]  (default /tmp/sfscale/sf1adv)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "minhash_lsh_near_dups",
    "simhash_near_dups",
    "jaccard_near_dups",
    "jaccard_prefix_filter_dups",
]


def main() -> None:
    adv = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfscale/sf1adv"
    from postgres_etl_pipeline_spark.queries import REGISTRY, queries as load_all
    from postgres_etl_pipeline_spark.session import build_session

    load_all()
    spark = build_session(
        app_name="scale-adversary",
        extra_conf={"spark.driver.memory": "48g"},
    )
    # one warm-up for JVM/codegen, then a single measured run per query
    # (the jaccard leg runs minutes on this corpus — best-of-N would just
    # repeat the demonstration)
    REGISTRY["dedup_exact_docs"].fn(spark, adv).count()
    for name in QUERIES:
        t0 = time.perf_counter()
        n = REGISTRY[name].fn(spark, adv).count()
        sec = time.perf_counter() - t0
        print(f"{name:28s} {sec:8.2f}s  {n} pairs", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
