"""Dump formatted plans for the round-13 plan evidence (plans/r13/).

Usage: python scripts/dump_r13_plans.py <suffix> [entry ...]
With no entries given, dumps the 12 headline bench queries plus the
classifier entry whose plan the round-13 notes cite.
"""

import sys

from postgres_etl_pipeline_spark.session import build_session
from postgres_etl_pipeline_spark.queries import REGISTRY, queries as load_all

HEADLINE = [
    "daily_sales_mart", "star_join_revenue", "topk_orders_per_priority",
    "events_hourly", "sessionize_users", "asof_click_attribution",
    "cube_returnflag_status", "pricing_summary", "q3_shipping_priority",
    "jaccard_near_dups", "minhash_lsh_near_dups", "embedding_cosine_topk",
    "nb_quality_classifier_topk",
]


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or HEADLINE
    load_all()
    spark = build_session(
        app_name="dump-r13-plans",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    sf = "/root/testdata/sf0.1"
    for name in names:
        df = REGISTRY[name].fn(spark, sf)
        txt = df._jdf.queryExecution().explainString(mode)
        out = f"plans/r13/{name}_{suffix}.txt"
        with open(out, "w") as f:
            f.write(txt)
        print(out, flush=True)


if __name__ == "__main__":
    main()
