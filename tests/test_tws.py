"""Spark 4 transformWithStateInPandas operator (streaming/jobs.py).

Skips when google.protobuf is absent (this container): the TWS state-server
protocol requires it. On a standard Spark 4 cluster the test runs fully —
drained TWS profile must equal the batch groupBy answer.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from postgres_etl_pipeline_spark.queries import read_events
from postgres_etl_pipeline_spark.session import scoped_conf
from postgres_etl_pipeline_spark.streaming import jobs, runner, sources

pytestmark = pytest.mark.skipif(
    not jobs.tws_available(),
    reason="google.protobuf not installed (TWS state-server protocol)",
)


def test_tws_profile_matches_batch(spark, sf_small):
    with scoped_conf(spark, jobs.TWS_PROVIDER_CONF):
        ev = sources.stream_events(spark, sf_small).select(
            "user_id", "event_type", "value"
        )
        out = jobs.stateful_user_profile_tws(ev)
        res = runner.run_to_memory(out, "tws_profile", "update")
        # update mode re-emits per batch; keep the final emission per user
        got = {
            r.user_id: (r.n_events, r.n_types, r.total_value)
            for r in res.groupBy("user_id")
            .agg(F.max_by(F.struct("n_events", "n_types", "total_value"), "n_events").alias("s"))
            .select("user_id", "s.*")
            .collect()
        }
    batch = read_events(spark, sf_small)
    want = {
        r.user_id: (r.n_events, r.n_types, r.total_value)
        for r in batch.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("total_value"),
        )
        .collect()
    }
    assert got == want
