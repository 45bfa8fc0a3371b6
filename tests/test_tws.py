"""Per-user stateful profile: the applyInPandasWithState twin runs
UNCONDITIONALLY, pinning the profile semantics against the batch answer in
this container. The transformWithStateInPandas legs live in
test_tws_protocol.py behind ONE module-level environmental skip
(google.protobuf absent; see that module's docstring for the adjudication).
On a standard Spark 4 cluster all three tests run and TWS must equal both
the twin and the batch answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_etl_pipeline_spark.queries import read_events
from postgres_etl_pipeline_spark.streaming import jobs, runner, sources

def _batch_profile(spark, sf_small):
    batch = read_events(spark, sf_small)
    return {
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


def _final_emission_per_user(res):
    # update mode re-emits per batch; keep the final emission per user
    return {
        r.user_id: (r.n_events, r.n_types, r.total_value)
        for r in res.groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("n_events", "n_types", "total_value"), "n_events"
            ).alias("s")
        )
        .select("user_id", "s.*")
        .collect()
    }


def test_profile_twin_matches_batch(spark, sf_small):
    """applyInPandasWithState profile == batch groupBy answer — runs in
    every environment, no protobuf needed."""
    ev = sources.stream_events(spark, sf_small).select(
        "user_id", "event_type", "value"
    )
    res = runner.run_to_memory(
        jobs.stateful_user_profile(ev),
        "profile_twin",
        "update",
        state_partitions=4,
    )
    assert _final_emission_per_user(res) == _batch_profile(spark, sf_small)
