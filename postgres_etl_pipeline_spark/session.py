"""SparkSession factory.

Defaults chosen for Postgres-parity semantics (SURVEY §2.9) and scale
(SURVEY §4.2):

- ``spark.sql.session.timeZone=UTC``: the reference stores TIMESTAMPTZ in UTC
  (reference ``sql/init.sql:20,29``; API emits ISO-8601 UTC
  ``mock_pos_api/app.py:25``).
- ``spark.sql.ansi.enabled=true`` (Spark 4 default): cast('oops' as int) and
  x/0 raise, matching Postgres (reference ``dbt_retail/models/staging/
  stg_transactions.sql:32,38``). Engine code that *wants* null-on-failure uses
  ``try_cast`` / ``try_divide`` explicitly.
- AQE on: runtime join re-planning + skew-join splitting at scale.
- shuffle.partitions sized to local cores here; on a real cluster leave AQE's
  coalescing to right-size post-shuffle partitions.
"""

from __future__ import annotations

import os
from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def build_session(
    app_name: str = "postgres-etl-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession configured for this engine.

    On a cluster, ``master`` comes from spark-submit; locally we default to
    ``local[N]`` with N = SPARK_GRAFT_CPUS (default 32).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


@contextmanager
def scoped_conf(spark: SparkSession, confs: dict[str, str]) -> Iterator[SparkSession]:
    """Set session confs for the duration of the block, then restore priors.

    For confs consumed at *relation-creation* time (e.g.
    ``spark.sql.legacy.parquet.nanosAsLong``, baked into the parquet
    relation when ``spark.read`` resolves it) this scopes the override to
    the reads inside the block without leaking mutated session state to
    later, unrelated reads — which should fail loudly on nanos timestamps
    rather than silently producing bigint columns.
    """
    priors: dict[str, str | None] = {}
    for k, v in confs.items():
        priors[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        yield spark
    finally:
        for k, prior in priors.items():
            if prior is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, prior)
