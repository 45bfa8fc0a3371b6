"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``postgres_etl_pipeline_spark.queries`` (registry of
QuerySpec: Spark fn + DuckDB oracle + SURVEY §2 citation).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from postgres_etl_pipeline_spark import queries as Q

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Flagship = the reference's one real analytical shape (daily mart,
    ``mart_daily_sales.sql:6-15``) scaled to the star join the fact schema
    declares (``sql/init.sql:33-44``): revenue by region × nation over the
    full 5-table join.
    """
    return Q.star_join_revenue(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted ⇒ rows-only check)."""
    return Q.oracle_sql()
