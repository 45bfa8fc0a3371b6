"""Plan inspection: parse a DataFrame's physical plan into a comparable
summary, so tests can pin the PLAN SHAPE (broadcasts, shuffle count, pushed
filters, column pruning) and not just the result values.

Why this exists: at sf0.01 every strategy returns the right rows in
milliseconds — the only way a local test can catch a 100 TB regression
(a dim that stopped broadcasting, a filter that stopped pushing into the
parquet scan, an accidental extra shuffle) is to assert on the plan
itself. `scripts/dump_plans.py` renders the same information for human
review in PLANS.md; this module is the machine-checkable twin.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "simple") -> str:
    """The physical plan as text. mode: simple|extended|formatted|cost."""
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        mode
    )
    return df._jdf.queryExecution().explainString(jmode)


@dataclass
class PlanSummary:
    shuffles: int = 0
    broadcast_joins: int = 0
    sort_merge_joins: int = 0
    shuffled_hash_joins: int = 0
    nested_loop_joins: int = 0
    scans: int = 0
    scans_with_pushed_filters: int = 0
    wholestage_spans: int = 0
    read_schemas: list[str] = field(default_factory=list)

    @property
    def joins(self) -> int:
        return (
            self.broadcast_joins
            + self.sort_merge_joins
            + self.shuffled_hash_joins
            + self.nested_loop_joins
        )


def plan_summary(df: DataFrame) -> PlanSummary:
    """Counts of the plan features that matter at scale.

    Parsed from the pre-AQE physical plan (`simple` mode): AQE rewrites
    (e.g. SMJ→BHJ on observed sizes) are runtime wins we don't pin tests
    to — the declared plan is what must be right at 100 TB, where the
    small-relation observations that trigger local AQE conversions don't
    happen.
    """
    s = plan_string(df, "simple")
    read_schemas = re.findall(r"ReadSchema: (struct<[^\n]*)", s)
    return PlanSummary(
        shuffles=len(re.findall(r"Exchange (?:hash|range)partitioning", s)),
        broadcast_joins=len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", s)),
        sort_merge_joins=len(re.findall(r"SortMergeJoin", s)),
        shuffled_hash_joins=len(re.findall(r"ShuffledHashJoin", s)),
        nested_loop_joins=len(re.findall(r"CartesianProduct", s)),
        scans=len(re.findall(r"FileScan ", s)),
        scans_with_pushed_filters=len(
            re.findall(r"PushedFilters: \[(?!\])", s)
        ),
        wholestage_spans=wholestage_spans(df),
        read_schemas=read_schemas,
    )


def wholestage_spans(df: DataFrame) -> int:
    """Distinct WholeStageCodegen spans (`*(N)` markers) in the executed
    plan. Under AQE the codegen annotation only exists once the final plan
    is materialized — call after an action for a meaningful count."""
    s = df._jdf.queryExecution().executedPlan().toString()
    return len(set(re.findall(r"\*\((\d+)\)", s)))


def scan_columns(df: DataFrame) -> list[set[str]]:
    """The column set each file scan actually reads (column-pruning check).

    A scan reading columns the query never touches means pruning broke —
    at 100 TB that's the difference between reading 2 columns and 16.
    """
    cols: list[set[str]] = []
    for schema in plan_summary(df).read_schemas:
        names = re.findall(r"(?:^struct<|,)(\w+):", schema)
        cols.append(set(names))
    return cols
