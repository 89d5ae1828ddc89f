"""Physical-plan inspection helpers: make plan-shape expectations testable.

The engine's scale story lives in the plans Catalyst produces: resume joins
must broadcast the tiny lineage side, encode stages must not introduce
unnecessary exchanges, scans must prune columns.  These helpers turn
`.explain()` eyeballing into assertions used by tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan."""
    plan = plan_string(df, "simple")
    return sum(1 for line in plan.splitlines()
               if "Exchange" in line and "BroadcastExchange" not in line)


def assert_broadcast_join(df: DataFrame):
    plan = plan_string(df, "simple")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan


def scan_read_schema(df: DataFrame) -> str:
    """ReadSchema fragment of the first parquet scan (column pruning check)."""
    plan = plan_string(df, "formatted")
    for line in plan.splitlines():
        if "ReadSchema" in line:
            return line.strip()
    return ""
