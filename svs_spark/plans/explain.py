"""Physical-plan introspection helpers.

Used by tests/test_plans.py to assert the plans we *want* at 100 TB —
not just plans that happen to pass: filters pushed to the parquet scan,
column pruning in ReadSchema, broadcast joins for small sides, TakeOrdered
instead of global sorts, whole-stage codegen over the hot expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if the parquet scan advertises a pushed filter containing
    ``fragment`` (check `PushedFilters:` lines in the formatted plan)."""
    plan = plan_string(df)
    return any(
        fragment in line
        for line in plan.splitlines()
        if "PushedFilters" in line
    )


def reads_only_columns(df: DataFrame, table_cols: set[str]) -> bool:
    """True if every parquet ReadSchema in the plan projects a subset of
    ``table_cols`` (column pruning reached the scan)."""
    import re

    plan = plan_string(df)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    if not schemas:
        return False
    for schema in schemas:
        cols = {
            c.split(":")[0].strip() for c in schema.split(",") if c.strip()
        }
        if not cols <= table_cols:
            return False
    return True


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_string(df, "simple")


def uses_take_ordered(df: DataFrame) -> bool:
    """TakeOrderedAndProject = per-partition heaps + driver merge — the
    distributed argpartition. A global Sort before a Limit is the plan
    smell this guards against."""
    return "TakeOrderedAndProject" in plan_string(df, "simple")


def count_shuffles(df: DataFrame) -> int:
    plan = plan_string(df, "simple")
    return plan.count("Exchange")


def codegen_stage_count(df: DataFrame) -> int:
    return plan_string(df, "simple").count("WholeStageCodegen")
