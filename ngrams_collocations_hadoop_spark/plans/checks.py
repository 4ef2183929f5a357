"""Helpers for asserting properties of a DataFrame's physical plan.

SURVEY.md §4/§5: the reference hand-implements predicate pushdown,
column pruning, partial aggregation, Top-K pushdown, and broadcast side
inputs; in this engine those come from Catalyst — and these checks
prove the plans actually contain them, guarding against regressions
that results-only tests cannot see (a plan can be correct but 100×
slower)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, executed: bool = False) -> str:
    """executedPlan (NOT sparkPlan): EnsureRequirements has run, so
    exchanges/sorts are visible. Before execution this is the initial
    adaptive plan; pass executed=True after an action for AQE's final
    decisions."""
    return df._jdf.queryExecution().executedPlan().toString()


def final_adaptive_plan(df: DataFrame) -> str:
    """Execute the plan (noop sink via count on the same QueryExecution)
    and return the final adaptive plan string, where AQE decisions
    (broadcast conversion, exchange reuse, skew splits) are visible."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def assert_in_plan(df: DataFrame, *fragments: str, executed: bool = False) -> None:
    plan = physical_plan(df, executed=executed)
    missing = [f for f in fragments if f not in plan]
    assert not missing, f"plan is missing {missing}:\n{plan}"


def assert_not_in_plan(df: DataFrame, *fragments: str) -> None:
    plan = physical_plan(df)
    present = [f for f in fragments if f in plan]
    assert not present, f"plan unexpectedly contains {present}:\n{plan}"


def count_in_plan(df: DataFrame, fragment: str, executed: bool = False) -> int:
    return physical_plan(df, executed=executed).count(fragment)


def unpartitioned_windows(df: DataFrame) -> list[str]:
    """Window nodes in the optimized logical plan with an EMPTY
    partition spec. Such a window moves every row to ONE task (Spark
    logs 'No Partition Defined for Window operation') — a single-task
    global sort that is fine at test SF and fatal at 100 TB. Detected
    structurally via the plan's JSON rendering, not its display string
    (the text form doesn't separate partition from order spec)."""
    import json

    nodes = json.loads(df._jdf.queryExecution().optimizedPlan().toJSON())
    return [n["class"] for n in nodes
            if n["class"].endswith(".Window") and not n.get("partitionSpec")]
