"""Physical-plan inspection utilities.

The scale contract (SURVEY.md §8 scale notes) is enforceable, not
aspirational: tests assert that filters reach the parquet scan, that dim
joins broadcast, that no operator falls back to a cartesian product, and
that shuffle counts stay at the algorithmic minimum. `.explain()` output is
for humans; these helpers make it a test surface.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return qe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def operator_counts(df: DataFrame) -> dict[str, int]:
    """Physical operator name -> occurrence count (formatted-mode nodes).

    Counts the FINAL plan only: once a DataFrame has executed, the
    formatted explain of a finalized AQE plan details '== Final Plan =='
    AND '== Initial Plan ==' with distinct node ids — counting both
    doubles every operator, so an exact-count assertion made after an
    action would spuriously fail (empirically: Exchange 2 -> 4 on the
    same DataFrame after .collect())."""
    plan = physical_plan(df)
    cut = plan.find("== Initial Plan ==")
    if cut != -1:
        plan = plan[:cut]
    out: dict[str, int] = {}
    for _, op in re.findall(r"\((\d+)\) (\w+)", plan):
        out[op] = out.get(op, 0) + 1
    return out


def pushed_filters(df: DataFrame) -> list[str]:
    """Every non-empty PushedFilters entry across the plan's scans."""
    plan = physical_plan(df)
    return [m for m in re.findall(r"PushedFilters: \[([^\]]*)\]", plan) if m]


def assert_filter_pushed(df: DataFrame, fragment: str) -> None:
    entries = pushed_filters(df)
    assert any(fragment in e for e in entries), (
        f"no pushed filter contains {fragment!r}; scans pushed: {entries}"
    )


def assert_broadcast_joins(df: DataFrame, at_least: int) -> None:
    ops = operator_counts(df)
    n = ops.get("BroadcastHashJoin", 0) + ops.get("BroadcastNestedLoopJoin", 0)
    assert n >= at_least, f"expected >= {at_least} broadcast joins, plan has {n}: {ops}"


def assert_no_cartesian(df: DataFrame) -> None:
    ops = operator_counts(df)
    assert "CartesianProduct" not in ops, f"cartesian product in plan: {ops}"


def assert_max_shuffles(df: DataFrame, limit: int) -> None:
    """Exchange nodes (shuffles) must not exceed the algorithmic minimum the
    query was designed for — a regression here is a 100 TB cost bomb."""
    n = operator_counts(df).get("Exchange", 0)
    assert n <= limit, f"plan has {n} shuffles, budget is {limit}"


def assert_whole_stage_codegen(df: DataFrame) -> None:
    """The hot path must be codegen'd (no interpreted row-at-a-time spans).

    AQE materializes the final plan only on execution, so this runs the
    query (call on small-SF data) and inspects the executed plan."""
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "*(" in final, final[:500]  # codegen'd operators print as *(id) Op
