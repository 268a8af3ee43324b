"""Physical-plan introspection: make Catalyst's decisions inspectable.

At 100 TB the difference between a good and a bad plan is the job — a scan
that reads all columns, a join that forgot to broadcast, an encode path
that picked up an Exchange. These helpers turn "the plan I'd want" into
assertions (used by tests/test_plans.py and available to operators/jobs
for runtime self-checks before launching an expensive action).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """Executed (physical) plan as text — what actually runs."""
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    """Catalyst-optimized logical plan as text."""
    return df._jdf.queryExecution().optimizedPlan().toString()


def _after(plan: str, marker: str, width: int = 300) -> str:
    """The `width` chars following the first `marker` ('' if absent)."""
    if marker not in plan:
        return ""
    return plan.split(marker, 1)[1][:width]


def pushed_filters(df: DataFrame, width: int = 300) -> str:
    """The PushedFilters fragment of the scan ('' if none)."""
    return _after(physical_plan(df), "PushedFilters", width)


def partition_filters(df: DataFrame, width: int = 300) -> str:
    """The PartitionFilters fragment (directory pruning) ('' if none)."""
    return _after(physical_plan(df), "PartitionFilters", width)


def read_schema(df: DataFrame, width: int = 300) -> str:
    """The ReadSchema fragment — which columns the scan actually reads."""
    return _after(physical_plan(df), "ReadSchema", width)


def exchange_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the physical plan."""
    return physical_plan(df).count("Exchange")


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or "BroadcastNestedLoopJoin" in physical_plan(df)


def uses_takeordered(df: DataFrame) -> bool:
    """Top-k ends in per-partition heaps, never a global Sort."""
    return "TakeOrderedAndProject" in physical_plan(df)


def python_eval_ops(df: DataFrame) -> list[str]:
    """Names of Python-evaluation operators in the plan (ArrowEvalPython =
    vectorized pandas UDF; BatchEvalPython = row-at-a-time — the slow path
    this engine bans)."""
    plan = physical_plan(df)
    return [
        op
        for op in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas", "MapInArrow")
        if op in plan
    ]


def assert_column_pruned(df: DataFrame, column: str) -> None:
    """Fail if `column` survives into the scan's ReadSchema."""
    frag = read_schema(df)
    if column in frag:
        raise AssertionError(
            f"column {column!r} not pruned from scan: ReadSchema={frag!r}"
        )


def assert_no_exchange(df: DataFrame) -> None:
    n = exchange_count(df)
    if n:
        raise AssertionError(f"plan contains {n} Exchange(s):\n{physical_plan(df)}")


def assert_no_rowwise_python(df: DataFrame) -> None:
    """BatchEvalPython (per-row Python UDF) must never appear."""
    if "BatchEvalPython" in physical_plan(df):
        raise AssertionError("row-at-a-time Python UDF in plan (BatchEvalPython)")
