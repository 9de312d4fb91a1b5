"""Physical-plan assertions used by tests and perf checks.

BASELINE.json input_hint mandates vectorized pandas/Arrow UDFs with
no per-row Python. Row-wise Python UDFs surface in Spark physical
plans as `BatchEvalPython`; Arrow-vectorized ones as `ArrowEvalPython`
/ `MapInPandas` / `FlatMapGroupsInPandas`. These helpers make the
constraint executable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

ROW_WISE_MARKERS = ("BatchEvalPython",)


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def assert_no_rowwise_python(df: DataFrame) -> None:
    plan = physical_plan(df)
    for marker in ROW_WISE_MARKERS:
        assert marker not in plan, f"row-wise Python UDF in plan:\n{plan}"


def pushed_filters(df: DataFrame) -> str:
    """The scan portion of the plan (shows PushedFilters / ReadSchema)."""
    plan = physical_plan(df)
    return "\n".join(line for line in plan.splitlines() if "PushedFilters" in line or "Scan" in line)
