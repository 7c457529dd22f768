"""Physical-plan inspection helpers: assert that Catalyst actually did
what the operator design assumes (filter/column pushdown into the
parquet scan, broadcast joins for small sides, whole-stage codegen) —
the '.explain and iterate' loop, made testable."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def plan_has(df: DataFrame, pattern: str, mode: str = "formatted") -> bool:
    return re.search(pattern, explain_str(df, mode)) is not None


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every scan in the plan."""
    plan = explain_str(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Column sets actually read by each parquet scan (ReadSchema)."""
    plan = explain_str(df)
    out = []
    for m in re.findall(r"ReadSchema: struct<([^>]*)>", plan):
        cols = {c.split(":")[0].strip() for c in m.split(",") if c.strip()}
        out.append(cols)
    return out
