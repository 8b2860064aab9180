"""Physical-plan inspection helpers (SURVEY.md §4, SCALE.md).

The reference delegates planning to DuckDB and exposes nothing; here the
plan IS the scale contract, so the engine ships first-class helpers to
render and interrogate it. tests/test_plans.py uses these to pin the
scale-critical properties (pushdown, pruning, broadcast, decorrelation);
operators use them ad hoc during development (`.explain`-driven tuning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """``EXPLAIN FORMATTED`` text for a DataFrame (pre-execution; AQE
    final plans may further improve at runtime)."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def pushed_filters(df: DataFrame) -> list[str]:
    """The PushedFilters lists of every scan in the plan."""
    return [ln.split("PushedFilters:", 1)[1].strip()
            for ln in formatted_plan(df).splitlines()
            if "PushedFilters:" in ln]


def partition_filters(df: DataFrame) -> list[str]:
    return [ln.split("PartitionFilters", 1)[1].strip(" :")
            for ln in formatted_plan(df).splitlines()
            if "PartitionFilters" in ln]


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def has_python_eval(df: DataFrame) -> bool:
    """True if any Python-eval stage (Batch/ArrowEvalPython, MapInPandas,
    FlatMapGroupsInPandas) appears — i.e. rows leave the JVM."""
    p = formatted_plan(df)
    return any(m in p for m in
               ("EvalPython", "MapInPandas", "FlatMapGroupsInPandas"))
