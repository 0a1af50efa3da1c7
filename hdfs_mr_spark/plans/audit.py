"""Physical-plan inspection helpers (SURVEY.md §4.3's audit gate).

Used by tests/test_plans.py to lock in plan properties, and runnable ad
hoc while developing an operator:

    from hdfs_mr_spark.plans.audit import plan_summary
    print(plan_summary(df))
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """`df.explain("formatted")` captured as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_nodes(plan: str) -> list[str]:
    """The operator lines of a formatted plan, in execution order."""
    return [n.strip() for n in re.findall(r"^\s*\(\d+\)\s+(.+)$", plan, re.M)]


def plan_summary(df: DataFrame) -> dict:
    """Counts of the plan features the 100 TB stance cares about."""
    plan = formatted_plan(df)
    nodes = plan_nodes(plan)
    return {
        "exchanges": sum("Exchange" in n for n in nodes),
        "broadcast_hash_joins": sum("BroadcastHashJoin" in n for n in nodes),
        "sort_merge_joins": sum("SortMergeJoin" in n for n in nodes),
        "nested_loop_joins": sum("BroadcastNestedLoopJoin" in n for n in nodes),
        "cartesian_products": sum("CartesianProduct" in n for n in nodes),
        "pushed_filters": len(
            [m for m in re.findall(r"PushedFilters: \[([^\]]*)\]", plan) if m]
        ),
        "wholestage_codegen": plan.count("WholeStageCodegen"),
        "nodes": nodes,
    }
