"""Physical-plan inspection helpers.

``plan_summary`` distills ``df.explain`` into the handful of facts that
decide whether a plan survives a 100x scale-up — the same properties
``tests/test_scale_plan.py`` pins.  Use it in notebooks/CI gates::

    >>> s = plan_summary(df)
    >>> assert s["python_udfs"] == 0 and s["pushed_filters"]
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def plan_summary(df: DataFrame) -> dict:
    plan = executed_plan(df)
    # long filter lists are truncated by Spark ("...," with no closing
    # bracket) — capture until the bracket, the next section, or EOL
    pushed = re.findall(r"PushedFilters: \[(.*?)(?:\]|, ReadSchema|\n)", plan)
    return {
        "exchanges": plan.count("Exchange"),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "python_udfs": plan.count("BatchEvalPython") + plan.count("ArrowEvalPython"),
        "arrow_batches": plan.count("MapInPandas") + plan.count("FlatMapGroupsInPandas"),
        "take_ordered": "TakeOrderedAndProject" in plan,
        "partition_filters": "PartitionFilters" in plan,
        "pushed_filters": [f for f in pushed if f.strip()],
        "scans": plan.count("FileScan"),
    }


def assert_scalable(df: DataFrame, max_exchanges: int | None = None,
                    allow_python_udfs: bool = False,
                    require_pushdown: bool = False) -> dict:
    """Raise AssertionError when the plan violates the given scale gates;
    returns the summary for logging either way."""
    s = plan_summary(df)
    if not allow_python_udfs and s["python_udfs"]:
        raise AssertionError(f"plan contains {s['python_udfs']} Python UDF node(s)")
    if max_exchanges is not None and s["exchanges"] > max_exchanges:
        raise AssertionError(
            f"plan has {s['exchanges']} exchanges (max {max_exchanges})")
    if require_pushdown and not s["pushed_filters"]:
        raise AssertionError("no filters pushed to the scan")
    return s
