"""Driver contract for the spark-graft builder (PySpark target).

The engine lives in ``legend_community_delta_spark``; the demo model and
query suite live in ``legend_community_delta_spark.demo``.  Each
``queries()`` entry has a DuckDB ``oracle_sql()`` twin unless the operator
is approximate/hash-seeded by nature (MinHash/SimHash/LSH), which get
rows-only checks.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from legend_community_delta_spark import demo  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the synthesized Legend
    mapping query (scan + derivations + expectation prefilter)."""
    return demo.QUERIES["legend_mapping_orders"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return dict(demo.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every deterministic query."""
    return dict(demo.ORACLES)
