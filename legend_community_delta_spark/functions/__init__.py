"""Shared helpers for the operator modules."""

from __future__ import annotations

from pyspark.sql import DataFrame


def local_df(spark, rows, schema) -> DataFrame:
    """``createDataFrame`` for METADATA-SIZED local rows, pinned to ONE
    partition.

    The default ``createDataFrame(list)`` parallelizes into
    ``defaultParallelism`` partitions (all but one empty), and a
    ``coalesce(1)`` consumer — the usual shape for store footers — then
    pulls every partition's Python-worker round-trip SERIALLY inside a
    single task: ~5.7 s for a ONE-ROW footer on local[32] (r13
    measurement; guide §4, the Python boundary).  One slice makes the
    same write ~0.35 s and is the right shape for any driver-local
    handful of rows.  Not for data-sized inputs — those should come
    from storage, not the driver.
    """
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
