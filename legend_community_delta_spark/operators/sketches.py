"""Mergeable sketch store: persisted HLL sketches for incremental
cardinality at 100 TB.

One-shot ``approx_count_distinct`` re-scans the corpus on every question.
The scale pattern is **sketch once, merge forever**: each ingest shard
aggregates its rows into a fixed-size HyperLogLog sketch (Spark 4's
Apache DataSketches ``hll_sketch_agg``), the binary sketches land in a
parquet store, and any later cardinality question is answered by merging
kilobyte sketches — no base-data rescan.  Merges are lossless for a fixed
``lg_k``: the union of per-shard sketches is byte-for-byte the sketch of
the union, so incremental == batch (pinned in tests).

Extension surface — the reference has no sketch machinery; this is the
LLM-pipeline cardinality path (distinct user/url/doc counts over append-
only corpora).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def hll_shard_sketches(df: DataFrame, value_col: str,
                       group_cols: list[str] | tuple[str, ...] = (),
                       shard_col: str | Column | None = None,
                       lg_k: int = 12) -> DataFrame:
    """Per-(group, shard) HLL sketches: ``(group..., __shard, sketch)``.

    *shard_col* is whatever partitions the ingest (a date, a batch id, a
    file path); one sketch row per (group, shard) — kilobytes each,
    regardless of row count underneath.
    """
    shard = (F.lit("all") if shard_col is None
             else (F.col(shard_col) if isinstance(shard_col, str)
                   else shard_col))
    return (df.groupBy(*group_cols, shard.alias("__shard"))
            .agg(F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch")))


def write_sketch_store(df: DataFrame, path: str, value_col: str,
                       group_cols: list[str] | tuple[str, ...] = (),
                       shard_col: str | Column | None = None,
                       lg_k: int = 12, mode: str = "append") -> None:
    """Sketch *df* per (group, shard) and persist to a parquet store.

    ``mode="append"`` is the incremental path: a daily batch writes only
    its own sketches; the store accumulates one row per (group, shard).
    The store carries ``lg_k`` in a column so readers can validate
    compatibility (unions require one lg_k unless explicitly relaxed).
    """
    (hll_shard_sketches(df, value_col, group_cols, shard_col, lg_k)
     .withColumn("lg_k", F.lit(lg_k))
     .write.mode(mode).parquet(path))


def read_sketch_estimates(spark, path: str,
                          group_cols: list[str] | tuple[str, ...] = (),
                          allow_mixed_lg_k: bool = False) -> DataFrame:
    """Merge the stored sketches and estimate distinct counts per group:
    ``(group..., approx_distinct)``.

    Reads only the sketch rows (kilobytes per shard) — the cost is
    independent of how much base data ever flowed through the store.
    A store that mixes ``lg_k`` values raises by default: the union
    degrades every sketch to the coarsest precision present, which
    should be a deliberate choice, not an accident of one mis-configured
    ingest shard.  Pass ``allow_mixed_lg_k=True`` to opt in — the
    DataSketches union downgrades legally (toward smaller lg_k) and the
    estimate stays valid at the coarser error bound.
    """
    store = spark.read.parquet(path)
    lgks = [r[0] for r in store.select("lg_k").distinct().collect()]
    if len(lgks) > 1 and not allow_mixed_lg_k:
        raise ValueError(
            f"sketch store at [{path}] mixes lg_k values {sorted(lgks)}; "
            "rebuild shards at one precision, or pass "
            "allow_mixed_lg_k=True to merge at the coarsest precision "
            f"(lg_k={min(lgks)} error bounds)")
    union = F.hll_union_agg("sketch", len(lgks) > 1)
    return (store.groupBy(*group_cols)
            .agg(F.hll_sketch_estimate(union).alias("approx_distinct")))


def merged_distinct(df: DataFrame, value_col: str,
                    group_cols: list[str] | tuple[str, ...] = (),
                    shard_col: str | Column | None = None,
                    lg_k: int = 12) -> DataFrame:
    """In-flight two-level sketch merge (no store): shard sketches then
    union per group — the same plan shape the store path replays, usable
    to validate a store against its base data."""
    return (hll_shard_sketches(df, value_col, group_cols, shard_col, lg_k)
            .groupBy(*group_cols)
            .agg(F.hll_sketch_estimate(F.hll_union_agg("sketch"))
                 .alias("approx_distinct")))
