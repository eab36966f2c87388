"""demo._spread: repartition only under-split scans (round-8 item)."""

from __future__ import annotations

from legend_community_delta_spark.demo import _spread


def test_spread_widens_single_split_input(spark):
    cores = spark.sparkContext.defaultParallelism
    df = spark.range(100).coalesce(1)
    out = _spread(df, spark)
    assert out.rdd.getNumPartitions() == cores


def test_spread_leaves_wide_input_alone(spark):
    cores = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(cores + 2)
    out = _spread(df, spark)
    # no extra shuffle: the plan is the input plan, partitions unchanged
    assert out is df
