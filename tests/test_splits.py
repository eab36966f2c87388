"""Leakage-safe splits + deterministic shard shuffle (operators/splits.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from legend_community_delta_spark.operators.splits import (
    _hex_boundaries,
    leakage_safe_split,
    shuffle_shards,
    split_leakage_report,
    write_training_shards,
)


def _pairs(spark, edges):
    if not edges:
        return spark.createDataFrame([], "id_a long, id_b long")
    return spark.createDataFrame(edges, "id_a long, id_b long")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [Row(doc_id=i, text=f"doc {i}") for i in range(300)])


def test_hex_boundaries_exact():
    b = _hex_boundaries({"train": 0.8, "val": 0.1, "test": 0.1}, 8)
    assert b[0] == ("train", format(int(0.8 * 16**8), "08x"))
    assert b[-1] == ("test", "gggggggg")
    with pytest.raises(ValueError):
        _hex_boundaries({"a": 0.5, "b": 0.4}, 8)
    with pytest.raises(ValueError):
        _hex_boundaries({}, 8)


def test_no_pair_straddles_splits(spark, docs):
    # chain 0-1-2 plus pair (10,11): whole components co-assigned
    pairs = _pairs(spark, [(0, 1), (1, 2), (10, 11)])
    out = leakage_safe_split(docs, pairs)
    rows = {r["doc_id"]: r["split"] for r in out.collect()}
    assert rows[0] == rows[1] == rows[2]
    assert rows[10] == rows[11]
    assert split_leakage_report(out, pairs).count() == 0
    # every doc assigned, all three splits populated at n=300
    assert len(rows) == 300 and None not in rows.values()
    assert set(rows.values()) == {"train", "val", "test"}


def test_split_fractions_roughly_honored(spark, docs):
    out = leakage_safe_split(docs, _pairs(spark, []))
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert counts["train"] / 300 > 0.7
    assert counts["val"] / 300 < 0.2 and counts["test"] / 300 < 0.2


def test_naive_split_leaks_where_safe_does_not(spark, docs):
    pairs = _pairs(spark, [(i, i + 100) for i in range(0, 60)])
    naive = docs.withColumn(
        "split", F.when(F.substring(F.md5(F.col("doc_id").cast("string")),
                                    1, 8) < "cccccccc", "train")
        .otherwise("test"))
    assert split_leakage_report(naive, pairs).count() > 0
    safe = leakage_safe_split(docs, pairs)
    assert split_leakage_report(safe, pairs).count() == 0


def test_salt_reassigns_deterministically(spark, docs):
    a1 = {r["doc_id"]: r["split"]
          for r in leakage_safe_split(docs, _pairs(spark, [])).collect()}
    a2 = {r["doc_id"]: r["split"]
          for r in leakage_safe_split(docs, _pairs(spark, [])).collect()}
    b = {r["doc_id"]: r["split"]
         for r in leakage_safe_split(docs, _pairs(spark, []),
                                     salt="epoch2").collect()}
    assert a1 == a2
    assert a1 != b


def test_shuffle_shards_positions_and_determinism(spark, docs):
    out = shuffle_shards(docs, hex_chars=1).collect()
    by_shard: dict[str, list] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["shard_pos"])
    # positions are contiguous 1..n per shard
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    assert sum(len(p) for p in by_shard.values()) == 300
    assert len(by_shard) == 16  # all hex shards hit at n=300
    again = shuffle_shards(docs, hex_chars=1).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    salted = shuffle_shards(docs, hex_chars=1, salt="e2").collect()
    assert sorted(map(tuple, out)) != sorted(map(tuple, salted))


def test_write_training_shards_roundtrip(spark, docs, tmp_path):
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, hex_chars=1)
    back = spark.read.parquet(path)
    assert back.count() == 300
    assert back.select("shard").distinct().count() == 16
    # shard is a partition column -> partition-pruned reads
    one = back.where(F.col("shard") == "a")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan


def test_leakage_safe_split_plan_no_udf(spark, docs):
    plan = (leakage_safe_split(docs, _pairs(spark, [(1, 2)]))
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_leakage_safe_split_random_graphs_property(spark):
    """Property: under arbitrary random pair graphs, no pair ever
    straddles splits, assignment is total, and fractions are respected
    in aggregate (hypothesis-style seeded trials without per-example
    Spark-session overhead)."""
    import random
    rng = random.Random(123)
    docs = spark.createDataFrame(
        [(i,) for i in range(120)], "doc_id long")
    for trial in range(5):
        n_edges = rng.randint(0, 80)
        edges = [(rng.randint(0, 119), rng.randint(0, 119))
                 for _ in range(n_edges)]
        edges = [(a, b) for a, b in edges if a != b]
        pairs = _pairs(spark, edges)
        out = leakage_safe_split(docs, pairs, salt=f"t{trial}")
        rows = {r["doc_id"]: r["split"] for r in out.collect()}
        assert len(rows) == 120 and None not in rows.values()
        for a, b in edges:
            assert rows[a] == rows[b], (trial, a, b, edges)
        assert split_leakage_report(out, pairs).count() == 0
