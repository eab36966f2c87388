"""Mergeable HLL sketch store: lossless shard-merge + incremental append."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from legend_community_delta_spark.operators.sketches import (
    hll_shard_sketches,
    merged_distinct,
    read_sketch_estimates,
    write_sketch_store,
)

from conftest import SF_DIR


def _events(spark):
    from legend_community_delta_spark import demo
    demo.ensure_views(spark, SF_DIR)
    return spark.table("events")


def test_shard_merge_is_lossless_and_accurate(spark):
    """Union of per-day shard sketches == one whole-corpus sketch (HLL
    merges are lossless at fixed lg_k), and both within 5% of exact."""
    ev = _events(spark)
    sharded = {r["event_type"]: r["approx_distinct"] for r in merged_distinct(
        ev, "user_id", ["event_type"], shard_col=F.to_date("ts")).collect()}
    whole = {r["event_type"]: r["approx_distinct"] for r in merged_distinct(
        ev, "user_id", ["event_type"], shard_col=None).collect()}
    exact = {r["event_type"]: r["n"] for r in
             ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    assert sharded == whole
    for et, n in exact.items():
        assert abs(sharded[et] - n) <= 0.05 * n + 1


def test_sketch_store_roundtrip_and_incremental(spark, tmp_path):
    """Store written in two appends answers identically to a one-shot
    build — the incremental-ingest invariant."""
    ev = _events(spark)
    old = ev.where(F.dayofmonth("ts") <= 15)
    new = ev.where(F.dayofmonth("ts") > 15)
    assert old.count() > 0 and new.count() > 0

    inc_path = str(tmp_path / "inc_store")
    write_sketch_store(old, inc_path, "user_id", ["event_type"],
                       shard_col=F.to_date("ts"))
    write_sketch_store(new, inc_path, "user_id", ["event_type"],
                       shard_col=F.to_date("ts"))
    one_path = str(tmp_path / "one_store")
    write_sketch_store(ev, one_path, "user_id", ["event_type"],
                       shard_col=F.to_date("ts"), mode="overwrite")

    inc = {tuple(r) for r in read_sketch_estimates(
        spark, inc_path, ["event_type"]).collect()}
    one = {tuple(r) for r in read_sketch_estimates(
        spark, one_path, ["event_type"]).collect()}
    assert inc == one

    exact = {r["event_type"]: r["n"] for r in
             ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    for et, est in inc:
        assert abs(est - exact[et]) <= 0.05 * exact[et] + 1


def test_sketch_rows_are_metadata_sized(spark):
    """One sketch row per (group, shard) — row count independent of the
    base data volume underneath each shard."""
    ev = _events(spark)
    sk = hll_shard_sketches(ev, "user_id", ["event_type"],
                            shard_col=F.to_date("ts"))
    n_rows = sk.count()
    n_groups = ev.select("event_type", F.to_date("ts")).distinct().count()
    assert n_rows == n_groups


def test_mixed_lgk_store_rejected(spark, tmp_path):
    """Mixed-precision stores raise by default, and merge legally at the
    coarsest precision when explicitly allowed (the DataSketches union
    downgrades toward smaller lg_k; estimates stay within the coarser
    error bound)."""
    ev = _events(spark)
    path = str(tmp_path / "mixed")
    write_sketch_store(ev, path, "user_id", ["event_type"], lg_k=12)
    write_sketch_store(ev, path, "user_id", ["event_type"], lg_k=14)
    with pytest.raises(ValueError, match="mixes lg_k"):
        read_sketch_estimates(spark, path, ["event_type"])

    approx = {r["event_type"]: r["approx_distinct"]
              for r in read_sketch_estimates(
                  spark, path, ["event_type"],
                  allow_mixed_lg_k=True).collect()}
    exact = {r["event_type"]: r["n"]
             for r in ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    assert approx.keys() == exact.keys()
    for et, e in exact.items():
        assert abs(approx[et] - e) <= 0.05 * e + 1


# ---------------------------------------------------------------------------
# bottom-k (KMV) sample store
# ---------------------------------------------------------------------------

def test_bottomk_merge_property(spark, tmp_path):
    from legend_community_delta_spark.operators.sketches import (
        bottomk_sample, read_sample, write_sample_store)
    df = spark.createDataFrame(
        [(i, "g1" if i % 2 == 0 else "g2", float(i)) for i in range(200)],
        "id_ long, grp string, val double")
    path = str(tmp_path / "samples")
    # two append batches = the incremental ingest path
    write_sample_store(df.where("id_ < 100"), path, "val", "id_",
                       ["grp"], k=16)
    write_sample_store(df.where("id_ >= 100"), path, "val", "id_",
                       ["grp"], k=16)
    merged = {(r["grp"], r["id"]) for r in
              read_sample(spark, path, ["grp"]).collect()}
    direct = {(r["grp"], r["id"]) for r in
              bottomk_sample(df, "val", "id_", ["grp"], k=16).collect()}
    # bottom-k of per-batch bottom-k's == bottom-k of everything
    assert merged == direct
    assert len(merged) == 32  # 16 per group


def test_bottomk_reingest_idempotent(spark, tmp_path):
    from legend_community_delta_spark.operators.sketches import (
        read_sample, write_sample_store)
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(50)], "id_ long, val double")
    path = str(tmp_path / "samples")
    write_sample_store(df, path, "val", "id_", k=8)
    once = sorted(r["id"] for r in read_sample(spark, path).collect())
    write_sample_store(df, path, "val", "id_", k=8)  # same batch again
    twice = sorted(r["id"] for r in read_sample(spark, path).collect())
    assert once == twice and len(once) == 8


def test_sample_quantiles_type1_hand_computed(spark):
    from legend_community_delta_spark.operators.sketches import (
        bottomk_sample, sample_quantiles)
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 11)], "id_ long, val double")
    s = bottomk_sample(df, "val", "id_", k=10)  # sample == population
    q = {r["prob"]: r["quantile"]
         for r in sample_quantiles(s, [0.1, 0.5, 1.0]).collect()}
    # type-1 (lower) quantile at rank ceil(p*10) over values 1..10
    assert q[0.1] == 1.0 and q[0.5] == 5.0 and q[1.0] == 10.0


def test_read_sample_uses_min_k_across_writers(spark, tmp_path):
    from legend_community_delta_spark.operators.sketches import (
        read_sample, write_sample_store)
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "id_ long, val double")
    path = str(tmp_path / "samples")
    write_sample_store(df.where("id_ < 50"), path, "val", "id_", k=32)
    write_sample_store(df.where("id_ >= 50"), path, "val", "id_", k=8)
    # merge-safe k is the writers' minimum
    assert read_sample(spark, path).count() == 8


def test_bottomk_ungrouped_plans_take_ordered(spark):
    from legend_community_delta_spark.operators.sketches import (
        bottomk_sample)
    df = spark.range(100).selectExpr("id AS id_", "CAST(id AS DOUBLE) AS v")
    plan = (bottomk_sample(df, "v", "id_", k=8)
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan
    assert "SinglePartition" not in plan


def test_agg_store_merge_equals_oneshot(spark, tmp_path):
    from pyspark.sql import functions as F
    from legend_community_delta_spark.operators.sketches import (
        read_agg_store, write_agg_store)
    df = spark.createDataFrame(
        [(i, "g" + str(i % 3), float(i)) for i in range(100)],
        "id long, g string, v double")
    aggs = {"n": ("count", "v"), "s": ("sum", "v"),
            "lo": ("min", "v"), "hi": ("max", "v")}
    path = str(tmp_path / "agg")
    write_agg_store(df.where("id % 2 = 0"), path, ["g"], aggs)
    write_agg_store(df.where("id % 2 = 1"), path, ["g"], aggs)
    got = {r.g: (r.n, r.s, r.lo, r.hi)
           for r in read_agg_store(spark, path, ["g"]).collect()}
    want = {r.g: (r.n, r.s, r.lo, r.hi)
            for r in df.groupBy("g").agg(
                F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"),
                F.min("v").alias("lo"), F.max("v").alias("hi")).collect()}
    assert got == want


def test_agg_store_rows_are_group_sized(spark, tmp_path):
    from legend_community_delta_spark.operators.sketches import (
        write_agg_store)
    df = spark.createDataFrame([(i, "g", float(i)) for i in range(5000)],
                               "id long, g string, v double")
    path = str(tmp_path / "agg")
    write_agg_store(df, path, ["g"], {"n": ("count", "v")})
    assert spark.read.parquet(path).count() == 1  # one partial per group


def test_agg_store_rejects_non_algebraic(spark, tmp_path):
    import pytest as _pytest
    from legend_community_delta_spark.operators.sketches import (
        write_agg_store)
    df = spark.createDataFrame([(1, "g", 1.0)], "id long, g string, v double")
    with _pytest.raises(ValueError, match="not mergeable"):
        write_agg_store(df, str(tmp_path / "x"), ["g"],
                        {"p50": ("median", "v")})


# --- exact heavy hitters (CMS cell filter) ---------------------------------

def test_heavy_hitters_exact_vs_bruteforce(spark):
    """The cell filter NEVER drops a true heavy hitter (cell total >=
    item count — pigeonhole, not sampling), and the recount pass makes
    the final counts exact; result must equal the naive groupBy."""
    from legend_community_delta_spark.operators.sketches import heavy_hitters
    rows = ([("alpha",)] * 40 + [("beta",)] * 25 + [("gamma",)] * 20
            + [(f"rare{i}",) for i in range(300)] * 3)
    df = spark.createDataFrame(rows, "item string")
    for width_exp in (2, 6, 14):      # width 4 forces brutal collisions
        got = {(r["item"], r["n_occurrences"]) for r in
               heavy_hitters(df, "item", min_count=20,
                             width_exp=width_exp).collect()}
        assert got == {("alpha", 40), ("beta", 25), ("gamma", 20)}, width_exp


def test_heavy_hitters_depth_invariance_and_validation(spark):
    from legend_community_delta_spark.operators.sketches import heavy_hitters
    rows = [("x",)] * 10 + [("y",)] * 9 + [(f"z{i}",) for i in range(50)]
    df = spark.createDataFrame(rows, "item string")
    for depth in (1, 2, 3):
        got = {(r["item"], r["n_occurrences"]) for r in
               heavy_hitters(df, "item", 10, width_exp=4,
                             depth=depth).collect()}
        assert got == {("x", 10)}
    with pytest.raises(ValueError, match="min_count"):
        heavy_hitters(df, "item", 0)
    with pytest.raises(ValueError, match="depth"):
        heavy_hitters(df, "item", 5, depth=9)


def test_heavy_hitter_ngrams_matches_python(spark):
    from legend_community_delta_spark.operators.sketches import (
        heavy_hitter_ngrams)
    texts = ["the quick brown fox JUMPS over the lazy dog",
             "The quick brown cow jumps over the idle dog",
             "the quick brown fox naps", "THE QUICK BROWN fox naps"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    # python brute force, same tokenization (lowercased \S+ 3-grams)
    from collections import Counter
    c = Counter()
    for t in texts:
        ts = t.lower().split()
        for i in range(len(ts) - 2):
            c[" ".join(ts[i:i + 3])] += 1
    want = {(g, n) for g, n in c.items() if n >= 3}
    got = {(r["ngram"], r["n_occurrences"]) for r in
           heavy_hitter_ngrams(df, n=3, min_count=3, width_exp=3).collect()}
    assert got == want and got       # nonempty by construction


def test_heavy_hitters_plan_is_jvm_only(spark):
    from legend_community_delta_spark.operators.sketches import (
        heavy_hitter_ngrams)
    df = spark.createDataFrame([("a b c a b c",)], "text string")
    plan = heavy_hitter_ngrams(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_hh_cell_store_incremental_equals_oneshot(spark, tmp_path):
    """Appending per-shard cell partials and summing at read == the
    cell pass of the union (plain sums merge losslessly), so the
    store-fed heavy hitters equal the one-shot result exactly."""
    from legend_community_delta_spark.operators.sketches import (
        heavy_hitters, heavy_hitters_from_store, write_hh_cell_store)
    a = spark.createDataFrame(
        [("x",)] * 12 + [("y",)] * 4 + [(f"r{i}",) for i in range(40)],
        "item string")
    b = spark.createDataFrame(
        [("x",)] * 3 + [("y",)] * 16 + [(f"s{i}",) for i in range(40)],
        "item string")
    path = str(tmp_path / "hh_cells")
    write_hh_cell_store(a, path, "item", width_exp=5)
    write_hh_cell_store(b, path, "item", width_exp=5)   # append
    union = a.unionByName(b)
    got = {(r["item"], r["n_occurrences"]) for r in
           heavy_hitters_from_store(spark, path, union, "item",
                                    min_count=15).collect()}
    want = {(r["item"], r["n_occurrences"]) for r in
            heavy_hitters(union, "item", 15, width_exp=5).collect()}
    assert got == want == {("x", 15), ("y", 20)}
    # store stays metadata-sized: bounded by shards * depth * width
    assert spark.read.parquet(path).count() <= 2 * 2 * 32


def test_hh_cell_store_rejects_mixed_shapes(spark, tmp_path):
    from legend_community_delta_spark.operators.sketches import (
        heavy_hitters_from_store, write_hh_cell_store)
    df = spark.createDataFrame([("x",)] * 3, "item string")
    path = str(tmp_path / "hh_mixed")
    write_hh_cell_store(df, path, "item", width_exp=5)
    write_hh_cell_store(df, path, "item", width_exp=6)
    with pytest.raises(ValueError, match="mixes shapes"):
        heavy_hitters_from_store(spark, path, df, "item", 2)
