"""Physical-plan assertions: the shapes that must survive a 100x scale-up.

These tests pin plan properties, not timings: filter pushdown to the
parquet scan, broadcast (not shuffle) joins for dims, TakeOrderedAndProject
for top-k, zero-Exchange co-located joins on bucketed tables, salted join
correctness.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from legend_community_delta_spark import demo
from legend_community_delta_spark.operators.joins import (
    broadcast_join,
    salted_join,
    write_bucketed,
)
from legend_community_delta_spark.operators.similarity import ivf_topk

from conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_mapping_query_pushdown(spark):
    demo.ensure_views(spark, SF_DIR)
    df = demo.QUERIES["legend_mapping_orders"](spark, SF_DIR)
    plan = _plan(df)
    # expectation prefilter must reach the parquet scan
    assert "PushedFilters: [" in plan
    assert "IsNotNull(o_orderkey)" in plan
    # column pruning: scan schema is the projected columns only
    assert "ReadSchema: struct<o_orderkey" in plan


def test_q5_uses_broadcast_joins(spark):
    demo.ensure_views(spark, SF_DIR)
    plan = _plan(demo.QUERIES["q5_region_revenue"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan   # dims broadcast at this scale


def test_q7_q8_join_strategy(spark):
    """Join-heavy TPC-H shapes: every dim join broadcasts (nation/region/
    supplier/customer/part side), fact stays un-shuffled by the joins, and
    nothing degenerates to a cartesian product."""
    demo.ensure_views(spark, SF_DIR)
    for name in ("q7_nation_volume", "q8_market_share"):
        plan = _plan(demo.QUERIES[name](spark, SF_DIR))
        assert "BroadcastHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name
        assert "SortMergeJoin" not in plan, name


def test_correlated_subqueries_decorrelate(spark):
    """Q17 (correlated scalar AVG) and Q21 (EXISTS + NOT EXISTS) must
    decorrelate into aggregate/semi/anti joins — never a per-row subquery
    or a cartesian product; Q17's per-part threshold must aggregate before
    joining (one pass over lineitem per side)."""
    demo.ensure_views(spark, SF_DIR)
    for name in ("q17_small_quantity", "q21_waiting_suppliers",
                 "q2_min_cost_supplier", "q11_important_stock",
                 "q15_top_supplier", "q19_discounted_revenue",
                 "q20_significant_suppliers", "q13_customer_distribution"):
        plan = _plan(demo.QUERIES[name](spark, SF_DIR))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    # Q21's EXISTS/NOT EXISTS become semi/anti joins
    plan21 = _plan(demo.QUERIES["q21_waiting_suppliers"](spark, SF_DIR))
    assert "LeftSemi" in plan21 and "LeftAnti" in plan21


def test_event_analytics_plan_shapes(spark):
    """Funnel and corpus report must stay join-free (scan -> aggregate);
    cohort retention joins only on its equi-keys — no cartesian."""
    demo.ensure_views(spark, SF_DIR)
    for name in ("event_funnel", "corpus_report"):
        plan = _plan(demo.QUERIES[name](spark, SF_DIR))
        assert "Join" not in plan, name
        assert "CartesianProduct" not in plan, name
    plan = _plan(demo.QUERIES["cohort_retention"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_and_asof_no_cross_product(spark):
    """The bucket-equi-ized range join and both as-of directions must
    never plan a cartesian/nested-loop product over the fact sides."""
    demo.ensure_views(spark, SF_DIR)
    for name in ("range_join_windows", "asof_views_purchases",
                 "asof_forward_views"):
        plan = _plan(demo.QUERIES[name](spark, SF_DIR))
        assert "CartesianProduct" not in plan, name


def test_topk_is_take_ordered(spark):
    demo.ensure_views(spark, SF_DIR)
    plan = _plan(demo.QUERIES["ann_cosine_topk"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan   # per-partition k, no global sort


# queries whose callable runs eager jobs/writes when invoked (streaming
# harnesses, index builds, iterative CC, provenance) — their UDF-freeness
# is covered by their operators' own tests; everything else is pinned here
_EAGER_QUERIES = {
    "events_hourly_stream", "dedup_stream_docs", "sessionize_stream",
    "stream_stream_join", "lsh_index_topk", "ivf_index_topk",
    "near_dup_clusters", "curate_corpus_docs", "curation_provenance",
    # r13: entries that EXECUTE work during query construction (model
    # training, store writes, streams, iterative label propagation,
    # eager checkpoints) are not lazily plannable either — their
    # returned plan is dominated by ExistingRDD scans of the already-
    # executed pipeline, so the Python-eval assertion on it was
    # vacuous while costing 1.4-8.4 s of pipeline execution EACH
    # (~95 s of the suite's 45-minute wall-clock; per-query profile in
    # OPTIMIZATION_r13.md).  The operator-level plan shapes for these
    # families stay pinned in their module tests
    # (test_spans/test_suffix/test_scale_plan's remaining entries).
    "unigram_vocab", "unigram_token_stats", "leakage_splits",
    "pq_ann_topk", "incremental_components", "verified_near_dup_clusters",
    "nb_stream_preds", "decontamination_stream", "near_dup_best_reps",
    "semantic_contamination_pairs", "bm25_index_topk", "semdedup_pairs",
    "span_dedup_stream", "stream_table_appends", "pagerank_near_dups",
    "events_psi_stream", "surprisal_stream", "incremental_span_docs",
    "max_dup_spans", "max_dup_spans_char", "longest_dup_span_docs",
    "exact_span_docs", "exact_span_docs_char", "exact_span_keep_first",
    "top_dup_windows", "exact_contamination_spans",
    "exact_contamination_docs", "zorder_roundtrip_lineitem",
    "zorder_skipping_stats", "simhash_pairs", "pair_store_pagerank",
    "table_changes_orders", "delta_time_travel_orders",
    "wordpiece_token_stats", "eval_ngram_docs", "bpe_merge_table",
    "bpe_token_stats",
}


def test_no_python_udfs_anywhere(spark):
    """EVERY lazily-plannable contract query stays JVM-side: no
    row-at-a-time or Arrow Python evaluation anywhere in any plan."""
    demo.ensure_views(spark, SF_DIR)
    checked = 0
    for name, fn in demo.QUERIES.items():
        if name in _EAGER_QUERIES:
            continue
        plan = _plan(fn(spark, SF_DIR))
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
        checked += 1
    assert checked >= 60


def test_bucketed_join_has_no_exchange(spark):
    demo.ensure_views(spark, SF_DIR)
    spark.sql("CREATE DATABASE IF NOT EXISTS buckets")
    write_bucketed(spark.table("orders"), "buckets.orders_b", "o_orderkey", 4)
    write_bucketed(
        spark.table("lineitem").withColumnRenamed("l_orderkey", "o_orderkey"),
        "buckets.lineitem_b", "o_orderkey", 4)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("buckets.orders_b").join(
            spark.table("buckets.lineitem_b"), "o_orderkey")
        plan = _plan(joined)
        # the bucketed write pre-paid the shuffle: no Exchange in the join
        assert "Exchange" not in plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_salted_join_matches_plain_join(spark):
    demo.ensure_views(spark, SF_DIR)
    orders = spark.table("orders").select("o_orderkey", "o_custkey")
    lineitem = spark.table("lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity")
    plain = orders.join(lineitem, "o_orderkey").count()
    salted = salted_join(orders, lineitem, "o_orderkey", n_salts=8).count()
    assert salted == plain


def test_broadcast_join_helper(spark):
    demo.ensure_views(spark, SF_DIR)
    big = spark.table("customer")
    small = spark.table("nation")
    out = broadcast_join(big, small, [big.c_nationkey == small.n_nationkey])
    assert "BroadcastHashJoin" in _plan(out)
    assert out.count() == big.count()


def test_ivf_topk_finds_query_vector(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = [float(x) for x in emb.where("vec_id = 3").first()["embedding"]]
    top = ivf_topk(emb, q, k=3, n_centroids=8, n_probe=8).collect()
    assert top[0]["vec_id"] == 3
    assert top[0]["cosine"] == pytest.approx(1.0)


def test_delta_gated_services(spark, tmp_path):
    """Runs the REAL Delta path (time travel, DESCRIBE HISTORY, MERGE)
    when delta-spark is importable, and the gated-error + parquet-
    fallback path otherwise — the same test passes in both
    environments, so dropping a delta-spark wheel into the image flips
    the currently-untested branches live with no edits."""
    from legend_community_delta_spark.sources.tables import (
        DeltaRequiredError, _delta_available, merge_upsert,
        read_version, table_history)
    delta_ok = _delta_available()
    spark.sql("CREATE DATABASE IF NOT EXISTS svc")
    spark.sql("DROP TABLE IF EXISTS svc.t")
    writer = spark.createDataFrame(
        [Row(id=1, v="a"), Row(id=2, v="b")]).write.mode("overwrite")
    if delta_ok:
        writer.format("delta").saveAsTable("svc.t")
    else:
        writer.saveAsTable("svc.t")
        with pytest.raises(DeltaRequiredError):
            read_version(spark, "svc.t", 0)
        with pytest.raises(DeltaRequiredError):
            table_history(spark, "svc.t")
    updates = spark.createDataFrame([Row(id=2, v="B"), Row(id=3, v="c")])
    merge_upsert(spark, updates, "svc.t", ["id"])
    got = {r["id"]: r["v"] for r in spark.table("svc.t").collect()}
    assert got == {1: "a", 2: "B", 3: "c"}
    if delta_ok:
        # real time travel: version 0 still shows pre-merge rows
        v0 = {r["id"]: r["v"]
              for r in read_version(spark, "svc.t", 0).collect()}
        assert v0 == {1: "a", 2: "b"}
        assert table_history(spark, "svc.t").count() >= 2
    else:
        # fully distributed fallback: no driver materialization,
        # staging cleaned up
        import inspect
        from legend_community_delta_spark.sources import tables as _t
        assert ".collect(" not in inspect.getsource(_t.merge_upsert)
        assert not spark.catalog.tableExists("svc.t__merge_staging")
    # idempotent re-merge on either path
    merge_upsert(spark, updates, "svc.t", ["id"])
    assert {r["id"]: r["v"] for r in spark.table("svc.t").collect()} == got


def test_partition_pruning(spark, tmp_path):
    """Partitioned table writes + partition pruning at the scan — the
    physical layout lever for time-partitioned 100 TB tables."""
    from pyspark.sql import functions as F
    demo.ensure_views(spark, SF_DIR)
    path = str(tmp_path / "orders_by_year")
    (spark.table("orders")
     .withColumn("order_year", F.year("o_orderdate"))
     .write.mode("overwrite").partitionBy("order_year").parquet(path))
    df = spark.read.parquet(path).where("order_year = 1997")
    plan = _plan(df)
    assert "PartitionFilters" in plan
    assert "order_year" in plan[plan.find("PartitionFilters"):][:200]
    assert df.count() > 0
    # non-matching partition scans nothing
    assert spark.read.parquet(path).where("order_year = 1888").count() == 0


def test_plan_summary_and_gate(spark):
    from legend_community_delta_spark.plans.inspect import (
        assert_scalable, plan_summary)
    demo.ensure_views(spark, SF_DIR)
    df = demo.QUERIES["legend_mapping_orders"](spark, SF_DIR)
    s = plan_summary(df)
    assert s["python_udfs"] == 0
    assert s["pushed_filters"]
    assert s["scans"] >= 1
    assert_scalable(df, require_pushdown=True)
    # gate failure path
    udf_df = demo.QUERIES["curate_corpus_docs"](spark, SF_DIR)  # no UDFs either
    assert_scalable(udf_df)
    import pytest as _p
    with _p.raises(AssertionError, match="exchanges"):
        assert_scalable(demo.QUERIES["q5_region_revenue"](spark, SF_DIR),
                        max_exchanges=0)


def test_stratified_sample(spark):
    from legend_community_delta_spark.operators.dedup import stratified_sample
    demo.ensure_views(spark, SF_DIR)
    docs = spark.table("documents")
    out = stratified_sample(docs, {"en": 0.5, "de": 1.0}, "lang", "doc_id")
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    totals = {r["lang"]: r["n"] for r in
              docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"en", "de"}           # others dropped
    assert counts["de"] == totals["de"]          # fraction 1.0 keeps all
    assert 0.3 * totals["en"] < counts["en"] < 0.7 * totals["en"]
    # deterministic across partitioning
    again = stratified_sample(docs.repartition(5), {"en": 0.5, "de": 1.0},
                              "lang", "doc_id")
    assert sorted(r["doc_id"] for r in out.collect()) == \
        sorted(r["doc_id"] for r in again.collect())


def test_contamination_family_plan_shapes(spark):
    """Decontamination plans: candidate generation and the inverted-index
    report are equi-join only — never a cartesian/nested-loop product,
    and the report's train side reaches the join as a semi-join key set
    (no doc ids carried)."""
    demo.ensure_views(spark, SF_DIR)
    for name in ("decontamination_pairs", "contamination_report",
                 "repetition_flags", "stratified_docs_sample"):
        plan = _plan(demo.QUERIES[name](spark, SF_DIR))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    report = _plan(demo.QUERIES["contamination_report"](spark, SF_DIR))
    assert "LeftSemi" in report
    sample = _plan(demo.QUERIES["stratified_docs_sample"](spark, SF_DIR))
    assert "WindowGroupLimit" in sample


def test_round7_family_plan_shapes(spark):
    """Plan pins for the span/DSIR/splits/sample families: column
    pruning reaches every scan, joins broadcast (no SortMergeJoin on
    these key sizes), no global sort, zero Python UDFs."""
    demo.ensure_views(spark, SF_DIR)

    plan = _plan(demo.QUERIES["dup_span_docs"](spark, SF_DIR))
    # scans carry only (doc_id, text); the wide join keys on xxhash64
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan
    assert "xxhash64" in plan
    assert "SortMergeJoin" not in plan

    plan = _plan(demo.QUERIES["shuffle_shards_plan"](spark, SF_DIR))
    # id-only scan; per-shard window, never a single-partition sort
    assert "ReadSchema: struct<doc_id:bigint>" in plan
    assert "SinglePartition" not in plan

    plan = _plan(demo.QUERIES["sample_quantile_stats"](spark, SF_DIR))
    assert "SinglePartition" not in plan
    assert "SortMergeJoin" not in plan

    plan = _plan(demo.QUERIES["robust_quality_docs"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan

    plan = _plan(demo.QUERIES["dsir_doc_weights"](spark, SF_DIR))
    # the 4096-bucket weight table broadcasts; exploded side not shuffled
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan

    for name in ("dup_span_docs", "shuffle_shards_plan",
                 "sample_quantile_stats", "robust_quality_docs",
                 "dsir_doc_weights", "bigram_surprisal_docs",
                 "embedding_drift_stats", "leakage_splits"):
        p = _plan(demo.QUERIES[name](spark, SF_DIR))
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, name


def test_round8_family_plan_shapes(spark):
    """Plan pins for the retrieval/classifier/sketch/graph/diff
    families: pruned scans, broadcast-only joins where sizes demand it,
    no single-partition sorts, zero Python UDFs."""
    demo.ensure_views(spark, SF_DIR)

    # nb confusion: model-building joins broadcast at this scale; the
    # whole plan is Column algebra
    plan = _plan(demo.QUERIES["nb_lang_confusion"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    # cms: sketch side broadcasts to the probe side, no SMJ anywhere
    plan = _plan(demo.QUERIES["cms_token_freq"](spark, SF_DIR))
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    # weighted sample: ungrouped top-k must be TakeOrderedAndProject
    plan = _plan(demo.QUERIES["weighted_docs_sample"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert "ReadSchema: struct<doc_id:bigint,n_chars:bigint>" in plan

    # psi drift: bins frame + baseline ride broadcasts
    plan = _plan(demo.QUERIES["events_psi_drift"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan

    # corpus diff: the hash scans carry only (doc_id, text) and the
    # source-map scans only (doc_id, source) — each pruned separately
    plan = _plan(demo.QUERIES["corpus_diff_stats"](spark, SF_DIR))
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan
    assert "ReadSchema: struct<doc_id:bigint,source:string>" in plan
    assert "CartesianProduct" not in plan

    for name in ("bm25_topk_docs", "pagerank_near_dups",
                 "containment_dup_pairs", "session_paths"):
        p = _plan(demo.QUERIES[name](spark, SF_DIR))
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, \
            name
        assert "CartesianProduct" not in p, name
