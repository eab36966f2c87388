"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "bench_total_sec", "value": N, "unit": "sec",
   "queries": {"q1_pricing_summary": sec, ...}, "sf": "<dir>"}

Execution is forced with the noop sink (full computation, no driver
collect overhead) except for small top-k results which are collected.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# headline set: legend paths, relational core, training-data operators
BENCH_QUERIES = [
    "legend_mapping_orders",
    "legend_service_part_stats",
    "legend_dq_lineitem",
    "q1_pricing_summary",
    "q3_topk_orders",
    "q5_region_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "q9_profit",
    "q10_returned_revenue",
    "q17_small_quantity",
    "q18_large_orders",
    "q21_waiting_suppliers",
    "window_top_orders",
    "rolling_windows",
    "sessionize_events",
    "asof_views_purchases",
    "rollup_lineitem",
    "pivot_orders",
    "events_hourly",
    "dedup_exact_docs",
    "text_quality_by_lang",
    "shingle_stats",
    "minhash_pairs",
    "near_dup_clusters",
    "verified_near_dup_pairs",
    "verified_near_dup_clusters",
    "decontamination_pairs",
    "contamination_report",
    "ann_cosine_topk",
    "doc_surprisal",
    "source_drift",
    "boilerplate_docs",
    "chunked_docs",
    "dup_span_docs",
    "dsir_doc_weights",
    "leakage_splits",
    "shuffle_shards_plan",
    "semdedup_pairs",
    "bigram_surprisal_docs",
    "embedding_drift_stats",
    "incremental_span_docs",
    "sample_quantile_stats",
    "robust_quality_docs",
    "bm25_topk_docs",
    "nb_lang_confusion",
    "cms_token_freq",
    "pagerank_near_dups",
    "containment_dup_pairs",
    "weighted_docs_sample",
    "session_paths",
    "events_psi_drift",
    "corpus_diff_stats",
    "doc_char_entropy",
    "vocab_edit_pairs",
    "hard_negative_mining",
    # round-6 additions: store-fed consumers + new operator families
    "pair_store_pagerank",
    "intra_dup_span_docs",
    "session_window_events",
    "events_sliding_window",
    "cdc_chunk_docs",
    "kn_surprisal_docs",
    "stupid_backoff_docs",
    "dup_rate_by_source",
    "ngram_diversity_by_source",
    "zipf_slope_by_source",
    "k_anonymity_docs",
    "benford_orders",
    "reconcile_orders",
    "scd2_user_status",
    "cluster_size_histogram",
    # round-7 additions
    "unigram_vocab",
    "unigram_token_stats",
    "eval_ngram_docs",
    "wordpiece_token_stats",
    # round-8 additions: suffix-rank exact dedup
    "exact_span_docs",
    "longest_dup_span_docs",
    "exact_span_keep_first",
    "top_dup_windows",
    "max_dup_spans",
    # round-9 additions: char-level suffix dedup + exact contamination
    "exact_span_docs_char",
    "max_dup_spans_char",
    "exact_contamination_spans",
    "exact_contamination_docs",
    # round-9 addition: exact heavy hitters (CMS cell filter)
    "heavy_hitter_ngrams",
    # round-9 additions: layout optimization + published cleaning rules
    "zorder_roundtrip_lineitem",
    "zorder_skipping_stats",
    "c4_clean_docs",
    "gopher_gates_docs",
    "table_changes_orders",
    "stream_table_appends",
    # round-10 additions: multimodal decode contract surfaces
    "media_decode_stats",
    "media_frames_stats",
]


def _await_idle(getloadavg=os.getloadavg, sleep=time.sleep,
                gate: float | None = None,
                max_wait: float | None = None) -> tuple[float, bool]:
    """Idle-gate for comparable timings (BENCH_HISTORY showed 2.4x
    run-to-run drift from ambient load on the shared machine): wait in
    5 s steps until the 1-minute load average drops below *gate* AND
    the 5-minute average below ``BENCH_LOAD_GATE_5M`` (a heavy job
    that JUST finished passes the 1 m gate while its cache/cgroup
    effects linger — the PERF.md round-9 lesson), or *max_wait*
    elapses; returns ``(load_1m, contended)``.  ``contended=True``
    means the run proceeded anyway and its numbers should not be used
    as a round-over-round reference."""
    if gate is None:
        gate = float(os.environ.get("BENCH_LOAD_GATE", "1.0"))
    gate5 = float(os.environ.get("BENCH_LOAD_GATE_5M", "2.5"))
    if max_wait is None:
        max_wait = float(os.environ.get("BENCH_LOAD_MAX_WAIT", "90"))

    def _read() -> tuple[float, float]:
        la = getloadavg()
        return (round(la[0], 2),
                round(la[1], 2) if len(la) > 1 else 0.0)

    load, load5 = _read()
    waited = 0.0
    while (load > gate or load5 > gate5) and waited < max_wait:
        sleep(5.0)
        waited += 5.0
        load, load5 = _read()
    return load, load > gate or load5 > gate5


def main() -> None:
    load_at_start, contended = _await_idle()
    load5_at_start = round(os.getloadavg()[1], 2)
    if contended:
        print(f"  WARNING: load_1m={load_at_start} above gate after "
              "max wait; run marked contended", file=sys.stderr,
              flush=True)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("legend-community-delta-spark-bench")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from legend_community_delta_spark import demo

    demo.ensure_views(spark, SF_DIR)
    # warmup: touch every table once so timings measure compute, not the
    # first-listing/first-read of the filesystem cache
    for t in demo._TABLES:
        try:
            spark.table(t).count()
        except Exception:
            pass

    verbose = os.environ.get("BENCH_VERBOSE") == "1"
    repeats = int(os.environ.get("BENCH_REPEATS", "2"))

    def run_pass(timings: dict[str, float]) -> None:
        """One full sweep; merges per-query min into *timings*."""
        for name in BENCH_QUERIES:
            fn = demo.QUERIES[name]
            best = timings.get(name)
            for _ in range(max(repeats, 1)):
                t0 = time.perf_counter()
                df = fn(spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                elapsed = time.perf_counter() - t0
                best = elapsed if best is None else min(best, elapsed)
            timings[name] = round(best, 3)
            if verbose:
                print(f"  {name}: {timings[name]}s", file=sys.stderr,
                      flush=True)

    timings: dict[str, float] = {}
    run_pass(timings)
    retry_load: float | None = None
    if contended:
        # the round-9 lesson: a run that started contended is a noisy
        # upper bound (BENCH_HISTORY shows 111.8 s vs 336.6 s on
        # adjacent runs of the same code).  Wait for idle once more
        # (longer budget — the first gate already burned its 90 s) and
        # sweep again, folding per-query MINs; the run only stays
        # marked contended if the retry ALSO started contended.
        retry_load, still = _await_idle(
            max_wait=float(os.environ.get("BENCH_LOAD_RETRY_WAIT",
                                          "300")))
        run_pass(timings)
        contended = contended and still

    total = round(sum(timings.values()), 3)
    # Full per-query detail always lands in BENCH_DETAIL.json next to
    # this script.  The stdout line must survive a 2000-char tail
    # buffer (the round-6 driver artifact recorded parsed=None because
    # the 71-query line outgrew it), so if the full dict doesn't fit,
    # the smallest timings are folded into "other_sec" and the count
    # noted — the heavy queries stay individually visible.
    here = os.path.dirname(os.path.abspath(__file__))
    detail_path = os.path.join(here, "BENCH_DETAIL.json")
    # provenance (round-7 review: BENCH_DETAIL.json is overwritten by
    # every run, so committed numbers were silently replaced by later
    # contended runs): stamp each run and append it to an append-only
    # history so rounds stay comparable
    stamp = {
        "ts_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        # start load = pre-existing contention; end load is mostly the
        # bench's own local[32] JVM and only flags EXTRA pressure
        "load_1m_start": load_at_start,
        # the 1m gate can pass right after a heavy job while its
        # page-cache/cgroup effects linger — the 5m average makes such
        # runs identifiable post hoc (r9: 310 s at 1m=0.97/5m~7 vs
        # 257 s at 1m=0.02/5m~1 for the same 84 queries)
        "load_5m_start": load5_at_start,
        "load_1m_end": round(os.getloadavg()[0], 2),
        "cpus": CPUS,
        "contended": contended,
    }
    if retry_load is not None:
        # the first pass started contended and a second full pass ran
        # after re-awaiting idle; per-query numbers are min across both
        stamp["retry_pass"] = True
        stamp["load_1m_retry_start"] = retry_load
    payload_full = {"metric": "bench_total_sec", "value": total,
                    "unit": "sec", "queries": timings, "sf": SF_DIR,
                    "run": stamp}
    with open(detail_path, "w") as f:
        json.dump(payload_full, f)
    with open(os.path.join(here, "BENCH_HISTORY.jsonl"), "a") as f:
        f.write(json.dumps(payload_full, separators=(",", ":")) + "\n")

    def line(q: dict, omitted: int, other: float) -> str:
        payload = {"metric": "bench_total_sec", "value": total,
                   "unit": "sec", "queries": q, "sf": SF_DIR}
        if contended:
            payload["contended"] = True
        if omitted:
            payload["queries_omitted"] = omitted
            payload["other_sec"] = round(other, 3)
            payload["detail"] = "BENCH_DETAIL.json"
        return json.dumps(payload, separators=(",", ":"))

    by_cost = sorted(timings.items(), key=lambda kv: -kv[1])
    keep = len(by_cost)
    out = line(dict(by_cost), 0, 0.0)
    while len(out) > 1900 and keep > 1:
        keep -= 1
        kept = dict(by_cost[:keep])
        other = sum(v for _, v in by_cost[keep:])
        out = line(kept, len(by_cost) - keep, other)
    print(out)
    spark.stop()


if __name__ == "__main__":
    main()
