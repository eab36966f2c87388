"""Models, retrieval, and monitoring: the round-8 surface in one script.

    python examples/model_pipeline.py [sf_dir]

Where `pretrain_pipeline.py` walks the curation chain, this walkthrough
covers the TRAINED-ARTIFACT side of a data pipeline — everything that
produces or consumes a persisted model/index/sketch (default corpus
/root/testdata/sf0.001):

1.  train a Naive Bayes language classifier on a labeled split, persist
    it, and gate a simulated ingest stream against the FROZEN model
2.  train a BPE tokenizer on the frequency-weighted vocabulary and
    price the corpus in trained-tokenizer tokens
3.  build the BM25 inverted index, then run decontamination-triage
    keyword probes against it (partition-pruned reads)
4.  maintain a count-min sketch store across two ingest batches and
    audit the heavy hitters against exact counts
5.  draw a weighted sample (inclusion tracking doc length) for human
    review
6.  monitor drift: daily PSI of event values vs the day-one baseline
7.  snapshot-diff corpus v1 -> v2 through the versioned table store

Every stage is lazy DataFrame algebra; the only actions are the
walkthrough prints.
"""

from __future__ import annotations

import os
import sys
import tempfile

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from legend_community_delta_spark.operators.classify import (
        nb_model_wide, nb_train, read_nb_model, write_nb_model)
    from legend_community_delta_spark.operators.curation import (
        weighted_sample)
    from legend_community_delta_spark.operators.retrieval import (
        query_bm25_index, write_bm25_index)
    from legend_community_delta_spark.operators.scoring import psi_drift
    from legend_community_delta_spark.operators.sketches import (
        cms_estimate, read_cms, write_cms_store)
    from legend_community_delta_spark.operators.tokenize import (
        bpe_encode_stats, bpe_train)
    from legend_community_delta_spark.sources.versioned import (
        VersionedTable, diff_versions)
    from legend_community_delta_spark.streaming import nb_score_stream

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from legend_community_delta_spark import demo
    demo.ensure_views(spark, sf_dir)
    docs = spark.table("documents")
    tmp = tempfile.mkdtemp(prefix="legend_model_pipeline_")

    # 1. frozen classifier gate --------------------------------------------
    model, stats = nb_train(docs.where(F.col("doc_id") % 5 != 0), "lang")
    write_nb_model(model, stats, f"{tmp}/nb")
    wide, stats_rows = nb_model_wide(*read_nb_model(spark, f"{tmp}/nb"))
    (docs.select("doc_id", "text").write.parquet(f"{tmp}/ingest"))
    stream = (spark.readStream
              .schema(spark.read.parquet(f"{tmp}/ingest").schema)
              .parquet(f"{tmp}/ingest"))
    q = (nb_score_stream(stream, wide, stats_rows)
         .writeStream.format("memory").queryName("gated")
         .outputMode("complete")
         .option("checkpointLocation", f"{tmp}/ckpt")
         .trigger(availableNow=True).start())
    q.awaitTermination(120); q.stop()
    gated = spark.table("gated")
    print(f"1. NB gate: {gated.count()} docs scored; pred mix = "
          f"{sorted((r['pred_label'], r['n']) for r in gated.groupBy('pred_label').agg(F.count('*').alias('n')).collect())}")

    # 2. BPE tokenizer ------------------------------------------------------
    merges, seg = bpe_train(docs, n_merges=12)
    priced = bpe_encode_stats(docs, seg)
    tot = priced.agg(F.sum("n_chars").alias("c"),
                     F.sum("n_bpe_tokens").alias("t")).first()
    print(f"2. BPE: {len(merges)} merges learned "
          f"(first: {[m[:2] for m in merges[:4]]}); corpus "
          f"{tot['c']} chars -> {tot['t']} BPE tokens")

    # 3. BM25 index + probes ------------------------------------------------
    write_bm25_index(docs, f"{tmp}/bm25")
    probes = spark.createDataFrame(
        [("eval1", "spark hash join"), ("eval2", "slow scan row")],
        "query_id string, query string")
    hits = query_bm25_index(spark, f"{tmp}/bm25", probes, k=3)
    print(f"3. BM25 probes (partition-pruned): "
          f"{sorted(tuple(r) for r in hits.select('query_id', 'doc_id', 'rank').collect())}")

    # 4. CMS store across two batches --------------------------------------
    def _toks(d):
        return (d.select(F.explode(F.split(F.lower("text"), r"\s+"))
                         .alias("tok")).where(F.col("tok") != ""))

    toks = _toks(docs)
    # two disjoint ingest batches append to one store; the merged sketch
    # answers for their union
    write_cms_store(_toks(docs.where(F.col("doc_id") % 2 == 0)),
                    f"{tmp}/cms", "tok")
    write_cms_store(_toks(docs.where(F.col("doc_id") % 2 == 1)),
                    f"{tmp}/cms", "tok")
    merged = read_cms(spark, f"{tmp}/cms")
    exact_top = (toks.groupBy("tok").agg(F.count("*").alias("freq"))
                 .orderBy(F.desc("freq"), "tok").limit(5))
    est = cms_estimate(merged, exact_top.select("tok"), "tok")
    audit = exact_top.join(est, exact_top["tok"] == est["value"])
    print(f"4. CMS heavy hitters (est >= exact always): "
          f"{sorted((r['tok'], r['freq'], r['est']) for r in audit.collect())}")

    # 5. weighted review sample --------------------------------------------
    sample = weighted_sample(docs.select("doc_id", "n_chars"),
                             "n_chars", k=10)
    print(f"5. weighted sample (longer docs likelier): "
          f"{[r['doc_id'] for r in sample.collect()]}")

    # 6. PSI drift monitor --------------------------------------------------
    ev = spark.table("events")
    base = ev.where(F.to_date("ts") == F.lit("2024-01-01"))
    psi = psi_drift(ev, base, "value", F.to_date("ts"))
    worst = psi.orderBy(F.desc("psi")).limit(3).collect()
    print(f"6. PSI vs day-one baseline, worst days: "
          f"{[(str(r['period']), r['psi']) for r in worst]}")

    # 7. snapshot diff through the versioned store --------------------------
    vt = VersionedTable(spark, f"{tmp}/corpus")
    vt.write(docs.select("doc_id", "text", "source"))
    vt.merge(docs.where(F.col("doc_id") % 7 == 0)
             .select("doc_id", F.concat("text", F.lit(" v2")).alias("text"),
                     "source"), keys=["doc_id"])
    d = diff_versions(vt, 0, 1, ["doc_id"])
    print(f"7. snapshot diff v0->v1: "
          f"{sorted((r['change'], r['n']) for r in d.groupBy('change').agg(F.count('*').alias('n')).collect())}")

    spark.stop()


if __name__ == "__main__":
    main()
