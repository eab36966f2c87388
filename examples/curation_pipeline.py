"""Training-data curation walkthrough: the 100 TB pipeline in miniature.

    python examples/curation_pipeline.py [sf_dir]

Runs the operators a pretraining data pipeline chains before
tokenization, against the synthetic documents/embeddings tables
(default /root/testdata/sf0.001):

1. quality scoring + language ID + PII redaction (Column algebra)
2. exact dedup, then MinHash/LSH near-dup pairs
3. connected components over the pair graph -> one survivor per cluster
4. exact token-budget cutoff (bucketed two-level prefix sum)
5. incremental dedup: an append batch against a persisted signature store
6. ANN: brute-force top-k, then a persisted partition-pruned LSH index
"""

from __future__ import annotations

import os
import sys
import tempfile

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from legend_community_delta_spark.functions.text import (
        language_id, quality_score, redact_pii, token_count)
    from legend_community_delta_spark.operators.curation import (
        curate_corpus, token_budget_cut)
    from legend_community_delta_spark.operators.dedup import (
        exact_dedup, incremental_minhash_pairs, minhash_dedup,
        write_signature_store)
    from legend_community_delta_spark.operators.graph import drop_near_dups
    from legend_community_delta_spark.operators.similarity import (
        build_lsh_index, cosine_topk_df, query_lsh_index)

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))

    # 1. scoring — all JVM Column algebra, no UDFs
    scored = docs.select(
        "doc_id", "source",
        quality_score("text").alias("quality"),
        language_id("text").alias("lang"),
        token_count("text").alias("tokens"),
        redact_pii("text").alias("clean_text"))
    print("scored sample:")
    scored.orderBy("doc_id").show(3, truncate=60)

    # 2-3. dedup family
    exact = exact_dedup(docs)
    pairs = minhash_dedup(exact, threshold=0.7)
    thinned = drop_near_dups(exact, pairs)
    print(f"docs={docs.count()} exact-unique={exact.count()} "
          f"near-pairs={pairs.count()} after-cluster-thin={thinned.count()}")

    # 4. exact token budget without a global single-partition window
    budgeted = token_budget_cut(thinned, max_tokens=20_000)
    print(f"within 20k-token budget: {budgeted.count()} docs")

    # or the whole pipeline in one call
    curated, stats = curate_corpus(docs, min_quality=0.3,
                                   near_dup_threshold=0.8,
                                   max_tokens=50_000)
    print("curate_corpus stages:", stats)

    with tempfile.TemporaryDirectory() as tmp:
        # 5. incremental dedup: day-2 batch never re-shingles day 1
        store = os.path.join(tmp, "sig_store")
        day1 = docs.where("doc_id % 2 = 0")
        day2 = docs.where("doc_id % 2 = 1")
        write_signature_store(day1, store)
        incr = incremental_minhash_pairs(spark, store, day2, threshold=0.7)
        print(f"incremental near-dup pairs involving the new batch: "
              f"{incr.count()}")

        # 6. ANN: lazy brute force, then the persisted pruned index
        qdf = emb.where("vec_id = 0")
        print("brute-force top-3:")
        cosine_topk_df(emb, qdf, k=3).show()
        index = os.path.join(tmp, "lsh_index")
        build_lsh_index(emb, index, dims=64, n_planes=8)
        q = [float(x) for x in qdf.first()["embedding"]]
        print("partition-pruned index top-3:")
        query_lsh_index(spark, index, q, k=3).show()

    spark.stop()


if __name__ == "__main__":
    main()
