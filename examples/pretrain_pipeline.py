"""The round-7 training-data pipeline, end to end in one script.

    python examples/pretrain_pipeline.py [sf_dir]

Chains the curation surface a pretraining run needs between raw ingest
and the tokenizer, against the synthetic documents table (default
/root/testdata/sf0.001):

1.  per-source ROBUST quality normalization (median/IQR z, winsorized)
    and a single global threshold on the normalized score
2.  duplicate-SPAN removal (distributed exact-substring dedup) with a
    persisted span store for tomorrow's incremental batch
3.  LSH-verified near-dup pairs -> leakage-safe train/val/test splits
    (no near-dup pair straddles splits; audited)
4.  DSIR importance selection against a trusted target slice
5.  per-language token budgets (exact bucketed prefix sum)
6.  deterministic shuffle into training shards + a sequence-pack plan
7.  dataset-card numbers from the mergeable stores (bottom-k quantiles)

Every stage is lazy DataFrame algebra; the only actions are the stage
counts printed for the walkthrough.
"""

from __future__ import annotations

import os
import sys
import tempfile

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from legend_community_delta_spark.functions.text import quality_score
    from legend_community_delta_spark.operators.curation import (
        stratum_token_budget,
        pack_plan,
    )
    from legend_community_delta_spark.operators.dedup import (
        verified_near_dup_pairs,
    )
    from legend_community_delta_spark.operators.scoring import (
        dsir_logratios,
        dsir_weights,
        robust_scores,
    )
    from legend_community_delta_spark.operators.sketches import (
        bottomk_sample,
        sample_quantiles,
    )
    from legend_community_delta_spark.operators.spans import (
        dedup_spans,
        write_span_store,
    )
    from legend_community_delta_spark.operators.splits import (
        leakage_safe_split,
        shuffle_shards,
        split_leakage_report,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (SparkSession.builder.master("local[4]")
             .appName("pretrain-pipeline")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    print(f"raw docs: {docs.count()}")

    # 1. robust quality: normalize per source, threshold once globally
    rq = robust_scores(docs, quality_score("text"))
    kept_ids = rq.where(F.col("robust_z") > -1.5).select("doc_id")
    docs = docs.join(kept_ids, "doc_id")
    print(f"after robust-quality gate: {docs.count()}")

    # 2. span removal + persist the store for the next ingest batch
    store = tempfile.mkdtemp(prefix="pretrain_spans_") + "/store"
    write_span_store(docs, store, n=15)
    docs = dedup_spans(docs, n=15)
    print(f"after duplicate-span removal: {docs.count()}")

    # 3. near-dup pairs -> leakage-safe splits (+ audit)
    pairs = verified_near_dup_pairs(docs, n=5, threshold=0.2)
    split = leakage_safe_split(docs, pairs)
    straddlers = split_leakage_report(split, pairs).count()
    print(f"splits: {sorted((r['split'], r['n']) for r in split.groupBy('split').agg(F.count('*').alias('n')).collect())} "
          f"straddling pairs: {straddlers}")
    assert straddlers == 0
    train = split.where(F.col("split") == "train").drop("split")

    # 4. DSIR: keep the half most target-like (target = en slice)
    lr = dsir_logratios(train.where(F.col("lang") == "en"), train)
    w = dsir_weights(train, lr)
    budget = max(1, train.count() // 2)
    chosen = (train.join(w, "doc_id")
              .orderBy(F.desc("logratio_avg"),
                       F.md5(F.col("doc_id").cast("string")), "doc_id")
              .limit(budget))
    print(f"after DSIR selection: {chosen.count()}")

    # 5. per-language token budgets
    mixed = stratum_token_budget(chosen, "lang",
                                 {"en": 5000, "de": 2000, "fr": 2000})
    print(f"after token budgets: {mixed.count()}")

    # 6. layout: shards + pack plan
    sharded = shuffle_shards(mixed, hex_chars=1)
    packed = pack_plan(mixed, chunk_tokens=64)
    print(f"shards: {sharded.select('shard').distinct().count()}, "
          f"packed sequences: {packed.agg(F.max('chunk_last')).first()[0] + 1}")

    # 7. dataset-card quantiles from a deterministic bottom-k sample
    q = sample_quantiles(
        bottomk_sample(mixed, "n_chars", "doc_id", ["lang"], k=64),
        [0.5, 0.9], ["lang"])
    for r in sorted(q.collect(), key=lambda r: (r["lang"], r["prob"])):
        print(f"  n_chars {r['lang']} p{int(r['prob'] * 100)}: "
              f"{r['quantile']}")
    spark.stop()


if __name__ == "__main__":
    main()
