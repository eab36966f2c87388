"""Corpus curation pipeline: the composed training-data path.

``curate_corpus`` chains the operators a pretraining data pipeline runs
before tokenization, in the order that minimizes work at scale:

1. **quality gate** — cheap Column-algebra scoring first (narrow, prunes
   rows before anything shuffles);
2. **exact dedup** — hash-groupBy on normalized content (one shuffle of
   (hash, id));
3. **near dedup** — MinHash/LSH candidate pairs; every doc appearing as
   the *larger* id of a surviving pair is dropped (keep-first policy —
   cluster-transitive enough for corpus thinning without a connected-
   components pass);
4. **token budget** — running-total cutoff in corpus order (window sum),
   stopping the corpus at ``max_tokens``.

Returns (curated DataFrame, stats dict of per-stage counts).  Stats force
one action per stage boundary; pass ``collect_stats=False`` to keep the
whole pipeline lazy for production runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.text import quality_score, token_count
from .dedup import exact_dedup, minhash_dedup


def curate_corpus(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id",
                  min_quality: float = 0.5,
                  near_dup_threshold: float = 0.8,
                  max_tokens: int | None = None,
                  collect_stats: bool = True,
                  ) -> tuple[DataFrame, dict[str, int]]:
    stats: dict[str, int] = {}

    def n(stage: str, frame: DataFrame) -> DataFrame:
        if collect_stats:
            stats[stage] = frame.count()
        return frame

    n("input", df)

    # 1. quality gate (narrow)
    gated = n("after_quality",
              df.where(quality_score(text_col) >= min_quality))

    # 2. exact dedup
    exact = n("after_exact_dedup", exact_dedup(gated, text_col, id_col))

    # 3. near dedup: drop the id_b side of each candidate pair
    pairs = minhash_dedup(exact, text_col, id_col,
                          threshold=near_dup_threshold)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    near = n("after_near_dedup", exact.join(losers, id_col, "left_anti"))

    # 4. token budget: cumulative tokens in id order, cut at the budget
    out = near
    if max_tokens is not None:
        w = Window.orderBy(id_col).rowsBetween(Window.unboundedPreceding, 0)
        out = (near.withColumn("__tok", token_count(text_col))
               .withColumn("__cum", F.sum("__tok").over(w))
               .where(F.col("__cum") <= max_tokens)
               .drop("__tok", "__cum"))
        # NOTE: the single-partition global running sum is the one
        # non-scalable step; at 100 TB budget per shard (partition by
        # hash, pro-rated budget) or sample a global quantile of doc
        # length instead.  Kept exact here for determinism.
    n("output", out)
    return out, stats
