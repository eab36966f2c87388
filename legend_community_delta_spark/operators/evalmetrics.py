"""Generation-eval metrics over paired text columns: ROUGE-N and BLEU.

The eval half of a training-data platform: scoring model outputs
(candidates) against references with the standard n-gram overlap
metrics — BLEU's clipped modified precision with brevity penalty
[Papineni et al., ACL'02] and ROUGE-N precision/recall/F1 [Lin, 2004].

Clipped counts are EXACT integer multiset math, computed RELATIONALLY:
explode each side's n-grams to ``(id, gram)`` rows, count per gram,
inner-join candidate vs reference counts and sum the minima.  A per-row
``aggregate``/``filter`` fold version was measured 60x slower — Spark
evaluates higher-order lambdas interpreted, while the explode/groupBy/
join shape stays inside whole-stage codegen and is exactly the plan
that scales out at 100 TB (the shuffles key on (id, gram)).  The final
ratios are a handful of double divisions per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import tokens, word_ngrams


def _clip_counts(base: DataFrame, id_col: str, cand_col: str,
                 ref_col: str, n: int, out: str) -> DataFrame:
    """(id, out) — total clipped n-gram overlap per row id."""
    cg = (base.select(id_col, F.explode(word_ngrams(cand_col, n))
                      .alias("__g"))
          .groupBy(id_col, "__g").agg(F.count(F.lit(1)).alias("__cc")))
    rg = (base.select(id_col, F.explode(word_ngrams(ref_col, n))
                      .alias("__g"))
          .groupBy(id_col, "__g").agg(F.count(F.lit(1)).alias("__rc")))
    return (cg.join(rg, [id_col, "__g"])
            .groupBy(id_col)
            .agg(F.sum(F.least("__cc", "__rc")).alias(out)))


def ngram_eval_metrics(df: DataFrame, cand_col: str, ref_col: str,
                       id_col: str, n_max: int = 2,
                       broadcast_clip: bool = False) -> DataFrame:
    """Append per-row eval-metric columns for n = 1..n_max:

    * ``p{n}`` — clipped modified n-gram precision (BLEU numerator),
    * ``r{n}`` — n-gram recall (ROUGE-N recall),
    * ``rouge{n}_f1`` — 2PR/(P+R) (0 when P+R = 0),

    plus ``bp`` (brevity penalty, ``min(1, exp(1 - |ref|/|cand|))``)
    and ``bleu{n_max}`` (BP times the geometric mean of p1..p{n_max};
    0 if any p_n is 0 — the strict, unsmoothed definition).

    *id_col* must uniquely key rows (the clipped counts join on it).
    Zero-length guards: an empty candidate scores 0 precision/BLEU; an
    empty reference scores 0 recall.  All ratios are exact integer
    divisions; only bp/bleu touch exp/pow.

    *broadcast_clip* hints the per-n clipped-count side into a broadcast
    join.  The clip table has ONE ROW PER INPUT ROW, so this is only
    safe when the caller knows the corpus is small (an eval slice, not a
    100 TB scan); the default lets AQE pick the join strategy.
    """
    if n_max < 1:
        raise ValueError(f"n_max must be >= 1 [{n_max}]")
    out = df
    pcols = []
    for n in range(1, n_max + 1):
        clip = _clip_counts(df, id_col, cand_col, ref_col, n,
                            f"__clip{n}")
        # clip is one row per input row id (a pair of longs): O(corpus)
        # rows, so only broadcast when the caller opted in for a
        # known-small eval slice — otherwise AQE picks the strategy
        out = out.join(F.broadcast(clip) if broadcast_clip else clip,
                       id_col, "left")
        cg_len = F.size(word_ngrams(cand_col, n))
        rg_len = F.size(word_ngrams(ref_col, n))
        c = F.coalesce(F.col(f"__clip{n}"), F.lit(0))
        p = F.when(cg_len > 0, c.cast("double") / cg_len) \
            .otherwise(F.lit(0.0))
        r = F.when(rg_len > 0, c.cast("double") / rg_len) \
            .otherwise(F.lit(0.0))
        out = (out.withColumn(f"p{n}", p).withColumn(f"r{n}", r)
               .drop(f"__clip{n}"))
        out = out.withColumn(
            f"rouge{n}_f1",
            F.when(F.col(f"p{n}") + F.col(f"r{n}") > 0,
                   2 * F.col(f"p{n}") * F.col(f"r{n}")
                   / (F.col(f"p{n}") + F.col(f"r{n}")))
            .otherwise(F.lit(0.0)))
        pcols.append(f"p{n}")
    clen = F.size(tokens(cand_col))
    rlen = F.size(tokens(ref_col))
    bp = F.when(clen <= 0, F.lit(0.0)).otherwise(
        F.least(F.lit(1.0),
                F.exp(F.lit(1.0) - rlen.cast("double") / clen)))
    out = out.withColumn("bp", bp)
    prod = F.lit(1.0)
    for c in pcols:
        prod = prod * F.col(c)
    geo = F.pow(prod, F.lit(1.0 / n_max))
    out = out.withColumn(
        f"bleu{n_max}",
        F.when(prod > 0, F.col("bp") * geo).otherwise(F.lit(0.0)))
    return out
