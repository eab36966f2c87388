"""Generation-eval metrics over paired text columns: ROUGE-N and BLEU.

The eval half of a training-data platform: scoring model outputs
(candidates) against references with the standard n-gram overlap
metrics — BLEU's clipped modified precision with brevity penalty
[Papineni et al., ACL'02] and ROUGE-N precision/recall/F1 [Lin, 2004].

Everything is EXACT integer multiset math (clipped counts) plus a few
double ratios, expressed as per-row Column algebra over token arrays —
no shuffle, no UDF, embarrassingly parallel, and every value reproduces
in DuckDB list algebra, so the contract entry carries a full oracle.

Per-row cost is O(|distinct n-grams| x |array|) from the filter-inside-
fold counting; candidate/reference texts are short (sentences to
paragraphs) in real eval sets, so this stays cheap; at 100 TB the
operator scales out as a pure map.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.text import tokens, word_ngrams


def _clipped_overlap(cg: Column, rg: Column) -> Column:
    """Sum over distinct candidate n-grams of
    ``min(count_in_candidate, count_in_reference)`` — BLEU's clipped
    count / ROUGE's overlap count.  Pure fold, exact integers."""
    return F.aggregate(
        F.array_distinct(cg), F.lit(0),
        lambda acc, g: acc + F.least(
            F.size(F.filter(cg, lambda x: x == g)),
            F.size(F.filter(rg, lambda x: x == g))))


def ngram_eval_metrics(df: DataFrame, cand_col: str, ref_col: str,
                       n_max: int = 2) -> DataFrame:
    """Append per-row eval-metric columns for n = 1..n_max:

    * ``p{n}`` — clipped modified n-gram precision (BLEU numerator),
    * ``r{n}`` — n-gram recall (ROUGE-N recall),
    * ``rouge{n}_f1`` — 2PR/(P+R) (0 when P+R = 0),

    plus ``bp`` (brevity penalty, ``min(1, exp(1 - |ref|/|cand|))``)
    and ``bleu{n_max}`` (BP times the geometric mean of p1..p{n_max};
    0 if any p_n is 0 — the strict, unsmoothed definition).

    Zero-length guards: an empty candidate scores 0 precision/BLEU; an
    empty reference scores 0 recall.  All ratios are exact integer
    divisions; only bp/bleu touch exp/pow.
    """
    if n_max < 1:
        raise ValueError(f"n_max must be >= 1 [{n_max}]")
    out = df
    pcols = []
    for n in range(1, n_max + 1):
        cg = word_ngrams(cand_col, n)
        rg = word_ngrams(ref_col, n)
        clip = _clipped_overlap(cg, rg)
        p = F.when(F.size(cg) > 0,
                   clip.cast("double") / F.size(cg)).otherwise(F.lit(0.0))
        r = F.when(F.size(rg) > 0,
                   clip.cast("double") / F.size(rg)).otherwise(F.lit(0.0))
        out = out.withColumn(f"p{n}", p).withColumn(f"r{n}", r)
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
