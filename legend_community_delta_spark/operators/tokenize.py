"""Distributed BPE (byte-pair-encoding) tokenizer training — the vocab-
construction stage of a pretraining pipeline, re-expressed Spark-first.

BPE training [Sennrich et al., ACL'16] iterates: count adjacent symbol
pairs across the corpus, merge the most frequent pair everywhere,
repeat.  The Spark shape exploits that everything happens on the
**distinct-word table weighted by corpus frequency** (the classic
trick): a 100 TB corpus has a vocabulary of maybe 10^7 distinct words,
so per-round work is vocabulary-sized, not corpus-sized — one explode +
one weighted count per round, with ONE single-row driver fetch (the
argmax pair — metadata, same budget as the connected-components
convergence probe).  Greedy left-to-right pair merging inside a word is
a fold, expressed as ``F.aggregate`` over the symbol array (an
interpreted higher-order lambda — acceptable because it runs once per
DISTINCT WORD per round, never per corpus token).

Encoding a corpus with the trained model is then a JOIN, not a fold:
explode doc tokens, equi-join the word → segmentation table (broadcast
when the vocab fits), count symbols.  OOV words fall back to character
segmentation — exactly what training would have produced for a word
with no merged pair.

The merge rule is deterministic: argmax pair count, ties broken by
(left, right) ascending — so the merge table is exactly reproducible,
pinned against an independent pure-python reference implementation in
tests.  The fold itself is not SQL-expressible in one query, so the
contract entries are rows-only by nature (rationale recorded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import text as TX


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct lowercased words with corpus frequencies:
    ``(word, freq)`` — the weighted vocabulary BPE trains on."""
    return (df.select(F.explode(F.transform(
        TX.tokens(text_col), lambda t: F.lower(t))).alias("word"))
        .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))


def merge_pair(symbols, a: str, b: str):
    """Column: greedy left-to-right merge of adjacent ``(a, b)`` into
    ``a+b`` over a symbol array — the BPE merge fold.  Non-overlapping
    by construction: a merged token can't be the left half of the same
    merge in the same pass (``a+b != a`` whenever b is non-empty)."""
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        # F.get is 0-based and NULL-safe on the empty accumulator
        # (ANSI-mode element_at(-1) raises there)
        lambda acc, x: F.when(
            (F.get(acc, F.size(acc) - 1) == F.lit(a)) & (x == F.lit(b)),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1),
                     F.array(F.lit(a + b)))
        ).otherwise(F.concat(acc, F.array(x))))


def bpe_train(df: DataFrame, text_col: str = "text",
              n_merges: int = 16, min_pair_count: int = 2,
              ) -> tuple[list, DataFrame]:
    """Train *n_merges* BPE merges on the corpus.

    Returns ``(merges, segmentation)``: *merges* is a list of
    ``(left, right, pair_count)`` in merge order; *segmentation* is the
    final ``(word, freq, symbols)`` table (the trained model — persist
    it like any model store).  Stops early when no pair reaches
    *min_pair_count*.

    Per round: adjacent pairs via two shifted slices zipped, one
    weighted groupBy, one single-row driver fetch for the argmax, one
    fold over the distinct words, ``localCheckpoint`` to keep the
    lineage flat across rounds.
    """
    seg = (word_freqs(df, text_col)
           .select("word", "freq",
                   F.split(F.col("word"), "").alias("symbols"))
           .localCheckpoint(eager=True))
    merges: list = []
    for _ in range(n_merges):
        s = F.col("symbols")
        adj = F.arrays_zip(
            F.slice(s, F.lit(1), F.greatest(F.size(s) - 1, F.lit(0)))
            .alias("l"),
            F.slice(s, F.lit(2), F.greatest(F.size(s) - 1, F.lit(0)))
            .alias("r"))
        pairs = (seg.select("freq", F.explode(adj).alias("p"))
                 .select("freq", F.col("p.l").alias("l"),
                         F.col("p.r").alias("r"))
                 .groupBy("l", "r").agg(F.sum("freq").alias("n")))
        best = (pairs.orderBy(F.desc("n"), "l", "r").limit(1).collect())
        if not best or best[0].n < min_pair_count:
            break
        a, b, n = best[0].l, best[0].r, int(best[0].n)
        merges.append((a, b, n))
        seg = (seg.select("word", "freq",
                          merge_pair(F.col("symbols"), a, b)
                          .alias("symbols"))
               .localCheckpoint(eager=True))
    return merges, seg


def bpe_encode_stats(df: DataFrame, segmentation: DataFrame,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-doc BPE token counts using a trained segmentation table:
    ``(doc_id, n_words, n_chars, n_bpe_tokens)``.

    Encoding is an equi-JOIN against the vocabulary (broadcast when it
    fits), not a per-token fold — the corpus-sized pass stays in
    codegen.  OOV words fall back to their character count (what BPE
    training produces for a word with no mergeable pair)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.transform(TX.tokens(text_col),
                              lambda t: F.lower(t))).alias("word"))
    vocab = segmentation.select(
        "word", F.size("symbols").alias("__n_sym"))
    return (toks.join(vocab, "word", "left")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_words"),
                 F.sum(F.length("word")).alias("n_chars"),
                 F.sum(F.coalesce(F.col("__n_sym"), F.length("word")))
                 .alias("n_bpe_tokens")))
