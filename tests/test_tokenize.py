"""BPE tokenizer training: exact equivalence with an independent
pure-python reference (merge table, segmentations, encode counts),
plus edge cases and the vocabulary-sized-work plan property.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from legend_community_delta_spark.operators.tokenize import (
    bpe_encode_stats,
    bpe_train,
    merge_pair,
    word_freqs,
)

from conftest import SF_DIR


# -- independent reference implementation (kept deliberately naive) -------

def _ref_word_freqs(texts):
    freqs = {}
    for t in texts:
        for w in t.split():
            w = w.lower()
            freqs[w] = freqs.get(w, 0) + 1
    return freqs


def _ref_merge(seq, a, b):
    out = []
    for c in seq:
        if out and out[-1] == a and c == b:
            out[-1] = a + b
        else:
            out.append(c)
    return out


def _ref_bpe(freqs, n_merges, min_count=2):
    seg = {w: list(w) for w in freqs}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for w, f in freqs.items():
            s = seg[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get(
                    (s[i], s[i + 1]), 0) + f
        if not counts:
            break
        (a, b), n = min(counts.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if n < min_count:
            break
        merges.append((a, b, n))
        seg = {w: _ref_merge(s, a, b) for w, s in seg.items()}
    return merges, seg


def _docs(spark, texts):
    return spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")


def test_merge_pair_greedy_left_to_right(spark):
    df = spark.createDataFrame([("aaaa",), ("abab",), ("a",)],
                               "w string")
    out = [r.m for r in df.select(
        merge_pair(F.split("w", ""), "a", "a").alias("m")).collect()]
    assert out == [["aa", "aa"], ["a", "b", "a", "b"], ["a"]]
    out2 = [r.m for r in df.select(
        merge_pair(F.split("w", ""), "a", "b").alias("m")).collect()]
    assert out2 == [["a", "a", "a", "a"], ["ab", "ab"], ["a"]]


def test_bpe_train_matches_reference_on_classic_corpus(spark):
    texts = ["low low low lower lowest",
             "newer newer new newest wider"]
    merges, seg = bpe_train(_docs(spark, texts), n_merges=8)
    ref_merges, ref_seg = _ref_bpe(_ref_word_freqs(texts), 8)
    assert merges == ref_merges
    got_seg = {r.word: r.symbols for r in seg.collect()}
    assert got_seg == ref_seg


def test_bpe_train_matches_reference_on_random_corpus(spark):
    rng = random.Random(11)
    vocab = ["".join(rng.choice("abcde")
                     for _ in range(rng.randint(1, 7)))
             for _ in range(30)]
    texts = [" ".join(rng.choice(vocab) for _ in range(12))
             for _ in range(20)]
    merges, seg = bpe_train(_docs(spark, texts), n_merges=10)
    ref_merges, ref_seg = _ref_bpe(_ref_word_freqs(texts), 10)
    assert merges == ref_merges
    assert {r.word: r.symbols for r in seg.collect()} == ref_seg


def test_bpe_train_matches_reference_on_real_documents(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    merges, _ = bpe_train(docs, n_merges=6)
    texts = [r.text for r in docs.select("text").collect()
             if r.text is not None]
    ref_merges, _ = _ref_bpe(_ref_word_freqs(texts), 6)
    assert merges == ref_merges


def test_bpe_encode_stats_and_oov_fallback(spark):
    train = _docs(spark, ["low low lower"])
    merges, seg = bpe_train(train, n_merges=4, min_pair_count=2)
    # 'low' appears 3x -> (l,o) then (lo,w) merge; 'lower' -> low+e+r
    stats = {r.doc_id: (r.n_words, r.n_chars, r.n_bpe_tokens)
             for r in bpe_encode_stats(
                 _docs(spark, ["low lower", "zzz"]), seg).collect()}
    _, ref_seg = _ref_bpe(_ref_word_freqs(["low low lower"]), 4)
    want_low = len(ref_seg["low"]) + len(ref_seg["lower"])
    assert stats[0] == (2, 8, want_low)
    assert stats[1] == (1, 3, 3)  # OOV word falls back to chars


def test_bpe_stops_below_min_pair_count(spark):
    # every word unique, every pair count 1: no merges at min_count=2
    merges, seg = bpe_train(_docs(spark, ["ab cd ef"]), n_merges=5)
    assert merges == []
    assert all(len(r.symbols) == 2 for r in seg.collect())


def test_bpe_rounds_work_on_distinct_words_not_corpus(spark):
    # the training table has one row per DISTINCT word regardless of
    # corpus duplication — the vocabulary-sized-work property
    texts = ["dup dup dup dup dup other"] * 50
    wf = word_freqs(_docs(spark, texts))
    assert wf.count() == 2
    assert {r.word: r.freq for r in wf.collect()} == \
        {"dup": 250, "other": 50}
