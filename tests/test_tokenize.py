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


# -- round-6: batched distributed path + local fast path ------------------

def test_bpe_local_and_distributed_paths_agree(spark):
    texts = ["low low low lower lowest",
             "newer newer new newest wider"]
    ref_merges, ref_seg = _ref_bpe(_ref_word_freqs(texts), 8)
    for kwargs in ({},                                    # local path
                   {"local_vocab_max": 0, "batch_max": 1},
                   {"local_vocab_max": 0, "batch_max": 4},
                   {"local_vocab_max": 0, "batch_max": 16}):
        merges, seg = bpe_train(_docs(spark, texts), n_merges=8, **kwargs)
        assert merges == ref_merges, kwargs
        assert {r.word: r.symbols for r in seg.collect()} == ref_seg


def test_bpe_batched_rounds_fewer_than_merges(spark):
    # the batched distributed path must apply >1 safe merge per Spark
    # round when merges are independent (the round-5 weak flag: one
    # round per merge = ~2 jobs x n_merges sequential scheduler trips);
    # disjoint per-word alphabets make every same-round merge conflict-
    # free, so each round batches them all
    texts = ["aaaa bbbb cccc dddd eeee ffff gggg hhhh"] * 3
    rounds: list = []
    merges, _ = bpe_train(_docs(spark, texts), n_merges=16,
                          local_vocab_max=0, batch_max=16,
                          round_sizes=rounds)
    ref_merges, _ = _ref_bpe(_ref_word_freqs(texts), 16)
    assert merges == ref_merges
    assert sum(rounds) == len(merges)
    assert len(merges) == 16
    assert len(rounds) <= max(1, len(merges) // 4)


def test_bpe_batched_differential_fuzz_vs_reference(spark):
    # small alphabet makes concat-collisions ("a"+"bc" vs "ab"+"c")
    # likely -- exactly the case _safe_batch must serialize
    rng = random.Random(1306)
    for trial in range(6):
        vocab = ["".join(rng.choice("ab")
                         for _ in range(rng.randint(1, 7)))
                 for _ in range(rng.randint(5, 25))]
        texts = [" ".join(rng.choice(vocab) for _ in range(10))
                 for _ in range(8)]
        n = rng.randint(3, 12)
        ref_merges, ref_seg = _ref_bpe(_ref_word_freqs(texts), n)
        merges, seg = bpe_train(
            _docs(spark, texts), n_merges=n,
            local_vocab_max=0, batch_max=rng.choice([2, 4, 8]))
        assert merges == ref_merges, (trial, texts)
        assert {r.word: r.symbols
                for r in seg.collect()} == ref_seg, trial


def test_bpe_local_path_uses_incremental_counts_exactly():
    # driver-side trainer (no spark): incremental == naive reference
    from legend_community_delta_spark.operators.tokenize import (
        _local_bpe)
    rng = random.Random(7)
    for _ in range(20):
        vocab = ["".join(rng.choice("abc")
                         for _ in range(rng.randint(1, 6)))
                 for _ in range(rng.randint(3, 30))]
        texts = [" ".join(rng.choice(vocab) for _ in range(15))]
        freqs = _ref_word_freqs(texts)
        n = rng.randint(1, 14)
        got_m, got_s = _local_bpe(dict(freqs), n, 2)
        want_m, want_s = _ref_bpe(freqs, n, 2)
        assert got_m == want_m
        assert got_s == want_s


# ---------------------------------------------------------------------------
# Unigram-LM (SentencePiece-style) trainer — pinned against a pure-python
# EM reference implementing the identical math (same seed vocabulary,
# same forward-backward posteriors, same prune rule).
# ---------------------------------------------------------------------------

def _ref_seed(freqs, max_len, seed_size):
    import math
    counts = {}
    for w, f in freqs.items():
        for i in range(len(w)):
            for l in range(1, min(max_len, len(w) - i) + 1):
                sub = w[i:i + l]
                counts[sub] = counts.get(sub, 0) + f
    chars = {p: n for p, n in counts.items() if len(p) == 1}
    multi = sorted(((p, n) for p, n in counts.items() if len(p) > 1),
                   key=lambda x: (-x[1], x[0]))[:seed_size]
    seeded = dict(chars)
    seeded.update(dict(multi))
    tot = sum(seeded.values())
    return {p: math.log(n) - math.log(tot) for p, n in seeded.items()}


def _ref_em_round(freqs, pieces, max_len):
    """One EM round: forward-backward expected counts, renormalize."""
    import math

    def lse(xs):
        if not xs:
            return -1e30
        m = max(xs)
        return m + math.log(sum(math.exp(x - m) for x in xs))

    expected = {}
    for w, f in freqs.items():
        n = len(w)
        edges = []
        for i in range(n):          # 0-based start
            for l in range(1, min(max_len, n - i) + 1):
                sub = w[i:i + l]
                if sub in pieces:
                    edges.append((i, l, pieces[sub]))
        fa = [0.0]
        for pos in range(1, n + 1):
            fa.append(lse([fa[s] + lp for s, l, lp in edges
                           if s + l == pos]))
        fb = [0.0] * (n + 1)
        for pos in range(n - 1, -1, -1):
            fb[pos] = lse([lp + fb[pos + l] for s, l, lp in edges
                           if s == pos])
        z = fa[n]
        for s, l, lp in edges:
            wgt = math.exp(fa[s] + lp + fb[s + l] - z)
            sub = w[s:s + l]
            expected[sub] = expected.get(sub, 0.0) + f * wgt
    tot = sum(expected.values())
    return ({p: math.log(c) - math.log(tot) for p, c in expected.items()},
            expected)


def _unigram_docs(spark):
    rows = [(1, "the cat sat on the mat"), (2, "the cat ate the rat"),
            (3, "a cat and a rat sat"), (4, "the mat sat flat")]
    return (spark.createDataFrame(rows, "doc_id long, text string"),
            _ref_word_freqs([t for _, t in rows]))


def test_unigram_seed_vocab_matches_reference(spark):
    from legend_community_delta_spark.operators.tokenize import (
        unigram_seed_vocab)
    df, freqs = _unigram_docs(spark)
    got = {r.piece: r.logp
           for r in unigram_seed_vocab(df, max_piece_len=4,
                                       seed_size=25).collect()}
    want = _ref_seed(dict(freqs), 4, 25)
    assert set(got) == set(want)
    for p in want:
        assert got[p] == pytest.approx(want[p], rel=1e-9), p


def test_unigram_em_round_matches_reference(spark):
    from legend_community_delta_spark.operators.tokenize import (
        _seed_from_words, unigram_em_round, word_freqs)
    df, freqs = _unigram_docs(spark)
    words = word_freqs(df)
    pieces = _seed_from_words(words, 4, 25)
    ref = _ref_seed(dict(freqs), 4, 25)
    for rnd in range(2):
        pieces = unigram_em_round(words, pieces, 4)
        ref, ref_exp = _ref_em_round(dict(freqs), ref, 4)
        got = {r.piece: (r.logp, r.expected) for r in pieces.collect()}
        assert set(got) == set(ref), rnd
        for p, lp in ref.items():
            assert got[p][0] == pytest.approx(lp, rel=1e-9), (rnd, p)
            assert got[p][1] == pytest.approx(ref_exp[p], rel=1e-9)


def test_unigram_em_round_floors_underflowed_posteriors(spark):
    """ADVICE r7: a piece whose posterior mass underflows to exactly 0.0
    must not yield NULL logp (Spark log(0) is NULL) — NULLs would poison
    every lattice containing the piece next round.  Force the underflow
    with a logp far below exp()'s range and assert every output logp is
    finite and non-NULL."""
    from legend_community_delta_spark.operators.tokenize import (
        unigram_em_round, word_freqs)
    df = spark.createDataFrame([("ab ab ab",)], "text string")
    words = word_freqs(df)
    pieces = spark.createDataFrame(
        [("a", -0.7), ("b", -0.7), ("ab", -800.0)],
        "piece string, logp double")
    out = unigram_em_round(words, pieces, 4).collect()
    got = {r.piece: r for r in out}
    assert set(got) == {"a", "b", "ab"}
    for p, r in got.items():
        assert r.logp is not None, p
        assert r.logp == r.logp and r.logp > float("-inf"), p  # no NaN
    # the underflowed piece bottoms out near log(1e-300 / total)
    assert got["ab"].expected == 0.0
    assert got["ab"].logp < -600
    # next round still runs NULL-free on the floored model
    out2 = unigram_em_round(
        words, spark.createDataFrame(
            [(r.piece, r.logp) for r in out],
            "piece string, logp double"), 4).collect()
    assert all(r.logp is not None for r in out2)


def test_unigram_train_learns_words_and_prunes_to_size(spark):
    from legend_community_delta_spark.operators.tokenize import (
        unigram_train)
    df, _ = _unigram_docs(spark)
    pieces = unigram_train(df, vocab_size=30, n_em=2,
                           max_piece_len=4, seed_size=40)
    rows = pieces.collect()
    vocab = {r.piece for r in rows}
    assert len(rows) <= 30
    # single-char coverage never pruned
    chars = {c for w in "thecatsatonmatateratandflat" for c in w}
    assert chars <= vocab
    # the high-frequency whole words win pieces
    assert {"the", "cat", "sat", "mat", "rat"} <= vocab
    # probabilities normalize
    import math
    assert sum(math.exp(r.logp) for r in rows) == pytest.approx(1.0)


def test_unigram_encode_stats_and_oov_fallback(spark):
    from legend_community_delta_spark.operators.tokenize import (
        unigram_train, unigram_encode_stats)
    df, _ = _unigram_docs(spark)
    pieces = unigram_train(df, vocab_size=30, n_em=2,
                           max_piece_len=4, seed_size=40)
    stats = {r.doc_id: (r.n_words, r.n_unigram_tokens)
             for r in unigram_encode_stats(df, pieces).collect()}
    # every trained word segments as one piece on this tiny corpus
    assert stats[1] == (6, 6) and stats[4] == (4, 4)
    # OOV word (chars 'z','q' not in training): char fallback
    oov = spark.createDataFrame([(9, "zq the")], "doc_id long, text string")
    got = unigram_encode_stats(oov, pieces).collect()[0]
    assert (got.n_words, got.n_unigram_tokens) == (2, 3)  # 2 chars + 'the'


def test_unigram_viterbi_tie_breaks_to_fewer_pieces(spark):
    from legend_community_delta_spark.operators.tokenize import (
        unigram_viterbi_segments)
    import math
    # model where 'ab' == 'a'+'b' in probability: p(ab)=1/4, p(a)=p(b)=1/2
    # -> log p('ab' as one piece) = log(1/4) == log p('a')+log p('b');
    # the tie must resolve to ONE piece
    pieces = spark.createDataFrame(
        [("a", math.log(0.5)), ("b", math.log(0.5)),
         ("ab", math.log(0.25))], "piece string, logp double")
    words = spark.createDataFrame([("ab", 1)], "word string, freq long")
    got = unigram_viterbi_segments(words, pieces, 4).collect()[0]
    assert got.n_pieces == 1


def test_unigram_vocab_below_alphabet_terminates(spark):
    """vocab_size smaller than the single-char alphabet: pruning cannot
    go below char coverage — must terminate with a chars-only model,
    not loop forever (regression: round-7 review)."""
    from legend_community_delta_spark.operators.tokenize import (
        unigram_train)
    df = spark.createDataFrame([(1, "ab ba ab")],
                               "doc_id long, text string")
    pieces = unigram_train(df, vocab_size=1, n_em=1,
                           max_piece_len=3, seed_size=10)
    rows = pieces.collect()
    assert {r.piece for r in rows} == {"a", "b"}


def test_unigram_no_python_udfs(spark):
    from legend_community_delta_spark.operators.tokenize import (
        unigram_em_round, _seed_from_words, word_freqs)
    df, _ = _unigram_docs(spark)
    words = word_freqs(df)
    out = unigram_em_round(words, _seed_from_words(words, 4, 25), 4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# WordPiece greedy encode — pinned against a pure-python greedy
# longest-match-first reference over the same vocabulary.
# ---------------------------------------------------------------------------

def _ref_wordpiece(word, vocab, max_len):
    pos, cnt = 0, 0
    n = len(word)
    while pos < n:
        match = None
        for l in range(min(max_len, n - pos), 0, -1):
            sub = word[pos:pos + l]
            key = sub if pos == 0 else "##" + sub
            if key in vocab:
                match = l
                break
        if match is None:
            return 1, True                        # whole word -> [UNK]
        pos += match
        cnt += 1
    return cnt, False


def test_wordpiece_matches_python_reference(spark):
    from legend_community_delta_spark.operators.tokenize import (
        wordpiece_segments)
    vocab = {"un", "##able", "##b", "##le", "a", "##a", "b", "##n",
             "u", "##u", "l", "##l", "e", "##e", "n", "able", "un##"}
    vdf = spark.createDataFrame([(p,) for p in sorted(vocab)],
                                "piece string")
    words = ["unable", "able", "banana", "nab", "zzz", "u", "ub",
             "lane", "ellen"]
    wdf = spark.createDataFrame([(w, 1) for w in words],
                                "word string, freq long")
    got = {r.word: (r.n_pieces, r.is_unk)
           for r in wordpiece_segments(wdf, vdf, 6).collect()}
    for w in words:
        assert got[w] == _ref_wordpiece(w, vocab, 6), w
    # longest-match-first: 'unable' = un + ##able (2), not u/n/a/b/l/e
    assert got["unable"] == (2, False)
    assert got["zzz"] == (1, True)


def test_wordpiece_encode_stats_and_unk(spark):
    from legend_community_delta_spark.operators.tokenize import (
        wordpiece_char_vocab, wordpiece_encode_stats)
    df = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the the qq")],
        "doc_id long, text string")
    # char vocab covers a,c,e,h,s,t,q + top words; every word segmentable
    vocab = wordpiece_char_vocab(df, top_words=2)  # 'the' + one more
    stats = {r.doc_id: (r.n_words, r.n_wordpiece_tokens, r.n_unk_words)
             for r in wordpiece_encode_stats(df, vocab).collect()}
    # top-2 words by (freq desc, word asc) = 'the' and 'cat' (whole
    # pieces, 1 token each); 'sat' falls back to 3 chars
    assert stats[1] == (3, 5, 0)
    assert stats[2] == (3, 4, 0)                  # the,the=1+1; qq=2 chars
    # unseen characters -> UNK
    oov = spark.createDataFrame([(9, "zz the")], "doc_id long, text string")
    got = wordpiece_encode_stats(oov, vocab).collect()[0]
    assert (got.n_words, got.n_wordpiece_tokens, got.n_unk_words) == (2, 2, 1)


def test_wordpiece_no_python_udfs(spark):
    from legend_community_delta_spark.operators.tokenize import (
        wordpiece_char_vocab, wordpiece_encode_stats)
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    out = wordpiece_encode_stats(df, wordpiece_char_vocab(df))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
