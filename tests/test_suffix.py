"""Suffix-rank exact-substring dedup (operators/suffix.py): prefix
doubling, overlapping-anchor window identity, rank-neighbor LCP —
pinned against a pure-python suffix reference, plus plan checks."""

from __future__ import annotations

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from legend_community_delta_spark.operators.suffix import (
    exact_span_stats,
    exact_window_groups,
    longest_dup_prefix,
    longest_dup_span_docs,
    suffix_ranks,
    token_positions,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again ok"),
    (2, "a b c d e f g h the quick brown fox jumps over the lazy dog yes"),
    (3, "unique tokens only here nothing repeats at all zzz"),
    (4, "a b c a b c a b c a b c"),   # intra-doc overlapping repeats
    (5, ""),                          # empty doc
]
TOKS = {d: t.split() for d, t in DOCS}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_dup_windows(n, min_count=2):
    occ = defaultdict(list)
    for d, ts in TOKS.items():
        for s in range(len(ts) - n + 1):
            occ[tuple(ts[s:s + n])].append((d, s + 1))
    return {k: v for k, v in occ.items() if len(v) >= min_count}


def _py_span_stats(n, min_count=2):
    dups = _py_dup_windows(n, min_count)
    out = {}
    for d, ts in TOKS.items():
        starts = {s for v in dups.values() for (dd, s) in v if dd == d}
        kept = [t for i, t in enumerate(ts)
                if not any(s <= i + 1 <= s + n - 1 for s in starts)]
        out[d] = (len(ts), len(ts) - len(kept), " ".join(kept))
    return out


def _py_longest_dup():
    sufs = [(d, p + 1, tuple(ts[p:])) for d, ts in TOKS.items()
            for p in range(len(ts))]
    out = {}
    for d, ts in TOKS.items():
        best = 0
        for p in range(len(ts)):
            a = ts[p:]
            for (dd, pp, b) in sufs:
                if (dd, pp) == (d, p + 1):
                    continue
                l = 0
                while l < len(a) and l < len(b) and a[l] == b[l]:
                    l += 1
                best = max(best, l)
        out[d] = (len(ts), best)
    return out


@pytest.mark.parametrize("n", [2, 3, 4])
def test_exact_span_stats_matches_python_reference(spark, docs, n):
    got = {r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
           for r in exact_span_stats(docs, n=n).collect()}
    assert got == _py_span_stats(n)


@pytest.mark.parametrize("n", [2, 3])
def test_exact_window_groups_counts_and_identity(spark, docs, n):
    rows = exact_window_groups(docs, n=n).collect()
    dups = _py_dup_windows(n)
    got = sorted((r["doc_id"], r["s"], r["n_occ"]) for r in rows)
    ref = sorted((d, s, len(v)) for v in dups.values() for (d, s) in v)
    assert got == ref
    # the (w1, w2) anchor-rank pair partitions occurrences EXACTLY like
    # the window's literal token content
    bykey = defaultdict(set)
    for r in rows:
        bykey[(r["w1"], r["w2"])].add((r["doc_id"], r["s"]))
    refkey = {k: set(v) for k, v in dups.items()}
    assert sorted(map(sorted, bykey.values())) \
        == sorted(map(sorted, refkey.values()))


def test_exact_equals_hash_twin_on_fixture(spark, docs):
    """The xxhash64 cover (spans.duplicate_span_stats) and the exact
    rank cover must agree wherever no hash collision occurs — i.e.
    everywhere on a test fixture."""
    from legend_community_delta_spark.operators.spans import (
        duplicate_span_stats)
    a = {r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
         for r in exact_span_stats(docs, n=3).collect()}
    b = {r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
         for r in duplicate_span_stats(docs, n=3).collect()}
    assert a == b


def test_longest_dup_span_docs_matches_python(spark, docs):
    # exactness condition: 2**rounds >= max doc tokens (18) -> rounds=5
    got = {r["doc_id"]: (r["n_tokens"], r["max_dup_len"])
           for r in longest_dup_span_docs(docs, rounds=5).collect()}
    assert got == _py_longest_dup()


def test_longest_dup_tie_group_needs_full_sort(spark):
    """Regression (found by the sf0.01 oracle): when 2**rounds is SHORTER
    than the longest duplicate, suffixes tied on their first 2**rounds
    tokens sit in arbitrary order and the true max-LCP partner may not
    be rank-adjacent — the result undercounts (lower bound).  With the
    full-sort rounds it is exact."""
    rows = [
        # docs a and c share 7 tokens; doc b shares only the first 5
        (1, "t1 t2 t3 t4 t5 t6 t7 xa"),
        (2, "t1 t2 t3 t4 t5 yb yc yd"),
        (3, "t1 t2 t3 t4 t5 t6 t7 zc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # full sort: 2**3 = 8 >= max doc len 8 -> exact: docs 1 and 3 get 7
    exact = {r["doc_id"]: r["max_dup_len"]
             for r in longest_dup_span_docs(df, rounds=3).collect()}
    assert exact == {1: 7, 2: 5, 3: 7}
    # under-provisioned rounds: never an overcount, always >= 2**rounds
    # reached agreement (a real match), i.e. a sound lower bound
    low = {r["doc_id"]: r["max_dup_len"]
           for r in longest_dup_span_docs(df, rounds=2).collect()}
    for d in (1, 2, 3):
        assert low[d] <= exact[d]
        assert low[d] >= 4          # first-2**2-token agreement is real


def test_longest_dup_prefix_per_suffix_spot_checks(spark, docs):
    per = {(r["doc_id"], r["pos"]): r["dup_len"]
           for r in longest_dup_prefix(docs, rounds=5).collect()}
    # doc 1 pos 1 "the quick brown fox jumps over the lazy dog" repeats
    # in doc 2 pos 9 — 9 tokens
    assert per[(1, 1)] == 9 and per[(2, 9)] == 9
    # doc 3 has no repeated token anywhere
    assert all(per[(3, p)] == 0 for p in range(1, len(TOKS[3]) + 1))
    # doc 4 pos 1: "a b c a b c a b c" also starts at pos 4 (9 tokens)
    assert per[(4, 1)] == 9
    # suffixes are never matched against themselves
    assert per[(1, 13)] == 0        # trailing unique token "ok"


def test_suffix_ranks_group_and_order_like_lexicographic(spark, docs):
    pos = token_positions(docs)
    rk = suffix_ranks(pos, rounds=5)[5]
    sp = sorted((r["r"], r["doc_id"], r["pos"]) for r in rk.collect())
    sufs = sorted((tuple(TOKS[d][p - 1:]), d, p)
                  for d, ts in TOKS.items() for p in range(1, len(ts) + 1))
    key32 = defaultdict(list)
    for (s, d, p) in sufs:
        key32[s[:32]].append((d, p))
    groups = defaultdict(set)
    rank_of = {}
    for (r, d, p) in sp:
        groups[r].add((d, p))
        rank_of[(d, p)] = r
    # equal rank <=> equal first-32-token prefix
    assert sorted(map(sorted, groups.values())) \
        == sorted(map(sorted, (set(v) for v in key32.values())))
    # rank order == lexicographic prefix order
    keys_sorted = sorted(key32)
    ranks = [rank_of[key32[k][0]] for k in keys_sorted]
    assert ranks == sorted(ranks)


def test_validation_errors(spark, docs):
    with pytest.raises(ValueError):
        exact_window_groups(docs, n=0)
    with pytest.raises(ValueError):
        exact_window_groups(docs, min_count=1)
    with pytest.raises(ValueError):
        suffix_ranks(token_positions(docs), rounds=-1)


def test_plans_no_python_udfs_no_cartesian(spark, docs):
    for frame in (exact_span_stats(docs, n=3),
                  longest_dup_span_docs(docs, rounds=3)):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan


def test_exact_span_keep_first_spares_canonical(spark, docs):
    from legend_community_delta_spark.operators.suffix import (
        exact_span_stats as ess)
    n = 3
    dups = _py_dup_windows(n)
    ref = {}
    for d, ts in TOKS.items():
        starts = set()
        for occs in dups.values():
            canon = min(occs)
            starts |= {s for (dd, s) in occs if dd == d
                       and (dd, s) != canon}
        kept = [t for i, t in enumerate(ts)
                if not any(s <= i + 1 <= s + n - 1 for s in starts)]
        ref[d] = (len(ts), len(ts) - len(kept), " ".join(kept))
    got = {r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
           for r in ess(docs, n=n, keep_first=True).collect()}
    assert got == ref
    # keep-one removes strictly less than remove-all on this fixture
    alln = {r["doc_id"]: r["n_removed"]
            for r in ess(docs, n=n).collect()}
    assert sum(got[d][1] for d in got) < sum(alln.values())
    # every duplicated window still has exactly >= 1 surviving copy:
    # doc 1's shared 9-token prefix must survive SOMEWHERE
    assert "the quick brown" in got[1][2] or "the quick brown" in got[2][2]


def test_top_dup_windows_report(spark, docs):
    from legend_community_delta_spark.operators.suffix import (
        top_dup_windows)
    rows = top_dup_windows(docs, n=3, k=5).collect()
    dups = _py_dup_windows(3)
    ref = sorted(
        ((" ".join(g), len(v), len({d for d, _ in v}), *min(v))
         for g, v in dups.items()),
        key=lambda t: (-t[1], t[0]))[:5]
    got = [(r["window_text"], r["n_occ"], r["n_docs"],
            r["first_id"], r["first_pos"]) for r in rows]
    assert got == ref
    # "a b c" leads the report: 4 starts inside doc 4 + doc 2's prefix
    assert got[0][0] == "a b c" and got[0][1] == 5
    assert got[0][2] == 2                       # seen in 2 docs
    assert (got[0][3], got[0][4]) == (2, 1)     # canonical occurrence


def test_suffix_differential_fuzz_vs_python(spark):
    """Randomized differential check (derandomized profile in CI, see
    conftest): exact_span_stats and longest_dup_span_docs vs the plain
    pure-python reference on small random corpora with a tiny alphabet
    (maximizes repeats, overlaps, ties and cross-doc duplicates)."""
    from hypothesis import given, settings, strategies as st

    word = st.sampled_from(["a", "b", "c", "ab"])
    doc = st.lists(word, min_size=0, max_size=14).map(" ".join)

    @settings(max_examples=5, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=5), st.integers(2, 3))
    def check(texts, n):
        toks = {i + 1: t.split() for i, t in enumerate(texts)}
        df = spark.createDataFrame(list(enumerate(texts, 1)),
                                   "doc_id long, text string")
        # --- span stats ---
        occ = defaultdict(list)
        for d, ts in toks.items():
            for s in range(len(ts) - n + 1):
                occ[tuple(ts[s:s + n])].append((d, s + 1))
        dups = {k: v for k, v in occ.items() if len(v) >= 2}
        ref = {}
        for d, ts in toks.items():
            starts = {s for v in dups.values() for (dd, s) in v if dd == d}
            kept = [t for i, t in enumerate(ts)
                    if not any(s <= i + 1 <= s + n - 1 for s in starts)]
            ref[d] = (len(ts), len(ts) - len(kept), " ".join(kept))
        got = {r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
               for r in exact_span_stats(df, n=n).collect()}
        assert got == ref, (texts, n)
        # --- longest dup (rounds=4: 2**4=16 >= max doc len 14) ---
        sufs = [(d, p + 1, tuple(ts[p:])) for d, ts in toks.items()
                for p in range(len(ts))]
        lref = {}
        for d, ts in toks.items():
            best = 0
            for p in range(len(ts)):
                a = ts[p:]
                for (dd, pp, b) in sufs:
                    if (dd, pp) == (d, p + 1):
                        continue
                    ln = 0
                    while ln < len(a) and ln < len(b) and a[ln] == b[ln]:
                        ln += 1
                    best = max(best, ln)
            lref[d] = best
        lgot = {r["doc_id"]: r["max_dup_len"]
                for r in longest_dup_span_docs(df, rounds=4).collect()}
        assert lgot == lref, (texts,)

    check()


def test_suffix_ranks_early_stop_when_unique(spark):
    """Once ranks are unique (full suffix sort) remaining rounds are
    skipped and the final table is reused — results identical to the
    non-stopped run, and longest-dup exactness holds outright."""
    rows = [(1, "u1 u2 u3 u4 u5 u6"), (2, "v1 v2 v3 u1 w5 w6")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pos = token_positions(df)
    fast = suffix_ranks(pos, rounds=6, early_stop=True)
    slow = suffix_ranks(pos, rounds=6, early_stop=False)
    assert len(fast) == len(slow) == 7
    # only one shared token ("u1") -> ranks unique by round 2; the tail
    # tables are the SAME object (skipped rounds), not recomputed
    assert any(fast[k] is fast[6] for k in range(2, 6))
    for k in (0, 2, 6):
        a = {(r["doc_id"], r["pos"]): r["r"] for r in fast[k].collect()}
        b = {(r["doc_id"], r["pos"]): r["r"] for r in slow[k].collect()}
        # grouping must match exactly (rank VALUES may differ only by
        # relabeling; with unique ranks order must match too)
        ga = sorted(sorted(kk for kk, v in a.items() if v == val)
                    for val in set(a.values()))
        gb = sorted(sorted(kk for kk, v in b.items() if v == val)
                    for val in set(b.values()))
        assert ga == gb, k
    # longest-dup is exact through the early-stopped path too
    got = {r["doc_id"]: r["max_dup_len"]
           for r in longest_dup_span_docs(df, rounds=6).collect()}
    assert got == {1: 1, 2: 1}                  # only "u1" repeats


def test_max_dup_spans_matches_python(spark, docs):
    from legend_community_delta_spark.operators.suffix import (
        max_dup_spans)
    # python reference: per position longest duplicated prefix, then
    # drop spans contained in the predecessor's span
    sufs = [(d, p + 1, tuple(ts[p:])) for d, ts in TOKS.items()
            for p in range(len(ts))]
    dl = {}
    for d, ts in TOKS.items():
        for p in range(len(ts)):
            a = ts[p:]
            best = 0
            for (dd, pp, b) in sufs:
                if (dd, pp) == (d, p + 1):
                    continue
                ln = 0
                while ln < len(a) and ln < len(b) and a[ln] == b[ln]:
                    ln += 1
                best = max(best, ln)
            dl[(d, p + 1)] = best
    for min_len in (2, 4, 9):
        ref = sorted(
            (d, p, dl[(d, p)]) for (d, p) in dl
            if dl[(d, p)] >= min_len
            and dl.get((d, p - 1), 0) < dl[(d, p)] + 1)
        got = sorted((r["doc_id"], r["start"], r["length"])
                     for r in max_dup_spans(docs, min_len=min_len,
                                            rounds=5).collect())
        assert got == ref, min_len
    # spot: doc 1's 9-token shared prefix is ONE maximal span at pos 1
    got9 = {(r["doc_id"], r["start"], r["length"])
            for r in max_dup_spans(docs, min_len=9, rounds=5).collect()}
    assert (1, 1, 9) in got9 and (2, 9, 9) in got9
    # no span is shadowed by its predecessor
    by_doc = defaultdict(list)
    for (d, s, ln) in got9:
        by_doc[d].append((s, ln))
    for spans in by_doc.values():
        spans.sort()
        for (s1, l1), (s2, l2) in zip(spans, spans[1:]):
            assert s1 + l1 - 1 < s2 + l2 - 1   # strictly extends cover


# ---------------------------------------------------------------------------
# unit="char" (round 9): Lee et al. dedup at byte/BPE granularity; the
# char unit makes intra-token duplication (markup, CJK, code) visible.
# ---------------------------------------------------------------------------

CHAR_DOCS = [
    (1, "<div class=x>hello</div> ok"),
    (2, "zz<div class=x>hello</div>!"),      # same markup, no shared token
    (3, "abcabcabcabc"),                     # intra-doc char repeats
    (4, "totally different text qq"),
    (5, ""),
]
CHAR_TOKS = {d: list(t) for d, t in CHAR_DOCS}


@pytest.fixture(scope="module")
def char_docs(spark):
    return spark.createDataFrame(CHAR_DOCS, "doc_id long, text string")


def _py_char_span_stats(n, min_count=2):
    occ = defaultdict(list)
    for d, ts in CHAR_TOKS.items():
        for s in range(len(ts) - n + 1):
            occ[tuple(ts[s:s + n])].append((d, s + 1))
    dups = {k: v for k, v in occ.items() if len(v) >= min_count}
    out = {}
    for d, ts in CHAR_TOKS.items():
        starts = {s for v in dups.values() for (dd, s) in v if dd == d}
        kept = [t for i, t in enumerate(ts)
                if not any(s <= i + 1 <= s + n - 1 for s in starts)]
        out[d] = (len(ts), len(ts) - len(kept), "".join(kept))
    return out


@pytest.mark.parametrize("n", [3, 6])
def test_char_unit_span_stats_matches_python(spark, char_docs, n):
    ref = _py_char_span_stats(n)
    got = {r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
           for r in exact_span_stats(char_docs, n=n, unit="char").collect()}
    assert got == ref


def test_char_unit_sees_intra_token_duplication(spark, char_docs):
    # docs 1 and 2 share the 24-char markup span but NO whitespace token
    # ("<div" vs "zz<div", "ok" vs "!") — token unit finds nothing to
    # remove across them, char unit removes the whole shared span
    tok = {r["doc_id"]: r["n_removed"]
           for r in exact_span_stats(char_docs, n=4).collect()}
    ch = {r["doc_id"]: r["n_removed"]
          for r in exact_span_stats(char_docs, n=4, unit="char").collect()}
    assert tok[1] == 0 and tok[2] == 0
    assert ch[1] >= 24 and ch[2] >= 24
    assert ch[4] == 0                        # unrelated doc untouched


def test_char_unit_max_dup_spans_matches_python(spark, char_docs):
    from legend_community_delta_spark.operators.suffix import max_dup_spans

    sufs = [(d, p + 1, tuple(ts[p:])) for d, ts in CHAR_TOKS.items()
            for p in range(len(ts))]
    dl = {}
    for d, ts in CHAR_TOKS.items():
        for p in range(len(ts)):
            a = ts[p:]
            best = 0
            for (dd, pp, b) in sufs:
                if (dd, pp) == (d, p + 1):
                    continue
                ln = 0
                while ln < len(a) and ln < len(b) and a[ln] == b[ln]:
                    ln += 1
                best = max(best, ln)
            dl[(d, p + 1)] = best
    for min_len in (4, 10):
        ref = sorted(
            (d, p, dl[(d, p)]) for (d, p) in dl
            if dl[(d, p)] >= min_len
            and dl.get((d, p - 1), 0) < dl[(d, p)] + 1)
        got = sorted((r["doc_id"], r["start"], r["length"])
                     for r in max_dup_spans(char_docs, min_len=min_len,
                                            rounds=5,
                                            unit="char").collect())
        assert got == ref, min_len


def test_char_unit_validation(spark, char_docs):
    with pytest.raises(ValueError, match="unit"):
        token_positions(char_docs, unit="byte")


# ---------------------------------------------------------------------------
# exact cross-corpus contamination (round 9)
# ---------------------------------------------------------------------------

def test_exact_contamination_spans_and_stats(spark):
    from legend_community_delta_spark.operators.suffix import (
        exact_contamination_spans, exact_contamination_stats)
    train = spark.createDataFrame([
        (1, "a b c d e f g h"),
        (2, "x y z a b c d q"),
    ], "doc_id long, text string")
    ev = spark.createDataFrame([
        (1, "p p a b c d w w"),      # leak; id COLLIDES with train id 1
        (9, "m m m n n n o o"),      # clean
        (10, "k k k k j j j j"),     # eval-internal dup pair — must NOT
        (11, "k k k k j j j j"),     # count as train contamination
        (12, ""),
    ], "doc_id long, text string")
    spans = sorted((r["doc_id"], r["s"], r["n_train_occ"]) for r in
                   exact_contamination_spans(train, ev, n=4).collect())
    # 'a b c d' occurs at train(1) pos 1 and train(2) pos 4 -> 2 occs;
    # the colliding eval id must still resolve to the EVAL document
    assert spans == [(1, 3, 2)]
    stats = {r["doc_id"]: (r["n_tokens"], r["n_contaminated"],
                           r["contaminated_frac"]) for r in
             exact_contamination_stats(train, ev, n=4).collect()}
    assert stats == {1: (8, 4, 0.5), 9: (8, 0, 0.0),
                     10: (8, 0, 0.0), 11: (8, 0, 0.0),
                     12: (0, 0, 0.0)}


def test_exact_contamination_char_unit(spark):
    from legend_community_delta_spark.operators.suffix import (
        exact_contamination_spans)
    train = spark.createDataFrame(
        [(1, "xx<secret token>yy")], "doc_id long, text string")
    ev = spark.createDataFrame(
        [(5, "aa<secret token>bb"), (6, "nothing shared qq")],
        "doc_id long, text string")
    # no whitespace token is shared (xx<secret vs aa<secret, token>yy vs
    # token>bb) so token-level finds nothing; char-level finds the leak
    tok = exact_contamination_spans(train, ev, n=5).count()
    ch = sorted((r["doc_id"], r["s"]) for r in
                exact_contamination_spans(train, ev, n=14,
                                          unit="char").collect())
    assert tok == 0
    assert ch == [(5, 3)]                     # '<secret token>' at pos 3


def test_exact_contamination_matches_python_reference(spark, docs):
    """Split the module corpus odd/even and pin against brute force."""
    from legend_community_delta_spark.operators.suffix import (
        exact_contamination_spans)
    train_ids = {d for d in TOKS if d % 2 == 0}
    n = 3
    train_grams = defaultdict(int)
    for d in train_ids:
        ts = TOKS[d]
        for s in range(len(ts) - n + 1):
            train_grams[tuple(ts[s:s + n])] += 1
    ref = sorted(
        (d, s + 1, train_grams[tuple(TOKS[d][s:s + n])])
        for d in TOKS if d not in train_ids
        for s in range(len(TOKS[d]) - n + 1)
        if train_grams.get(tuple(TOKS[d][s:s + n]), 0) >= 1)
    train = docs.where(F.col("doc_id") % 2 == 0)
    ev = docs.where(F.col("doc_id") % 2 == 1)
    got = sorted((r["doc_id"], r["s"], r["n_train_occ"]) for r in
                 exact_contamination_spans(train, ev, n=n).collect())
    assert got == ref


def test_exact_decontaminate_rebuilds_text(spark):
    from legend_community_delta_spark.operators.suffix import (
        exact_decontaminate)
    train = spark.createDataFrame(
        [(1, "a b c d e f")], "doc_id long, text string")
    ev = spark.createDataFrame([
        (5, "x x a b c d y"),        # leak in the middle
        (6, "clean text here"),
        (7, ""),
    ], "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           exact_decontaminate(train, ev, n=4).collect()}
    assert out[5]["clean_text"] == "x x y"
    assert out[5]["n_removed"] == 4
    assert out[6] == out[6].__class__(doc_id=6, n_tokens=3, n_removed=0,
                                      clean_text="clean text here")
    assert out[7]["n_tokens"] == 0 and out[7]["clean_text"] == ""
    # char unit: excise an intra-token leak, text rejoined with ''
    ch = {r["doc_id"]: r for r in
          exact_decontaminate(
              spark.createDataFrame([(1, "xx<k>yy")],
                                    "doc_id long, text string"),
              spark.createDataFrame([(5, "ab<k>cd")],
                                    "doc_id long, text string"),
              n=3, unit="char").collect()}
    assert ch[5]["clean_text"] == "abcd"
    assert ch[5]["n_removed"] == 3
