"""Duplicate-span removal (operators/spans.py) — fixtures + plan pins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from legend_community_delta_spark.operators.spans import (
    dedup_spans,
    duplicate_span_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


SHARED = "a b c d e f g h i j"  # 10 tokens, duplicated across docs 1/2


@pytest.fixture(scope="module")
def corpus(spark):
    return _docs(
        spark,
        [
            (1, SHARED + " unique1 tail1"),
            (2, SHARED + " unique2 tail2"),
            (3, "totally different words only here once now ok fine yes"),
            (4, "short doc"),  # shorter than n — untouched
            (5, ""),  # empty — untouched
        ],
    )


def test_shared_span_removed_unique_tail_kept(spark, corpus):
    out = {
        r["doc_id"]: r
        for r in duplicate_span_stats(corpus, n=10).collect()
    }
    # Docs 1/2 share exactly one 10-token window (positions 1..10);
    # those tokens go, the unique tails stay.
    assert out[1]["clean_text"] == "unique1 tail1"
    assert out[2]["clean_text"] == "unique2 tail2"
    assert out[1]["n_removed"] == 10 and out[1]["n_tokens"] == 12
    # Unique doc untouched.
    assert out[3]["n_removed"] == 0
    assert out[3]["clean_text"].startswith("totally different")
    # Shorter-than-n and empty docs never touched.
    assert out[4]["n_removed"] == 0 and out[4]["clean_text"] == "short doc"
    assert out[5]["n_tokens"] == 0 and out[5]["clean_text"] == ""


def test_overlapping_windows_union_cover(spark):
    # Docs share an 11-token run -> two overlapping 10-windows; the cover
    # is their union (all 11 tokens), not double-counted.
    run = "a b c d e f g h i j k"
    df = _docs(spark, [(1, run + " x1"), (2, run + " x2")])
    out = {r["doc_id"]: r for r in duplicate_span_stats(df, n=10).collect()}
    assert out[1]["n_removed"] == 11
    assert out[1]["clean_text"] == "x1"


def test_self_repetition_counts_globally(spark):
    # One doc repeating its own 10-gram twice trips min_count=2 alone.
    df = _docs(spark, [(1, SHARED + " " + SHARED), (2, "other words")])
    out = {r["doc_id"]: r for r in duplicate_span_stats(df, n=10).collect()}
    assert out[1]["n_removed"] == 20 and out[1]["clean_text"] == ""
    assert out[2]["n_removed"] == 0


def test_min_count_three_requires_three_copies(spark, corpus):
    out = {
        r["doc_id"]: r["n_removed"]
        for r in duplicate_span_stats(corpus, n=10, min_count=3).collect()
    }
    assert all(v == 0 for v in out.values())


def test_dedup_spans_rewrites_and_drops_empty(spark):
    df = _docs(
        spark,
        [(1, SHARED + " keepme"), (2, SHARED + " metoo"), (3, SHARED)],
    ).withColumn("lang", F.lit("en"))
    out = dedup_spans(df, n=10)
    rows = {r["doc_id"]: r for r in out.collect()}
    # Doc 3 became empty and was dropped; passthrough column survives.
    assert set(rows) == {1, 2}
    assert rows[1]["text"] == "keepme" and rows[1]["lang"] == "en"
    kept_all = dedup_spans(df, n=10, drop_empty=False)
    assert kept_all.count() == 3


def test_validation(spark, corpus):
    with pytest.raises(ValueError):
        duplicate_span_stats(corpus, n=0)
    with pytest.raises(ValueError):
        duplicate_span_stats(corpus, min_count=1)


def test_plan_no_udf_and_hashed_shuffle(spark, corpus):
    plan = duplicate_span_stats(corpus, n=10)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # The wide stages key on the xxhash64 long, not the gram string.
    assert "xxhash64" in plan


# ---------------------------------------------------------------------------
# persisted span store + incremental removal
# ---------------------------------------------------------------------------

def test_incremental_equals_batch_on_union(spark, tmp_path):
    from legend_community_delta_spark.operators.spans import (
        incremental_dup_spans, write_span_store)
    hist = _docs(spark, [(1, SHARED + " old1"), (3, "nothing shared here")])
    new = _docs(spark, [(10, SHARED + " new1"), (11, "fresh unique words")])
    path = str(tmp_path / "store")
    write_span_store(hist, path, n=10)
    inc = {r["doc_id"]: r for r in
           incremental_dup_spans(spark, path, new).collect()}
    # batch over the union, restricted to the new ids, must agree
    batch = {r["doc_id"]: r for r in
             duplicate_span_stats(hist.union(new), n=10).collect()
             if r["doc_id"] >= 10}
    assert set(inc) == set(batch) == {10, 11}
    for k in inc:
        assert inc[k]["n_removed"] == batch[k]["n_removed"]
        assert inc[k]["clean_text"] == batch[k]["clean_text"]
    # the shared 10-gram appears once in store + once in batch -> removed
    assert inc[10]["clean_text"] == "new1"
    assert inc[11]["n_removed"] == 0


def test_span_store_append_merges_counts(spark, tmp_path):
    from legend_community_delta_spark.operators.spans import (
        incremental_dup_spans, write_span_store)
    path = str(tmp_path / "store")
    # the duplicated window is split across two appends: each store batch
    # holds ONE copy, so only the merged counts can flag it
    write_span_store(_docs(spark, [(1, SHARED + " a1")]), path, n=10)
    write_span_store(_docs(spark, [(2, SHARED + " a2")]), path, n=10,
                     mode="append")
    new = _docs(spark, [(10, "totally fresh text with no overlap")])
    out = {r["doc_id"]: r for r in
           incremental_dup_spans(spark, path, new, min_count=2).collect()}
    assert out[10]["n_removed"] == 0
    # a new doc repeating the stored window IS flagged (store already >= 2)
    out2 = {r["doc_id"]: r["n_removed"] for r in
            incremental_dup_spans(
                spark, path, _docs(spark, [(20, SHARED + " n2")])).collect()}
    assert out2[20] == 10


def test_span_store_unique_flag_gates_reaggregation(spark, tmp_path):
    """r12: an overwrite-written store certifies unique gh keys in its
    __meta footer (readers skip the re-agg exchange); any append flips
    the flag back to the conservative merge path.  Results must be
    identical either way."""
    from legend_community_delta_spark.operators.spans import (
        incremental_dup_spans, write_span_store)
    path = str(tmp_path / "store")
    write_span_store(_docs(spark, [(1, SHARED + " a1")]), path, n=10)
    meta = spark.read.parquet(f"{path}__meta").first()
    assert meta["unique"] is True
    # fast path: store count 1 + batch count 1 reaches min_count=2
    out = {r["doc_id"]: r["n_removed"] for r in
           incremental_dup_spans(
               spark, path, _docs(spark, [(20, SHARED + " n2")])).collect()}
    assert out[20] == 10
    write_span_store(_docs(spark, [(2, SHARED + " a2")]), path, n=10,
                     mode="append")
    meta = spark.read.parquet(f"{path}__meta").first()
    assert meta["unique"] is False
    # merge path still agrees after the append doubled the store count
    out2 = {r["doc_id"]: r["n_removed"] for r in
            incremental_dup_spans(
                spark, path, _docs(spark, [(21, SHARED + " n3")])).collect()}
    assert out2[21] == 10


def test_span_store_ignore_mode_preserves_append_meta(spark, tmp_path):
    """ADVICE r12: mode='ignore' on an existing path skips the data
    write, so the __meta footer must not be re-certified unique=True —
    an appended store would otherwise take the skip-reaggregation fast
    path over duplicate gh rows.  On a FRESH path ignore behaves like a
    create and may certify unique."""
    from legend_community_delta_spark.operators.spans import write_span_store
    path = str(tmp_path / "store")
    write_span_store(_docs(spark, [(1, SHARED + " a1")]), path, n=10)
    write_span_store(_docs(spark, [(2, SHARED + " a2")]), path, n=10,
                     mode="append")
    assert spark.read.parquet(f"{path}__meta").first()["unique"] is False
    # ignore on the existing path: data write skipped, meta untouched
    write_span_store(_docs(spark, [(3, SHARED + " a3")]), path, n=10,
                     mode="ignore")
    assert spark.read.parquet(f"{path}__meta").first()["unique"] is False
    # ignore on a fresh path: the write happened, unique is certified
    fresh = str(tmp_path / "fresh")
    write_span_store(_docs(spark, [(1, SHARED + " a1")]), fresh, n=10,
                     mode="ignore")
    assert spark.read.parquet(f"{fresh}__meta").first()["unique"] is True


def test_span_store_width_mismatch_refused(spark, tmp_path):
    from legend_community_delta_spark.operators.spans import write_span_store
    path = str(tmp_path / "store")
    write_span_store(_docs(spark, [(1, SHARED)]), path, n=10)
    with pytest.raises(ValueError):
        write_span_store(_docs(spark, [(2, SHARED)]), path, n=12,
                         mode="append")


# -- round-6: within-document repeated-window removal ----------------------

def test_intra_doc_dup_spans_hand_cases(spark):
    from legend_community_delta_spark.operators.spans import (
        intra_doc_dup_spans)
    rows = [
        (1, "a b c a b c a b c"),   # chained repeat: keep first copy
        (2, "a a a a a"),           # overlapping self-repeat, n=2
        (3, "x y z"),               # no repeats
        (4, "p q r p q"),           # repeated window 'p q' at 4 (1+3)
        (5, ""),                    # empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.n_removed, r.clean_text)
           for r in intra_doc_dup_spans(df, n=2).collect()}
    # doc 1: windows 'a b','b c','c a' repeat at non-overlapping starts;
    # greedy cover keeps only the first 2-token window's span
    assert got[3] == (3, 0, "x y z")
    assert got[5] == (0, 0, "")
    # doc 2: 'a a' at 3 (<=1+2? 3-2=1 -> window1) and 4 removable
    assert got[2] == (5, 3, "a a")
    # doc 4: 'p q' repeats at start 4 = 1+3 >= 1+n: removable
    assert got[4] == (5, 2, "p q r")
    # doc 1: all windows starting at 4.. are covered by earlier copies
    assert got[1][0] == 9 and got[1][2].startswith("a b c")
    assert got[1][1] >= 6  # both later copies removed


def test_intra_doc_dup_spans_n3_matches_reference(spark):
    from legend_community_delta_spark.operators.spans import (
        intra_doc_dup_spans)

    def ref(text, n):
        toks = text.split()
        m = max(len(toks) - n + 1, 0)
        wins = [" ".join(toks[i:i + n]) for i in range(m)]
        rem = [i for i in range(m)
               if any(wins[j] == wins[i] for j in range(0, max(i - n + 1, 0)))]
        keep = [p for p in range(len(toks))
                if not any(s <= p <= s + n - 1 for s in rem)]
        return (len(toks), len(toks) - len(keep),
                " ".join(toks[p] for p in keep))

    import random
    rng = random.Random(99)
    rows = []
    for i in range(40):
        words = [rng.choice("abcde") for _ in range(rng.randint(0, 30))]
        rows.append((i, " ".join(words)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.n_removed, r.clean_text)
           for r in intra_doc_dup_spans(df, n=3).collect()}
    for i, text in rows:
        assert got[i] == ref(text, 3), (i, text)


def test_intra_doc_dup_spans_plan_is_map_only(spark):
    from legend_community_delta_spark.operators.spans import (
        intra_doc_dup_spans)
    df = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
    plan = intra_doc_dup_spans(df, n=2)._jdf.queryExecution(
        ).explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    assert "Exchange" not in plan        # zero shuffles
    assert "EvalPython" not in plan      # zero Python


# -- round-9: unit="char" on the hash-keyed family -------------------------

def test_char_unit_agrees_with_suffix_exact_twin(spark):
    """Cross-family consistency: the hash-keyed cover at unit='char'
    must produce the same spans as the collision-free suffix-rank twin
    on the same corpus (hash collisions are impossible at this size)."""
    from legend_community_delta_spark.operators.suffix import (
        exact_span_stats)
    docs = _docs(spark, [
        (1, "<div class=x>hello</div> ok"),
        (2, "zz<div class=x>hello</div>!"),
        (3, "abcabcabcabc"),
        (4, "no overlap at all here qq"),
    ])
    a = {r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
         for r in duplicate_span_stats(docs, n=6, unit="char").collect()}
    b = {r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
         for r in exact_span_stats(docs, n=6, unit="char").collect()}
    assert a == b
    assert a[1][1] >= 24                 # the shared markup span went
    assert a[4][1] == 0


def test_char_unit_incremental_reads_unit_from_store(spark, tmp_path):
    from legend_community_delta_spark.operators.spans import (
        incremental_dup_spans, write_span_store)
    path = str(tmp_path / "cstore")
    hist = _docs(spark, [(1, "xx<span>boilerplate</span>yy")])
    write_span_store(hist, path, n=8, unit="char")
    new = _docs(spark, [(10, "qq<span>boilerplate</span>ww")])
    out = {r["doc_id"]: r for r in
           incremental_dup_spans(spark, path, new).collect()}
    # the shared char windows (store 1 + batch 1 = 2) are removed even
    # though the docs share no whitespace token
    assert out[10]["n_removed"] >= 24
    assert "boilerplate" not in out[10]["clean_text"]


def test_char_unit_store_mismatch_refused(spark, tmp_path):
    from legend_community_delta_spark.operators.spans import write_span_store
    path = str(tmp_path / "mstore")
    write_span_store(_docs(spark, [(1, SHARED)]), path, n=10, unit="token")
    with pytest.raises(ValueError, match="unit"):
        write_span_store(_docs(spark, [(2, SHARED)]), path, n=10,
                         mode="append", unit="char")


def test_pre_unit_store_defaults_to_token(spark, tmp_path):
    """Stores written before the unit column existed (footer = n only)
    must keep reading as token-built."""
    from legend_community_delta_spark.operators.spans import (
        incremental_dup_spans, _window_grams)
    from legend_community_delta_spark.functions import text as TX
    path = str(tmp_path / "oldstore")
    hist = _docs(spark, [(1, SHARED + " old1")])
    base = hist.select(F.col("doc_id"), TX.tokens(F.col("text"))
                       .alias("__toks"))
    (_window_grams(base, "doc_id", 10)
     .groupBy("gh").agg(F.count(F.lit(1)).alias("cnt"))
     .write.mode("overwrite").parquet(path))
    spark.createDataFrame([(10,)], "n int") \
        .coalesce(1).write.mode("overwrite").parquet(f"{path}__meta")
    new = _docs(spark, [(10, SHARED + " new1")])
    out = {r["doc_id"]: r for r in
           incremental_dup_spans(spark, path, new).collect()}
    assert out[10]["clean_text"] == "new1"


def test_intra_doc_char_unit(spark):
    from legend_community_delta_spark.operators.spans import (
        intra_doc_dup_spans)
    docs = _docs(spark, [(1, "abcdefabcdef"), (2, "xyzw")])
    out = {r["doc_id"]: r for r in
           intra_doc_dup_spans(docs, n=6, unit="char").collect()}
    # the second abcdef repeats the first at distance n -> removed
    assert out[1]["clean_text"] == "abcdef"
    assert out[1]["n_removed"] == 6
    assert out[2]["n_removed"] == 0
