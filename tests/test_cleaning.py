"""C4 line-level cleaning + Gopher document gates (operators/cleaning.py).

Constructed realistic text pins every published rule exactly; the
fixture-level Spark<->DuckDB parity runs in the driver contract
(c4_clean_docs / gopher_gates_docs entries in demo.py).
"""

from __future__ import annotations

import pytest

from legend_community_delta_spark.operators.cleaning import (
    c4_clean,
    gopher_gates,
)


@pytest.fixture(scope="module")
def c4_docs(spark):
    rows = [
        # normal page: 2 good lines + 1 short line + 1 no-punct line
        (1, "This is a perfectly normal sentence with many words.\n"
            "Too short.\n"
            "this line has plenty of words but no terminal punctuation\n"
            "Another good line follows here with enough words too!"),
        # javascript line dropped, rest fine (3 sentences)
        (2, "Please enable javascript to view this page properly okay.\n"
            "Real content sentence number one is right here today.\n"
            "Real content sentence number two is right here today.\n"
            "Real content sentence number three is right here today."),
        # lorem ipsum page: dropped wholesale
        (3, "Lorem ipsum dolor sit amet consectetur adipiscing elit sed.\n"
            "This other sentence would have been fine on its own."),
        # code page: brace drops the whole doc
        (4, "A fine first sentence with more than five words here.\n"
            "function f() { return 1; } and some trailing words here."),
        # too few sentences after cleaning
        (5, "Only one good sentence lives in this document body."),
        # empty-ish
        (6, ""),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_c4_line_rules(spark, c4_docs):
    out = {r["doc_id"]: r for r in c4_clean(c4_docs).collect()}
    # doc 1: 4 lines, 2 kept (short + unpunctuated dropped)
    assert out[1]["n_lines"] == 4 and out[1]["n_kept_lines"] == 2
    assert "Too short." not in out[1]["clean_text"]
    assert "no terminal punctuation" not in out[1]["clean_text"]
    # doc 2: javascript line dropped even though it ends in '.'
    assert out[2]["n_kept_lines"] == 3
    assert "javascript" not in out[2]["clean_text"]


def test_c4_doc_rules(spark, c4_docs):
    out = {r["doc_id"]: r for r in c4_clean(c4_docs).collect()}
    assert out[1]["keep_doc"] is False          # only 2 sentences kept
    assert out[2]["keep_doc"] is True           # 3 clean sentences
    assert out[3]["has_blocklist"] is True and not out[3]["keep_doc"]
    assert out[4]["has_brace"] is True and not out[4]["keep_doc"]
    assert out[5]["keep_doc"] is False          # < 3 sentences
    assert out[6]["n_kept_lines"] == 0 and not out[6]["keep_doc"]


def test_c4_relaxed_punct_mode(spark, c4_docs):
    out = {r["doc_id"]: r
           for r in c4_clean(c4_docs, require_terminal_punct=False,
                             min_sentences=0).collect()}
    # the unpunctuated long line now survives
    assert out[1]["n_kept_lines"] == 3
    assert out[1]["keep_doc"] is True


def test_c4_plan_is_udf_free(spark, c4_docs):
    plan = c4_clean(c4_docs)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


@pytest.fixture(scope="module")
def gopher_docs(spark):
    the_fifty = ("the quick brown fox jumps over the lazy dog and "
                 "that dog will have to be happy with all of this " * 5)
    rows = [
        (1, the_fifty + "final words here now"),          # passes all
        (2, "short doc with the and of that"),            # too few words
        (3, " ".join(["supercalifragilistic"] * 60)),     # mean len + stops
        (4, the_fifty + " ".join(["####"] * 30)),         # symbol ratio
        (5, "\n".join(["- bullet line item"] * 10)),      # bullets
        (6, the_fifty + " ".join(["1234567"] * 40)),      # alpha frac
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_gopher_each_gate_fires(spark, gopher_docs):
    out = {r["doc_id"]: r for r in gopher_gates(gopher_docs).collect()}
    assert out[1]["keep_doc"] is True
    assert out[2]["ok_word_count"] is False and not out[2]["keep_doc"]
    assert out[3]["ok_mean_word_len"] is False
    assert out[3]["ok_stopwords"] is False
    assert out[4]["ok_symbol_ratio"] is False
    assert out[5]["ok_bullets"] is False
    assert out[6]["ok_alpha_words"] is False


def test_gopher_metrics_exact(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat ... on the mat #tag")],
        "doc_id int, text string")
    r = gopher_gates(df).collect()[0]
    assert r["n_words"] == 8
    # chars: 3+3+3+3+2+3+3+4 = 24 -> 3.0
    assert r["mean_word_len"] == 3.0
    # one '...' + one '#' over 8 words = 0.25
    assert r["symbol_word_ratio"] == 0.25
    # distinct stopword hits: 'the' only -> 1
    assert r["stopword_hits"] == 1
    assert r["ok_stopwords"] is False


def test_gopher_stopword_distinctness(spark):
    # 'the' twice is ONE distinct hit; 'the' + 'of' is two
    df = spark.createDataFrame(
        [(1, "the the word word"), (2, "the of word word")],
        "doc_id int, text string")
    out = {r["doc_id"]: r["stopword_hits"]
           for r in gopher_gates(df).collect()}
    assert out == {1: 1, 2: 2}


def test_gopher_plan_is_udf_free(spark, gopher_docs):
    plan = gopher_gates(gopher_docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
