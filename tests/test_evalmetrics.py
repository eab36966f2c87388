"""ROUGE-N / BLEU n-gram eval metrics: hand-computed goldens + guards."""

from __future__ import annotations

import math

import pytest

from legend_community_delta_spark.operators.evalmetrics import (
    ngram_eval_metrics,
)


def _row(spark, cand, ref, n_max=2):
    df = spark.createDataFrame([(1, cand, ref)],
                               "id long, cand string, ref string")
    return ngram_eval_metrics(df, "cand", "ref", "id", n_max).collect()[0]


def test_hand_computed_bleu_rouge(spark):
    # cand: [the cat the cat], ref: [the cat sat]
    got = _row(spark, "the cat the cat", "the cat sat")
    assert got.p1 == pytest.approx(0.5)          # clip: the=1, cat=1 -> 2/4
    assert got.r1 == pytest.approx(2 / 3)
    assert got.rouge1_f1 == pytest.approx(4 / 7)
    assert got.p2 == pytest.approx(1 / 3)        # clip: "the cat"=1 -> 1/3
    assert got.r2 == pytest.approx(1 / 2)
    assert got.bp == 1.0                         # cand longer than ref
    assert got.bleu2 == pytest.approx(math.sqrt(0.5 * (1 / 3)))


def test_identical_texts_score_one(spark):
    got = _row(spark, "a b c d", "a b c d")
    assert (got.p1, got.r1, got.p2, got.r2) == (1.0, 1.0, 1.0, 1.0)
    assert got.rouge1_f1 == 1.0 and got.rouge2_f1 == 1.0
    assert got.bp == 1.0 and got.bleu2 == 1.0


def test_brevity_penalty_and_clipping(spark):
    # short candidate: bp = exp(1 - 4/2) = exp(-1)
    got = _row(spark, "a b", "a b c d")
    assert got.bp == pytest.approx(math.exp(-1))
    assert got.bleu2 == pytest.approx(math.exp(-1) * math.sqrt(1.0 * 1.0))
    # clipping: candidate repeats a token beyond the reference count
    got = _row(spark, "a a a a", "a b")
    assert got.p1 == pytest.approx(1 / 4)        # min(4 in cand, 1 in ref)


def test_zero_guards(spark):
    got = _row(spark, "", "a b")
    assert (got.p1, got.r1, got.bp, got.bleu2) == (0.0, 0.0, 0.0, 0.0)
    got = _row(spark, "a b", "")
    assert got.r1 == 0.0 and got.rouge1_f1 == 0.0
    # disjoint: everything 0, no NaN anywhere
    got = _row(spark, "a b", "c d")
    assert got.bleu2 == 0.0 and got.rouge2_f1 == 0.0


def test_no_python_udfs(spark):
    df = spark.createDataFrame([(1, "a b", "a c")],
                               "id long, cand string, ref string")
    plan = (ngram_eval_metrics(df, "cand", "ref", "id", 2)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_clip_broadcast_is_opt_in(spark):
    """ADVICE r7: the clip table is O(corpus) rows — the broadcast hint
    must be opt-in, not the default (default lets AQE pick)."""
    df = spark.createDataFrame([(1, "a b", "a c")],
                               "id long, cand string, ref string")
    default_plan = (ngram_eval_metrics(df, "cand", "ref", "id", 1)
                    ._jdf.queryExecution().optimizedPlan().toString())
    hinted_plan = (ngram_eval_metrics(df, "cand", "ref", "id", 1,
                                      broadcast_clip=True)
                   ._jdf.queryExecution().optimizedPlan().toString())
    assert "broadcast" not in default_plan.lower()
    assert "broadcast" in hinted_plan.lower()
    # same values either way
    a = ngram_eval_metrics(df, "cand", "ref", "id", 1).collect()[0]
    b = ngram_eval_metrics(df, "cand", "ref", "id", 1,
                           broadcast_clip=True).collect()[0]
    assert a == b
