"""Governance operators: k-anonymity report/suppression, Benford."""

from __future__ import annotations

import math

import pytest

from legend_community_delta_spark.operators.governance import (
    benford_report,
    k_anonymity_report,
    suppress_small_groups,
)


def test_k_anonymity_report_hand_computed(spark):
    rows = [("en", "a")] * 5 + [("en", "b")] * 2 + [("fr", "a")] * 1 \
        + [(None, "a")] * 3
    df = spark.createDataFrame(rows, "lang string, source string")
    got = k_anonymity_report(df, ["lang", "source"], k=3).collect()[0]
    assert (got.k, got.n_rows, got.n_groups) == (3, 11, 4)
    assert got.violating_groups == 2        # ("en","b")=2, ("fr","a")=1
    assert got.at_risk_rows == 3
    assert got.min_group_size == 1


def test_suppress_small_groups_enforces_k(spark):
    rows = [("en", "a", i) for i in range(5)] + \
        [("en", "b", 10), ("fr", "a", 11)]
    df = spark.createDataFrame(rows, "lang string, source string, id long")
    out = suppress_small_groups(df, ["lang", "source"], k=3)
    assert sorted(r.id for r in out.collect()) == [0, 1, 2, 3, 4]
    # post-condition: the suppressed set is k-anonymous
    rep = k_anonymity_report(out, ["lang", "source"], k=3).collect()[0]
    assert rep.violating_groups == 0
    with pytest.raises(ValueError):
        suppress_small_groups(df, ["lang"], k=1)


def test_suppress_small_groups_null_group_kept(spark):
    """Mirror of the report test: a NULL quasi-identifier combination
    covering >= k rows is its own group and must be KEPT by suppression
    (regression: a plain equi-join semi-join dropped every NULL row)."""
    rows = [(None, "a", i) for i in range(3)] + \
        [("en", None, 10 + i) for i in range(3)] + \
        [(None, None, 20), ("fr", "a", 21)]
    df = spark.createDataFrame(rows, "lang string, source string, id long")
    out = suppress_small_groups(df, ["lang", "source"], k=3)
    # NULL groups of size 3 survive; (None,None)=1 and ("fr","a")=1 drop
    assert sorted(r.id for r in out.collect()) == [0, 1, 2, 10, 11, 12]
    # report agrees: enforcement output is k-anonymous
    rep = k_anonymity_report(out, ["lang", "source"], k=3).collect()[0]
    assert rep.violating_groups == 0 and rep.n_rows == 6


def test_benford_report_hand_computed(spark):
    # 1x 123.4, 2x 0.0045 (digit 4), 1x 9000.0, one NULL, one negative
    df = spark.createDataFrame(
        [(123.4,), (0.0045,), (0.0045,), (9000.0,), (None,), (-5.0,)],
        "v double")
    got = {r.digit: r for r in benford_report(df, "v").collect()}
    assert set(got) == set(range(1, 10))
    assert got[1].n == 1 and got[4].n == 2 and got[9].n == 1
    assert got[2].n == 0                     # absent digit present as 0
    assert got[1].expected_p == round(math.log10(2), 6)
    # observed_p sums to 1 over the 4 counted rows
    assert sum(r.n for r in got.values()) == 4
    assert got[4].observed_p == 0.5
    # chi2 term for an absent digit = expected count
    t = 4
    assert got[2].chi2_term == round(math.log10(1.5) * t, 6)


def test_reconcile_tables_hand_computed(spark):
    from pyspark.sql import Row
    left = spark.createDataFrame([
        Row(k=1, v="a", w=1.0),
        Row(k=2, v="b", w=None),      # NULL matches NULL
        Row(k=3, v="c", w=3.0),      # changed in right
        Row(k=4, v="d", w=4.0),      # missing in right
        Row(k=5, v=None, w=5.0),    # NULL -> value = changed
    ])
    right = spark.createDataFrame([
        Row(k=1, v="a", w=1.0),
        Row(k=2, v="b", w=None),
        Row(k=3, v="c", w=30.0),
        Row(k=5, v="x", w=5.0),
        Row(k=6, v="e", w=6.0),      # missing in left
    ])
    from legend_community_delta_spark.operators.governance import (
        reconcile_tables)
    got = {r.status: r.n_rows
           for r in reconcile_tables(left, right, ["k"]).collect()}
    assert got == {"matched": 2, "changed": 2,
                   "only_left": 1, "only_right": 1}
    # restricting compare_cols flips the NULL->value row to matched
    got2 = {r.status: r.n_rows
            for r in reconcile_tables(left, right, ["k"],
                                      ["w"]).collect()}
    assert got2 == {"matched": 3, "changed": 1,
                    "only_left": 1, "only_right": 1}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        reconcile_tables(left, right, [])


def test_scd2_history_hand_computed(spark):
    from pyspark.sql import Row
    from legend_community_delta_spark.operators.governance import (
        scd2_history)
    rows = [
        Row(k=1, ts=1, s="A"), Row(k=1, ts=2, s="A"),   # noop
        Row(k=1, ts=3, s="B"), Row(k=1, ts=4, s="A"),   # real changes
        Row(k=1, ts=5, s="A"),                            # noop
        Row(k=2, ts=1, s="X"),
        Row(k=3, ts=1, s=None), Row(k=3, ts=2, s=None),  # NULL noop
        Row(k=3, ts=3, s="Y"),
    ]
    df = spark.createDataFrame(rows, "k long, ts long, s string")
    got = sorted(((r.k, r.s, r.valid_from, r.valid_to, r.is_current)
                  for r in scd2_history(df, ["k"], "ts",
                                        ["s"]).collect()),
                 key=lambda t: (t[0], t[1] or "", t[2]))
    assert got == [
        (1, "A", 1, 3, False), (1, "A", 4, None, True),
        (1, "B", 3, 4, False),
        (2, "X", 1, None, True),
        (3, None, 1, 3, False), (3, "Y", 3, None, True),
    ]  # (3, None) sorts first via the ''-coalesced key
    # intervals are half-open and gapless per key
    per_k = {}
    for k, s, vf, vt, cur in got:
        per_k.setdefault(k, []).append((vf, vt))
    for k, iv in per_k.items():
        iv.sort()
        for (a, b), (c, d) in zip(iv, iv[1:]):
            assert b == c, (k, iv)
    # collapse off: every change row becomes a version
    raw = scd2_history(df, ["k"], "ts", ["s"],
                       collapse_noops=False).count()
    assert raw == len(rows)


def test_gini_hand_computed_and_bounds(spark):
    from legend_community_delta_spark.operators.governance import (
        gini_by_group)
    # equal mass -> 0; all mass on one row of n -> (n-1)/n
    df = spark.createDataFrame(
        [("even", 5.0), ("even", 5.0), ("even", 5.0), ("even", 5.0),
         ("skew", 0.0), ("skew", 0.0), ("skew", 0.0), ("skew", 12.0),
         ("pair", 1.0), ("pair", 3.0)],
        "g string, v double")
    got = {r.g: (r.n, r.gini)
           for r in gini_by_group(df, "v", ["g"]).collect()}
    assert got["even"] == (4, 0.0)
    assert got["skew"] == (4, round(3 / 4, 6))
    # hand: sorted [1,3]: G = 2*(1*1+2*3)/(2*4) - 3/2 = 14/8 - 1.5
    assert got["pair"] == (2, round(14 / 8 - 1.5, 6))
    # ungrouped path
    tot = gini_by_group(df, "v").collect()[0]
    assert tot.n == 10 and 0.0 <= tot.gini < 1.0
