"""Differential fuzz: duplicate_span_stats vs a pure-Python reference.

The Spark plan (hash counts + flagged-start collect + array rebuild) and
an obviously-correct quadratic Python implementation must agree on small
random corpora drawn from a tiny vocabulary (tiny vocab forces window
collisions, the interesting regime).
"""

from __future__ import annotations

import random

from legend_community_delta_spark.operators.spans import (
    duplicate_span_stats,
)

VOCAB = ["a", "b", "c", "d"]


def _reference(docs: dict[int, str], n: int, min_count: int) -> dict:
    toks = {i: t.split() for i, t in docs.items()}
    counts: dict[tuple, int] = {}
    for ts in toks.values():
        for s in range(len(ts) - n + 1):
            g = tuple(ts[s:s + n])
            counts[g] = counts.get(g, 0) + 1
    out = {}
    for i, ts in toks.items():
        covered = set()
        for s in range(len(ts) - n + 1):
            if counts[tuple(ts[s:s + n])] >= min_count:
                covered.update(range(s, s + n))
        kept = [t for p, t in enumerate(ts) if p not in covered]
        out[i] = (len(ts), len(ts) - len(kept), " ".join(kept))
    return out


def test_span_removal_matches_reference_on_random_corpora(spark):
    rng = random.Random(42)
    for trial in range(8):
        n = rng.choice([2, 3, 4])
        docs = {
            i: " ".join(rng.choice(VOCAB)
                        for _ in range(rng.randint(0, 12)))
            for i in range(rng.randint(2, 8))
        }
        df = spark.createDataFrame(list(docs.items()),
                                   "doc_id long, text string")
        got = {r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
               for r in duplicate_span_stats(df, n=n).collect()}
        want = _reference(docs, n, 2)
        assert got == want, (
            f"trial {trial}: n={n} docs={docs}\n got={got}\nwant={want}")
