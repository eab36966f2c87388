"""Text-analysis Column builders — all JVM-side expressions, no Python UDFs.

Everything here returns a ``pyspark.sql.Column`` built from built-in
functions (whole-stage codegen'd), so these run at 100 TB scale without a
Python round-trip.  They are the building blocks for the dedup and
quality-scoring operators and for `__spark_entry__` queries.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: Column | str) -> Column:
    """Whitespace tokens, empty-safe (``[]`` for blank strings)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(r"\S+"), 0)


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def unit_array(col: Column | str, unit: str = "token") -> Column:
    """Text -> array of dedup units.  ``token`` = whitespace tokens;
    ``char`` = individual characters of the RAW text (Lee et al.
    deduplicate at byte/BPE granularity — char level makes intra-token
    duplication in markup, CJK, and code visible, which whitespace
    tokens cannot see).  Shared by the hash-keyed (spans) and
    suffix-rank (suffix) dedup families so both units mean the same
    thing in both."""
    c = F.col(col) if isinstance(col, str) else col
    if unit == "token":
        return tokens(c)
    if unit == "char":
        return F.when(F.length(c) > 0, F.split(c, "")) \
            .otherwise(F.array().cast("array<string>"))
    raise ValueError(f"unit must be 'token' or 'char' [{unit}]")


def unit_joiner(unit: str) -> str:
    """Separator that reassembles a unit array into text."""
    if unit not in ("token", "char"):
        raise ValueError(f"unit must be 'token' or 'char' [{unit}]")
    return " " if unit == "token" else ""


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count: splits on whitespace AND punctuation AND
    digit/letter boundaries — a cheap, deterministic proxy for a BPE
    tokenizer's token count (useful for budget estimation at scale)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(
        c, F.lit(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"), 0))


def word_ngrams(col: Column | str, n: int) -> Column:
    """Array of space-joined word n-grams (``[]`` when fewer than n tokens)."""
    t = tokens(col)
    return F.when(F.size(t) >= n, F.transform(
        F.sequence(F.lit(1), F.size(t) - F.lit(n - 1)),
        lambda i: F.array_join(F.slice(t, i, n), " "),
    )).otherwise(F.array().cast("array<string>"))


def char_shingles(col: Column | str, k: int = 5) -> Column:
    """Array of character k-shingles of the lowercased string."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    return F.when(F.length(c) >= k, F.transform(
        F.sequence(F.lit(1), F.length(c) - F.lit(k - 1)),
        lambda i: F.substring(c, i, k),
    )).otherwise(F.array().cast("array<string>"))


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.size(F.regexp_extract_all(c, F.lit(r"[^\w\s]"), 0))
    return F.when(F.length(c) > 0,
                  n_punct.cast("double") / F.length(c)).otherwise(F.lit(0.0))


def stopword_ratio(col: Column | str, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are (English, by default) stopwords."""
    sw = stopwords or _EN_STOPWORDS
    t = F.transform(tokens(col), lambda t: F.lower(t))
    hits = F.size(F.filter(t, lambda x: x.isin(*sw)))
    return F.when(F.size(t) > 0,
                  hits.cast("double") / F.size(t)).otherwise(F.lit(0.0))


def mean_word_length(col: Column | str) -> Column:
    t = tokens(col)
    total = F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x))
    return F.when(F.size(t) > 0,
                  total.cast("double") / F.size(t)).otherwise(F.lit(0.0))


def quality_score(col: Column | str) -> Column:
    """Heuristic document quality in [0, 1]: favors moderate length,
    low punctuation density, sane mean word length, some stopwords.
    A cheap first-pass filter for pretraining corpora (C4/Gopher-style
    rules re-expressed as one Column)."""
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(c).cast("double")
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))             # >=50 tokens
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(c) * 4)
    mwl = mean_word_length(c)
    word_score = F.when((mwl >= 2.0) & (mwl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.3))
    # NULL text is minimum quality, not an accidental 0.77: least/greatest
    # SKIP null args, so without the guard the null-propagating components
    # silently drop out of the average and a NULL doc outscores real text
    return F.when(c.isNull(), F.lit(0.0)).otherwise(
        F.round((len_score + punct_pen + word_score) / F.lit(3.0), 6))


def content_hash(col: Column | str) -> Column:
    """64-bit content fingerprint of normalized text (exact-dup key)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(F.lower(F.trim(F.regexp_replace(c, r"\s+", " "))))


def winnow_fingerprint(col: Column | str, k: int = 8, keep: int = 4) -> Column:
    """Rolling-hash document fingerprint: the *keep* smallest k-shingle
    hashes, sorted — a compact near-dup signature (winnowing-style)."""
    hashes = F.transform(char_shingles(col, k), lambda s: F.xxhash64(s))
    return F.slice(F.array_sort(hashes), 1, keep)


# PII patterns kept to syntax with identical semantics in Java regex and
# RE2 (no lookaround, explicit classes) so metrics can be oracle-checked
_PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def redact_pii(col: Column | str, token: str = "[PII]",
               kinds: list[str] | None = None) -> Column:
    """Replace email/phone/SSN/IPv4-looking substrings with *token*.

    Pure ``regexp_replace`` chain — narrow, codegen'd, runs at scan
    speed; the pre-tokenization scrub a pretraining pipeline applies
    before anything else sees the text."""
    c = F.col(col) if isinstance(col, str) else col
    for kind in (kinds or list(_PII_PATTERNS)):
        c = F.regexp_replace(c, _PII_PATTERNS[kind], token)
    return c


def pii_counts(col: Column | str) -> Column:
    """Struct of per-kind PII match counts (for corpus audit metrics)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.struct(*[
        F.size(F.regexp_extract_all(c, F.lit(p), 0)).alias(kind)
        for kind, p in _PII_PATTERNS.items()])


def language_id(col: Column | str) -> Column:
    """Heuristic language ID over common-word hits: returns the language
    whose marker-word list intersects the token set the most
    ('en','de','fr','es','zh' subset; 'und' when nothing matches).

    Character-range n-gram heuristics handle zh; everything stays in
    Column algebra so it runs at scan speed.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = F.transform(tokens(c), lambda t: F.lower(t))
    scores = []
    for lang, words in _LANG_MARKERS.items():
        scores.append(F.struct(
            F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
            .alias("score"),
            F.lit(lang).alias("lang")))
    # CJK detection by codepoint range beats word lists
    cjk = F.size(F.regexp_extract_all(c, F.lit(r"[一-鿿]"), 0))
    best = F.array_max(F.array(*scores))
    return (F.when(cjk > 0, F.lit("zh"))
            .when(best["score"] > 0, best["lang"])
            .otherwise(F.lit("und")))


_EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "was", "at", "by", "be", "this", "are",
]

_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "that", "with", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "la", "les", "et", "est", "dans", "pour", "une"],
    "es": ["el", "los", "las", "es", "en", "por", "para", "una"],
}
