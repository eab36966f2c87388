"""Named web-corpus cleaning rules: C4 line-level cleaning and
Gopher/MassiveText document-quality gates.

Two published rule families a pretraining pipeline runs before any
model-based filtering (both are public-paper specifications):

* **C4** (Raffel et al. 2020, "Exploring the Limits of Transfer
  Learning", §2.2): keep only lines that end in terminal punctuation
  and have >= 5 words; drop lines containing "javascript" or policy
  boilerplate; drop any page containing "{", "lorem ipsum", or fewer
  than 3 sentences after line filtering.
* **Gopher** (Rae et al. 2021, "Scaling Language Models", table A1):
  document gates on word count, mean word length, symbol-to-word
  ratio, bullet/ellipsis line fractions, alphabetic-word fraction,
  and minimum stop-word hits.

Everything is pure Column algebra (split / filter / aggregate /
regexp) — no UDFs, fully pushdown-friendly, and each rule is exactly
reproducible in ANSI SQL so the whole family is value-oracle-able.
Every gate is a named boolean column; the keep decision is their
conjunction, so a pipeline can audit WHICH rule dropped a document
(the same provenance idea as curation.curate_provenance).

Scale: one narrow projection per document — no shuffle at all until
the caller aggregates; at 100 TB this runs at scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["c4_clean", "gopher_gates", "C4_BLOCKLIST", "GOPHER_STOPWORDS"]

# C4 §2.2: "curly bracket", "lorem ipsum", and the policy phrases from
# the paper's page-level rules.
C4_BLOCKLIST = ("lorem ipsum", "terms of use", "privacy policy",
                "cookie policy", "uses cookies", "use of cookies")

# Gopher table A1 names exactly this stop-word list ("the, be, to, of,
# and, that, have, with") and requires >= 2 hits.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have",
                    "with")


def _words(col: Column) -> Column:
    return F.filter(F.split(col, r"\s+"), lambda w: w != "")


def c4_clean(df: DataFrame, text_col: str = "text",
             id_col: str = "doc_id",
             min_words_per_line: int = 5,
             min_sentences: int = 3,
             require_terminal_punct: bool = True,
             blocklist: tuple[str, ...] = C4_BLOCKLIST,
             line_blocklist: tuple[str, ...] = ("javascript",),
             line_sep: str = "\n") -> DataFrame:
    """C4 line-level cleaning: ``(id, n_lines, n_kept_lines,
    n_sentences, has_blocklist, has_brace, keep_doc, clean_text)``.

    Line rules (each kept line must pass ALL):
    * >= *min_words_per_line* whitespace words;
    * ends in terminal punctuation (``. ! ? "`` — C4's rule), unless
      ``require_terminal_punct=False`` (for corpora without
      punctuation conventions);
    * mentions none of *line_blocklist* (case-insensitive).

    Document rules (``keep_doc``):
    * no "{" anywhere (C4 drops pages with code braces);
    * none of *blocklist* anywhere (case-insensitive);
    * >= *min_sentences* sentence enders (``. ! ?``) in the KEPT text.

    ``clean_text`` joins the kept lines with *line_sep* — dropped
    documents still carry their cleaned text so callers can audit.
    """
    text = F.col(text_col)
    lines = F.split(text, F.lit(line_sep), -1)

    def line_ok(line: Column) -> Column:
        ok = F.size(_words(line)) >= min_words_per_line
        if require_terminal_punct:
            ok = ok & line.rlike(r'[.!?"]\s*$')
        low = F.lower(line)
        for term in line_blocklist:
            ok = ok & ~low.contains(F.lit(term.lower()))
        return ok

    kept = F.filter(lines, line_ok)
    clean = F.array_join(kept, line_sep)
    low_text = F.lower(text)
    has_block = F.lit(False)
    for term in blocklist:
        has_block = has_block | low_text.contains(F.lit(term.lower()))
    has_brace = text.contains(F.lit("{"))
    n_sent = F.length(clean) - F.length(
        F.regexp_replace(clean, r"[.!?]", ""))
    out = df.select(
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept_lines"),
        n_sent.alias("n_sentences"),
        has_block.alias("has_blocklist"),
        has_brace.alias("has_brace"),
        clean.alias("clean_text"),
    )
    keep = ((F.col("n_kept_lines") > 0)
            & (F.col("n_sentences") >= F.lit(min_sentences))
            & ~F.col("has_blocklist") & ~F.col("has_brace"))
    return out.withColumn("keep_doc", keep).select(
        id_col, "n_lines", "n_kept_lines", "n_sentences",
        "has_blocklist", "has_brace", "keep_doc", "clean_text")


def gopher_gates(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id",
                 min_words: int = 50, max_words: int = 100_000,
                 min_mean_word_len: float = 3.0,
                 max_mean_word_len: float = 10.0,
                 max_symbol_word_ratio: float = 0.1,
                 max_bullet_frac: float = 0.9,
                 max_ellipsis_frac: float = 0.3,
                 min_alpha_word_frac: float = 0.8,
                 min_stopword_hits: int = 2,
                 stopwords: tuple[str, ...] = GOPHER_STOPWORDS
                 ) -> DataFrame:
    """Gopher/MassiveText document gates (Rae et al. 2021, table A1):
    one named boolean per rule plus the metric it gated on, and
    ``keep_doc`` = every gate passed.

    Columns: ``(id, n_words, mean_word_len, symbol_word_ratio,
    bullet_frac, ellipsis_frac, alpha_word_frac, stopword_hits,
    ok_word_count, ok_mean_word_len, ok_symbol_ratio, ok_bullets,
    ok_ellipsis, ok_alpha_words, ok_stopwords, keep_doc)``.

    * word count in [*min_words*, *max_words*];
    * mean word length in [*min_mean_word_len*, *max_mean_word_len*];
    * (count of ``#`` + count of ``...``) / words <=
      *max_symbol_word_ratio* (the paper gates the two symbols as
      separate ratios at the same threshold; this combines them — a
      strictly tighter, documented simplification);
    * fraction of lines starting with a bullet <= *max_bullet_frac*,
      ending with "..." <= *max_ellipsis_frac*;
    * >= *min_alpha_word_frac* of words contain an alphabetic char;
    * >= *min_stopword_hits* DISTINCT stop words present (the paper:
      "at least two of the following English words").
    """
    text = F.col(text_col)
    words = _words(text)
    n_words = F.size(words)
    total_chars = F.aggregate(
        words, F.lit(0).cast("long"),
        lambda acc, w: acc + F.length(w))
    mean_len = total_chars / F.greatest(n_words, F.lit(1))
    hash_count = F.length(text) - F.length(
        F.regexp_replace(text, r"#", ""))
    ellipsis_count = F.floor(
        (F.length(text) - F.length(F.regexp_replace(text, r"\.\.\.", "")))
        / 3).cast("long")
    sym_ratio = (hash_count + ellipsis_count) \
        / F.greatest(n_words, F.lit(1))
    lines = F.split(text, "\n", -1)
    n_lines = F.greatest(F.size(lines), F.lit(1))
    bullet_frac = F.size(F.filter(
        lines, lambda l: l.rlike(r"^\s*([-*•]|\d+[.)])\s"))) / n_lines
    ellipsis_frac = F.size(F.filter(
        lines, lambda l: l.rlike(r"\.\.\.\s*$"))) / n_lines
    alpha_frac = F.size(F.filter(
        words, lambda w: w.rlike(r"[A-Za-z]"))) \
        / F.greatest(n_words, F.lit(1))
    low_words = F.transform(words, F.lower)
    stop_hits = F.size(F.array_intersect(
        F.array_distinct(low_words),
        F.array(*[F.lit(s) for s in stopwords])))

    out = df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(mean_len, 4).alias("mean_word_len"),
        F.round(sym_ratio, 4).alias("symbol_word_ratio"),
        F.round(bullet_frac, 4).alias("bullet_frac"),
        F.round(ellipsis_frac, 4).alias("ellipsis_frac"),
        F.round(alpha_frac, 4).alias("alpha_word_frac"),
        stop_hits.alias("stopword_hits"),
    )
    gates = {
        "ok_word_count": (F.col("n_words") >= min_words)
                         & (F.col("n_words") <= max_words),
        "ok_mean_word_len": (F.col("mean_word_len") >= min_mean_word_len)
                            & (F.col("mean_word_len")
                               <= max_mean_word_len),
        "ok_symbol_ratio": F.col("symbol_word_ratio")
                           <= max_symbol_word_ratio,
        "ok_bullets": F.col("bullet_frac") <= max_bullet_frac,
        "ok_ellipsis": F.col("ellipsis_frac") <= max_ellipsis_frac,
        "ok_alpha_words": F.col("alpha_word_frac")
                          >= min_alpha_word_frac,
        "ok_stopwords": F.col("stopword_hits") >= min_stopword_hits,
    }
    for name, cond in gates.items():
        out = out.withColumn(name, cond)
    keep = F.lit(True)
    for name in gates:
        keep = keep & F.col(name)
    return out.withColumn("keep_doc", keep)
