"""Distributed BPE (byte-pair-encoding) tokenizer training — the vocab-
construction stage of a pretraining pipeline, re-expressed Spark-first.

BPE training [Sennrich et al., ACL'16] iterates: count adjacent symbol
pairs across the corpus, merge the most frequent pair everywhere,
repeat.  The Spark shape exploits that everything happens on the
**distinct-word table weighted by corpus frequency** (the classic
trick): a 100 TB corpus has a vocabulary of maybe 10^7 distinct words,
so per-round work is vocabulary-sized, not corpus-sized — one explode +
one weighted count per round, with ONE single-row driver fetch (the
argmax pair — metadata, same budget as the connected-components
convergence probe).  Greedy left-to-right pair merging inside a word is
a fold, expressed as ``F.aggregate`` over the symbol array (an
interpreted higher-order lambda — acceptable because it runs once per
DISTINCT WORD per round, never per corpus token).

Encoding a corpus with the trained model is then a JOIN, not a fold:
explode doc tokens, equi-join the word → segmentation table (broadcast
when the vocab fits), count symbols.  OOV words fall back to character
segmentation — exactly what training would have produced for a word
with no merged pair.

The merge rule is deterministic: argmax pair count, ties broken by
(left, right) ascending — so the merge table is exactly reproducible,
pinned against an independent pure-python reference implementation in
tests.  The fold itself is not SQL-expressible in one query, so the
contract entries are rows-only by nature (rationale recorded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import text as TX


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct lowercased words with corpus frequencies:
    ``(word, freq)`` — the weighted vocabulary BPE trains on."""
    return (df.select(F.explode(F.transform(
        TX.tokens(text_col), lambda t: F.lower(t))).alias("word"))
        .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))


def merge_pair(symbols, a: str, b: str):
    """Column: greedy left-to-right merge of adjacent ``(a, b)`` into
    ``a+b`` over a symbol array — the BPE merge fold.  Non-overlapping
    by construction: a merged token can't be the left half of the same
    merge in the same pass (``a+b != a`` whenever b is non-empty)."""
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        # F.get is 0-based and NULL-safe on the empty accumulator
        # (ANSI-mode element_at(-1) raises there)
        lambda acc, x: F.when(
            (F.get(acc, F.size(acc) - 1) == F.lit(a)) & (x == F.lit(b)),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1),
                     F.array(F.lit(a + b)))
        ).otherwise(F.concat(acc, F.array(x))))


def _local_merge(seq: list, a: str, b: str) -> list:
    """Greedy left-to-right merge of adjacent (a, b) — the driver-side
    twin of :func:`merge_pair` (same fold, same non-overlap rule)."""
    out: list = []
    for c in seq:
        if out and out[-1] == a and c == b:
            out[-1] = a + b
        else:
            out.append(c)
    return out


def _local_bpe(freqs: dict, n_merges: int,
               min_count: int) -> tuple[list, dict]:
    """Exact sequential BPE over a collected ``word -> freq`` table with
    INCREMENTAL pair-count maintenance (the subword-nmt trick): each
    merge touches only the words that contain the merged pair, so the
    driver-side cost is proportional to affected words, not
    ``vocab x n_merges`` full rescans."""
    seg = {w: list(w) for w in freqs}
    counts: dict = {}
    pair_words: dict = {}
    for w, f in freqs.items():
        s = seg[w]
        for i in range(len(s) - 1):
            p = (s[i], s[i + 1])
            counts[p] = counts.get(p, 0) + f
            pair_words.setdefault(p, set()).add(w)
    merges: list = []
    for _ in range(n_merges):
        if not counts:
            break
        (a, b), n = min(counts.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if n < min_count:
            break
        merges.append((a, b, int(n)))
        # pair_words entries go stale when a word stops containing a
        # pair; re-processing such a word is a harmless no-op because
        # its old contributions are removed and re-added unchanged
        for w in sorted(pair_words.get((a, b), ())):
            s, f = seg[w], freqs[w]
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                counts[p] -= f
                if counts[p] <= 0:
                    del counts[p]
            s2 = _local_merge(s, a, b)
            seg[w] = s2
            for i in range(len(s2) - 1):
                p = (s2[i], s2[i + 1])
                counts[p] = counts.get(p, 0) + f
                pair_words.setdefault(p, set()).add(w)
    return merges, seg


def _safe_batch(rows, batch_max: int, min_pair_count: int,
                merged_strs: set) -> list:
    """Select a prefix of the (n desc, l, r)-sorted pair rows that is
    provably equivalent to merging them ONE AT A TIME with recounting
    in between.  Three facts make a prefix safe:

    * a pair sharing no symbol with an earlier selected pair (and not
      equal to its concatenation) keeps its exact count under that
      earlier merge — its adjacencies are untouched;
    * a merge ``(a, b) -> ab`` whose concatenation is a FRESH string
      (never produced by any earlier merge, and multi-char so never an
      initial symbol) only creates new pairs ``(x, ab)`` / ``(ab, y)``
      whose counts are bounded by the old ``(x, a)`` / ``(b, y)``
      counts — and those CONFLICT with the merge, so they are bounded
      by the count at the first conflicting row;
    * therefore every selected pair whose count is STRICTLY above the
      largest CONFLICTING pair's count is still the running argmax when
      its turn comes: untouched old pairs that tie with it sort after
      it lexicographically (they trail it in the (n desc, l, r) order,
      which is exactly the sequential tie-break), while new pairs —
      whose lexicographic rank is arbitrary — are bounded by the
      conflicting counts the strict rule clears.

    A pair whose concatenation collides with an existing symbol string
    (``a+b in merged_strs``) can boost collision-keyed pair counts
    unboundedly, so it may only ever lead a round — the batch stops
    right after it.
    """
    selected: list = []
    used: set = set()  # symbols AND concatenations of selected pairs
    stop_i = None
    for i, row in enumerate(rows):
        if i >= batch_max or row.n < min_pair_count:
            stop_i = i
            break
        a, b = row.l, row.r
        if i > 0 and (a in used or b in used
                      or (a + b) in used or (a + b) in merged_strs):
            stop_i = i
            break
        selected.append((a, b, int(row.n)))
        used.update((a, b, a + b))
        if i == 0 and (a + b) in merged_strs:
            # collision-concat argmax (its product string already exists
            # as a symbol): safe only as the round's sole merge
            stop_i = 1
            break
    if stop_i is None:
        stop_i = len(rows)
    # bound the largest count any pair CONFLICTING with the selected set
    # can hold (it also bounds every pair a selected merge creates):
    # first conflicting fetched row, else the fetch boundary for unseen
    c_conf = 0
    for row in rows[stop_i:]:
        a, b = row.l, row.r
        if (a in used or b in used
                or (a + b) in used or (a + b) in merged_strs):
            c_conf = int(row.n)
            break
    else:
        if len(rows) > batch_max:  # unseen pairs exist beyond the fetch
            c_conf = int(rows[-1].n)
    while len(selected) > 1 and selected[-1][2] <= c_conf:
        selected.pop()
    return selected


def bpe_train(df: DataFrame, text_col: str = "text",
              n_merges: int = 16, min_pair_count: int = 2,
              local_vocab_max: int = 2_000_000, batch_max: int = 16,
              round_sizes: list | None = None,
              ) -> tuple[list, DataFrame]:
    """Train *n_merges* BPE merges on the corpus.

    Returns ``(merges, segmentation)``: *merges* is a list of
    ``(left, right, pair_count)`` in merge order; *segmentation* is the
    final ``(word, freq, symbols)`` table (the trained model — persist
    it like any model store).  Stops early when no pair reaches
    *min_pair_count*.  *round_sizes*, if given, collects the number of
    merges applied per Spark round (telemetry for tests/tuning).

    Two paths, both EXACTLY sequential-BPE-equivalent (same merge
    table, same tie-breaks — pinned against a pure-python reference):

    * **local** (vocabulary fits the driver, ``<= local_vocab_max``
      distinct words): the corpus-sized tokenize/count runs in Spark
      once, the vocabulary-sized merge loop runs driver-side with
      incremental pair counts.  This is the right shape even at 100 TB
      — BPE's working set after ``word_freqs`` is the DISTINCT-WORD
      table (~10^7 rows), and a 32k-merge loop as Spark jobs would be
      ~64k sequential scheduler round-trips regardless of data size;
    * **distributed** (vocabulary larger than the driver allowance):
      per round, ONE weighted pair count + one driver fetch of the top
      ``batch_max + 1`` pairs, then every provably-independent merge
      from that list is applied in the same round
      (:func:`_safe_batch`), cutting rounds by up to ``batch_max``x
      while preserving exact sequential semantics.
    """
    wf = word_freqs(df, text_col).localCheckpoint(eager=True)
    if wf.count() <= local_vocab_max:
        freqs = {r.word: int(r.freq) for r in wf.collect()}
        merges, seg_map = _local_bpe(freqs, n_merges, min_pair_count)
        if round_sizes is not None and merges:
            round_sizes.append(len(merges))
        spark = df.sparkSession
        seg = spark.createDataFrame(
            [(w, freqs[w], seg_map[w]) for w in sorted(seg_map)],
            "word string, freq long, symbols array<string>")
        return merges, seg
    seg = (wf.select("word", "freq",
                     F.split(F.col("word"), "").alias("symbols"))
           .localCheckpoint(eager=True))
    merges = []
    merged_strs: set = set()
    while len(merges) < n_merges:
        s = F.col("symbols")
        adj = F.arrays_zip(
            F.slice(s, F.lit(1), F.greatest(F.size(s) - 1, F.lit(0)))
            .alias("l"),
            F.slice(s, F.lit(2), F.greatest(F.size(s) - 1, F.lit(0)))
            .alias("r"))
        pairs = (seg.select("freq", F.explode(adj).alias("p"))
                 .select("freq", F.col("p.l").alias("l"),
                         F.col("p.r").alias("r"))
                 .groupBy("l", "r").agg(F.sum("freq").alias("n")))
        take = min(batch_max, n_merges - len(merges))
        rows = (pairs.orderBy(F.desc("n"), "l", "r")
                .limit(take + 1).collect())
        if not rows or rows[0].n < min_pair_count:
            break
        batch = _safe_batch(rows, take, min_pair_count, merged_strs)
        sym = F.col("symbols")
        for a, b, n in batch:
            merges.append((a, b, n))
            merged_strs.add(a + b)
            sym = merge_pair(sym, a, b)
        if round_sizes is not None:
            round_sizes.append(len(batch))
        seg = (seg.select("word", "freq", sym.alias("symbols"))
               .localCheckpoint(eager=True))
    return merges, seg


def bpe_encode_stats(df: DataFrame, segmentation: DataFrame,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-doc BPE token counts using a trained segmentation table:
    ``(doc_id, n_words, n_chars, n_bpe_tokens)``.

    Encoding is an equi-JOIN against the vocabulary (broadcast when it
    fits), not a per-token fold — the corpus-sized pass stays in
    codegen.  OOV words fall back to their character count (what BPE
    training produces for a word with no mergeable pair)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.transform(TX.tokens(text_col),
                              lambda t: F.lower(t))).alias("word"))
    vocab = segmentation.select(
        "word", F.size("symbols").alias("__n_sym"))
    return (toks.join(vocab, "word", "left")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_words"),
                 F.sum(F.length("word")).alias("n_chars"),
                 F.sum(F.coalesce(F.col("__n_sym"), F.length("word")))
                 .alias("n_bpe_tokens")))
