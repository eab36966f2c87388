"""Suffix-rank exact-substring dedup — the suffix-array lineage.

`operators/spans.py` re-expresses Lee et al.'s (ACL 2022) suffix-array
span removal as a fixed-width n-gram cover keyed on xxhash64 — fast, but
hash-keyed (collisions are possible in principle at corpus scale).  This
module is the EXACT counterpart, built the way distributed suffix-array
construction is published (prefix doubling, Manber-Myers):

1. **Order ranks by prefix doubling** — round k ranks every suffix
   (doc_id, pos) by its first ``2**k`` tokens: ``rank_k = order-rank of
   (rank_{k-1}(p), rank_{k-1}(p + 2**(k-1)))``.  Each round is one
   distinct + range-partitioned rank + one join — O(log cap) bounded
   passes, shuffles keyed on 8-byte longs.
2. **Exact n-window identity via overlapping anchors** — two n-token
   windows are equal iff ``(rank_k1(p), rank_k1(p + n - 2**k1))`` match,
   where ``k1 = floor(log2 n)`` (the sparse-table trick: two overlapping
   power-of-two prefixes cover the window).  NO window strings and NO
   hashes ever shuffle — grouping keys are two longs, so the result is
   exact at any scale.
3. **Exact LCP between rank-neighbors** — descend the rank tables
   (k = K..0, add ``2**k`` when ranks at the accumulated offset agree),
   giving each document's longest duplicated substring without ever
   comparing strings.

Rank assignment never funnels through one partition: distinct keys are
range-partitioned, row_number'ed per partition, and offset by a
broadcast running count of partition sizes (the counts table has one row
per partition — metadata, not data).  ``localCheckpoint`` pins each
round so ``spark_partition_id`` stays stable and lineage stays flat.

Suffixes shorter than a comparison width rank by their real tokens plus
a sticky end-sentinel (rank 0), exactly like $-padded suffix sorting;
true LCPs are clamped by both suffixes' remaining lengths, so the
padding can never invent a cross-document match.

Ranks are CORPUS-RELATIVE: adding documents changes every rank, so
this module is the batch/full-rebuild path.  For incremental pipelines
(new batches against a persisted state) use the hash-keyed span store
in :mod:`..operators.spans` — its xxhash64 window keys are stable
across batches, which is exactly the property ranks trade away for
collision-freedom.

Reference repo has no such operator (scope ends at Legend queries,
`/root/reference/README.md`); this extends the training-data surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions import text as TX


def _order_rank(df: DataFrame, cols: list[str], out: str) -> DataFrame:
    """Distributed order-preserving DENSE rank over *cols*, appended to
    every input row (equal tuples share a rank; tuple order preserved):
    range-partition on the tuple (equal tuples land together), dense
    row-rank within each partition, then add the partition's broadcast
    running DISTINCT count.  One shuffle, no global single-partition
    window, no distinct/join-back round-trip.  (Range boundaries can't
    split a tie group — a pathological corpus where most rows share one
    tuple serializes that group's partition, the same skew profile as
    any sort-based rank.)"""
    spark = df.sparkSession
    n_parts = spark.sparkContext.defaultParallelism
    d = (df.repartitionByRange(n_parts, *cols)
         .localCheckpoint(eager=True))          # pin partition ids
    d = d.withColumn("__pid", F.spark_partition_id())
    w = Window.partitionBy("__pid").orderBy(*cols)
    d = d.withColumn("__lr", F.dense_rank().over(w))
    counts = d.groupBy("__pid").agg(
        F.count_distinct(*[F.col(c) for c in cols]).alias("__n"))
    woff = (Window.orderBy("__pid")
            .rowsBetween(Window.unboundedPreceding, -1))
    offs = counts.select(
        "__pid", F.coalesce(F.sum("__n").over(woff), F.lit(0))
        .alias("__off"))                        # one row per partition
    return (d.join(F.broadcast(offs), "__pid")
            .withColumn(out, F.col("__lr") + F.col("__off"))
            .drop("__pid", "__lr", "__off"))


def _global_row_number(df: DataFrame, cols: list[str],
                       out: str) -> DataFrame:
    """Global 1-based row_number by *cols* without a single-partition
    window — same range-partition + broadcast-offset construction as
    :func:`_order_rank`, minus the distinct."""
    spark = df.sparkSession
    n_parts = spark.sparkContext.defaultParallelism
    d = (df.repartitionByRange(n_parts, *cols)
         .localCheckpoint(eager=True))
    d = d.withColumn("__pid", F.spark_partition_id())
    w = Window.partitionBy("__pid").orderBy(*cols)
    d = d.withColumn("__lr", F.row_number().over(w))
    counts = d.groupBy("__pid").agg(F.max("__lr").alias("__n"))
    woff = (Window.orderBy("__pid")
            .rowsBetween(Window.unboundedPreceding, -1))
    offs = counts.select(
        "__pid", F.coalesce(F.sum("__n").over(woff), F.lit(0))
        .alias("__off"))
    return (d.join(F.broadcast(offs), "__pid")
            .withColumn(out, F.col("__lr") + F.col("__off"))
            .drop("__pid", "__lr", "__off"))


# shared with the hash-keyed spans family so unit="char" means the same
# thing on both the batch-exact and incremental paths
_unit_array = TX.unit_array
_unit_joiner = TX.unit_joiner


def token_positions(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    unit: str = "token") -> DataFrame:
    """``(id, pos, tok)`` — one row per unit, 1-based positions."""
    return df.select(
        F.col(id_col),
        F.posexplode(_unit_array(F.col(text_col), unit))
        .alias("__p", "tok"),
    ).select(id_col, (F.col("__p") + 1).alias("pos"), "tok")


def suffix_ranks(positions: DataFrame, id_col: str = "doc_id",
                 rounds: int = 6,
                 early_stop: bool = True) -> list[DataFrame]:
    """Prefix-doubled order ranks: returns ``[r_0, ..., r_rounds]``
    where ``r_k`` is ``(id, pos, r)`` ranking every suffix by its first
    ``2**k`` tokens (end-padded with a sticky sentinel).  Each table is
    localCheckpointed — O(log cap) bounded passes over 8-byte keys.

    *early_stop* (default): once ranks are UNIQUE — a full suffix sort,
    reached as soon as ``2**k`` passes the corpus's longest repeated
    prefix — the remaining rounds can't split anything further, so the
    final table is reused for them (one cheap max-aggregate per round
    on a checkpointed table buys skipping the tail rounds entirely; on
    corpora without long exact repeats that's most of them).  Unique
    ranks also satisfy :func:`longest_dup_prefix`'s exactness condition
    outright, whatever ``rounds`` was."""
    if rounds < 0:
        raise ValueError(f"rounds must be >= 0 [{rounds}]")
    # each round's table is read MANY times downstream (next round's
    # pairs twice, the LCP descent twice per level, the early-stop
    # aggregate) — materialize it once per round
    r0 = (_order_rank(positions, ["tok"], "r")
          .select(id_col, "pos", "r")
          .localCheckpoint(eager=True))
    out = [r0]
    cur = r0
    n_pos = None
    for k in range(1, rounds + 1):
        half = 1 << (k - 1)
        nxt = cur.select(id_col, (F.col("pos") - half).alias("pos"),
                         F.col("r").alias("__r2"))
        pairs = (cur.join(nxt, [id_col, "pos"], "left")
                 .select(id_col, "pos", "r",
                         F.coalesce("__r2", F.lit(0)).alias("r2")))
        cur = (_order_rank(pairs, ["r", "r2"], "__nr")
               .select(id_col, "pos", F.col("__nr").alias("r"))
               .localCheckpoint(eager=True))
        out.append(cur)
        if early_stop and k < rounds:
            agg = cur.agg(F.max("r").alias("m"),
                          F.count(F.lit(1)).alias("n")).first()
            if n_pos is None:
                n_pos = agg["n"]
            if agg["m"] == n_pos:               # full suffix sort reached
                out.extend([cur] * (rounds - k))
                break
    return out


def _floor_log2(n: int) -> int:
    k = 0
    while (1 << (k + 1)) <= n:
        k += 1
    return k


def exact_window_groups(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 15,
                        min_count: int = 2,
                        unit: str = "token") -> DataFrame:
    """All corpus-duplicated n-token windows, EXACTLY: ``(id, s, w1, w2,
    n_occ)`` where ``(w1, w2)`` is the overlapping-anchor rank pair that
    identifies the window's token content (equal pair <=> equal window)
    and ``n_occ`` its corpus-wide occurrence count (>= *min_count*).
    Overlapping occurrences count separately, as in suffix-array LCP
    semantics and :mod:`..operators.spans`."""
    if n < 1:
        raise ValueError(f"n must be >= 1 [{n}]")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2 [{min_count}]")
    pos = token_positions(df, text_col, id_col, unit)
    k1 = _floor_log2(n)
    rk = suffix_ranks(pos, id_col, k1)[k1]
    lens = pos.groupBy(id_col).agg(F.max("pos").alias("__len"))
    a1 = rk.select(id_col, F.col("pos").alias("s"), F.col("r").alias("w1"))
    a2 = rk.select(id_col, (F.col("pos") - (n - (1 << k1))).alias("s"),
                   F.col("r").alias("w2"))
    wins = (a1.join(a2, [id_col, "s"])
            .join(lens, id_col)
            .where(F.col("s") + (n - 1) <= F.col("__len"))
            .select(id_col, "s", "w1", "w2"))
    counts = (wins.groupBy("w1", "w2")
              .agg(F.count(F.lit(1)).alias("n_occ"))
              .where(F.col("n_occ") >= min_count))
    return wins.join(counts, ["w1", "w2"]).select(
        id_col, "s", "w1", "w2", "n_occ")


def exact_span_stats(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", n: int = 15,
                     min_count: int = 2,
                     keep_first: bool = False,
                     unit: str = "token") -> DataFrame:
    """EXACT twin of :func:`..operators.spans.duplicate_span_stats`:
    ``(id, n_tokens, n_removed, clean_text)`` with every token covered
    by a corpus-duplicated n-token window removed — but grouped on
    suffix-rank anchor pairs instead of xxhash64, so no collision can
    ever remove (or spare) the wrong span, at any corpus size.

    *keep_first* switches to the Lee et al. keep-one semantics: each
    duplicate group's CANONICAL occurrence (lowest ``(id, s)``) is
    exempted from its own group's removal.  Note the standard Lee et
    al. caveat: that spared occurrence's tokens may still be removed
    when a *different* duplicated window group overlaps the same
    positions, so a duplicated substring is not guaranteed to survive
    with one intact copy — only its canonical window is never removed
    on account of its own group."""
    base = df.select(F.col(id_col),
                     _unit_array(F.col(text_col), unit).alias("__toks"))
    wins = exact_window_groups(df, text_col, id_col, n, min_count, unit)
    if keep_first:
        canon = (wins.groupBy("w1", "w2")
                 .agg(F.min(F.struct(id_col, "s")).alias("__c")))
        wins = (wins.join(canon, ["w1", "w2"])
                .where(~((F.col(id_col) == F.col("__c")[id_col])
                         & (F.col("s") == F.col("__c")["s"]))))
    flagged = (wins.groupBy(id_col)
               .agg(F.collect_set("s").alias("__starts")))
    joined = base.join(flagged, id_col, "left")
    starts = F.coalesce(F.col("__starts"), F.array().cast("array<int>"))
    kept = F.filter(
        "__toks",
        lambda t, i: ~F.exists(
            starts, lambda s: (i + 1 >= s) & (i + 1 <= s + F.lit(n - 1))
        ),
    )
    return joined.select(
        F.col(id_col),
        F.size("__toks").alias("n_tokens"),
        (F.size("__toks") - F.size(kept)).alias("n_removed"),
        F.concat_ws(_unit_joiner(unit), kept).alias("clean_text"),
    )


def top_dup_windows(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", n: int = 15,
                    min_count: int = 2, k: int = 20,
                    unit: str = "token") -> DataFrame:
    """Corpus diagnostics: the *k* most-repeated n-token windows —
    ``(window_text, n_occ, n_docs, first_id, first_pos)`` ranked by
    ``(n_occ desc, window_text asc)``.  Identity comes from the exact
    rank pairs; the TEXT is reconstructed only for each group's
    canonical occurrence (one slice join, k-bounded output) — the
    corpus-wide stages never carry strings longer than one token."""
    wins = exact_window_groups(df, text_col, id_col, n, min_count, unit)
    groups = (wins.groupBy("w1", "w2")
              .agg(F.max("n_occ").alias("n_occ"),
                   F.countDistinct(id_col).alias("n_docs"),
                   F.min(F.struct(F.col(id_col).alias("i"),
                                  F.col("s").alias("s"))).alias("__c")))
    base = df.select(F.col(id_col).alias("__ri"),
                     _unit_array(F.col(text_col), unit).alias("__toks"))
    rep = (groups.join(base, groups["__c"]["i"] == F.col("__ri"))
           .select(F.concat_ws(
               _unit_joiner(unit), F.slice("__toks", F.col("__c")["s"], n))
               .alias("window_text"),
               "n_occ", "n_docs",
               F.col("__c")["i"].alias("first_id"),
               F.col("__c")["s"].alias("first_pos")))
    return rep.orderBy(F.desc("n_occ"), "window_text").limit(k)


def exact_contamination_spans(train: DataFrame, eval_df: DataFrame,
                              text_col: str = "text",
                              id_col: str = "doc_id", n: int = 15,
                              unit: str = "token") -> DataFrame:
    """EXACT cross-corpus contamination spans: every eval-side n-unit
    window whose exact content occurs anywhere in *train* —
    ``(id, s, n_train_occ)`` with 1-based eval positions.  The
    suffix-rank counterpart of the n-gram-Jaccard decontamination
    family: window identity is the collision-free overlapping-anchor
    rank pair over the tagged UNION corpus, so no hash collision can
    fabricate (or hide) a leak at any corpus size, and no string or
    hash wider than one unit ever shuffles.

    Windows duplicated only WITHIN eval are not reported (the filter is
    on the train-side occurrence count, not the total), and train-only
    duplication never produces a row — this is never a self-join."""
    def tag(df: DataFrame, c: int) -> DataFrame:
        return df.select(
            F.struct(F.lit(c).alias("c"), F.col(id_col).alias("i"))
            .alias("__xid"), F.col(text_col).alias(text_col))

    union = tag(train, 0).unionByName(tag(eval_df, 1))
    # min_count=2 is the cheapest corpus-wide prefilter: an eval window
    # with >=1 train occurrence has total count >= 2 by construction
    wins = exact_window_groups(union, text_col, "__xid", n,
                               min_count=2, unit=unit)
    tcnt = (wins.where(F.col("__xid")["c"] == 0)
            .groupBy("w1", "w2")
            .agg(F.count(F.lit(1)).alias("n_train_occ")))
    return (wins.where(F.col("__xid")["c"] == 1)
            .join(tcnt, ["w1", "w2"])
            .select(F.col("__xid")["i"].alias(id_col), "s",
                    "n_train_occ"))


def exact_contamination_stats(train: DataFrame, eval_df: DataFrame,
                              text_col: str = "text",
                              id_col: str = "doc_id", n: int = 15,
                              unit: str = "token") -> DataFrame:
    """Per-eval-document exact-contamination report: ``(id, n_tokens,
    n_contaminated, contaminated_frac)`` where ``n_contaminated``
    counts eval units covered by at least one window that exactly
    occurs in *train* (the Lee et al. span-cover measure, cross-corpus
    flavor).  Decontaminate by dropping docs above a threshold or by
    removing the spans themselves via the cover rebuild."""
    spans = exact_contamination_spans(train, eval_df, text_col, id_col,
                                      n, unit)
    base = eval_df.select(
        F.col(id_col),
        _unit_array(F.col(text_col), unit).alias("__toks"))
    flagged = (spans.groupBy(id_col)
               .agg(F.collect_set("s").alias("__starts")))
    joined = base.join(flagged, id_col, "left")
    starts = F.coalesce(F.col("__starts"), F.array().cast("array<int>"))
    covered = F.filter(
        F.sequence(F.lit(1), F.greatest(F.size("__toks"), F.lit(1))),
        lambda p: F.exists(
            starts, lambda s: (p >= s) & (p <= s + F.lit(n - 1))),
    )
    n_cov = F.when(F.size("__toks") > 0, F.size(covered)).otherwise(0)
    return joined.select(
        F.col(id_col),
        F.size("__toks").alias("n_tokens"),
        n_cov.alias("n_contaminated"),
        F.when(F.size("__toks") > 0,
               F.round(n_cov / F.size("__toks"), 6))
        .otherwise(F.lit(0.0)).alias("contaminated_frac"),
    )


def exact_decontaminate(train: DataFrame, eval_df: DataFrame,
                        text_col: str = "text",
                        id_col: str = "doc_id", n: int = 15,
                        unit: str = "token") -> DataFrame:
    """Eval corpus with every unit covered by a train-present n-unit
    window REMOVED — the cross-corpus flavor of
    :func:`exact_span_stats`'s cover rebuild, for pipelines that keep
    the eval doc but excise the leaked spans instead of dropping the
    whole document.  Returns ``(id, n_tokens, n_removed, clean_text)``
    over the EVAL corpus (train is never rewritten)."""
    spans = exact_contamination_spans(train, eval_df, text_col, id_col,
                                      n, unit)
    base = eval_df.select(
        F.col(id_col),
        _unit_array(F.col(text_col), unit).alias("__toks"))
    flagged = (spans.groupBy(id_col)
               .agg(F.collect_set("s").alias("__starts")))
    joined = base.join(flagged, id_col, "left")
    starts = F.coalesce(F.col("__starts"), F.array().cast("array<int>"))
    kept = F.filter(
        "__toks",
        lambda t, i: ~F.exists(
            starts, lambda s: (i + 1 >= s) & (i + 1 <= s + F.lit(n - 1))
        ),
    )
    return joined.select(
        F.col(id_col),
        F.size("__toks").alias("n_tokens"),
        (F.size("__toks") - F.size(kept)).alias("n_removed"),
        F.concat_ws(_unit_joiner(unit), kept).alias("clean_text"),
    )


def longest_dup_prefix(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       rounds: int = 6,
                       unit: str = "token") -> DataFrame:
    """Per-suffix longest duplicated prefix: ``(id, pos, dup_len)`` =
    the length of the longest substring starting at (id, pos) that also
    occurs at some OTHER position in the corpus (0 if none).

    Classic suffix-array fact: the max LCP of a suffix with any other
    suffix is attained at a rank-order neighbor, so one global ordering
    plus one LCP per adjacent pair suffices.  LCPs descend the rank
    tables (k = rounds..0, add ``2**k`` on agreement at the accumulated
    shift) and are clamped by both suffixes' remaining lengths so the
    end-sentinel padding never fabricates a match.

    **Exactness condition: ``2**rounds`` must reach the longest
    document's token count** — that makes the rank order a FULL suffix
    sort, where rank-tied suffixes are wholly identical (uniform
    pairwise LCP), so the neighbor argument holds.  With fewer rounds
    suffixes tied on their first ``2**rounds`` tokens sit in arbitrary
    order inside the tie group and the true max-LCP partner may not be
    adjacent: the result is then a LOWER BOUND (never an overcount —
    every reported match is a real one)."""
    pos = token_positions(df, text_col, id_col, unit)
    rks = suffix_ranks(pos, id_col, rounds)
    lens = pos.groupBy(id_col).agg(F.max("pos").alias("__len"))
    final = (rks[rounds]
             .join(lens, id_col)
             .select(id_col, "pos", "r",
                     (F.col("__len") - F.col("pos") + 1).alias("rem")))
    ordered = _global_row_number(final, ["r", id_col, "pos"], "rn")
    nxt = ordered.select(
        (F.col("rn") - 1).alias("rn"), F.col(id_col).alias("__idb"),
        F.col("pos").alias("__pb"), F.col("rem").alias("__remb"))
    adj = (ordered.join(nxt, "rn")
           .select(F.col(id_col).alias("__ida"), F.col("pos").alias("__pa"),
                   F.col("rem").alias("__rema"), "__idb", "__pb", "__remb")
           .withColumn("__acc", F.lit(0)))
    for k in range(rounds, -1, -1):
        rk = rks[k]
        ra = rk.select(F.col(id_col).alias("__qida"),
                       F.col("pos").alias("__qa"),
                       F.col("r").alias("__ra"))
        rb = rk.select(F.col(id_col).alias("__qidb"),
                       F.col("pos").alias("__qb"),
                       F.col("r").alias("__rb"))
        adj = (adj
               .join(ra, (F.col("__ida") == F.col("__qida")) &
                         (F.col("__qa") == F.col("__pa") + F.col("__acc")),
                     "left").drop("__qida", "__qa")
               .join(rb, (F.col("__idb") == F.col("__qidb")) &
                         (F.col("__qb") == F.col("__pb") + F.col("__acc")),
                     "left").drop("__qidb", "__qb"))
        agree = (F.coalesce("__ra", F.lit(0))
                 == F.coalesce("__rb", F.lit(0)))
        adj = (adj.withColumn(
            "__acc", F.col("__acc")
            + F.when(agree, F.lit(1 << k)).otherwise(F.lit(0)))
            .drop("__ra", "__rb"))
    lcp = F.least("__acc", "__rema", "__remb")
    both = (adj.select(F.col("__ida").alias(id_col),
                       F.col("__pa").alias("pos"), lcp.alias("__l"))
            .unionByName(
                adj.select(F.col("__idb").alias(id_col),
                           F.col("__pb").alias("pos"), lcp.alias("__l"))))
    per_suffix = both.groupBy(id_col, "pos").agg(
        F.max("__l").alias("dup_len"))
    return (pos.select(id_col, "pos")
            .join(per_suffix, [id_col, "pos"], "left")
            .select(id_col, "pos",
                    F.coalesce("dup_len", F.lit(0)).alias("dup_len")))


def max_dup_spans(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", min_len: int = 10,
                  rounds: int = 6,
                  unit: str = "token") -> DataFrame:
    """MAXIMAL duplicated spans: ``(id, start, length)`` — every
    position whose longest duplicated prefix is >= *min_len* and is not
    contained in the previous position's span.  Containment only needs
    the IMMEDIATE predecessor: a duplicated substring of length L at
    p-1 implies one of length L-1 at p, so dup_len can fall by at most
    1 per step and any older span that covered this one would cover
    p-1's too.  One lag window per document on top of
    :func:`longest_dup_prefix` (same exactness condition)."""
    if min_len < 1:
        raise ValueError(f"min_len must be >= 1 [{min_len}]")
    per = longest_dup_prefix(df, text_col, id_col, rounds, unit)
    w = Window.partitionBy(id_col).orderBy("pos")
    prev = F.lag("dup_len", 1, 0).over(w)
    return (per.withColumn("__prev", prev)
            .where((F.col("dup_len") >= min_len)
                   & (F.col("__prev") < F.col("dup_len") + 1))
            .select(id_col, F.col("pos").alias("start"),
                    F.col("dup_len").alias("length")))


def longest_dup_span_docs(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id",
                          rounds: int = 6,
                          unit: str = "token") -> DataFrame:
    """Per-document longest exactly-duplicated substring length (in
    tokens, 0 when nothing repeats): ``(id, n_tokens, max_dup_len)``.
    Exact when ``2**rounds`` reaches the longest document's token count
    (full suffix sort — see :func:`longest_dup_prefix`); a lower bound
    otherwise."""
    per = longest_dup_prefix(df, text_col, id_col, rounds, unit)
    toks = df.select(
        F.col(id_col),
        F.size(_unit_array(F.col(text_col), unit)).alias("n_tokens"))
    agg = per.groupBy(id_col).agg(F.max("dup_len").alias("max_dup_len"))
    return (toks.join(agg, id_col, "left")
            .select(id_col, "n_tokens",
                    F.coalesce("max_dup_len", F.lit(0)).alias("max_dup_len")))
