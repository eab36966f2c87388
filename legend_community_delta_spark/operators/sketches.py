"""Mergeable sketch store: persisted HLL sketches for incremental
cardinality at 100 TB.

One-shot ``approx_count_distinct`` re-scans the corpus on every question.
The scale pattern is **sketch once, merge forever**: each ingest shard
aggregates its rows into a fixed-size HyperLogLog sketch (Spark 4's
Apache DataSketches ``hll_sketch_agg``), the binary sketches land in a
parquet store, and any later cardinality question is answered by merging
kilobyte sketches — no base-data rescan.  Merges are lossless for a fixed
``lg_k``: the union of per-shard sketches is byte-for-byte the sketch of
the union, so incremental == batch (pinned in tests).

Extension surface — the reference has no sketch machinery; this is the
LLM-pipeline cardinality path (distinct user/url/doc counts over append-
only corpora).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def hll_shard_sketches(df: DataFrame, value_col: str,
                       group_cols: list[str] | tuple[str, ...] = (),
                       shard_col: str | Column | None = None,
                       lg_k: int = 12) -> DataFrame:
    """Per-(group, shard) HLL sketches: ``(group..., __shard, sketch)``.

    *shard_col* is whatever partitions the ingest (a date, a batch id, a
    file path); one sketch row per (group, shard) — kilobytes each,
    regardless of row count underneath.
    """
    shard = (F.lit("all") if shard_col is None
             else (F.col(shard_col) if isinstance(shard_col, str)
                   else shard_col))
    return (df.groupBy(*group_cols, shard.alias("__shard"))
            .agg(F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch")))


def write_sketch_store(df: DataFrame, path: str, value_col: str,
                       group_cols: list[str] | tuple[str, ...] = (),
                       shard_col: str | Column | None = None,
                       lg_k: int = 12, mode: str = "append") -> None:
    """Sketch *df* per (group, shard) and persist to a parquet store.

    ``mode="append"`` is the incremental path: a daily batch writes only
    its own sketches; the store accumulates one row per (group, shard).
    The store carries ``lg_k`` in a column so readers can validate
    compatibility (unions require one lg_k unless explicitly relaxed).
    """
    (hll_shard_sketches(df, value_col, group_cols, shard_col, lg_k)
     .withColumn("lg_k", F.lit(lg_k))
     .write.mode(mode).parquet(path))


def read_sketch_estimates(spark, path: str,
                          group_cols: list[str] | tuple[str, ...] = (),
                          allow_mixed_lg_k: bool = False) -> DataFrame:
    """Merge the stored sketches and estimate distinct counts per group:
    ``(group..., approx_distinct)``.

    Reads only the sketch rows (kilobytes per shard) — the cost is
    independent of how much base data ever flowed through the store.
    A store that mixes ``lg_k`` values raises by default: the union
    degrades every sketch to the coarsest precision present, which
    should be a deliberate choice, not an accident of one mis-configured
    ingest shard.  Pass ``allow_mixed_lg_k=True`` to opt in — the
    DataSketches union downgrades legally (toward smaller lg_k) and the
    estimate stays valid at the coarser error bound.
    """
    store = spark.read.parquet(path)
    lgks = [r[0] for r in store.select("lg_k").distinct().collect()]
    if len(lgks) > 1 and not allow_mixed_lg_k:
        raise ValueError(
            f"sketch store at [{path}] mixes lg_k values {sorted(lgks)}; "
            "rebuild shards at one precision, or pass "
            "allow_mixed_lg_k=True to merge at the coarsest precision "
            f"(lg_k={min(lgks)} error bounds)")
    union = F.hll_union_agg("sketch", len(lgks) > 1)
    return (store.groupBy(*group_cols)
            .agg(F.hll_sketch_estimate(union).alias("approx_distinct")))


def merged_distinct(df: DataFrame, value_col: str,
                    group_cols: list[str] | tuple[str, ...] = (),
                    shard_col: str | Column | None = None,
                    lg_k: int = 12) -> DataFrame:
    """In-flight two-level sketch merge (no store): shard sketches then
    union per group — the same plan shape the store path replays, usable
    to validate a store against its base data."""
    return (hll_shard_sketches(df, value_col, group_cols, shard_col, lg_k)
            .groupBy(*group_cols)
            .agg(F.hll_sketch_estimate(F.hll_union_agg("sketch"))
                 .alias("approx_distinct")))


# ---------------------------------------------------------------------------
# Bottom-k (KMV) sample store — mergeable deterministic uniform samples
# ---------------------------------------------------------------------------

def bottomk_sample(df: DataFrame, value_col: str, id_col: str,
                   group_cols: list[str] | tuple[str, ...] = (),
                   k: int = 256) -> DataFrame:
    """The k rows with the SMALLEST ``md5(id)`` per group — a
    deterministic uniform sample (md5 order is indistinguishable from a
    random permutation but reproducible in any engine) with the KMV
    bottom-k sketch's defining property: **bottom-k of a union equals
    bottom-k of the per-shard bottom-k's**, so samples merge losslessly
    without re-reading base data (Cohen & Kaplan's bottom-k sketches).

    Returns ``(group..., __h, id, value)`` rows (normalized column
    names so stores written from different tables merge).  Grouped:
    one WindowGroupLimit per group — no global sort.  Ungrouped: a
    global bottom-k is exactly ``orderBy(h).limit(k)``, which Spark
    plans as TakeOrderedAndProject (per-partition k + driver merge),
    never a single-partition sort.
    """
    from pyspark.sql import Window
    h = F.md5(F.col(id_col).cast("string"))
    base = df.select(*group_cols, h.alias("__h"),
                     F.col(id_col).alias("id"),
                     F.col(value_col).alias("value"))
    if not group_cols:
        return base.orderBy(F.col("__h"), F.col("id")).limit(k)
    w = Window.partitionBy(*[F.col(c) for c in group_cols])
    rn = F.row_number().over(w.orderBy(F.col("__h"), F.col("id")))
    return (base.withColumn("__rn", rn)
            .where(F.col("__rn") <= k)
            .drop("__rn"))


def write_sample_store(df: DataFrame, path: str, value_col: str,
                       id_col: str,
                       group_cols: list[str] | tuple[str, ...] = (),
                       k: int = 256, mode: str = "append") -> None:
    """Persist a per-batch bottom-k sample to a parquet store.

    ``mode='append'`` is the incremental path: each ingest batch writes
    only its own bottom-k rows (k rows per group per batch, regardless
    of batch size); the reader re-applies the bottom-k cut over the
    union, which by the KMV merge property equals the bottom-k of all
    data ever written — an always-fresh uniform sample of the full
    corpus in O(k·batches) stored rows."""
    (bottomk_sample(df, value_col, id_col, group_cols, k)
     .withColumn("__k", F.lit(int(k)))
     .write.mode(mode).parquet(path))


def read_sample(spark, path: str,
                group_cols: list[str] | tuple[str, ...] = (),
                k: int | None = None) -> DataFrame:
    """Merge the store back into THE bottom-k sample of everything ever
    written (ids deduplicated — re-ingesting a batch is idempotent).
    ``k`` defaults to the smallest k any writer used (the only merge-
    safe choice: a union is a valid bottom-k' sample for k' <= min k)."""
    stored = spark.read.parquet(path)
    if k is None:
        k = stored.agg(F.min("__k")).first()[0]
    from pyspark.sql import Window
    w = (Window.partitionBy(*[F.col(c) for c in group_cols])
         if group_cols else Window.partitionBy(F.lit(1)))
    dedup = stored.dropDuplicates(list(group_cols) + ["id"] if group_cols
                                  else ["id"])
    rn = F.row_number().over(w.orderBy(F.col("__h"), F.col("id")))
    return (dedup.withColumn("__rn", rn)
            .where(F.col("__rn") <= k).drop("__rn", "__k"))


# ---------------------------------------------------------------------------
# Count-min sketch — mergeable frequency estimates (heavy hitters)
# ---------------------------------------------------------------------------

def cms_cells(df: DataFrame, value_col: str, d: int = 4,
              prefix_len: int = 3,
              group_cols: list[str] | tuple[str, ...] = ()) -> DataFrame:
    """Count-min sketch of *value_col* as ``(group..., row, cell, n)``.

    *d* hash rows x ``16**prefix_len`` cells per row (md5 hex-prefix
    cells — engine-portable, so estimates are fully oracle-checkable).
    The sketch is a COUNTER MATRIX, hence linearly mergeable: the CMS of
    a union is the cell-wise SUM of the per-shard sketches — the
    heavy-hitter companion to the HLL store above (frequency, not
    cardinality), sized ``d * 16**prefix_len`` rows no matter how much
    data flowed through.

    Standard CMS guarantees: estimate >= true count always (counters
    only over-count on collisions); overestimate <= eN/w with
    probability 1 - (1/2)^d for w cells.
    """
    # NULL maps to an explicit sentinel BEFORE hashing (md5 of a
    # concat with NULL is NULL): the sketch and the probe must agree
    # on NULL's cells or a NULL probe would estimate 0 while NULLs
    # were counted in, breaking est >= true-count.  The sentinel
    # starts with a NUL byte, which no numeric/date/bool cast can
    # produce; a STRING column could in principle hold the literal
    # "\x00NULL" and would then share NULL's cells — that only
    # inflates both estimates (est >= true still holds), it never
    # under-counts.
    v = F.coalesce(F.col(value_col).cast("string"),
                   F.lit("\x00NULL"))
    rc = F.explode(F.array(*[
        F.struct(
            F.lit(i).alias("row"),
            F.substring(F.md5(F.concat(F.lit(f"cms{i}:"), v)),
                        1, prefix_len).alias("cell"))
        for i in range(d)])).alias("__rc")
    return (df.select(*group_cols, rc)
            .select(*group_cols, F.col("__rc.row").alias("row"),
                    F.col("__rc.cell").alias("cell"))
            .groupBy(*group_cols, "row", "cell")
            .agg(F.count(F.lit(1)).alias("n")))


def cms_merge(cms: DataFrame,
              group_cols: list[str] | tuple[str, ...] = ()) -> DataFrame:
    """Merge sketch shards cell-wise (the linearity of CMS): input may
    hold many shards' cells; output has one row per (group, row, cell)."""
    return (cms.groupBy(*group_cols, "row", "cell")
            .agg(F.sum("n").alias("n")))


def cms_estimate(cms: DataFrame, probes: DataFrame, value_col: str,
                 d: int = 4, prefix_len: int = 3) -> DataFrame:
    """Estimate each probe value's frequency from a (merged) sketch:
    ``(value, est)`` with ``est = min over rows of the probe's cell``.

    The sketch side is d x w counters — kilobytes — so it BROADCASTS to
    the probe side (left join, probes preserved: a probe whose cell is
    absent from the sketch scores 0 — never seen).

    Expects an UNGROUPED sketch: a grouped one would silently take the
    min across groups' cells — merge or filter to one group first."""
    extra = set(cms.columns) - {"row", "cell", "n"}
    if extra:
        raise ValueError(
            f"cms_estimate needs an ungrouped sketch (row, cell, n); "
            f"found extra columns {sorted(extra)} — filter to one group "
            "or cms_merge without group_cols first")
    # NULL maps to an explicit sentinel BEFORE hashing (md5 of a
    # concat with NULL is NULL): the sketch and the probe must agree
    # on NULL's cells or a NULL probe would estimate 0 while NULLs
    # were counted in, breaking est >= true-count.  The sentinel
    # starts with a NUL byte, which no numeric/date/bool cast can
    # produce; a STRING column could in principle hold the literal
    # "\x00NULL" and would then share NULL's cells — that only
    # inflates both estimates (est >= true still holds), it never
    # under-counts.
    v = F.coalesce(F.col(value_col).cast("string"),
                   F.lit("\x00NULL"))
    keys = probes.select(
        v.alias("value"),
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("row"),
                F.substring(F.md5(F.concat(F.lit(f"cms{i}:"), v)),
                            1, prefix_len).alias("cell"))
            for i in range(d)])).alias("__rc"))
    keys = keys.select("value", F.col("__rc.row").alias("row"),
                       F.col("__rc.cell").alias("cell"))
    return (keys.join(F.broadcast(cms), ["row", "cell"], "left")
            .groupBy("value")
            .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("est")))


def write_cms_store(df: DataFrame, path: str, value_col: str,
                    d: int = 4, prefix_len: int = 3,
                    group_cols: list[str] | tuple[str, ...] = (),
                    mode: str = "append") -> None:
    """Persist a batch's CMS cells (``mode='append'`` = incremental: each
    ingest batch appends its own d x w counters; the reader's cell-wise
    sum reconstructs THE sketch of everything ever written)."""
    (cms_cells(df, value_col, d, prefix_len, group_cols)
     .withColumn("__d", F.lit(int(d)))
     .withColumn("__w", F.lit(int(16 ** prefix_len)))
     .write.mode(mode).parquet(path))


def read_cms(spark, path: str,
             group_cols: list[str] | tuple[str, ...] = ()) -> DataFrame:
    """Merge a CMS store back into one sketch.  Mixed (d, w) parameters
    raise — cells from differently-shaped sketches must never be summed
    (same rule as the signature and HLL stores)."""
    store = spark.read.parquet(path)
    shapes = [tuple(r) for r in
              store.select("__d", "__w").distinct().collect()]
    if len(shapes) > 1:
        raise ValueError(
            f"CMS store at [{path}] mixes sketch shapes {sorted(shapes)}; "
            "rebuild with one (d, w)")
    return cms_merge(store.drop("__d", "__w"), group_cols)


def sample_quantiles(sample: DataFrame, probs: list[float],
                     group_cols: list[str] | tuple[str, ...] = (),
                     ) -> DataFrame:
    """Exact quantiles OF THE SAMPLE per group (type-1 / lower
    interpolation — engine-portable integer rank math, no float
    interpolation): ``(group..., prob, quantile)``.  With a bottom-k
    sample of n rows the estimate converges at O(1/sqrt(k)) like any
    uniform-sample quantile."""
    from pyspark.sql import Window
    w = (Window.partitionBy(*[F.col(c) for c in group_cols])
         if group_cols else Window.partitionBy(F.lit(1)))
    ranked = (sample
              .withColumn("__rn", F.row_number().over(
                  w.orderBy(F.col("value"), F.col("id"))))
              .withColumn("__n", F.count(F.lit(1)).over(w)))
    out = None
    for p in probs:
        # type-1 quantile: value at rank ceil(p*n), clamped to [1, n]
        target = F.greatest(F.lit(1), F.ceil(F.lit(float(p))
                                             * F.col("__n")).cast("int"))
        part = (ranked.where(F.col("__rn") == target)
                .select(*group_cols, F.lit(float(p)).alias("prob"),
                        F.col("value").alias("quantile")))
        out = part if out is None else out.unionByName(part)
    return out


# ---------------------------------------------------------------------------
# Mergeable aggregate store — incremental materialized aggregates
# ---------------------------------------------------------------------------

_AGG_MERGE = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}


def agg_partials(df: DataFrame,
                 group_cols: list[str] | tuple[str, ...],
                 aggs: dict) -> DataFrame:
    """One batch's partial aggregates: *aggs* maps output name ->
    ``(func, col)`` with func in count/sum/min/max — the ALGEBRAIC
    aggregates, whose partials merge losslessly (count/sum by sum,
    min/max by themselves).  Column names carry the merge rule as a
    ``__<func>`` suffix so the reader needs no side metadata."""
    exprs = []
    for name, (func, col) in aggs.items():
        if func not in _AGG_MERGE:
            raise ValueError(
                f"agg [{func}] is not mergeable here; supported: "
                f"{sorted(_AGG_MERGE)} (avg = sum/count at read time; "
                "distinct -> the HLL store; quantiles -> the sample "
                "store)")
        fn = {"count": lambda c: F.count(F.lit(1)), "sum": F.sum,
              "min": F.min, "max": F.max}[func]
        exprs.append(fn(col).alias(f"{name}__{func}"))
    return df.groupBy(*group_cols).agg(*exprs)


def write_agg_store(df: DataFrame, path: str,
                    group_cols: list[str] | tuple[str, ...],
                    aggs: dict, mode: str = "append") -> None:
    """Incremental materialized aggregate: each ingest batch appends its
    partial rows (one per group per batch — metadata-sized relative to
    the batch); :func:`read_agg_store` merges.  The classic
    "maintain the dashboard aggregate without rescanning history"
    pattern, same store discipline as the HLL/CMS/sample stores."""
    agg_partials(df, group_cols, aggs).write.mode(mode).parquet(path)


def read_agg_store(spark, path: str,
                   group_cols: list[str] | tuple[str, ...]) -> DataFrame:
    """Merge the store back into THE aggregate of everything written:
    ``<name>__count/sum`` partials re-sum, ``__min``/``__max`` re-min/
    max; output columns drop the suffix."""
    store = spark.read.parquet(path)
    exprs = []
    for c in store.columns:
        if c in group_cols:
            continue
        name, _, func = c.rpartition("__")
        merge = _AGG_MERGE.get(func)
        if merge is None:
            raise ValueError(f"column [{c}] lacks a mergeable suffix")
        fn = {"sum": F.sum, "min": F.min, "max": F.max}[merge]
        exprs.append(fn(c).alias(name))
    return store.groupBy(*group_cols).agg(*exprs)


# ---------------------------------------------------------------------------
# Exact heavy hitters with bounded aggregation state (CMS cell filter).
# ---------------------------------------------------------------------------

def heavy_hitters(items: DataFrame, item_col: str, min_count: int,
                  width_exp: int = 16, depth: int = 2,
                  seed: int = 0x9E3779B9) -> DataFrame:
    """EXACT set of items occurring >= *min_count* times, without the
    unbounded partial-aggregation state of a plain
    ``groupBy(item).count()``.

    At 100 TB the distinct-item space (think 5-grams) dwarfs executor
    memory, so the map-side partial aggregate of a naive wordcount
    spills continuously and the shuffle approaches one record per
    DISTINCT item per task.  This is the count-min *cell filter*
    instead (the candidate trick behind Manku-Motwani / CMS heavy
    hitters, made exact):

    1. *depth* independent hash dimensions fold every occurrence into
       ``2**width_exp`` cells each — ONE scan, one aggregation whose
       state is exactly ``depth * 2**width_exp`` longs, regardless of
       corpus size.  A cell's total >= the count of every item in it,
       so "item is heavy" implies "all its cells are heavy": keeping
       only items whose *every* cell total >= min_count NEVER drops a
       true heavy hitter (deterministic — no sampling, no luck).
    2. Exact recount of the survivors only: the second aggregation's
       state is the true heavy hitters plus collision passengers,
       which shrink multiplicatively with *depth* (an item survives
       only when ALL its cells are saturated by someone else).

    The cell filters join on small int sets; AQE broadcasts them when
    they fit (cells with total >= min_count number at most
    occurrences/min_count — metadata-sized for any threshold worth
    calling "heavy").  Returns ``(item, n_occurrences)`` with
    ``n_occurrences >= min_count``, exactly.
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1 [{min_count}]")
    heavy_cells = (hh_cell_counts(items, item_col, width_exp, depth, seed)
                   .where(F.col("n") >= min_count))
    return _hh_survivor_recount(items, item_col, heavy_cells,
                                width_exp, depth, seed, min_count)


def hh_cell_counts(items: DataFrame, item_col: str, width_exp: int = 16,
                   depth: int = 2, seed: int = 0x9E3779B9) -> DataFrame:
    """The bounded-state cell pass of :func:`heavy_hitters` on its own:
    ``(dim, cell, n)`` partials — one scan, aggregation state exactly
    ``depth * 2**width_exp``.  Cell counts are plain sums, so partials
    from different shards MERGE losslessly (the heavy-hitter analogue
    of the HLL/CMS stores)."""
    if not 1 <= depth <= 8:
        raise ValueError(f"depth must be in [1, 8] [{depth}]")
    width = 1 << width_exp
    src = items.select(F.col(item_col).alias("item"))
    stacked = src.select(F.explode(F.array(*[
        F.struct(F.lit(d).alias("dim"),
                 F.pmod(F.xxhash64(F.col("item"), F.lit(seed + d)),
                        F.lit(width)).alias("cell"))
        for d in range(depth)])).alias("dc")) \
        .select("dc.dim", "dc.cell")
    return stacked.groupBy("dim", "cell").agg(
        F.count(F.lit(1)).alias("n"))


def _hh_survivor_recount(items: DataFrame, item_col: str,
                         heavy_cells: DataFrame, width_exp: int,
                         depth: int, seed: int,
                         min_count: int) -> DataFrame:
    """Second pass of :func:`heavy_hitters`: keep items whose EVERY
    cell is heavy (deterministic superset), then recount exactly."""
    width = 1 << width_exp
    cells = [F.pmod(F.xxhash64(F.col("item"), F.lit(seed + d)),
                    F.lit(width)).alias(f"__c{d}") for d in range(depth)]
    survivors = items.select(F.col(item_col).alias("item")) \
        .select("item", *cells)
    for d in range(depth):
        hc = heavy_cells.where(F.col("dim") == d) \
            .select(F.col("cell").alias(f"__c{d}"))
        survivors = survivors.join(hc, f"__c{d}", "left_semi")
    return (survivors.groupBy("item")
            .agg(F.count(F.lit(1)).alias("n_occurrences"))
            .where(F.col("n_occurrences") >= min_count))


def write_hh_cell_store(items: DataFrame, path: str, item_col: str,
                        width_exp: int = 16, depth: int = 2,
                        seed: int = 0x9E3779B9,
                        mode: str = "append") -> None:
    """Persist a batch's heavy-hitter cell partials (``mode='append'``
    = incremental: each ingest batch appends its own depth x width
    counters; the reader's cell-wise sum is THE cell pass of everything
    ever written — new shards never force a rescan of old ones)."""
    (hh_cell_counts(items, item_col, width_exp, depth, seed)
     .withColumn("__we", F.lit(int(width_exp)))
     .withColumn("__d", F.lit(int(depth)))
     .withColumn("__seed", F.lit(int(seed)))
     .write.mode(mode).parquet(path))


def heavy_hitters_from_store(spark, path: str, items: DataFrame,
                             item_col: str, min_count: int) -> DataFrame:
    """Exact heavy hitters of everything ever written to the cell
    store.  The merged cell partials provide the candidate filter
    without re-running the cell pass; *items* must be the union of the
    corpora the store was built from (the recount scans it once, with
    survivor-bounded state).  Mixed (width, depth, seed) shards raise —
    cells from differently-shaped passes must never be summed."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1 [{min_count}]")
    store = spark.read.parquet(path)
    shapes = [tuple(r) for r in
              store.select("__we", "__d", "__seed").distinct().collect()]
    if len(shapes) > 1:
        raise ValueError(
            f"heavy-hitter cell store at [{path}] mixes shapes "
            f"{sorted(shapes)}; rebuild with one (width_exp, depth, seed)")
    width_exp, depth, seed = (int(v) for v in shapes[0])
    heavy_cells = (store.groupBy("dim", "cell")
                   .agg(F.sum("n").alias("n"))
                   .where(F.col("n") >= min_count))
    return _hh_survivor_recount(items, item_col, heavy_cells,
                                width_exp, depth, seed, min_count)


def heavy_hitter_ngrams(docs: DataFrame, text_col: str = "text",
                        n: int = 3, min_count: int = 20,
                        width_exp: int = 16, depth: int = 2) -> DataFrame:
    """Corpus-level boilerplate mining: the exact word n-grams occurring
    >= *min_count* times (lowercased), via :func:`heavy_hitters` — the
    pass that finds repeated headers/footers/licence blurbs before a
    span-level dedup decides what to cut."""
    from ..functions import text as TX
    grams = docs.select(F.explode(
        TX.word_ngrams(F.lower(F.col(text_col)), n)).alias("g"))
    hh = heavy_hitters(grams, "g", min_count, width_exp, depth)
    return hh.select(F.col("item").alias("ngram"), "n_occurrences") \
        .orderBy(F.desc("n_occurrences"), "ngram")
