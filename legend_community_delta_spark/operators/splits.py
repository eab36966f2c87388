"""Dataset split and output-layout operators for training pipelines.

Two jobs every pretraining pipeline runs after curation and before
tokenization, both absent from the reference (its scope ends at Legend
query/validation — `/root/reference/README.md`):

* :func:`leakage_safe_split` — train/val/test assignment where EVERY
  member of a near-dup cluster lands in the same split.  Splitting by
  ``hash(doc_id)`` leaks: a near-duplicate of a validation doc in train
  inflates eval.  The fix is to hash the near-dup COMPONENT label, so
  the unit of assignment is the cluster, not the doc.
* :func:`shuffle_shards` / :func:`write_training_shards` — the
  deterministic global shuffle: every doc gets a shard (md5-prefix of
  its salted id — uniform by construction) and a reproducible position
  within the shard.  This is the write-side layout op that turns a
  curated corpus into N independently-readable, well-shuffled training
  shards without a global ``orderBy`` (each shard sorts locally after a
  hash repartition — no single-point total sort at 100 TB).

Hex-string thresholds keep everything engine-portable: a fixed-width
lowercase hex prefix compares lexicographically exactly like the number
it encodes, so split assignment is auditable SQL in any engine with
``md5``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .graph import connected_components


def _hex_boundaries(fractions: dict[str, float], hex_chars: int,
                    ) -> list[tuple[str, str]]:
    """[(split_name, upper-bound hex prefix)] for cumulative fractions."""
    if not fractions:
        raise ValueError("fractions must be non-empty")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    space = 16 ** hex_chars
    bounds, cum = [], 0.0
    for name, frac in fractions.items():
        if frac < 0:
            raise ValueError(f"negative fraction for {name!r}")
        cum += frac
        edge = int(cum * space)
        # "g" > every hex digit: an always-true upper bound once the
        # cumulative fraction reaches 1, immune to float round-off and
        # to the fixed-width compare (a 9-char "100000000" would NOT
        # lexicographically dominate 8 hex chars).
        bounds.append((name, "g" * hex_chars if edge >= space
                       else format(edge, f"0{hex_chars}x")))
    return bounds


def leakage_safe_split(df: DataFrame, pairs: DataFrame,
                       id_col: str = "doc_id",
                       fractions: dict[str, float] | None = None,
                       salt: str = "split",
                       hex_chars: int = 8) -> DataFrame:
    """Assign every document to a split such that near-duplicates never
    straddle splits.

    ``pairs`` is any near-dup edge list ``(id_a, id_b)`` (from
    ``verified_near_dup_pairs``, ``minhash_dedup``, …).  Documents in a
    pair inherit their connected component's minimum id as the split
    unit; isolated documents are their own unit.  The unit label is
    hashed (``md5(salt || label)``) and the hex prefix compared against
    cumulative-fraction boundaries — deterministic, engine-portable, and
    independent of row order or partitioning.

    Returns ``df`` plus a ``split`` column.  Scale shape: the only extra
    work over the edge list is :func:`connected_components` (O(log d)
    rounds over the pairs, which are tiny relative to the corpus) and
    one left join from the corpus to the component labels.
    """
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    comp = connected_components(pairs).withColumnRenamed("id", id_col)
    unit = F.coalesce(F.col("component"), F.col(id_col)).cast("string")
    h = F.substring(F.md5(F.concat(F.lit(salt), unit)), 1, hex_chars)
    expr = None
    for name, bound in _hex_boundaries(fractions, hex_chars):
        cond = h < F.lit(bound)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return (df.join(comp, id_col, "left")
            .withColumn("split", expr)
            .drop("component"))


def split_leakage_report(split_df: DataFrame, pairs: DataFrame,
                         id_col: str = "doc_id") -> DataFrame:
    """Audit: count near-dup pairs whose endpoints sit in different
    splits (must be 0 for :func:`leakage_safe_split` output).  Returns
    ``(split_a, split_b, n_pairs)`` for every straddling combination."""
    s = split_df.select(F.col(id_col), "split")
    return (pairs
            .join(s.select(F.col(id_col).alias("id_a"),
                           F.col("split").alias("split_a")), "id_a")
            .join(s.select(F.col(id_col).alias("id_b"),
                           F.col("split").alias("split_b")), "id_b")
            .where(F.col("split_a") != F.col("split_b"))
            .groupBy("split_a", "split_b")
            .agg(F.count(F.lit(1)).alias("n_pairs")))


def shuffle_shards(df: DataFrame, id_col: str = "doc_id",
                   hex_chars: int = 2, salt: str = "") -> DataFrame:
    """Deterministic global shuffle into ``16**hex_chars`` shards.

    Adds ``shard`` (the first *hex_chars* md5 digits of the salted id —
    uniform by construction, no sampling pass) and ``shard_pos`` (the
    doc's 1-based position in the shard's reproducible order: full md5,
    then id).  Changing ``salt`` reshuffles the corpus end-to-end —
    epoch-level reshuffling without touching the data.

    Scale shape: one hash repartition by ``shard`` + per-shard local
    sort (the ``row_number`` window partitions on ``shard``, so no
    global total order is ever materialized — shards are the unit of
    parallelism at write and at read).
    """
    sid = F.concat(F.lit(salt), F.col(id_col).cast("string"))
    h = F.md5(sid)
    w = (Window.partitionBy("shard")
         .orderBy(F.col("__h"), F.col(id_col)))
    return (df.withColumn("__h", h)
            .withColumn("shard", F.substring("__h", 1, hex_chars))
            .withColumn("shard_pos", F.row_number().over(w))
            .drop("__h"))


def write_training_shards(df: DataFrame, path: str,
                          id_col: str = "doc_id",
                          hex_chars: int = 2, salt: str = "") -> None:
    """Materialize :func:`shuffle_shards` as ``shard=``-partitioned
    parquet, one co-located file set per shard (`repartition` by the
    shard column so each output partition holds exactly one shard,
    sorted by its reproducible order)."""
    out = shuffle_shards(df, id_col=id_col, hex_chars=hex_chars, salt=salt)
    (out.repartition(16 ** hex_chars, "shard")
        .sortWithinPartitions("shard", "shard_pos")
        .write.mode("overwrite").partitionBy("shard").parquet(path))
