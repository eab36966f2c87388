"""Join strategy helpers for the 100 TB posture.

Catalyst picks good plans when you tell it what it can't infer:

* :func:`broadcast_join` — explicit broadcast of a small side (dim tables,
  lookup sets).  AQE converts eligible joins automatically, but an explicit
  hint survives stats being missing/stale.
* :func:`salted_join` — skew mitigation for a hot-keyed large side joining
  a modest (but not broadcastable) side: the large side gets a
  deterministic salt, the small side is exploded ``n_salts``-fold, and the
  join runs on (key, salt) so one hot key spreads over n_salts reducers.
  Deterministic (hash-of-row salt, not rand()) so retried tasks produce
  identical output — required for exactly-once at scale.
* :func:`write_bucketed` / co-located joins — pre-shuffle once at write
  time; subsequent equi-joins on the bucket key run with ZERO exchanges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def broadcast_join(large: DataFrame, small: DataFrame, on: list[str] | str,
                   how: str = "inner") -> DataFrame:
    return large.join(F.broadcast(small), on, how)


def salted_join(large: DataFrame, small: DataFrame, on: str,
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Skew-resistant equi-join on *on*.

    The salt is ``xxhash64(whole row) mod n_salts`` — deterministic under
    task retry (``rand()`` would not be), uniform enough to split hot keys.
    The small side is replicated ``n_salts`` times (explode of a literal
    range), so size it accordingly.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]),
                  F.lit(n_salts)).alias("__salt")
    salted_large = large.withColumn("__salt", salt)
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    return (salted_large.join(salted_small, [on, "__salt"], how)
            .drop("__salt"))


def write_bucketed(df: DataFrame, table: str, key: str | list[str],
                   buckets: int = 32, sort: bool = True,
                   mode: str = "overwrite") -> None:
    """Persist *df* bucketed (and sorted) by *key* into the catalog.

    Two tables bucketed identically on the join key co-locate: Spark plans
    their equi-join without any Exchange — the write paid the shuffle once
    for every future join.  This is the batch answer to "reuse a
    partitioning across stages".
    """
    keys = [key] if isinstance(key, str) else key
    writer = df.write.mode(mode).bucketBy(buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def key_skew_report(df: DataFrame, key_cols: list[str] | tuple[str, ...],
                    top_n: int = 20) -> DataFrame:
    """Shuffle-skew diagnosis: the *top_n* heaviest join/groupBy keys
    with their row share — ``(key..., n, frac, rank)``, frac rounded
    to 6, rank by (n desc, keys asc).

    The first thing to run when a shuffle stage straggles at scale: a
    key holding >1/partitions of the rows WILL serialize that partition,
    and the fix (salt it via :func:`salted_join`, or isolate it into a
    broadcast branch) needs the offender list this produces.  One
    count aggregate + a TakeOrderedAndProject over (count, keys) — the
    report itself never shuffles more than the key frequencies.
    """
    from pyspark.sql import functions as F

    keys = [F.col(c) for c in key_cols]
    total = df.agg(F.count(F.lit(1)).alias("__t"))
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    ranked = (counts.crossJoin(F.broadcast(total))
              .select(*key_cols,
                      "n",
                      F.round(F.col("n") / F.col("__t"), 6).alias("frac"))
              .orderBy(F.desc("n"), *key_cols)
              .limit(top_n))
    from pyspark.sql import Window
    rn = F.row_number().over(
        Window.orderBy(F.desc("n"), *[F.col(c) for c in key_cols]))
    return ranked.withColumn("rank", rn)
