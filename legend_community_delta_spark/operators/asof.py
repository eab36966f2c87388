"""As-of and range joins — time-series operators Spark lacks natively.

* :func:`asof_join` — for each left row, attach the latest right row with
  ``right.ts <= left.ts`` per key (backward as-of; ``forward`` mirrors it).
  Implemented with the union + last-ignoring-nulls window trick: one
  shuffle on the key, no per-row Python, no cross product — the canonical
  Spark formulation (Flink/kdb asof semantics, DuckDB ``ASOF JOIN``
  equivalent, which the demo oracle uses).
* :func:`range_join` — point-in-interval equi-ized via bucketing: both
  sides map to coarse buckets (intervals explode to every bucket they
  overlap), the join runs on (key?, bucket) and an exact predicate
  filters.  Turns an O(n*m) inequality join into an equi-join sized by
  bucket occupancy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import NumericType


def asof_join(left: DataFrame, right: DataFrame, on: str | list[str],
              ts_col: str, value_cols: list[str] | None = None,
              direction: str = "backward",
              suffix: str = "_asof",
              time_bucket: int | None = None,
              tolerance: float | int | None = None) -> DataFrame:
    """Left as-of join: every left row + the nearest preceding (backward)
    or following (forward) right row's *value_cols* per *on* key.

    Ties at equal ``ts``: the right row is considered visible (inclusive).
    Right rows should be unique per (key, ts) — pre-aggregate if not.
    Unmatched left rows keep NULLs (left-join semantics).

    **Skew knob**: the default plan windows ``partitionBy(key)`` — one
    partition per key, ideal for high-cardinality keys (user_id) but a
    single fat partition when few keys carry deep histories (telemetry
    with a handful of series).  Pass *time_bucket* (a width in *ts_col*'s
    units; numeric ts required — convert timestamps to epoch µs first)
    to window ``partitionBy(key, floor(ts/width))`` instead, with a
    boundary carry: per-(key, bucket) edge values aggregate to one row
    per bucket, a metadata-sized per-key window computes each bucket's
    carry-in, and within-bucket results coalesce with it.  Same output
    as the default plan (pinned in tests), with partition size bounded
    by bucket occupancy instead of key history length.  Leave ``None``
    when keys are plentiful — the bucketed plan spends two extra
    shuffles for parallelism the key count already provides.
    """
    keys = [on] if isinstance(on, str) else list(on)
    value_cols = value_cols or [
        c for c in right.columns if c not in keys + [ts_col]]
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    if tolerance is not None:
        # max staleness (pandas merge_asof semantics): a match farther
        # than `tolerance` in ts_col's units reverts to the unmatched
        # NULLs.  Implemented by carrying the matched right ts as one
        # more value column through the UNTOLERANCED plan (default or
        # bucketed alike), then nulling stale matches in a final select.
        if tolerance < 0:
            raise ValueError(f"tolerance must be >= 0, got {tolerance}")
        if not isinstance(left.schema[ts_col].dataType, NumericType):
            raise TypeError(
                f"tolerance needs a numeric {ts_col!r} (staleness = "
                "ts difference); convert timestamps to epoch µs first")
        rts = "__rts"
        out = asof_join(left, right.withColumn(rts, F.col(ts_col)), on,
                        ts_col, value_cols + [rts], direction, suffix,
                        time_bucket)
        matched_ts = F.col(f"{rts}{suffix}")
        age = (F.col(ts_col) - matched_ts if direction == "backward"
               else matched_ts - F.col(ts_col))
        stale = matched_ts.isNull() | (age > tolerance)
        return out.select(
            *[c for c in left.columns],
            *[F.when(stale,
                     F.lit(None).cast(right.schema[c].dataType))
              .otherwise(F.col(f"{c}{suffix}")).alias(f"{c}{suffix}")
              for c in value_cols])

    lhs = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}")
          for c in value_cols])
    rhs = right.select(
        *[F.col(k) for k in keys],
        F.col(ts_col),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in keys + [ts_col]],
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols])
    unioned = lhs.unionByName(rhs)

    backward = direction == "backward"
    # right rows (side 0) sort before left rows at equal ts -> inclusive
    order = [F.col(ts_col).asc() if backward else F.col(ts_col).desc(),
             F.col("__is_left").asc()]

    if time_bucket is None:
        w = (Window.partitionBy(*keys).orderBy(*order)
             .rowsBetween(Window.unboundedPreceding, 0))
        picked = [F.last(f"{c}{suffix}", ignorenulls=True).over(w)
                  .alias(f"{c}{suffix}") for c in value_cols]
        out = unioned.select(
            *[c for c in left.columns], "__is_left", *picked)
        return out.where(F.col("__is_left") == 1).drop("__is_left")

    if not isinstance(unioned.schema[ts_col].dataType, NumericType):
        raise TypeError(
            f"time_bucket needs a numeric {ts_col!r} (bucket = "
            "floor(ts/width)); convert timestamps to epoch µs first")

    u = unioned.withColumn("__tb",
                           F.floor(F.col(ts_col) / F.lit(time_bucket)))
    w_in = (Window.partitionBy(*keys, "__tb").orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, 0))
    within = [F.last(f"{c}{suffix}", ignorenulls=True).over(w_in)
              .alias(f"__w_{c}") for c in value_cols]
    u = u.select(*u.columns, *within)

    # boundary value each bucket exports: per column, its last (backward)
    # / first (forward) NON-NULL right value — ONE row per (key, bucket).
    # NULL-valued rows get a NULL ordering key so max_by/min_by skip them;
    # exporting the boundary ROW's value instead would export NULL and the
    # carry window would then skip the whole bucket, diverging from the
    # default plan's per-column last(ignorenulls=True).
    pick = F.max_by if backward else F.min_by
    edges = (u.where(F.col("__is_left") == 0)
             .groupBy(*keys, "__tb")
             .agg(*[pick(F.col(f"{c}{suffix}"),
                         F.when(F.col(f"{c}{suffix}").isNotNull(),
                                F.col(ts_col)))
                    .alias(f"__b_{c}") for c in value_cols]))

    # carry-in per bucket = nearest exporting bucket strictly before
    # (after, forward) it — a per-key window over bucket COUNT rows
    # (metadata-sized next to the row data)
    buckets = u.select(*keys, "__tb").distinct()
    w_carry = (Window.partitionBy(*keys)
               .orderBy(F.col("__tb").asc() if backward
                        else F.col("__tb").desc())
               .rowsBetween(Window.unboundedPreceding, -1))
    carry = (buckets.join(edges, keys + ["__tb"], "left")
             .select(*keys, "__tb",
                     *[F.last(f"__b_{c}", ignorenulls=True).over(w_carry)
                       .alias(f"__c_{c}") for c in value_cols]))

    return (u.join(carry, keys + ["__tb"])
            .where(F.col("__is_left") == 1)
            .select(*[c for c in left.columns],
                    *[F.coalesce(f"__w_{c}", f"__c_{c}")
                      .alias(f"{c}{suffix}") for c in value_cols]))


def range_join(points: DataFrame, intervals: DataFrame,
               point_col: str, start_col: str, end_col: str,
               on: str | list[str] | None = None,
               bucket: int = 3600,
               max_buckets_per_interval: int = 10_000) -> DataFrame:
    """Join each point row to every interval containing it
    (``start <= point < end``), optionally also matching key columns *on*.

    Both sides are mapped to integer buckets of width *bucket* (same units
    as the columns); intervals explode to each bucket they overlap.  The
    bucket equi-join prunes candidates; the exact range predicate decides.
    Pick *bucket* near the median interval length: too small explodes the
    interval side, too large inflates candidate pairs.

    **Explosion guard**: an interval spanning more than
    *max_buckets_per_interval* buckets (a year-long outlier against a
    1-second bucket, a sentinel end like 9999-12-31) fails the job with
    a pointed error instead of silently materializing millions of
    exploded rows per such interval — raise the limit deliberately if
    genuinely-huge intervals are expected, or widen *bucket*.
    """
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    p = points.withColumn("__bucket",
                          F.floor(F.col(point_col) / F.lit(bucket)))
    n_buckets = (F.floor(F.col(end_col) / F.lit(bucket))
                 - F.floor(F.col(start_col) / F.lit(bucket)) + 1)
    err_msg = F.concat(
        F.lit(f"range_join: interval spans more than "
              f"{max_buckets_per_interval} buckets of width {bucket} "
              f"(start="),
        F.col(start_col).cast("string"), F.lit(", end="),
        F.col(end_col).cast("string"),
        F.lit("); widen bucket= or raise max_buckets_per_interval="))
    guard = F.when(
        n_buckets <= F.lit(max_buckets_per_interval),
        F.sequence(F.floor(F.col(start_col) / F.lit(bucket)),
                   F.floor(F.col(end_col) / F.lit(bucket)))
    ).otherwise(F.raise_error(err_msg).cast("array<bigint>"))
    i = intervals.withColumn("__bucket", F.explode(guard))
    joined = p.join(i, keys + ["__bucket"])
    return (joined
            .where((F.col(point_col) >= F.col(start_col))
                   & (F.col(point_col) < F.col(end_col)))
            .drop("__bucket"))


def resample_ffill(df: DataFrame, ts_col: str, step: int,
                   on: str | list[str] | None = None,
                   value_cols: list[str] | None = None,
                   suffix: str = "",
                   max_ticks_per_key: int = 1_000_000) -> DataFrame:
    """Regular-grid resampling with forward fill: one row per (key,
    grid tick) spanning each key's observed range, each carrying the
    last observation at or before the tick — the gap-filling /
    downsample-to-grid step before any aligned time-series math
    (numeric *ts_col*; ticks at multiples of *step*).

    Built as grid-generation + :func:`asof_join` (backward): the grid is
    one sequence-explode per key (bounds from a metadata-sized min/max
    aggregate), so the whole operator inherits the as-of join's scale
    story (and its ``time_bucket`` knob if a key's history is deep).
    Keys whose range would exceed *max_ticks_per_key* fail with a
    pointed error instead of silently exploding (same guard discipline
    as range_join).
    """
    keys = [] if on is None else ([on] if isinstance(on, str)
                                  else list(on))
    if not keys:
        df = df.withColumn("__k", F.lit(1))
        keys = ["__k"]
    bounds = df.groupBy(*keys).agg(
        F.floor(F.min(ts_col) / F.lit(step)).alias("__lo"),
        F.floor(F.max(ts_col) / F.lit(step)).alias("__hi"))
    n_ticks = F.col("__hi") - F.col("__lo") + 1
    err = F.concat(
        F.lit(f"resample_ffill: key range spans more than "
              f"{max_ticks_per_key} ticks of step {step} (lo="),
        F.col("__lo").cast("string"), F.lit(", hi="),
        F.col("__hi").cast("string"),
        F.lit("); widen step= or raise max_ticks_per_key="))
    guard = F.when(n_ticks <= F.lit(max_ticks_per_key),
                   F.sequence(F.col("__lo"), F.col("__hi"))
                   ).otherwise(F.raise_error(err).cast("array<bigint>"))
    grid = (bounds.select(*keys, F.explode(guard).alias("__tick"))
            .select(*keys, (F.col("__tick") * F.lit(step)).alias(ts_col)))
    out = asof_join(grid, df, keys, ts_col, value_cols,
                    direction="backward", suffix=suffix or "_asof")
    if not suffix:
        vcs = value_cols or [c for c in df.columns
                             if c not in keys + [ts_col]]
        for c in vcs:
            out = out.withColumnRenamed(f"{c}_asof", c)
    return out.drop("__k")
