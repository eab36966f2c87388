"""Data-governance checks — the privacy/quality screens a regulated
(Legend-shaped) data platform runs before publishing a dataset.

Extension surface: the reference's scope ends at per-row expectations
(`legendValidate`); these are the DATASET-level governance companions —
k-anonymity over quasi-identifier combinations and Benford first-digit
conformance for financial amounts.  Both are plain aggregates (exact,
engine-portable, fully oracle-checkable) and scale as single
map-side-combined groupBys.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from ..functions import local_df


def k_anonymity_report(df: DataFrame, quasi_cols: list[str],
                       k: int = 5) -> DataFrame:
    """One-row k-anonymity summary over the *quasi_cols* combination:
    ``(k, n_rows, n_groups, violating_groups, at_risk_rows,
    min_group_size)`` — a dataset is k-anonymous iff every
    quasi-identifier combination covers >= k rows, so ``at_risk_rows``
    is exactly the re-identifiable population that must be suppressed
    or generalized before release.

    NULL quasi-identifier values form their own group (SQL GROUP BY
    semantics — identical on any engine).  One groupBy + one aggregate.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    groups = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("__n"))
    return groups.agg(
        F.lit(int(k)).alias("k"),
        F.sum("__n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(F.col("__n") < k, 1).otherwise(0))
        .alias("violating_groups"),
        F.sum(F.when(F.col("__n") < k, F.col("__n")).otherwise(0))
        .alias("at_risk_rows"),
        F.min("__n").alias("min_group_size"))


def suppress_small_groups(df: DataFrame, quasi_cols: list[str],
                          k: int = 5) -> DataFrame:
    """The enforcement half: drop every row whose quasi-identifier
    combination covers fewer than *k* rows (suppression — the blunt,
    always-correct k-anonymization).  One aggregate + one semi-join.

    NULL quasi-identifier values form their own group, exactly as
    ``k_anonymity_report`` counts them: the semi-join uses NULL-safe
    equality (``<=>``) per quasi column, so a NULL combination covering
    >= k rows is KEPT (a plain equi-join would silently drop it and the
    report/enforcement pair would disagree on NULL-valued rows)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    ok = (df.groupBy(*quasi_cols)
          .agg(F.count(F.lit(1)).alias("__n"))
          .where(F.col("__n") >= k)
          .drop("__n"))
    ok = ok.select(*[F.col(c).alias(f"__ok_{c}") for c in quasi_cols])
    cond = None
    for c in quasi_cols:
        term = F.col(c).eqNullSafe(F.col(f"__ok_{c}"))
        cond = term if cond is None else cond & term
    return df.join(ok, cond, "left_semi")


def benford_report(df: DataFrame, value_col: str) -> DataFrame:
    """First-digit Benford conformance for a positive amount column:
    per digit 1..9 ``(digit, n, observed_p, expected_p, chi2_term)`` —
    sum the chi2 terms against a chi-square(8) critical value to flag
    fabricated or truncated financial data (the classic forensic
    screen).  Non-positive and NULL amounts are excluded (Benford's law
    applies to positive magnitudes).

    The first significant digit is taken TEXTUALLY from the canonical
    float rendering (first char in '1'..'9') — exact on any engine, no
    log10/pow float round-trip.  One filter + one groupBy(digit).
    """
    v = F.col(value_col)
    # anchored leading-strip (not a global replace): identical behavior
    # in Spark and DuckDB, and scientific renderings ('4.52e-05') still
    # lead with the significant digit after stripping '0's and '.'s
    digit = F.substring(F.regexp_replace(
        F.abs(v).cast("string"), r"^[0.]+", ""), 1, 1)
    base = (df.where(v.isNotNull() & (v > 0))
            .select(digit.cast("int").alias("digit")))
    counts = base.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("__t"))
    digits = local_df(counts.sparkSession,
                      [(d, math.log10(1.0 + 1.0 / d)) for d in range(1, 10)],
                      "digit int, expected_p double")
    return (digits.join(counts, "digit", "left")
            .crossJoin(F.broadcast(total))
            .select("digit",
                    F.coalesce("n", F.lit(0)).alias("n"),
                    F.round(F.coalesce("n", F.lit(0))
                            / F.col("__t"), 6).alias("observed_p"),
                    F.round("expected_p", 6).alias("expected_p"),
                    F.round(
                        F.pow(F.coalesce("n", F.lit(0))
                              - F.col("expected_p") * F.col("__t"), 2)
                        / (F.col("expected_p") * F.col("__t")), 6)
                    .alias("chi2_term")))


def reconcile_tables(left: DataFrame, right: DataFrame,
                     keys: list[str],
                     compare_cols: list[str] | None = None) -> DataFrame:
    """Row-level reconciliation between two tables keyed on *keys*:
    ``(status, n_rows)`` with status in ``matched`` / ``changed`` /
    ``only_left`` / ``only_right`` — the daily control a finance
    platform runs between a source system and its replica (or two
    versions of one table; see also ``VersionedTable.snapshot_diff``
    for the commit-log-aware variant).

    *compare_cols* defaults to every shared non-key column; comparison
    is NULL-SAFE per column (NULL == NULL counts as equal — SQL's
    IS NOT DISTINCT FROM), so a NULL drifting to a value reports as
    ``changed``, not ``matched``.  One full outer join on the keys +
    one aggregate; no hashing, so the result is exact on any engine.
    """
    if not keys:
        raise ValueError("keys must be non-empty")
    if compare_cols is None:
        shared = [c for c in left.columns
                  if c in set(right.columns) and c not in set(keys)]
        compare_cols = shared
    lp = left.select(*keys, *[F.col(c).alias(f"__l_{c}")
                              for c in compare_cols],
                     F.lit(1).alias("__in_l"))
    rp = right.select(*keys, *[F.col(c).alias(f"__r_{c}")
                               for c in compare_cols],
                      F.lit(1).alias("__in_r"))
    j = lp.join(rp, keys, "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"__l_{c}").eqNullSafe(F.col(f"__r_{c}"))
    status = (F.when(F.col("__in_l").isNull(), F.lit("only_right"))
              .when(F.col("__in_r").isNull(), F.lit("only_left"))
              .when(same, F.lit("matched"))
              .otherwise(F.lit("changed")))
    return (j.select(status.alias("status"))
            .groupBy("status").agg(F.count(F.lit(1)).alias("n_rows")))


def scd2_history(changes: DataFrame, keys: list[str], ts_col: str,
                 attr_cols: list[str],
                 collapse_noops: bool = True) -> DataFrame:
    """Build a type-2 slowly-changing-dimension history from a change
    feed: one row per key per VERSION with ``valid_from`` /
    ``valid_to`` / ``is_current`` — the warehouse-modeling staple for
    auditable attribute history (who held which status, when).

    *changes* carries one row per observed state ``(keys..., ts,
    attrs...)``.  With *collapse_noops* (default) a change whose
    attributes NULL-safely equal the previous observed state opens no
    new version — exactly SCD2's "only real changes version" rule.
    ``valid_to`` is the next version's ``valid_from`` (half-open
    intervals, no gaps/overlaps by construction); the latest version
    has ``valid_to`` NULL and ``is_current`` true.

    Ties on (keys, ts) are broken deterministically by the attribute
    values ascending.  Two window passes partitioned by the keys —
    shuffles only on the key columns.
    """
    from pyspark.sql import Window

    if not keys or not attr_cols:
        raise ValueError("keys and attr_cols must be non-empty")
    w = (Window.partitionBy(*keys)
         .orderBy(F.col(ts_col), *[F.col(c) for c in attr_cols]))
    cur = changes.select(*keys, ts_col, *attr_cols)
    if collapse_noops:
        same_prev = F.lit(True)
        for c in attr_cols:
            same_prev = same_prev & F.col(c).eqNullSafe(
                F.lag(c).over(w))
        # first row per key: lag is NULL on every attr -> eqNullSafe
        # may hold for all-NULL attrs; guard with an explicit row probe
        first_row = F.lag(ts_col).over(w).isNull()
        cur = (cur.withColumn("__noop", same_prev & ~first_row)
               .where(~F.col("__noop")).drop("__noop"))
    w2 = (Window.partitionBy(*keys)
          .orderBy(F.col(ts_col), *[F.col(c) for c in attr_cols]))
    return (cur
            .withColumn("valid_from", F.col(ts_col))
            .withColumn("valid_to", F.lead(ts_col).over(w2))
            .withColumn("is_current", F.col("valid_to").isNull())
            .drop(ts_col))


def gini_by_group(df: DataFrame, value_col: str,
                  group_cols: list[str] | tuple[str, ...] = ()
                  ) -> DataFrame:
    """Gini concentration coefficient of a non-negative amount per
    group: ``G = 2 * sum(i * x_(i)) / (n * sum(x)) - (n + 1) / n``
    over values sorted ascending (rank formula — exact integer/sum
    math, no pairwise differences).  0 = perfectly even, -> 1 = all
    mass in one row; the concentration screen for exposure, revenue,
    or corpus-contribution skew.

    NULLs are excluded (callers apply their own policy to negatives —
    the formula assumes non-negative mass); ties take row_number order,
    which cannot change G (tied values are interchangeable in the rank
    sum).  One window + one aggregate, shuffled on the group columns
    only.
    """
    from pyspark.sql import Window

    v = F.col(value_col)
    base = df.where(v.isNotNull()).select(*group_cols, v.alias("__x"))
    w = (Window.partitionBy(*[F.col(c) for c in group_cols])
         if group_cols else Window.partitionBy(F.lit(1)))
    ranked = base.withColumn(
        "__i", F.row_number().over(w.orderBy(F.col("__x"))))
    return (ranked.groupBy(*group_cols)
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(
                     F.lit(2.0) * F.sum(F.col("__i") * F.col("__x"))
                     / (F.count(F.lit(1)) * F.sum("__x"))
                     - (F.count(F.lit(1)) + F.lit(1.0))
                     / F.count(F.lit(1)), 6).alias("gini")))
