"""DataFrame-level operations: ``legend_transform`` / ``legend_validate``.

Reference behavior (``package.scala:29-51``):

* ``legendTransform`` — rename every mapped property to its target column.
  The reference folds ``withColumnRenamed``; we emit **one** projection
  (a single ``select``) — same result, one plan node.
* ``legendValidate`` — append an array column with the *names of violated
  rules* per row.  The reference uses a row-wise Scala UDF (its only UDF,
  opaque to Catalyst).  We use pure Column algebra — ``when`` + ``array``
  + ``array_compact`` — which stays inside whole-stage codegen and costs a
  single projection at any scale (SURVEY §4 calls this out explicitly).

Violation semantics: a rule is violated when its expression is **not true**
(false *or* NULL).  Guarded expectation SQL never evaluates to NULL; for
unguarded business rules this "fails closed" deterministically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def legend_transform(df: DataFrame, transformations: dict[str, str]) -> DataFrame:
    """Rename source properties to target columns in one projection.

    *transformations* maps property name -> column name.  Unmapped columns
    pass through unchanged, in their original order.
    """
    cols = [F.col(f"`{c}`").alias(transformations.get(c, c)) for c in df.columns]
    return df.select(*cols)


def violations_column(expectations: dict[str, str]) -> Column:
    """Array of names of violated rules — pure Column algebra, no UDF."""
    if not expectations:
        return F.array().cast("array<string>")
    flags = [
        F.when(~F.expr(sql).eqNullSafe(F.lit(True)), F.lit(name))
        for name, sql in expectations.items()
    ]
    return F.array_compact(F.array(*flags))


def legend_validate(df: DataFrame, expectations: dict[str, str],
                    column: str = "legend") -> DataFrame:
    """Append the violated-rules array column (default name ``legend``,
    matching the reference)."""
    return df.withColumn(column, violations_column(expectations))


def dq_metrics(df: DataFrame, expectations: dict[str, str],
               column: str = "legend") -> DataFrame:
    """Violated-rule counts: explode + groupBy (``LegendSparkTest.scala:58-67``).

    Returns columns ``(rule, violations)``.  The aggregation is map-side
    combinable; at scale this is one narrow projection + one shuffle of
    |rules| groups.
    """
    validated = df if column in df.columns else legend_validate(df, expectations, column)
    return (validated
            .select(F.explode(F.col(column)).alias("rule"))
            .groupBy("rule")
            .agg(F.count(F.lit(1)).alias("violations")))
