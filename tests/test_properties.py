"""Property-based tests (hypothesis): codegen round-trips and compiler
function-table behavior hold for arbitrary inputs, not just fixtures."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import types as T

from legend_community_delta_spark import load_dicts
from legend_community_delta_spark.codegen import generate_pure_from_schema
from legend_community_delta_spark.plans.parser import parse_model_text
from legend_community_delta_spark.schema import mapping_schema, relaxed

# Spark types whose PURE round trip is type-stable
# (Byte/Short collapse to Integer by design — excluded)
_STABLE_TYPES = [
    T.StringType(), T.IntegerType(), T.LongType(), T.DoubleType(),
    T.FloatType(), T.BooleanType(), T.DateType(), T.TimestampType(),
]

_field_name = st.from_regex(re.compile(r"[a-z][a-z0-9]{0,8}(_[a-z0-9]{1,6}){0,2}"),
                            fullmatch=True)


@st.composite
def flat_schemas(draw):
    names = draw(st.lists(_field_name, min_size=1, max_size=8, unique=True))
    return T.StructType([
        T.StructField(n, draw(st.sampled_from(_STABLE_TYPES)),
                      nullable=draw(st.booleans()))
        for n in names
    ])


@settings(max_examples=40, deadline=None)
@given(flat_schemas())
def test_codegen_round_trip_schema(schema):
    """schema -> PURE text -> (our parser) -> model -> mapping schema
    reproduces the original columns/types, nullable-relaxed."""
    text = generate_pure_from_schema("prop::test", "db", "tbl", schema)
    model = load_dicts(parse_model_text(text))
    out = mapping_schema(model, "prop::test::mapping::Tbl")
    expected = relaxed(schema)
    assert [f.name for f in out.fields] == [f.name for f in expected.fields]
    assert [f.dataType for f in out.fields] == [f.dataType for f in expected.fields]


def test_expectation_sql_is_always_parseable(spark):
    """Every generated expectation compiles under Spark's SQL parser."""
    from pyspark.sql import functions as F
    from legend_community_delta_spark.expectations import class_expectations
    from fixtures import ALL_ENTITIES

    model = load_dicts(ALL_ENTITIES)
    for cls_path in ("demo::entity::employee", "demo::entity::person"):
        rules = class_expectations(model, model.get_class(cls_path))
        for sql in rules.values():
            F.expr(sql)  # raises on unparseable SQL


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=-10**9, max_value=10**9),
       st.integers(min_value=-10**9, max_value=10**9))
def test_pure_parser_comparison_round_trip(a, b):
    from legend_community_delta_spark.plans.parser import parse_expression
    from legend_community_delta_spark.plans.compiler import Context, to_sql
    from legend_community_delta_spark.model.loader import LegendModel

    ast = parse_expression(f"{a} + {b} > {b}")
    ctx = Context(model=LegendModel())
    sql = to_sql(ast, ctx)
    assert sql == f"{a} + {b} > {b}"
