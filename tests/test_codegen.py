"""Codegen goldens + round-trip (reference ``LegendCodegenTest.scala``)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from legend_community_delta_spark import LegendModelError, load_dicts
from legend_community_delta_spark.codegen import (
    camel_case_entity,
    camel_case_field,
    generate_pure_from_schema,
    is_valid_namespace,
)
from legend_community_delta_spark.plans.parser import (
    parse_lambda,
    parse_model_text,
    validate_model,
)
from legend_community_delta_spark.plans.query import parse_service_lambda, plan_sql


def _meta(comment: str) -> dict:
    return {"comment": comment}


def test_namespace_rules():
    # LegendCodegenTest.scala:35-41
    assert is_valid_namespace("antoine::amend")
    assert not is_valid_namespace(" antoine::amend")
    assert not is_valid_namespace("antoine.amend")
    assert not is_valid_namespace("antoine::amend::")
    assert is_valid_namespace("antoine::amend::legend")


def test_casing_rules():
    # LegendCodegenTest.scala:43-50
    assert camel_case_entity("hello_world") == "HelloWorld"
    assert camel_case_entity("helloWorld") == "HelloWorld"
    assert camel_case_entity("helloworld") == "Helloworld"
    assert camel_case_field("hello_world") == "helloWorld"
    assert camel_case_field("helloWorld") == "helloWorld"
    assert camel_case_field("helloworld") == "helloworld"


CHILD = T.StructType([
    T.StructField("nickname", T.StringType(), True, _meta("Kids nickname")),
    T.StructField("age", T.IntegerType(), True, _meta("Kids age")),
])

PARENT = T.StructType([
    T.StructField("first_name", T.StringType(), True),
    T.StructField("last_name", T.StringType(), True),
    T.StructField("age", T.IntegerType(), True, _meta("Parent age")),
    T.StructField("children", T.ArrayType(CHILD), True,
                  _meta("All of their children")),
])

# exact golden from LegendCodegenTest.scala:73-131
GOLDEN = """###Pure
Class org::finos::legend::delta::classes::ParentChildren
{
  {meta::pure::profiles::doc.doc = 'Kids nickname'} nickname: String[0..1];
  {meta::pure::profiles::doc.doc = 'Kids age'} age: Integer[0..1];
}

Class org::finos::legend::delta::classes::ParentBase
{
  firstName: String[0..1];
  lastName: String[0..1];
  {meta::pure::profiles::doc.doc = 'Parent age'} age: Integer[0..1];
}

Class org::finos::legend::delta::classes::Parent extends org::finos::legend::delta::classes::ParentBase
{
  {meta::pure::profiles::doc.doc = 'All of their children'} children: org::finos::legend::delta::classes::ParentChildren[0..*];
}

Class org::finos::legend::delta::classes::ParentSerializable extends org::finos::legend::delta::classes::ParentBase
{
  {meta::pure::profiles::doc.doc = 'JSON wrapper for nested property [children]'} children: String[0..*];
}

###Mapping
Mapping org::finos::legend::delta::mapping::Parent
(
  *org::finos::legend::delta::classes::ParentSerializable: Relational
  {
    ~primaryKey
    (
      [org::finos::legend::delta::Store]family.parent.first_name,
      [org::finos::legend::delta::Store]family.parent.last_name,
      [org::finos::legend::delta::Store]family.parent.age,
      [org::finos::legend::delta::Store]family.parent.children
    )
    ~mainTable [org::finos::legend::delta::Store]family.parent
    firstName: [org::finos::legend::delta::Store]family.parent.first_name,
    lastName: [org::finos::legend::delta::Store]family.parent.last_name,
    age: [org::finos::legend::delta::Store]family.parent.age,
    children: [org::finos::legend::delta::Store]family.parent.children
  }
)

###Relational
Database org::finos::legend::delta::Store
(
  Schema family
  (
    Table parent
    (
      first_name VARCHAR(2147483647),
      last_name VARCHAR(2147483647),
      age INTEGER,
      children VARCHAR(2147483647)
    )
  )
)
"""


def test_nested_schema_golden():
    observed = generate_pure_from_schema(
        "org::finos::legend::delta", "family", "parent", PARENT)
    assert observed == GOLDEN


def test_unsupported_types_raise():
    bad = T.StructType([T.StructField("m", T.MapType(T.StringType(), T.StringType()))])
    with pytest.raises(LegendModelError):
        generate_pure_from_schema("a::b", "db", "t", bad)
    bad2 = T.StructType([T.StructField("d", T.DecimalType(10, 2))])
    with pytest.raises(LegendModelError):
        generate_pure_from_schema("a::b", "db", "t", bad2)
    with pytest.raises(LegendModelError):
        generate_pure_from_schema("NotValid", "db", "t", PARENT)


def test_validate_model():
    assert validate_model(GOLDEN)
    assert validate_model("###Pure\nClass foo::bar::Entity\n{\n  foobar: String[0..1];\n}")
    assert not validate_model("this is not PURE")


def test_round_trip_query():
    # LegendCodegenTest.scala:144-176 — generated PURE -> (our) compile ->
    # query plan -> SQL golden
    schema = T.StructType([
        T.StructField("group_id", T.StringType(), False),
        T.StructField("artifact_id", T.StringType(), False),
        T.StructField("version", T.StringType(), False),
    ])
    ns = "org::finos::legend"
    text = generate_pure_from_schema(ns, "maven", "project", schema)
    model = load_dicts(parse_model_text(text))
    mapping = model.get_mapping(f"{ns}::mapping::Project")
    cls = model.get_class(mapping.class_path)
    lam = parse_lambda(
        f"{ns}::classes::Project.all()->project("
        "[x|$x.groupId,x|$x.artifactId,x|$x.version],"
        "['groupId','artifactId','version'])")
    plan = parse_service_lambda(lam)
    sql = plan_sql(model, plan, mapping.qualified_table, cls,
                   mapping.property_columns)
    assert sql == ("select `root`.group_id as `groupId`, "
                   "`root`.artifact_id as `artifactId`, "
                   "`root`.version as `version` "
                   "from maven.project as `root`")


def test_parse_expression_forms():
    from legend_community_delta_spark.plans.parser import parse_expression
    ast = parse_expression("$this.highFives > 0")
    assert ast["function"] == "greaterThan"
    ast = parse_expression("$this.sme->isEmpty() || $this.sme->in(['Scala', 'R'])")
    assert ast["function"] == "or"
    ast = parse_expression(
        "$this.birthDate->dateDiff($this.joinedDate,DurationUnit.YEARS)")
    assert ast["function"] == "dateDiff"
    assert ast["parameters"][2]["property"] == "YEARS"
    ast = parse_expression("$this.firstName->substring(0,1) + $this.lastName->substring(0,1)")
    assert ast["function"] == "plus"


def test_pure_parse_compile_round_trip(legend):
    """Text lambda -> AST -> SQL matches the stored-AST service path."""
    from test_query_sql import SKILLS_SQL
    sql = legend.generate_sql_pure(
        "demo::entity::employee.all()"
        "->filter(x|!$x.gender->isEmpty())"
        "->groupBy([x|$x.gender],"
        "[agg(x|$x.highFives, x|$x->average()), agg(x|$x.id, x|$x->count())],"
        "['Gender','HighFives','Employees'])"
        "->sort([desc('HighFives')])->take(10)",
        "demo::mapping::employee_delta")
    assert sql == SKILLS_SQL


def test_distinct_in_query_chain(legend):
    sql = legend.generate_sql_pure(
        "demo::entity::employee.all()->project([x|$x.gender],['Gender'])"
        "->distinct()",
        "demo::mapping::employee_delta")
    assert sql == ("select distinct `root`.gender as `Gender` "
                   "from legend.employee as `root`")
