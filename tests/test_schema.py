"""Schema compiler goldens (reference ``LegendEntityTest.scala:30-133``)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from legend_community_delta_spark import LegendModelError, load_dicts
from legend_community_delta_spark.schema import (
    PURE_TO_SPARK,
    mapping_schema,
    primitive_type,
    relaxed,
    schema_for,
)

from fixtures import prop_def


def test_type_map_table():
    # pinned by LegendEntityTest.scala:30-47
    assert PURE_TO_SPARK["String"] == T.StringType()
    assert PURE_TO_SPARK["Boolean"] == T.BooleanType()
    assert PURE_TO_SPARK["Binary"] == T.BinaryType()
    assert PURE_TO_SPARK["Integer"] == T.IntegerType()
    assert PURE_TO_SPARK["Number"] == T.LongType()      # lossy by design
    assert PURE_TO_SPARK["Float"] == T.FloatType()
    assert PURE_TO_SPARK["Decimal"] == T.DoubleType()   # lossy by design
    assert PURE_TO_SPARK["Date"] == T.DateType()
    assert PURE_TO_SPARK["StrictDate"] == T.DateType()
    assert PURE_TO_SPARK["DateTime"] == T.TimestampType()
    with pytest.raises(LegendModelError):
        primitive_type("Map")


def test_lossless_mode():
    assert primitive_type("Decimal", lossless=True) == T.DecimalType(38, 18)
    assert primitive_type("Number", lossless=True) == T.DecimalType(38, 0)


def test_employee_schema_inheritance(model):
    # employee = person fields + {id, sme, joinedDate, highFives}
    # (LegendEntityTest.scala:82-88)
    st = schema_for(model, "demo::entity::employee")
    assert [f.name for f in st.fields] == [
        "firstName", "lastName", "birthDate", "gender",
        "id", "sme", "joinedDate", "highFives"]
    by_name = {f.name: f for f in st.fields}
    assert by_name["firstName"].dataType == T.StringType()
    assert not by_name["firstName"].nullable
    assert by_name["gender"].nullable
    assert by_name["id"].dataType == T.IntegerType()
    assert by_name["sme"].dataType == T.StringType()     # enum -> string
    assert by_name["sme"].nullable
    assert by_name["birthDate"].dataType == T.DateType()
    assert by_name["joinedDate"].dataType == T.DateType()
    assert by_name["highFives"].dataType == T.IntegerType()


def test_doc_comments_in_metadata(model):
    st = schema_for(model, "demo::entity::employee")
    assert {f.name: f.metadata.get("comment") for f in st.fields}["id"] == \
        "Unique identifier"


def test_mapping_schema_renames(model):
    # camelCase -> snake_case (LegendEntityTest.scala:129-133)
    st = mapping_schema(model, "demo::mapping::employee_delta")
    assert [f.name for f in st.fields] == [
        "first_name", "last_name", "birth_date", "gender",
        "id", "sme", "joined_date", "high_fives"]


def test_relaxed_nullability(model):
    st = relaxed(schema_for(model, "demo::entity::employee"))
    assert all(f.nullable for f in st.fields)


def test_nested_class_and_collections():
    entities = [
        {"content": {"_type": "class", "package": "t", "name": "child",
                     "properties": [prop_def("nickname", "String"),
                                    prop_def("age", "Integer")],
                     "qualifiedProperties": [], "constraints": []}},
        {"content": {"_type": "class", "package": "t", "name": "parent",
                     "properties": [
                         prop_def("name", "String"),
                         prop_def("favorite", "t::child", lower=0),
                         prop_def("children", "t::child", lower=0, upper=None),
                         prop_def("tags", "String", lower=1, upper=None),
                     ],
                     "qualifiedProperties": [], "constraints": []}},
    ]
    model = load_dicts(entities)
    st = schema_for(model, "t::parent")
    by_name = {f.name: f for f in st.fields}
    assert isinstance(by_name["favorite"].dataType, T.StructType)
    assert isinstance(by_name["children"].dataType, T.ArrayType)
    assert isinstance(by_name["children"].dataType.elementType, T.StructType)
    assert by_name["tags"].dataType == T.ArrayType(T.StringType(), False)
    assert not by_name["tags"].nullable        # lower bound 1
    assert by_name["children"].nullable        # lower bound 0


def test_unknown_type_raises(model):
    bad = load_dicts([{"content": {
        "_type": "class", "package": "t", "name": "bad",
        "properties": [prop_def("x", "Uuid")],
        "qualifiedProperties": [], "constraints": []}}])
    with pytest.raises(LegendModelError):
        schema_for(bad, "t::bad")


def test_directory_loader(tmp_path):
    """load_resources: entity JSON files on disk round-trip to the same
    model as in-memory dicts (LegendFileLoader parity)."""
    import json
    from legend_community_delta_spark import Legend, load_resources
    from fixtures import ALL_ENTITIES

    d = tmp_path / "entities"
    (d / "sub").mkdir(parents=True)
    for i, e in enumerate(ALL_ENTITIES):
        target = d / ("sub" if i % 2 else "") / f"e{i}.json"
        target.write_text(json.dumps(e))
    legend = Legend(load_resources(str(d)))
    assert len(legend.get_entity_names()) == len(ALL_ENTITIES)
    assert legend.get_table("demo::mapping::employee_delta") == "legend.employee"
    assert "[id] is mandatory" in legend.get_expectations(
        "demo::mapping::employee_delta")
