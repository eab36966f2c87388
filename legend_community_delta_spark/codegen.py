"""Reverse codegen: Spark/Delta schema -> PURE model text.

Reproduces the reference's ``pure/LegendCodegen.scala`` +
``pure/package.scala`` behavior, golden-pinned by
``LegendCodegenTest.scala:52-133``:

* nested structs (or arrays of structs) split the entity into
  ``{Name}Base`` / ``{Name}`` / ``{Name}Serializable`` classes, the
  Serializable variant representing nested fields as JSON-wrapper
  ``String`` properties;
* the relational store and mapping are generated against the Serializable
  shape with the original column names;
* all columns form a composite ~primaryKey (Delta has no PK);
* reverse type map per SURVEY §1.3 (DecimalType/MapType unsupported -> raise).
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from .model.entities import LegendModelError

# ---------------------------------------------------------------------------
# casing / namespace utils (pure/package.scala:31-48)
# ---------------------------------------------------------------------------


def camel_case_entity(s: str) -> str:
    """``hello_world`` -> ``HelloWorld``; ``helloWorld`` -> ``HelloWorld``."""
    return "".join(p[:1].upper() + p[1:] for p in s.split("_") if p)


def camel_case_field(s: str) -> str:
    """``hello_world`` -> ``helloWorld``; ``helloworld`` unchanged."""
    c = camel_case_entity(s)
    return c[:1].lower() + c[1:] if c else c


_NAMESPACE_RE = re.compile(r"^[a-z]+(?:::[a-z]+)+$")


def is_valid_namespace(s: str) -> bool:
    return _NAMESPACE_RE.match(s) is not None


# ---------------------------------------------------------------------------
# reverse type map
# ---------------------------------------------------------------------------

_REVERSE: list[tuple[type, tuple[str, str]]] = [
    (T.FloatType, ("Float", "DOUBLE")),
    (T.DoubleType, ("Decimal", "DOUBLE")),
    (T.ByteType, ("Integer", "TINYINT")),
    (T.ShortType, ("Integer", "SMALLINT")),
    (T.IntegerType, ("Integer", "INTEGER")),
    (T.LongType, ("Number", "BIGINT")),
    (T.StringType, ("String", "VARCHAR(2147483647)")),
    (T.BooleanType, ("Boolean", "BIT")),
    (T.BinaryType, ("Binary", "BINARY(2147483647)")),
    (T.DateType, ("Date", "DATE")),
    (T.TimestampType, ("DateTime", "TIMESTAMP")),
]


def _pure_datatype(dt: T.DataType, field_name: str) -> tuple[str, str]:
    for klass, mapped in _REVERSE:
        if isinstance(dt, klass):
            return mapped
    raise LegendModelError(
        f"Unsupported field type [{dt.simpleString()}] for field [{field_name}]")


# ---------------------------------------------------------------------------
# model of one generated class
# ---------------------------------------------------------------------------


class _Field:
    def __init__(self, name: str, cardinality: str, pure_type: str,
                 relational_type: str, doc: str | None, complex_: bool):
        self.name = name
        self.field_name = camel_case_field(name)
        self.cardinality = cardinality
        self.pure_type = pure_type
        self.relational_type = relational_type
        self.doc = doc
        self.complex = complex_

    def class_field(self) -> str:
        if self.doc:
            return (f"{{meta::pure::profiles::doc.doc = '{self.doc}'}} "
                    f"{self.field_name}: {self.pure_type}{self.cardinality};")
        return f"{self.field_name}: {self.pure_type}{self.cardinality};"

    def serializable_field(self) -> str:
        doc = f"JSON wrapper for nested property [{self.field_name}]"
        return (f"{{meta::pure::profiles::doc.doc = '{doc}'}} "
                f"{self.field_name}: String{self.cardinality};")


class _GenClass:
    def __init__(self, table: str, fqn: str, fields: list[_Field], nested: bool):
        self.table = table
        self.fqn = fqn
        self.fields = fields
        self.nested = nested

    @property
    def has_nested(self) -> bool:
        return any(f.complex for f in self.fields)

    def render_class(self) -> str:
        if not self.has_nested:
            body = "\n  ".join(f.class_field() for f in self.fields)
            return f"Class {self.fqn}\n{{\n  {body}\n}}\n"
        base = [f for f in self.fields if not f.complex]
        nested = [f for f in self.fields if f.complex]
        base_body = "\n  ".join(f.class_field() for f in base)
        nested_body = "\n  ".join(f.class_field() for f in nested)
        wrapper_body = "\n  ".join(f.serializable_field() for f in nested)
        return (
            f"Class {self.fqn}Base\n{{\n  {base_body}\n}}\n\n"
            f"Class {self.fqn} extends {self.fqn}Base\n{{\n  {nested_body}\n}}\n\n"
            f"Class {self.fqn}Serializable extends {self.fqn}Base\n"
            f"{{\n  {wrapper_body}\n}}\n"
        )

    def render_mapping(self, namespace: str, database: str) -> str:
        target = f"{self.fqn}Serializable" if self.has_nested else self.fqn
        mapping_name = f"{namespace}::mapping::{camel_case_entity(self.table)}"
        store = f"[{namespace}::Store]{database}.{self.table}"
        pk = ",\n      ".join(f"{store}.{f.name}" for f in self.fields)
        cols = ",\n    ".join(f"{f.field_name}: {store}.{f.name}"
                              for f in self.fields)
        return (
            f"Mapping {mapping_name}\n(\n"
            f"  *{target}: Relational\n  {{\n"
            f"    ~primaryKey\n    (\n      {pk}\n    )\n"
            f"    ~mainTable {store}\n"
            f"    {cols}\n  }}\n)\n"
        )

    def render_table(self) -> str:
        cols = ",\n      ".join(f"{f.name} {f.relational_type}" for f in self.fields)
        return f"    Table {self.table}\n    (\n      {cols}\n    )"


def _process(namespace: str, table: str, entity_name: str,
             schema: T.StructType, out: list[_GenClass], nested: bool) -> None:
    fields: list[_Field] = []
    for f in schema.fields:
        dt = f.dataType
        is_array = isinstance(dt, T.ArrayType)
        element = dt.elementType if is_array else dt
        cardinality = (("[0..*]" if f.nullable else "[1..*]") if is_array
                       else ("[0..1]" if f.nullable else "[1]"))
        doc = f.metadata.get("comment") if f.metadata else None
        if isinstance(element, T.StructType):
            child_name = f"{entity_name}{camel_case_entity(f.name)}"
            _process(namespace, table, child_name, element, out, nested=True)
            fields.append(_Field(
                f.name, cardinality, f"{namespace}::classes::{child_name}",
                "VARCHAR(2147483647)", doc, complex_=True))
        else:
            pure_t, rel_t = _pure_datatype(element, f.name)
            fields.append(_Field(f.name, cardinality, pure_t, rel_t, doc,
                                 complex_=False))
    # camelCase is lossy (``a_0`` and ``a0`` both -> ``a0``); a collision
    # would make the generated mapping silently drop a column when the
    # model is loaded back (class properties are keyed by name).  Refuse
    # loudly instead of losing data.
    by_prop: dict[str, list[str]] = {}
    for fld in fields:
        by_prop.setdefault(fld.field_name, []).append(fld.name)
    clashes = {p: cols for p, cols in by_prop.items() if len(cols) > 1}
    if clashes:
        detail = "; ".join(
            f"columns {cols} all map to property [{p}]"
            for p, cols in sorted(clashes.items()))
        raise LegendModelError(
            f"camelCase collision in table [{table}]: {detail}. "
            "Rename the colliding columns before generating a PURE model.")
    out.append(_GenClass(table, f"{namespace}::classes::{entity_name}",
                         fields, nested))


def generate_pure_from_schema(namespace: str, database: str, table: str,
                              schema: T.StructType) -> str:
    """One table's schema -> full PURE model text (###Pure/###Mapping/###Relational)."""
    if not is_valid_namespace(namespace):
        raise LegendModelError("namespace should be in the form of group::artifact::.*")
    classes: list[_GenClass] = []
    _process(namespace, table, camel_case_entity(table), schema, classes,
             nested=False)
    return _render_model(namespace, database, classes)


def _render_model(namespace: str, database: str,
                  classes: list[_GenClass]) -> str:
    top = [c for c in classes if not c.nested]
    pure = "\n".join(c.render_class() for c in classes)
    mappings = "\n".join(c.render_mapping(namespace, database) for c in top)
    tables = "\n".join(c.render_table() for c in top)
    return (
        f"###Pure\n{pure}\n"
        f"###Mapping\n{mappings}\n"
        f"###Relational\n"
        f"Database {namespace}::Store\n(\n  Schema {database}\n  (\n"
        f"{tables}\n  )\n)\n"
    )


def generate_pure_from_table(spark: SparkSession, namespace: str,
                             qualified_table: str) -> str:
    """``db.table`` -> PURE model text (``LegendCodegen.generatePureFromTable``)."""
    database, _, table = qualified_table.rpartition(".")
    schema = spark.table(qualified_table).schema
    return generate_pure_from_schema(namespace, database or "default", table, schema)


def generate_pure_from_database(spark: SparkSession, namespace: str,
                                database: str) -> str:
    """Every table in a database -> one PURE model
    (``LegendCodegen.generatePureFromDatabase:111-133``).  Metadata-sized
    driver work: catalog listing only, no data reads."""
    if not is_valid_namespace(namespace):
        raise LegendModelError("namespace should be in the form of group::artifact::.*")
    classes: list[_GenClass] = []
    for t in spark.catalog.listTables(database):
        schema = spark.table(f"{database}.{t.name}").schema
        _process(namespace, t.name, camel_case_entity(t.name), schema, classes,
                 nested=False)
    return _render_model(namespace, database, classes)
