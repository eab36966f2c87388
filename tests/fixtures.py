"""Hand-authored PURE entity fixtures.

Semantically equivalent to the reference's employee model
(``/root/reference/src/test/resources/entities/databricks/`` — see
FIXTURES.md) but written from scratch as Python dicts: person/employee
classes, sme enumeration, snake_case relational mapping, and the two
services (employee, skills).
"""

from __future__ import annotations

from typing import Any

# ---------------------------------------------------------------------------
# AST construction helpers (value-specification JSON nodes)
# ---------------------------------------------------------------------------


def this_prop(name: str) -> dict:
    return {"_type": "property", "property": name,
            "parameters": [{"_type": "var", "name": "this"}]}


def var_prop(var: str, name: str) -> dict:
    return {"_type": "property", "property": name,
            "parameters": [{"_type": "var", "name": var}]}


def func(name: str, *params: dict) -> dict:
    return {"_type": "func", "function": name, "parameters": list(params)}


def lam(body: dict, params: tuple[str, ...] = ("x",)) -> dict:
    return {"_type": "lambda", "body": [body],
            "parameters": [{"_type": "var", "name": p} for p in params]}


def integer(v: int) -> dict:
    return {"_type": "integer", "values": [v],
            "multiplicity": {"lowerBound": 1, "upperBound": 1}}


def string(v: str) -> dict:
    return {"_type": "string", "values": [v],
            "multiplicity": {"lowerBound": 1, "upperBound": 1}}


def collection(*values: dict) -> dict:
    return {"_type": "collection", "values": list(values),
            "multiplicity": {"lowerBound": len(values), "upperBound": len(values)}}


def duration_unit(unit: str) -> dict:
    return {"_type": "property", "property": unit,
            "parameters": [{"_type": "packageableElementPtr",
                            "fullPath": "DurationUnit"}]}


def prop_def(name: str, ptype: str, lower: int = 1, upper: int | None = 1,
             doc: str | None = None) -> dict:
    d: dict[str, Any] = {
        "name": name, "type": ptype,
        "multiplicity": {"lowerBound": lower,
                         **({"upperBound": upper} if upper is not None else {})},
    }
    if doc:
        d["taggedValues"] = [{"tag": {"profile": "meta::pure::profiles::doc",
                                      "value": "doc"}, "value": doc}]
    return d


# ---------------------------------------------------------------------------
# The employee model
# ---------------------------------------------------------------------------

SME_VALUES = ["Scala", "Python", "Java", "R", "SQL"]

PERSON = {
    "content": {
        "_type": "class",
        "package": "demo::entity",
        "name": "person",
        "superTypes": [],
        "properties": [
            prop_def("firstName", "String", doc="Person first name"),
            prop_def("lastName", "String", doc="Person last name"),
            prop_def("birthDate", "Date", doc="Person birth date"),
            prop_def("gender", "String", lower=0, doc="Person gender"),
        ],
        "qualifiedProperties": [],
        "constraints": [],
    }
}

EMPLOYEE = {
    "content": {
        "_type": "class",
        "package": "demo::entity",
        "name": "employee",
        "superTypes": ["demo::entity::person"],
        "taggedValues": [{"tag": {"profile": "meta::pure::profiles::doc",
                                  "value": "doc"}, "value": "Company employee"}],
        "properties": [
            prop_def("id", "Integer", doc="Unique identifier"),
            prop_def("sme", "demo::entity::sme", lower=0, doc="Subject matter expert"),
            prop_def("joinedDate", "StrictDate", doc="Date joined company"),
            prop_def("highFives", "Integer", lower=0, doc="High five count"),
        ],
        "qualifiedProperties": [
            {"name": "hiringAge", "returnType": "Integer",
             "returnMultiplicity": {"lowerBound": 1, "upperBound": 1},
             "parameters": [],
             "body": [func("dateDiff", this_prop("birthDate"),
                           this_prop("joinedDate"), duration_unit("YEARS"))]},
            {"name": "age", "returnType": "Integer",
             "returnMultiplicity": {"lowerBound": 1, "upperBound": 1},
             "parameters": [],
             "body": [func("dateDiff", this_prop("birthDate"),
                           func("today"), duration_unit("YEARS"))]},
            {"name": "initials", "returnType": "String",
             "returnMultiplicity": {"lowerBound": 1, "upperBound": 1},
             "parameters": [],
             "body": [func("plus", collection(
                 func("substring", this_prop("firstName"), integer(0), integer(1)),
                 func("substring", this_prop("lastName"), integer(0), integer(1)),
             ))]},
        ],
        "constraints": [
            {"name": "[high five] should be positive",
             "functionDefinition": {"_type": "lambda", "parameters": [], "body": [
                 func("greaterThan", this_prop("highFives"), integer(0))]}},
            {"name": "[hiringAge] should be > 18",
             "functionDefinition": {"_type": "lambda", "parameters": [], "body": [
                 func("greaterThan", this_prop("hiringAge"), integer(18))]}},
        ],
    }
}

SME = {
    "content": {
        "_type": "Enumeration",
        "package": "demo::entity",
        "name": "sme",
        "values": [{"value": v} for v in SME_VALUES],
    }
}

_COLUMNS = {
    "firstName": "first_name",
    "lastName": "last_name",
    "birthDate": "birth_date",
    "gender": "gender",
    "id": "id",
    "sme": "sme",
    "joinedDate": "joined_date",
    "highFives": "high_fives",
}

MAPPING = {
    "content": {
        "_type": "mapping",
        "package": "demo::mapping",
        "name": "employee_delta",
        "classMappings": [{
            "_type": "relational",
            "class": "demo::entity::employee",
            "mainTable": {"_type": "Table", "schema": "legend", "table": "employee"},
            "primaryKey": [],
            "propertyMappings": [
                {"_type": "relationalPropertyMapping",
                 "property": {"class": "demo::entity::employee", "property": p},
                 "relationalOperation": {"_type": "column", "column": c,
                                         "table": "employee"}}
                for p, c in _COLUMNS.items()
            ],
        }],
    }
}

STORE = {
    "content": {
        "_type": "relational",
        "package": "demo::table",
        "name": "employee",
        "schemas": [{
            "name": "legend",
            "tables": [{
                "name": "employee",
                "primaryKey": ["id"],
                "columns": [
                    {"name": "id", "type": {"_type": "Integer"}, "nullable": False},
                    {"name": "first_name", "type": {"_type": "Varchar", "size": 255}},
                    {"name": "last_name", "type": {"_type": "Varchar", "size": 255}},
                    {"name": "birth_date", "type": {"_type": "Date"}},
                    {"name": "gender", "type": {"_type": "Varchar", "size": 255}},
                    {"name": "sme", "type": {"_type": "Varchar", "size": 255}},
                    {"name": "joined_date", "type": {"_type": "Date"}},
                    {"name": "high_fives", "type": {"_type": "Integer"}},
                ],
            }],
        }],
    }
}


def _employee_all() -> dict:
    return func("getAll", {"_type": "packageableElementPtr",
                           "fullPath": "demo::entity::employee"})


SERVICE_SKILLS = {
    "content": {
        "_type": "service",
        "package": "demo::service",
        "name": "skills",
        "pattern": "/skills",
        "execution": {
            "_type": "pureSingleExecution",
            "mapping": "demo::mapping::employee_delta",
            "func": lam(
                func("take",
                     func("sort",
                          func("groupBy",
                               func("filter", _employee_all(),
                                    lam(func("not", func("isEmpty",
                                                         var_prop("x", "gender"))))),
                               collection(lam(var_prop("x", "gender"))),
                               collection(
                                   func("agg", lam(var_prop("x", "highFives")),
                                        lam(func("average",
                                                 {"_type": "var", "name": "x"}))),
                                   func("agg", lam(var_prop("x", "id")),
                                        lam(func("count",
                                                 {"_type": "var", "name": "x"})))),
                               collection(string("Gender"), string("HighFives"),
                                          string("Employees"))),
                          collection(func("desc", string("HighFives")))),
                     integer(10)),
                params=()),
        },
    }
}

SERVICE_EMPLOYEE = {
    "content": {
        "_type": "service",
        "package": "demo::service",
        "name": "employee",
        "pattern": "/employee",
        "execution": {
            "_type": "pureSingleExecution",
            "mapping": "demo::mapping::employee_delta",
            "func": lam(
                func("take",
                     func("sort",
                          func("project",
                               func("filter", _employee_all(),
                                    lam(func("startsWith",
                                             var_prop("x", "firstName"),
                                             string("G")))),
                               collection(lam(var_prop("x", "firstName")),
                                          lam(var_prop("x", "lastName")),
                                          lam(var_prop("x", "highFives")),
                                          lam(var_prop("x", "age")),
                                          lam(var_prop("x", "hiringAge")),
                                          lam(var_prop("x", "sme")),
                                          lam(var_prop("x", "initials"))),
                               collection(string("FirstName"), string("LastName"),
                                          string("HighFives"), string("Age"),
                                          string("HiringAge"), string("Sme"),
                                          string("Initials"))),
                          collection(func("desc", string("HighFives")))),
                     integer(10)),
                params=()),
        },
    }
}

ALL_ENTITIES = [PERSON, EMPLOYEE, SME, MAPPING, STORE,
                SERVICE_SKILLS, SERVICE_EMPLOYEE]
