"""Quickstart: the full engine story in one runnable script.

    python examples/quickstart.py

Walks the reference workflow (model -> schema -> ingest -> transform ->
validate -> derive -> query -> codegen) against a tiny in-repo model and
synthetic rows.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))


def main() -> None:
    from legend_community_delta_spark import (
        Legend,
        dq_metrics,
        legend_transform,
        legend_validate,
        load_dicts,
    )
    from legend_community_delta_spark.codegen import generate_pure_from_schema
    from legend_community_delta_spark.session import build_session
    from fixtures import ALL_ENTITIES

    spark = build_session("legend-quickstart", cores=4)
    spark.sparkContext.setLogLevel("ERROR")
    legend = Legend(load_dicts(ALL_ENTITIES), spark)

    print("== entities ==")
    print(legend.get_entity_names())

    print("\n== schema (employee) ==")
    print(legend.get_schema("demo::entity::employee").simpleString())

    print("\n== expectations (SQL) ==")
    for name, sql in legend.get_expectations(
            "demo::mapping::employee_delta").items():
        print(f"  {name}: {sql}")

    rows = [
        {"firstName": "Ada", "lastName": "Lovelace",
         "birthDate": "1980-03-14", "gender": "F", "id": 1,
         "sme": "Python", "joinedDate": "2015-06-01", "highFives": 12},
        {"firstName": "NoId", "lastName": "Missing",
         "birthDate": "1990-01-01", "gender": "M",
         "sme": "C", "joinedDate": "2005-01-01", "highFives": 3},
    ]
    expectations = legend.get_expectations("demo::mapping::employee_delta")
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "employee.json")
        with open(src, "w") as fh:
            fh.write("\n".join(json.dumps(r) for r in rows))
        bronze = spark.read.schema(
            legend.get_schema("demo::entity::employee")).json(src)
        silver = legend_transform(
            bronze, legend.get_transformations("demo::mapping::employee_delta"))
        gold = legend_validate(silver, expectations)
        print("\n== validated rows ==")
        gold.select("first_name", "legend").show(truncate=False)
        print("== DQ metrics ==")
        dq_metrics(gold, expectations).show(truncate=False)

    print("== generated SQL (skills service) ==")
    print(legend.generate_sql("demo::service::skills"))

    print("\n== ad-hoc PURE lambda ==")
    print(legend.generate_sql_pure(
        "demo::entity::employee.all()->filter(x|$x.highFives > 5)"
        "->project([x|$x.firstName],['Name'])",
        "demo::mapping::employee_delta"))

    print("\n== reverse codegen (first 400 chars) ==")
    schema = legend.get_schema("demo::mapping::employee_delta")
    print(generate_pure_from_schema(
        "demo::generated", "hr", "employee", schema)[:400], "...")

    spark.stop()


if __name__ == "__main__":
    main()
