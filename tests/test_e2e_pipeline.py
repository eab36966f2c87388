"""End-to-end employee pipeline (reference ``LegendSparkTest.scala:42-72``).

Synthetic raw rows include: rows missing ``id``, rows with ``sme`` outside
the enum, under-age hires — and no violations of the other rules.  The
distinct violated-rule set must be exactly those three rules.
"""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import functions as F

from legend_community_delta_spark import (
    dq_metrics,
    legend_transform,
    legend_validate,
)

D = dt.date


def _raw_rows():
    rows = []
    # 10 clean rows (hired well past 18th birthday)
    for i in range(1, 11):
        rows.append({"firstName": f"Ada{i}", "lastName": f"Lovelace{i}",
                     "birthDate": "1980-03-14", "gender": "F" if i % 2 else "M",
                     "id": i, "sme": "Python" if i % 2 else "Scala",
                     "joinedDate": "2015-06-01", "highFives": 10 + i,
                     "role": "ENG"})   # extra field: schema-on-read must drop it
    # 3 rows missing id
    for i in range(3):
        rows.append({"firstName": f"Grace{i}", "lastName": "Hopper",
                     "birthDate": "1975-12-09", "gender": "F",
                     "sme": "SQL", "joinedDate": "2010-01-15",
                     "highFives": 5, "role": "SA"})
    # 2 rows with invalid sme
    for i in range(2):
        rows.append({"firstName": f"Linus{i}", "lastName": "T",
                     "birthDate": "1970-01-01", "gender": "M", "id": 100 + i,
                     "sme": "C", "joinedDate": "1995-05-05", "highFives": 3,
                     "role": "ENG"})
    # 2 under-age hires
    for i in range(2):
        rows.append({"firstName": f"Kid{i}", "lastName": "Coder",
                     "birthDate": "2000-07-07", "gender": "N", "id": 200 + i,
                     "sme": "Java", "joinedDate": "2015-08-08", "highFives": 1,
                     "role": "RSA"})
    return rows


def test_full_pipeline(legend_spark, spark, tmp_path):
    legend = legend_spark
    # 1. schema-on-read of raw NDJSON (bronze)
    raw_path = tmp_path / "employee.json"
    raw_path.write_text("\n".join(json.dumps(r) for r in _raw_rows()))
    schema = legend.get_schema("demo::entity::employee")
    bronze = spark.read.schema(schema).json(str(raw_path))
    assert bronze.columns == ["firstName", "lastName", "birthDate", "gender",
                              "id", "sme", "joinedDate", "highFives"]
    assert bronze.count() == 17

    # 2. transform: rename to target columns (silver)
    transformations = legend.get_transformations("demo::mapping::employee_delta")
    silver = legend_transform(bronze, transformations)
    assert silver.columns == ["first_name", "last_name", "birth_date", "gender",
                              "id", "sme", "joined_date", "high_fives"]

    # 3. validate: violated-rules array (gold)
    expectations = legend.get_expectations("demo::mapping::employee_delta")
    gold = legend_validate(silver, expectations)
    assert "legend" in gold.columns

    violated = {r[0] for r in
                gold.select(F.explode("legend")).distinct().collect()}
    assert violated == {"[id] is mandatory", "[sme] not allowed value",
                        "[hiringAge] should be > 18"}

    counts = {r["rule"]: r["violations"]
              for r in dq_metrics(gold, expectations).collect()}
    assert counts == {"[id] is mandatory": 3, "[sme] not allowed value": 2,
                      "[hiringAge] should be > 18": 2}

    # 4. derive: computed columns
    derivations = legend.get_derivations("demo::mapping::employee_delta")
    derived = gold
    for name, sql in derivations.items():
        derived = derived.withColumn(name, F.expr(sql))
    ages = dict(derived.select("first_name", "hiringAge")
                .where("first_name = 'Ada1'").collect())
    assert ages["Ada1"] == 35

    # 5. create table + write + query the mapping
    table = legend.create_table("demo::mapping::employee_delta")
    assert table == "legend.employee"
    silver.write.mode("overwrite").insertInto(table)
    result = legend.query("demo::mapping::employee_delta")
    # prefilter drops rows that violate any field-referencing expectation:
    # 17 - 3 (no id) - 2 (bad sme) = 12; under-age rows pass (hiringAge
    # rule is not applicable to the prefilter — reference behavior)
    assert result.count() == 12
    assert "hiringAge" in result.columns and "initials" in result.columns
    ini = {r["firstName"]: r["initials"] for r in result.collect()}
    assert ini["Ada1"] == "AL1"[:2]

    # 6. service query end-to-end
    skills = legend.query("demo::service::skills").collect()
    assert {r["Gender"] for r in skills} <= {"F", "M", "N"}
    by_gender = {r["Gender"]: r for r in skills}
    assert by_gender["N"]["Employees"] == 2

    # validate the whole-stage codegen claim: no python UDFs in plan
    plan = gold._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_table_enumeration(legend_spark, spark):
    # metastore enumeration parity (pure/LegendCodegen.scala:115-133)
    tables = [t.name for t in spark.catalog.listTables("legend")]
    assert "employee" in tables


def test_csv_source_with_schema(legend_spark, spark, tmp_path):
    """CSV schema-on-read path (same contract as JSON ingest)."""
    from legend_community_delta_spark.sources import read_with_schema
    legend = legend_spark
    p = tmp_path / "emp.csv"
    p.write_text(
        "firstName,lastName,birthDate,gender,id,sme,joinedDate,highFives\n"
        "Ada,Lovelace,1980-03-14,F,1,Python,2015-06-01,12\n"
        "Bad,Sme,1975-12-09,M,2,C,2010-01-15,5\n")
    schema = legend.get_schema("demo::entity::employee")
    df = read_with_schema(spark, str(p), schema, fmt="csv", header=True)
    assert df.count() == 2
    rows = {r["firstName"]: r for r in df.collect()}
    assert rows["Ada"]["highFives"] == 12
    import datetime as dt
    assert rows["Ada"]["birthDate"] == dt.date(1980, 3, 14)
