"""Integration against the REAL reference fixtures (genuine Legend Studio
exports), when present at /root/reference (read-only).

This is the definitive loader/compiler parity proof: the exact entity
JSONs the reference ships are loaded by OUR loader and must produce the
reference's own golden expectations/derivations/transformations/SQL
(``python/tests/tests.py:74-163``, ``LegendEntityTest.scala:140-244``).
Skipped when the reference checkout is absent (repo stays standalone).
"""

from __future__ import annotations

import os

import pytest

REF = "/root/reference/src/test/resources/entities"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixtures not available")


@pytest.fixture(scope="module")
def ref_legend():
    from legend_community_delta_spark import Legend
    return Legend.from_directory(REF)


def test_entity_names(ref_legend):
    names = ref_legend.get_entity_names()
    assert "databricks::entity::employee" in names
    assert "databricks::mapping::employee_delta" in names
    assert "databricks::service::skills" in names


def test_schema_from_real_fixtures(ref_legend):
    st = ref_legend.get_schema("databricks::entity::employee")
    assert set(f.name for f in st.fields) == {
        "firstName", "lastName", "birthDate", "gender",
        "id", "sme", "joinedDate", "highFives"}


def test_expectations_golden(ref_legend):
    # exact dict from python/tests/tests.py:74-88
    expected = {
        "[birthDate] is mandatory": "birth_date IS NOT NULL",
        "[sme] not allowed value":
            "(sme IS NULL OR sme IN ('Scala', 'Python', 'Java', 'R', 'SQL'))",
        "[id] is mandatory": "id IS NOT NULL",
        "[joinedDate] is mandatory": "joined_date IS NOT NULL",
        "[firstName] is mandatory": "first_name IS NOT NULL",
        "[high five] should be positive":
            "(high_fives IS NOT NULL AND high_fives > 0)",
        "[lastName] is mandatory": "last_name IS NOT NULL",
        "[hiringAge] should be > 18":
            "year(joined_date) - year(birth_date) > 18",
    }
    got = ref_legend.get_expectations("databricks::mapping::employee_delta")
    assert got == expected


def test_transformations_golden(ref_legend):
    assert ref_legend.get_transformations("databricks::mapping::employee_delta") == {
        "highFives": "high_fives", "joinedDate": "joined_date",
        "lastName": "last_name", "firstName": "first_name",
        "birthDate": "birth_date", "id": "id", "sme": "sme",
        "gender": "gender"}


def test_derivations_golden(ref_legend):
    assert ref_legend.get_derivations("databricks::mapping::employee_delta") == {
        "hiringAge": "year(joined_date) - year(birth_date)",
        "age": "year(current_date) - year(birth_date)",
        "initials":
            "concat(substring(first_name, 0, 1), substring(last_name, 0, 1))",
    }


def test_table_golden(ref_legend):
    assert ref_legend.get_table("databricks::mapping::employee_delta") == \
        "legend.employee"


def test_skills_service_sql_golden(ref_legend):
    # LegendEntityTest.scala:229-244 golden, modulo the documented
    # avg-promotion cast deviation (Spark types 1.0 as DECIMAL)
    sql = ref_legend.generate_sql("databricks::service::skills")
    assert sql == (
        "select `root`.gender as `Gender`, "
        "avg(cast(1.0 * `root`.high_fives as double)) as `HighFives`, "
        "count(`root`.id) as `Employees` "
        "from legend.employee as `root` "
        "where not `root`.gender is null "
        "group by `Gender` "
        "order by `HighFives` desc "
        "limit 10")


def test_employee_service_sql(ref_legend):
    sql = ref_legend.generate_sql("databricks::service::employee")
    assert "`root`.first_name like 'G%'" in sql
    assert sql.endswith("order by `HighFives` desc limit 10")


def test_mapping_sql_content(ref_legend):
    """Full mapping query: same select items and WHERE conjuncts as the
    reference golden (LegendEntityTest.scala:201-227), order-insensitively
    (ours is declaration-ordered, the reference is Scala-Map-hash-ordered)."""
    sql = ref_legend.generate_sql("databricks::mapping::employee_delta")
    head, _, where = sql.partition(" where ")
    for item in [
        "`root`.high_fives as `highFives`",
        "`root`.joined_date as `joinedDate`",
        "`root`.last_name as `lastName`",
        "`root`.first_name as `firstName`",
        "`root`.birth_date as `birthDate`",
        "`root`.id as `id`",
        "`root`.sme as `sme`",
        "`root`.gender as `gender`",
        "year(`root`.joined_date) - year(`root`.birth_date) as `hiringAge`",
        "year(current_date) - year(`root`.birth_date) as `age`",
        "concat(substring(`root`.first_name, 0, 1), "
        "substring(`root`.last_name, 0, 1)) as `initials`",
    ]:
        assert item in head, item
        assert head.count(item) == 1, f"duplicated: {item}"
    assert "from legend.employee as `root`" in head
    conjuncts = {c.strip() for c in where.split(" and ")}
    # recombine the guarded conjunct split by " and "
    assert "(`root`.high_fives is not null" in where
    assert "`root`.high_fives > 0)" in where
    for expected in [
        "`root`.first_name is not null",
        "`root`.last_name is not null",
        "`root`.birth_date is not null",
        "`root`.id is not null",
        "`root`.joined_date is not null",
        "(`root`.sme is null or `root`.sme in "
        "('Scala', 'Python', 'Java', 'R', 'SQL'))",
    ]:
        assert expected in where
    # hiringAge constraint is NOT in the prefilter (reference behavior)
    assert "18" not in where
