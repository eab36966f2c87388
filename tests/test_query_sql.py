"""Query synthesis goldens (reference ``LegendEntityTest.scala:201-244``).

Deviation (documented in plans/query.py): select-list / WHERE order follows
model declaration order instead of Scala Map hash order; contents identical.
"""

from __future__ import annotations

import pytest

from legend_community_delta_spark import LegendModelError


MAPPING_SQL = (
    "select "
    "`root`.first_name as `firstName`, "
    "`root`.last_name as `lastName`, "
    "`root`.birth_date as `birthDate`, "
    "`root`.gender as `gender`, "
    "`root`.id as `id`, "
    "`root`.sme as `sme`, "
    "`root`.joined_date as `joinedDate`, "
    "`root`.high_fives as `highFives`, "
    "year(`root`.joined_date) - year(`root`.birth_date) as `hiringAge`, "
    "year(current_date) - year(`root`.birth_date) as `age`, "
    "concat(substring(`root`.first_name, 0, 1), substring(`root`.last_name, 0, 1)) as `initials` "
    "from legend.employee as `root` "
    "where `root`.first_name is not null "
    "and `root`.last_name is not null "
    "and `root`.birth_date is not null "
    "and `root`.id is not null "
    "and (`root`.sme is null or `root`.sme in ('Scala', 'Python', 'Java', 'R', 'SQL')) "
    "and `root`.joined_date is not null "
    "and (`root`.high_fives is not null and `root`.high_fives > 0)"
)

# NOTE deviation from LegendEntityTest.scala:235: the reference emits
# `avg(1.0 * col)` under the Databricks dialect where 1.0 is DOUBLE; Spark
# types 1.0 as DECIMAL(2,1), so we add an explicit double cast to preserve
# the *semantic* golden (double-typed average).
SKILLS_SQL = (
    "select `root`.gender as `Gender`, "
    "avg(cast(1.0 * `root`.high_fives as double)) as `HighFives`, "
    "count(`root`.id) as `Employees` "
    "from legend.employee as `root` "
    "where not `root`.gender is null "
    "group by `Gender` "
    "order by `HighFives` desc "
    "limit 10"
)


def test_generate_sql_mapping(legend):
    assert legend.generate_sql("demo::mapping::employee_delta") == MAPPING_SQL


def test_generate_sql_service_skills(legend):
    # exactly the reference golden (LegendEntityTest.scala:229-244)
    assert legend.generate_sql("demo::service::skills") == SKILLS_SQL


def test_generate_sql_service_employee(legend):
    sql = legend.generate_sql("demo::service::employee")
    assert sql.startswith("select `root`.first_name as `FirstName`, ")
    assert "`root`.first_name like 'G%'" in sql
    assert "year(current_date) - year(`root`.birth_date) as `Age`" in sql
    assert ("concat(substring(`root`.first_name, 0, 1), "
            "substring(`root`.last_name, 0, 1)) as `Initials`") in sql
    assert sql.endswith("order by `HighFives` desc limit 10")


def test_unknown_path_raises(legend):
    with pytest.raises(LegendModelError):
        legend.generate_sql("demo::entity::person")


def test_unknown_property_raises(legend):
    from legend_community_delta_spark.plans.compiler import Context, to_sql
    from fixtures import this_prop
    ctx = Context(model=legend.model, cls=legend.model.get_class("demo::entity::employee"))
    with pytest.raises(LegendModelError):
        to_sql(this_prop("nickName"), ctx)
