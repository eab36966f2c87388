"""Execute every PURE function the compiler supports on real rows.

The golden-string tests pin SQL *text*; these pin *behavior*: each
compiled expression runs on a small DataFrame and must produce the
expected value.  Covers the reference surface (SURVEY §2.B) and our
extensions (string/date/math/conditional library).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from legend_community_delta_spark import load_dicts
from legend_community_delta_spark.plans.compiler import Context, to_sql
from legend_community_delta_spark.plans.parser import parse_expression

from fixtures import prop_def


@pytest.fixture(scope="module")
def fmodel():
    return load_dicts([{"content": {
        "_type": "class", "package": "t", "name": "row",
        "properties": [
            prop_def("s", "String"),
            prop_def("s2", "String"),
            prop_def("n", "Integer"),
            prop_def("m", "Integer"),
            prop_def("x", "Float"),
            prop_def("d1", "Date"),
            prop_def("d2", "Date"),
            prop_def("ts", "DateTime"),
            prop_def("tags", "String", lower=0, upper=None),
        ],
        "qualifiedProperties": [], "constraints": []}}])


@pytest.fixture(scope="module")
def fdf(spark):
    return spark.createDataFrame(
        [("Hello World", "abc", 7, 3, 2.25,
          dt.date(1990, 5, 17), dt.date(2020, 11, 3),
          dt.datetime(2020, 11, 3, 14, 30, 0), ["a", "b", "c"])],
        "s string, s2 string, n int, m int, x double, d1 date, d2 date, "
        "ts timestamp, tags array<string>")


CASES = [
    # PURE expression, expected value
    ("$this.s->toUpper()", "HELLO WORLD"),
    ("$this.s->toLower()", "hello world"),
    ("$this.s->length()", 11),
    ("$this.s->substring(0,5)", "Hello"),
    ("$this.s->startsWith('Hello')", True),
    ("$this.s->endsWith('World')", True),
    ("$this.s->contains('lo Wo')", True),
    ("$this.s->matches('.*World')", True),
    ("$this.s->replace('World', 'Spark')", "Hello Spark"),
    ("$this.s->indexOf('World')", 6),
    ("$this.s2->reverseString()", "cba"),
    ("$this.s->trim()", "Hello World"),
    ("$this.s + '!'", "Hello World!"),
    ("'x' + $this.s2", "xabc"),
    ("$this.n + $this.m", 10),
    ("$this.n - $this.m", 4),
    ("$this.n * $this.m", 21),
    ("$this.n->rem($this.m)", 1),
    ("$this.n->abs()", 7),
    ("$this.x->floor()", 2),
    ("$this.x->ceiling()", 3),
    ("$this.x->sqrt()", 1.5),
    ("$this.x->round()", 2.0),
    ("$this.n > $this.m", True),
    ("$this.n <= $this.m", False),
    ("$this.n != $this.m", True),
    ("$this.n == 7", True),
    ("$this.n->isNotEmpty()", True),
    ("$this.s->isEmpty()", False),
    ("$this.s2->in(['abc', 'def'])", True),
    ("!($this.n < $this.m)", True),
    ("$this.n > 0 && $this.m > 0", True),
    ("$this.n < 0 || $this.m > 0", True),
    ("$this.d1->dateDiff($this.d2,DurationUnit.YEARS)", 30),
    ("$this.d1->dateDiff($this.d2,DurationUnit.MONTHS)", 366),
    ("$this.d1->dateDiff($this.d2,DurationUnit.DAYS)", 11128),
    ("$this.d2->year()", 2020),
    ("$this.d2->month()", 11),
    ("$this.d2->dayOfMonth()", 3),
    ("$this.ts->hour()", 14),
    ("$this.ts->minute()", 30),
    ("$this.tags->size()", 3),
    ("if($this.n > $this.m, 'big', 'small')", "big"),
    ("$this.n->toString()", "7"),
    ("'42'->parseInteger()", 42),
    ("'2.5'->parseFloat()", 2.5),
]


@pytest.mark.parametrize("expr,expected", CASES,
                         ids=[c[0][:40] for c in CASES])
def test_function_executes(spark, fmodel, fdf, expr, expected):
    ctx = Context(model=fmodel, cls=fmodel.get_class("t::row"))
    sql = to_sql(parse_expression(expr), ctx)
    got = fdf.select(F.expr(sql).alias("v")).first()["v"]
    if isinstance(expected, float):
        assert got == pytest.approx(expected)
    else:
        assert got == expected


def test_today_and_now_run(spark, fmodel, fdf):
    ctx = Context(model=fmodel, cls=fmodel.get_class("t::row"))
    sql = to_sql(parse_expression("today()"), ctx)
    assert fdf.select(F.expr(sql)).first()[0] is not None
    sql = to_sql(parse_expression("now()"), ctx)
    assert fdf.select(F.expr(sql)).first()[0] is not None
