"""Local mirror of the driver's correctness gate: run every demo query on
Spark AND its DuckDB oracle, compare row count + columns + values
(order-insensitive, exact equality — the determinism contract in demo.py
is supposed to make values bit-identical)."""

from __future__ import annotations

import math

import duckdb
import pytest

from legend_community_delta_spark import demo

from conftest import SF_DIR


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in demo._TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _rows_canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", sorted(demo.ORACLES))
def test_query_matches_oracle(spark, name):
    sdf = demo.QUERIES[name](spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns

    con = _duck(SF_DIR)
    cur = con.execute(demo.ORACLES[name])
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()

    assert sorted(scols) == sorted(ocols), \
        f"{name}: column mismatch {scols} vs {ocols}"
    assert len(srows) == len(orows), \
        f"{name}: row count {len(srows)} vs {len(orows)}"
    s_canon = _rows_canon(scols, [tuple(r) for r in srows])
    o_canon = _rows_canon(ocols, orows)
    mismatches = [(a, b) for a, b in zip(s_canon, o_canon) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


@pytest.mark.parametrize("name", sorted(set(demo.QUERIES) - set(demo.ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = demo.QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0
