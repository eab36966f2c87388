"""As-of join and range join: semantics vs hand-computed + DuckDB oracles."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import Row

from legend_community_delta_spark.operators.asof import asof_join, range_join


def test_asof_backward_basic(spark):
    left = spark.createDataFrame([
        Row(k="a", ts=10), Row(k="a", ts=20), Row(k="a", ts=5),
        Row(k="b", ts=10),
    ])
    right = spark.createDataFrame([
        Row(k="a", ts=8, px=1.0), Row(k="a", ts=10, px=2.0),
        Row(k="a", ts=15, px=3.0), Row(k="b", ts=99, px=9.0),
    ])
    out = {(r["k"], r["ts"]): r["px_asof"]
           for r in asof_join(left, right, "k", "ts").collect()}
    assert out[("a", 5)] is None          # nothing at or before 5
    assert out[("a", 10)] == 2.0          # equal ts is inclusive
    assert out[("a", 20)] == 3.0
    assert out[("b", 10)] is None         # right row is in the future


def test_asof_forward(spark):
    left = spark.createDataFrame([Row(k="a", ts=10)])
    right = spark.createDataFrame([
        Row(k="a", ts=5, px=1.0), Row(k="a", ts=12, px=2.0),
        Row(k="a", ts=30, px=3.0)])
    out = asof_join(left, right, "k", "ts", direction="forward").collect()
    assert out[0]["px_asof"] == 2.0       # nearest following


def test_asof_matches_duckdb_on_events(spark):
    """views asof-join purchases per user — vs DuckDB's native ASOF JOIN."""
    path = "/root/testdata/sf0.001/events.parquet"
    from legend_community_delta_spark.demo import _read_table
    events = _read_table(spark, path)
    views = events.where("event_type = 'view'") \
        .select("user_id", "event_id", "ts")
    purchases = (events.where("event_type = 'purchase'")
                 .groupBy("user_id", "ts")
                 .agg({"value": "max"})
                 .withColumnRenamed("max(value)", "value"))
    got = asof_join(views, purchases, "user_id", "ts",
                    value_cols=["value"]).collect()
    spark_map = {r["event_id"]: r["value_asof"] for r in got}

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{path}'")
    oracle = con.execute("""
        SELECT v.event_id, p.value
        FROM (SELECT user_id, event_id, ts FROM events
              WHERE event_type = 'view') v
        ASOF LEFT JOIN (SELECT user_id, ts, max(value) AS value FROM events
                        WHERE event_type = 'purchase' GROUP BY 1, 2) p
          ON v.user_id = p.user_id AND v.ts >= p.ts
    """).fetchall()
    duck_map = {eid: val for eid, val in oracle}
    assert len(spark_map) == len(duck_map)
    mismatches = {k for k in duck_map
                  if spark_map.get(k) != duck_map[k]
                  and not (spark_map.get(k) is None and duck_map[k] is None)}
    assert not mismatches, f"first: {sorted(mismatches)[:5]}"


def test_asof_time_bucket_matches_default_plan(spark):
    """VERDICT r2 hardening #3: the time-bucketed skew variant must give
    byte-identical results to the key-partitioned plan — across both
    directions, bucket widths smaller and larger than the data gaps,
    and carries spanning several empty buckets.  Every 5th right row has a
    NULL value (ADVICE r3): when such a row lands on a bucket boundary the
    bucket must still export its last NON-NULL value, not NULL (which the
    carry window would skip, dropping the bucket's real contribution)."""
    import random
    rng = random.Random(7)
    left_rows = [Row(k=f"s{i % 2}", ts=rng.randrange(0, 10_000))
                 for i in range(300)]
    right_rows = [Row(k=f"s{i % 2}", ts=t,
                      px=float(i) if i % 5 else None)
                  for i, t in enumerate(sorted(
                      rng.sample(range(0, 10_000), 40)))]
    left = spark.createDataFrame(left_rows)
    right = spark.createDataFrame(right_rows)

    for direction in ("backward", "forward"):
        base = sorted(
            tuple(r) for r in asof_join(
                left, right, "k", "ts", direction=direction).collect())
        for width in (7, 100, 5_000, 100_000):
            got = sorted(
                tuple(r) for r in asof_join(
                    left, right, "k", "ts", direction=direction,
                    time_bucket=width).collect())
            assert got == base, (direction, width)

    # the within-bucket window partitions by (key, bucket) — the fat
    # single-key partition is gone from the plan
    plan = asof_join(left, right, "k", "ts", time_bucket=100) \
        ._jdf.queryExecution().executedPlan().toString()
    winlines = [ln for ln in plan.splitlines()
                if "windowspecdefinition" in ln and "ts" in ln]
    assert winlines and any("__tb" in ln for ln in winlines)

    with pytest.raises(TypeError, match="numeric"):
        asof_join(left.withColumn("ts", left.ts.cast("string")),
                  right.withColumn("ts", right.ts.cast("string")),
                  "k", "ts", time_bucket=100)


def test_range_join_explosion_guard(spark):
    """A pathological interval (sentinel end date) must fail loudly
    instead of silently exploding to millions of bucket rows."""
    points = spark.createDataFrame([Row(p=100)])
    ok = spark.createDataFrame([Row(s=50, e=150)])
    bad = spark.createDataFrame([Row(s=50, e=50_000_000)])
    assert range_join(points, ok, "p", "s", "e", bucket=100).count() == 1
    with pytest.raises(Exception, match="spans more than"):
        range_join(points, bad, "p", "s", "e", bucket=100,
                   max_buckets_per_interval=1000).count()
    # raising the limit deliberately lets the huge interval through
    assert range_join(points, bad, "p", "s", "e", bucket=100,
                      max_buckets_per_interval=600_000).count() == 1


def test_range_join(spark):
    points = spark.createDataFrame(
        [Row(pid=1, t=50), Row(pid=2, t=150), Row(pid=3, t=9999)])
    intervals = spark.createDataFrame([
        Row(iid=10, s=0, e=100), Row(iid=11, s=40, e=60),
        Row(iid=12, s=100, e=200)])
    out = range_join(points, intervals, "t", "s", "e", bucket=50).collect()
    pairs = sorted((r["pid"], r["iid"]) for r in out)
    assert pairs == [(1, 10), (1, 11), (2, 12)]


def test_range_join_with_key_vs_duckdb(spark):
    import random
    rng = random.Random(3)
    points = [Row(k=rng.randrange(3), pid=i, t=rng.randrange(0, 1000))
              for i in range(200)]
    intervals = []
    for i in range(40):
        s = rng.randrange(0, 950)
        intervals.append(Row(k=rng.randrange(3), iid=i, s=s,
                             e=s + rng.randrange(10, 200)))
    pdf = spark.createDataFrame(points)
    idf = spark.createDataFrame(intervals)
    got = sorted((r["pid"], r["iid"]) for r in
                 range_join(pdf, idf, "t", "s", "e", on="k", bucket=64).collect())

    con = duckdb.connect()
    con.execute("CREATE TABLE p(k INT, pid INT, t INT)")
    con.executemany("INSERT INTO p VALUES (?,?,?)",
                    [(r.k, r.pid, r.t) for r in points])
    con.execute("CREATE TABLE i(k INT, iid INT, s INT, e INT)")
    con.executemany("INSERT INTO i VALUES (?,?,?,?)",
                    [(r.k, r.iid, r.s, r.e) for r in intervals])
    oracle = sorted(con.execute(
        "SELECT pid, iid FROM p JOIN i ON p.k = i.k AND t >= s AND t < e"
    ).fetchall())
    assert got == oracle


def test_asof_tolerance_nulls_stale_matches(spark):
    from legend_community_delta_spark.operators.asof import asof_join
    left = spark.createDataFrame(
        [(1, 100), (1, 200), (1, 1000), (2, 50)],
        "k long, ts long")
    right = spark.createDataFrame(
        [(1, 90, "a"), (1, 190, "b")], "k long, ts long, v string")
    out = {(r.k, r.ts): r.v_asof
           for r in asof_join(left, right, "k", "ts",
                              tolerance=50).collect()}
    # ts=100 matched 90 (age 10, fresh); ts=200 matched 190 (age 10);
    # ts=1000 would match 190 but age 810 > 50 -> NULL; key 2 unmatched
    assert out == {(1, 100): "a", (1, 200): "b", (1, 1000): None,
                   (2, 50): None}
    # tolerance=None keeps the stale carry
    full = {(r.k, r.ts): r.v_asof
            for r in asof_join(left, right, "k", "ts").collect()}
    assert full[(1, 1000)] == "b"


def test_asof_tolerance_matches_bucketed_plan(spark):
    from legend_community_delta_spark.operators.asof import asof_join
    left = spark.createDataFrame(
        [(1, t) for t in (5, 250, 999, 1500)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 1, "x"), (1, 240, "y"), (1, 900, None), (1, 1400, "z")],
        "k long, ts long, v string")
    plain = sorted(map(tuple, asof_join(
        left, right, "k", "ts", tolerance=120).collect()))
    bucketed = sorted(map(tuple, asof_join(
        left, right, "k", "ts", tolerance=120,
        time_bucket=100).collect()))
    assert plain == bucketed


def test_asof_tolerance_forward_and_validation(spark):
    import pytest as _pytest
    from legend_community_delta_spark.operators.asof import asof_join
    left = spark.createDataFrame([(1, 100)], "k long, ts long")
    right = spark.createDataFrame([(1, 500, "f")],
                                  "k long, ts long, v string")
    near = asof_join(left, right, "k", "ts", direction="forward",
                     tolerance=400).collect()
    far = asof_join(left, right, "k", "ts", direction="forward",
                    tolerance=100).collect()
    assert near[0].v_asof == "f" and far[0].v_asof is None
    with _pytest.raises(ValueError, match=">= 0"):
        asof_join(left, right, "k", "ts", tolerance=-1)


def test_resample_ffill_hand_computed(spark):
    from legend_community_delta_spark.operators.asof import resample_ffill
    df = spark.createDataFrame(
        [("a", 105, 1.0), ("a", 327, 2.0), ("b", 12, 9.0)],
        "k string, ts long, v double")
    got = sorted(map(tuple, resample_ffill(df, "ts", 100, on="k")
                     .collect()))
    assert got == [("a", 100, None), ("a", 200, 1.0), ("a", 300, 1.0),
                   ("b", 0, None)]
    # ungrouped: one global grid
    flat = sorted(map(tuple, resample_ffill(df.drop("k"), "ts", 100)
                      .collect()))
    assert flat == [(0, None), (100, 9.0), (200, 1.0), (300, 1.0)]


def test_resample_ffill_tick_explosion_guard(spark):
    import pytest as _pytest
    from legend_community_delta_spark.operators.asof import resample_ffill
    df = spark.createDataFrame([("a", 0, 1.0), ("a", 10**9, 2.0)],
                               "k string, ts long, v double")
    with _pytest.raises(Exception, match="spans more than"):
        resample_ffill(df, "ts", 1, on="k",
                       max_ticks_per_key=1000).collect()
