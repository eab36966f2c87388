"""Ad-hoc optimization-round measurement: time named queries with the
noop sink under bench.py's exact session config, and optionally dump
``explain('formatted')`` to plans/<tag>/<query>_<suffix>.txt.

Usage:
  python tools/measure.py q1 q2 ...              # time only (best of N)
  MEASURE_PLANS=r13:before python tools/measure.py q1 ...   # + plan dump
  MEASURE_REPEATS=3 MEASURE_SF=/root/testdata/sf0.1 ...

Prints one JSON line {query: best_sec, ...} so runs are easy to diff.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("MEASURE_SF", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPEATS = int(os.environ.get("MEASURE_REPEATS", "2"))
PLANS = os.environ.get("MEASURE_PLANS")  # e.g. "r13:before"


def main(names: list[str]) -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("legend-measure")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from legend_community_delta_spark import demo

    demo.ensure_views(spark, SF_DIR)
    for t in demo._TABLES:
        try:
            spark.table(t).count()
        except Exception:
            pass

    plan_dir = suffix = None
    if PLANS:
        tag, suffix = PLANS.split(":")
        plan_dir = os.path.join(REPO, "plans", tag)
        os.makedirs(plan_dir, exist_ok=True)

    out: dict[str, float] = {}
    for name in names:
        fn = demo.QUERIES[name]
        if plan_dir:
            df = fn(spark, SF_DIR)
            with open(os.path.join(plan_dir, f"{name}_{suffix}.txt"),
                      "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        best = None
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        out[name] = round(best, 3)
        print(f"  {name}: {out[name]}s", file=sys.stderr, flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
