"""SparkSession tuning presets for the engine's workload shape.

One place for the sizing rules PERF.md documents, so notebooks/jobs start
from a sane baseline instead of Spark defaults (200 shuffle partitions on
a laptop, AQE knobs unset, no Arrow).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def recommended_configs(cores: int, target_scale: str = "local") -> dict[str, str]:
    """Config dict for a session running this engine's operators.

    ``target_scale``: ``local`` (tests/dev, single machine) or ``cluster``
    (real deployment — shuffle partitions sized for re-splitting by AQE).
    """
    shuffle = cores if target_scale == "local" else max(cores * 3, 200)
    return {
        "spark.sql.shuffle.partitions": str(shuffle),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # Arrow for the pandas-UDF paths (multimodal, wide-embedding cosine)
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # scan tasks sized to fit executor memory comfortably
        "spark.sql.files.maxPartitionBytes": "134217728",
    }


def build_session(app_name: str = "legend-community-delta-spark",
                  cores: int | None = None,
                  target_scale: str = "local",
                  master: str | None = None,
                  extra: dict[str, str] | None = None) -> SparkSession:
    import multiprocessing
    n = cores or multiprocessing.cpu_count()
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    elif target_scale == "local":
        builder = builder.master(f"local[{n}]")
    for k, v in recommended_configs(n, target_scale).items():
        builder = builder.config(k, v)
    for k, v in (extra or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
