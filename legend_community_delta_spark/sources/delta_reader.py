"""Read Delta Lake tables WITHOUT a Delta runtime: transaction-log
replay over plain ``spark.read.parquet``.

The reference's headline surface is Delta (``Legend.scala:163-186``,
the notebooks' time travel); this container has no delta-spark wheel,
so :mod:`.versioned` re-expresses the WRITE side on parquet.  This
module covers the READ side of interop: a real Delta table written by
any engine is just parquet files plus a JSON/parquet transaction log
in the PUBLIC Delta protocol, and replaying that log yields the exact
live file set for any version — ``VERSION AS OF`` included.

Scale notes (how every Delta client works, including delta-spark):

* the DRIVER holds only the log — add/remove actions (path +
  partition values), metadata and the schema; data files are never
  opened by the driver;
* a checkpoint parquet (``N.checkpoint.parquet``) is read through
  Spark and only the path/partitionValues columns are collected, so
  even million-file tables ship a few hundred MB of strings to the
  driver, not data;
* the assembled DataFrame is ONE ``spark.read.parquet`` over the live
  files with ``basePath`` set, so hive-laid partition directories
  prune natively and Catalyst sees a plain parquet relation
  (predicate pushdown, column pruning, AQE all apply).

Unsupported (raise pointedly): multi-part checkpoints, v2 checkpoints
with sidecars, deletion vectors, and column-mapping modes other than
none — the features gated behind higher reader versions.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_delta", "delta_log_versions", "delta_history"]


def _log_entries(log_dir: str) -> tuple[list[int], dict[int, str]]:
    """Sorted commit versions + {version: json path}."""
    commits: dict[int, str] = {}
    for name in os.listdir(log_dir):
        if name.endswith(".json") and name[:-5].isdigit():
            commits[int(name[:-5])] = os.path.join(log_dir, name)
    return sorted(commits), commits


def _checkpoints(log_dir: str) -> dict[int, str]:
    """{version: single-part checkpoint parquet path}; multi-part
    checkpoint files raise pointedly when they would be needed."""
    out: dict[int, str] = {}
    for name in os.listdir(log_dir):
        if name.endswith(".checkpoint.parquet"):
            head = name[:-len(".checkpoint.parquet")]
            if head.isdigit():
                out[int(head)] = os.path.join(log_dir, name)
    return out


def delta_log_versions(path: str) -> list[int]:
    """The commit versions present in a Delta table's log."""
    log_dir = os.path.join(path, "_delta_log")
    if not os.path.isdir(log_dir):
        raise ValueError(f"[{path}] has no _delta_log — not a Delta "
                         "table")
    versions, _ = _log_entries(log_dir)
    return versions


def delta_history(spark: SparkSession, path: str) -> DataFrame:
    """``DESCRIBE HISTORY`` for a Delta table without a Delta runtime:
    one row per commit, newest first — (version, timestamp,
    operation), from each commit's ``commitInfo`` action (logs written
    without commitInfo — it is optional in the protocol — fall back to
    the commit file's mtime and a null operation)."""
    path = path.rstrip("/")
    log_dir = os.path.join(path, "_delta_log")
    if not os.path.isdir(log_dir):
        raise ValueError(f"[{path}] has no _delta_log — not a Delta "
                         "table")
    versions, commit_files = _log_entries(log_dir)
    rows = []
    for v in versions:
        ts, op = None, None
        with open(commit_files[v]) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "commitInfo" in action:
                    ci = action["commitInfo"]
                    ts = ci.get("timestamp")
                    op = ci.get("operation")
                    break
        if ts is None:
            ts = int(os.stat(commit_files[v]).st_mtime * 1000)
        rows.append((v, float(ts) / 1000.0, op))
    rows.reverse()
    return spark.createDataFrame(
        rows, "version int, timestamp double, operation string")


def read_delta(spark: SparkSession, path: str,
               version: int | None = None,
               timestamp_ms: float | None = None) -> DataFrame:
    """Open a Delta table (``VERSION AS OF`` *version* /
    ``TIMESTAMP AS OF`` *timestamp_ms*, latest when both omitted) by
    replaying its transaction log — no Delta runtime.

    Returns one parquet scan over the live files with the log's
    schema enforced and partition directories recovered via
    ``basePath`` (Delta lays partitioned files out hive-style).
    An empty live set (a table whose files were all removed) returns
    an EMPTY DataFrame with the log's schema, like Delta does.
    """
    path = path.rstrip("/")
    log_dir = os.path.join(path, "_delta_log")
    if not os.path.isdir(log_dir):
        raise ValueError(f"[{path}] has no _delta_log — not a Delta "
                         "table")
    versions, commit_files = _log_entries(log_dir)
    if not versions:
        raise ValueError(f"[{path}] has an empty _delta_log")
    if version is not None and timestamp_ms is not None:
        raise ValueError("pass version OR timestamp_ms, not both")
    if timestamp_ms is not None:
        hist = {r["version"]: r["timestamp"] * 1000.0
                for r in delta_history(spark, path).collect()}
        eligible = [v for v in versions if hist[v] <= timestamp_ms]
        if not eligible:
            raise ValueError(
                f"no commit at or before timestamp {timestamp_ms} at "
                f"[{path}] (earliest is {min(hist.values())})")
        target = max(eligible)
    else:
        target = versions[-1] if version is None else int(version)
    if target not in commit_files and target > versions[-1]:
        raise ValueError(
            f"version {target} out of range [0, {versions[-1]}] "
            f"at [{path}]")

    live: dict[str, dict] = {}
    meta: dict | None = None
    protocol: dict | None = None

    # start from the newest single-part checkpoint at/below target
    start = 0
    cps = _checkpoints(log_dir)
    usable = [v for v in cps if v <= target]
    if usable:
        cp_v = max(usable)
        cp = spark.read.parquet(cps[cp_v])
        cols = set(cp.columns)
        rows = cp.select(*[c for c in ("add", "remove", "metaData",
                                       "protocol") if c in cols]) \
            .collect()
        for r in rows:
            add = r["add"] if "add" in cols else None
            if add is not None and add["path"] is not None:
                live[add["path"]] = dict(add["partitionValues"] or {})
            md = r["metaData"] if "metaData" in cols else None
            if md is not None and md["id"] is not None:
                meta = {"schemaString": md["schemaString"],
                        "partitionColumns":
                            list(md["partitionColumns"] or [])}
        start = cp_v + 1
    elif any(".checkpoint." in n for n in os.listdir(log_dir)):
        raise ValueError(
            f"[{path}] has only multi-part/v2 checkpoints; this "
            "reader supports single-part classic checkpoints — "
            "compact the log or read with delta-spark")

    for v in versions:
        if v < start or v > target:
            continue
        with open(commit_files[v]) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "add" in action:
                    a = action["add"]
                    live[a["path"]] = dict(a.get("partitionValues")
                                           or {})
                elif "remove" in action:
                    live.pop(action["remove"]["path"], None)
                elif "metaData" in action:
                    meta = action["metaData"]
                elif "protocol" in action:
                    protocol = action["protocol"]
    if protocol and protocol.get("minReaderVersion", 1) > 1:
        feats = protocol.get("readerFeatures") or []
        hard = {"deletionVectors", "columnMapping", "v2Checkpoint"} \
            & set(feats)
        if hard:
            raise ValueError(
                f"Delta table at [{path}] requires reader features "
                f"{sorted(hard)}; read it with delta-spark")
    if meta is None:
        raise ValueError(f"[{path}] log has no metaData action")

    from pyspark.sql.types import StructType
    full_schema = StructType.fromJson(json.loads(meta["schemaString"]))
    if not live:
        # a valid state: every file removed — empty table, real schema
        return spark.createDataFrame([], full_schema)
    part_cols = list(meta.get("partitionColumns") or [])
    data_schema = StructType(
        [f for f in full_schema.fields if f.name not in part_cols])
    files = [os.path.join(path, p) for p in live]
    reader = spark.read.schema(data_schema) if not part_cols \
        else spark.read.option("basePath", path).schema(data_schema)
    df = reader.parquet(*files)
    if part_cols:
        # basePath recovers partition columns from the hive dirs;
        # cast them to the log schema's declared types
        from pyspark.sql import functions as F
        for f in full_schema.fields:
            if f.name in part_cols:
                df = df.withColumn(f.name,
                                   F.col(f.name).cast(f.dataType))
        df = df.select(*[f.name for f in full_schema.fields])
    return df
