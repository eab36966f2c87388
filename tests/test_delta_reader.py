"""Delta-table READ interop without a Delta runtime (log replay)."""

from __future__ import annotations

import json
import os
import struct  # noqa: F401 (parity with sibling test modules)

import pytest
from pyspark.sql import Row

from legend_community_delta_spark.sources.delta_reader import (
    delta_log_versions, read_delta)
from legend_community_delta_spark.sources.versioned import VersionedTable


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_round_trip_with_export_delta_log(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([Row(id=1, v="a"), Row(id=2, v="b")]))
    root = t.export_delta_log()
    assert delta_log_versions(root) == [0]
    got = read_delta(spark, root)
    assert got.columns == ["id", "v"]
    assert _rows(got) == [(1, "a"), (2, "b")]


def test_round_trip_partitioned(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame(
        [Row(id=1, k="x"), Row(id=2, k="y"), Row(id=3, k="x")]),
        partition_by=["k"])
    root = t.export_delta_log()
    got = read_delta(spark, root)
    assert sorted(got.columns) == ["id", "k"]
    assert sorted((r["id"], r["k"]) for r in got.collect()) == \
        sorted([(1, "x"), (2, "y"), (3, "x")])
    # partition pruning is native: one equality filter answers right
    assert sorted(r["id"] for r in
                  got.where("k = 'x'").collect()) == [1, 3]


def _append_commit(root, version, actions):
    log = os.path.join(root, "_delta_log", f"{version:020d}.json")
    with open(log, "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


def test_multi_commit_replay_and_version_as_of(spark, tmp_path):
    # commit 0 via the exporter, then a hand-written commit 1 that
    # REMOVES one file and ADDS another — the reader must replay both
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([Row(id=1, v="a"), Row(id=2, v="b")])
            .coalesce(1))
    root = t.export_delta_log()
    files = [n for n in os.listdir(root) if n.endswith(".parquet")]
    assert len(files) == 1
    # write a second data file the Delta way (plain parquet inside)
    spark.createDataFrame([Row(id=3, v="c")]).coalesce(1) \
        .write.mode("overwrite").parquet(str(tmp_path / "extra"))
    extra = [n for n in os.listdir(str(tmp_path / "extra"))
             if n.endswith(".parquet")][0]
    os.replace(str(tmp_path / "extra" / extra),
               os.path.join(root, "part-extra.parquet"))
    _append_commit(root, 1, [
        {"remove": {"path": files[0], "dataChange": True}},
        {"add": {"path": "part-extra.parquet", "partitionValues": {},
                 "size": os.path.getsize(
                     os.path.join(root, "part-extra.parquet")),
                 "modificationTime": 0, "dataChange": True}},
    ])
    assert delta_log_versions(root) == [0, 1]
    assert _rows(read_delta(spark, root)) == [(3, "c")]
    assert _rows(read_delta(spark, root, version=0)) == \
        [(1, "a"), (2, "b")]
    with pytest.raises(ValueError, match="out of range"):
        read_delta(spark, root, version=9)


def test_checkpoint_replay(spark, tmp_path):
    # a classic single-part checkpoint carries the state; later JSON
    # commits replay on top of it
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([Row(id=1, v="a")]).coalesce(1))
    root = t.export_delta_log()
    f0 = [n for n in os.listdir(root) if n.endswith(".parquet")][0]
    meta = [json.loads(line) for line in
            open(os.path.join(root, "_delta_log",
                              f"{0:020d}.json"))][1]["metaData"]
    # build the checkpoint parquet with Spark (nested action structs;
    # explicit schema — empty maps/nulls can't be inferred)
    ckpt_schema = (
        "add struct<path:string,partitionValues:map<string,string>>, "
        "remove struct<path:string>, "
        "metaData struct<id:string,schemaString:string,"
        "partitionColumns:array<string>>")
    rows = [
        ((f0, {}), None, None),
        (None, None, (meta["id"], meta["schemaString"], [])),
    ]
    ckpt_dir = str(tmp_path / "ckpt")
    spark.createDataFrame(rows, ckpt_schema).coalesce(1) \
        .write.parquet(ckpt_dir)
    part = [n for n in os.listdir(ckpt_dir)
            if n.endswith(".parquet")][0]
    os.replace(os.path.join(ckpt_dir, part),
               os.path.join(root, "_delta_log",
                            f"{0:020d}.checkpoint.parquet"))
    os.remove(os.path.join(root, "_delta_log", f"{0:020d}.json"))
    # a later JSON commit on top of the checkpoint
    spark.createDataFrame([Row(id=2, v="b")]).coalesce(1) \
        .write.mode("overwrite").parquet(str(tmp_path / "extra"))
    extra = [n for n in os.listdir(str(tmp_path / "extra"))
             if n.endswith(".parquet")][0]
    os.replace(str(tmp_path / "extra" / extra),
               os.path.join(root, "part-2.parquet"))
    _append_commit(root, 1, [
        {"add": {"path": "part-2.parquet", "partitionValues": {},
                 "size": 1, "modificationTime": 0,
                 "dataChange": True}}])
    assert _rows(read_delta(spark, root)) == [(1, "a"), (2, "b")]


def test_reader_feature_gates(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([Row(id=1)]))
    root = t.export_delta_log()
    _append_commit(root, 1, [
        {"protocol": {"minReaderVersion": 3,
                      "readerFeatures": ["deletionVectors"]}}])
    with pytest.raises(ValueError, match="deletionVectors"):
        read_delta(spark, root)
    # but VERSION AS OF 0 still reads (the gate is per target state)
    assert _rows(read_delta(spark, root, version=0)) == [(1,)]


def test_not_a_delta_table_raises(spark, tmp_path):
    os.makedirs(str(tmp_path / "plain"))
    with pytest.raises(ValueError, match="no _delta_log"):
        read_delta(spark, str(tmp_path / "plain"))


def test_delta_history_from_log(spark, tmp_path):
    from legend_community_delta_spark.sources.delta_reader import (
        delta_history)
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([Row(id=1)]))
    root = t.export_delta_log()
    _append_commit(root, 1, [
        {"commitInfo": {"timestamp": 1700000000000,
                        "operation": "WRITE"}},
        {"add": {"path": "nope.parquet", "partitionValues": {},
                 "size": 1, "modificationTime": 0,
                 "dataChange": True}}])
    hist = delta_history(spark, root).collect()
    assert [r["version"] for r in hist] == [1, 0]      # newest first
    assert hist[0]["operation"] == "WRITE"
    assert hist[0]["timestamp"] == 1700000000000 / 1000.0
    assert hist[1]["operation"] is None                # no commitInfo


def test_tables_surface_falls_back_to_log_replay(spark, tmp_path):
    # without delta-spark, read_version/table_history on a Delta PATH
    # must answer through the log-replay reader instead of raising
    from legend_community_delta_spark.sources.tables import (
        DeltaRequiredError, read_version, table_history)
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([Row(id=1, v="a")]))
    root = t.export_delta_log()
    try:
        import delta  # noqa: F401
        pytest.skip("delta-spark present: native path covers this")
    except ImportError:
        pass
    assert _rows(read_version(spark, root, 0)) == [(1, "a")]
    assert [r["version"] for r in
            table_history(spark, root).collect()] == [0]
    # a CATALOG name still raises the pointed error
    with pytest.raises(DeltaRequiredError):
        read_version(spark, "some_catalog_table", 0)


def test_timestamp_as_of_and_empty_state(spark, tmp_path):
    from legend_community_delta_spark.sources.delta_reader import (
        delta_history)  # noqa: F401
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([Row(id=1, v="a")]).coalesce(1))
    root = t.export_delta_log()
    f0 = [n for n in os.listdir(root) if n.endswith(".parquet")][0]
    # stamp commit 0 with a known commitInfo time, then commit 1
    # REMOVES everything at a later time
    c0 = os.path.join(root, "_delta_log", f"{0:020d}.json")
    lines = [json.loads(line) for line in open(c0)]
    with open(c0, "w") as fh:
        fh.write(json.dumps({"commitInfo": {
            "timestamp": 1000_000, "operation": "WRITE"}}) + "\n")
        for a in lines:
            fh.write(json.dumps(a) + "\n")
    _append_commit(root, 1, [
        {"commitInfo": {"timestamp": 2000_000, "operation": "DELETE"}},
        {"remove": {"path": f0, "dataChange": True}}])
    # TIMESTAMP AS OF between the commits resolves to version 0
    assert _rows(read_delta(spark, root, timestamp_ms=1500_000)) == \
        [(1, "a")]
    # latest state is EMPTY but valid: empty frame, real schema
    got = read_delta(spark, root)
    assert got.count() == 0 and got.columns == ["id", "v"]
    with pytest.raises(ValueError, match="no commit at or before"):
        read_delta(spark, root, timestamp_ms=500_000)
    with pytest.raises(ValueError, match="not both"):
        read_delta(spark, root, version=0, timestamp_ms=1)
