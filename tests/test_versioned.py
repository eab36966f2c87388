"""Versioned parquet tables: time travel, history, merge — no Delta."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from legend_community_delta_spark.sources.versioned import VersionedTable


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_time_travel_and_history(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    v0 = t.write(spark.createDataFrame([Row(id=1, v="a"), Row(id=2, v="b")]))
    v1 = t.append(spark.createDataFrame([Row(id=3, v="c")]))
    assert (v0, v1) == (0, 1)

    # VERSION AS OF: the old snapshot is intact after the append
    assert _rows(t.read(0)) == [(1, "a"), (2, "b")]
    assert _rows(t.read(1)) == [(1, "a"), (2, "b"), (3, "c")]
    assert _rows(t.read()) == _rows(t.read(1))

    hist = t.history().collect()
    assert [r["version"] for r in hist] == [1, 0]          # newest first
    assert [r["operation"] for r in hist] == ["APPEND", "WRITE"]
    assert hist[0]["timestamp"] >= hist[1]["timestamp"]

    with pytest.raises(ValueError, match="out of range"):
        t.read(7)
    with pytest.raises(ValueError, match="empty"):
        VersionedTable(spark, str(tmp_path / "nope")).read()


def test_merge_is_row_level_and_versioned(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    t.write(spark.createDataFrame(
        [Row(id=1, v="a"), Row(id=2, v="b"), Row(id=3, v="c")]))
    v = t.merge(spark.createDataFrame(
        [Row(id=2, v="B"), Row(id=4, v="d")]), keys=["id"])
    assert v == 1
    # matched row replaced, new row inserted, untouched rows kept
    assert _rows(t.read()) == [(1, "a"), (2, "B"), (3, "c"), (4, "d")]
    # the pre-merge snapshot still answers queries (drift debugging)
    assert _rows(t.read(0)) == [(1, "a"), (2, "b"), (3, "c")]
    # idempotent re-merge: same end state, one more version
    t.merge(spark.createDataFrame([Row(id=2, v="B")]), keys=["id"])
    assert _rows(t.read()) == [(1, "a"), (2, "B"), (3, "c"), (4, "d")]
    assert t.latest_version() == 2


def test_vacuum_keeps_history_drops_old_snapshots(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    for i in range(4):
        t.append(spark.createDataFrame([Row(id=i)]))
    dropped = t.vacuum(keep_last=2)
    assert dropped == [0, 1]
    # history still lists everything; recent versions still readable
    assert [r["version"] for r in t.history().collect()] == [3, 2, 1, 0]
    assert len(t.read(2).collect()) == 3
    assert len(t.read(3).collect()) == 4


def test_snapshot_diff_classifies_rows(spark):
    from legend_community_delta_spark.sources.versioned import (
        snapshot_diff)
    old = spark.createDataFrame(
        [Row(id=1, v="a"), Row(id=2, v="b"), Row(id=3, v="c"),
         Row(id=4, v=None)])
    new = spark.createDataFrame(
        [Row(id=1, v="a"),          # unchanged -> absent from output
         Row(id=2, v="B"),          # changed
         Row(id=4, v="NULL"),       # NULL -> the STRING 'NULL': changed
         Row(id=5, v="e")])         # added; id=3 removed
    got = {r.id: r.change
           for r in snapshot_diff(old, new, ["id"]).collect()}
    assert got == {2: "changed", 3: "removed", 4: "changed", 5: "added"}


def test_snapshot_diff_separator_prevents_column_smearing(spark):
    from legend_community_delta_spark.sources.versioned import (
        snapshot_diff)
    # ("ab", "") vs ("a", "b") concatenate identically without a
    # separator; the \x1f join must keep them distinct
    old = spark.createDataFrame([Row(id=1, x="ab", y="")])
    new = spark.createDataFrame([Row(id=1, x="a", y="b")])
    got = snapshot_diff(old, new, ["id"]).collect()
    assert [(r.id, r.change) for r in got] == [(1, "changed")]


def test_diff_versions_over_versioned_table(spark, tmp_path):
    from legend_community_delta_spark.sources.versioned import (
        diff_versions)
    t = VersionedTable(spark, str(tmp_path / "difftbl"))
    t.write(spark.createDataFrame([Row(id=1, v="a"), Row(id=2, v="b")]))
    t.merge(spark.createDataFrame([Row(id=2, v="B"), Row(id=3, v="c")]),
            keys=["id"])
    got = {r.id: r.change
           for r in diff_versions(t, 0, 1, ["id"]).collect()}
    assert got == {2: "changed", 3: "added"}


def test_compact_rewrites_latest_without_changing_rows(spark, tmp_path):
    import glob
    t = VersionedTable(spark, str(tmp_path / "ctbl"))
    df = spark.createDataFrame([Row(id=i, v=str(i)) for i in range(50)])
    t.write(df.repartition(8))
    before = _rows(t.read())
    n_before = len(glob.glob(f"{t.path}/v=0/part-*"))
    v = t.compact(target_files=1)
    assert v == 1
    assert _rows(t.read()) == before          # identical row set
    assert _rows(t.read(0)) == before         # old snapshot untouched
    n_after = len(glob.glob(f"{t.path}/v=1/part-*"))
    assert n_after == 1 and n_before > 1
    hist = t.history().collect()
    assert hist[0]["operation"] == "COMPACT"


def test_restore_commits_old_content_as_new_version(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "rtbl"))
    t.write(spark.createDataFrame([Row(id=1, v="good")]))
    t.write(spark.createDataFrame([Row(id=1, v="bad")]))
    v = t.restore(0)
    assert v == 2
    assert _rows(t.read()) == [(1, "good")]
    assert _rows(t.read(1)) == [(1, "bad")]   # history intact
    assert t.history().collect()[0]["operation"] == "RESTORE"


def test_compact_empty_table_raises(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "etbl"))
    with pytest.raises(ValueError, match="no versions"):
        t.compact()


def test_table_changes_cdf_shape(spark, tmp_path):
    from legend_community_delta_spark.sources.versioned import (
        table_changes)
    t = VersionedTable(spark, str(tmp_path / "cdf"))
    t.write(spark.createDataFrame(
        [Row(id=1, v="a"), Row(id=2, v="b"), Row(id=3, v="c")]))
    # v1: delete id=3, change id=2, insert id=4
    t.write(spark.createDataFrame(
        [Row(id=1, v="a"), Row(id=2, v="B"), Row(id=4, v="d")]))

    ch = table_changes(t, 0, 1, keys=["id"])
    assert ch.columns == ["id", "v", "_change_type", "_commit_version"]
    got = sorted((r["id"], r["v"], r["_change_type"]) for r in ch.collect())
    assert got == [
        (2, "B", "update_postimage"),
        (2, "b", "update_preimage"),
        (3, "c", "delete"),
        (4, "d", "insert"),
    ]
    assert {r["_commit_version"] for r in ch.collect()} == {1}
    # unchanged rows never appear (id=1 absent) — checked by the exact
    # list above; CDF between identical versions is empty
    assert table_changes(t, 1, 1, keys=["id"]).count() == 0


def test_stream_append_batches_are_segments_and_idempotent(spark,
                                                           tmp_path):
    t = VersionedTable(spark, str(tmp_path / "seg"))
    assert t.append_batch(spark.createDataFrame([Row(id=1)]), 0) == 0
    assert t.append_batch(spark.createDataFrame([Row(id=2)]), 1) == 1
    # replay of batch 1 (at-least-once delivery) is a committed no-op
    assert t.append_batch(spark.createDataFrame([Row(id=2)]), 1) is None
    assert t.append_batch(spark.createDataFrame([Row(id=3)]), 2) == 2
    assert _rows(t.read()) == [(1,), (2,), (3,)]
    # every segment version is itself a consistent prefix view
    assert _rows(t.read(1)) == [(1,), (2,)]
    ops = [r["operation"] for r in t.history().collect()]
    assert ops == ["STREAM_APPEND"] * 3
    # segments write O(batch): version dirs hold only their own rows
    seg = spark.read.parquet(str(tmp_path / "seg" / "v=1"))
    assert _rows(seg) == [(2,)]


def test_stream_segments_fold_and_vacuum_safely(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "segv"))
    t.write(spark.createDataFrame([Row(id=1)]))           # v0 full
    t.append_batch(spark.createDataFrame([Row(id=2)]), 0)  # v1 segment
    t.append_batch(spark.createDataFrame([Row(id=3)]), 1)  # v2 segment
    assert _rows(t.read()) == [(1,), (2,), (3,)]
    # vacuum keeping only the tip must keep the whole segment chain
    assert t.vacuum(keep_last=1) == []
    assert _rows(t.read()) == [(1,), (2,), (3,)]
    # compact folds the chain into one full snapshot; vacuum can then
    # really drop the old chain
    v = t.compact(target_files=1)
    assert _rows(t.read(v)) == [(1,), (2,), (3,)]
    dropped = t.vacuum(keep_last=1)
    assert dropped == [0, 1, 2]
    assert _rows(t.read()) == [(1,), (2,), (3,)]
