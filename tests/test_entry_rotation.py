"""The driver samples a bounded window from the FRONT of ``queries()``;
`__spark_entry__._rotation_order` puts the entries with the oldest (or
missing) driver CORRECTNESS rows first so every entry's driver artifact
stays at most a few rounds old (VERDICT r8 item 1)."""

from __future__ import annotations

import importlib.util
import json
import os


def _load_entry():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "entry_under_test", os.path.join(here, "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_rotation_is_a_permutation_of_all_queries():
    mod = _load_entry()
    from legend_community_delta_spark import demo

    names = list(mod.queries())
    assert sorted(names) == sorted(demo.QUERIES)
    # every oracle key still has a queries() twin
    assert set(mod.oracle_sql()) <= set(names)


def test_stale_and_never_sampled_entries_go_first(tmp_path):
    mod = _load_entry()
    (tmp_path / "CORRECTNESS_r1.json").write_text(
        json.dumps({"a": {}, "b": {}, "c": {}}))
    (tmp_path / "CORRECTNESS_r2.json").write_text(
        json.dumps({"b": {}}))
    order = mod._rotation_order(["a", "b", "c", "d"],
                                artifact_dir=str(tmp_path))
    # d was never sampled -> first; b is freshest (r2) -> last;
    # a/c tie at r1 and keep input order
    assert order == ["d", "a", "c", "b"]


def test_no_artifacts_preserves_input_order(tmp_path):
    mod = _load_entry()
    order = mod._rotation_order(["x", "y", "z"],
                                artifact_dir=str(tmp_path))
    assert order == ["x", "y", "z"]


def test_malformed_artifact_is_ignored(tmp_path):
    mod = _load_entry()
    (tmp_path / "CORRECTNESS_r1.json").write_text("{not json")
    (tmp_path / "CORRECTNESS_r2.json").write_text(json.dumps(["list"]))
    order = mod._rotation_order(["x", "y"], artifact_dir=str(tmp_path))
    assert order == ["x", "y"]
