"""Unit tests for bench.py's idle-gate (`_await_idle`).

BENCH_HISTORY.jsonl showed 2.4x run-to-run drift for identical query
sets on the same day — ambient load on the shared machine, not engine
regressions.  The gate waits for load_1m to drop below a threshold and
marks the run ``contended`` when it never does, so round-over-round
comparisons can exclude noise-dominated runs.
"""

from __future__ import annotations

import importlib.util
import os


def _load_bench():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(here, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_idle_machine_passes_immediately():
    bench = _load_bench()
    sleeps = []
    load, contended = bench._await_idle(
        getloadavg=lambda: (0.42, 0.5, 0.5),
        sleep=sleeps.append, gate=1.0, max_wait=90)
    assert (load, contended) == (0.42, False)
    assert sleeps == []                      # no wait on an idle box


def test_contended_machine_waits_then_flags():
    bench = _load_bench()
    sleeps = []
    load, contended = bench._await_idle(
        getloadavg=lambda: (7.5, 7.0, 6.0),
        sleep=sleeps.append, gate=1.0, max_wait=20)
    assert contended is True
    assert load == 7.5
    assert sleeps == [5.0] * 4               # waited out max_wait in 5s steps


def test_load_dropping_below_gate_clears_flag():
    bench = _load_bench()
    readings = iter([(3.0,), (2.0,), (0.8,)])
    load, contended = bench._await_idle(
        getloadavg=lambda: next(readings),
        sleep=lambda _s: None, gate=1.0, max_wait=90)
    assert (load, contended) == (0.8, False)


def test_env_overrides_respected(monkeypatch):
    bench = _load_bench()
    monkeypatch.setenv("BENCH_LOAD_GATE", "5.0")
    load, contended = bench._await_idle(
        getloadavg=lambda: (4.9,), sleep=lambda _s: None)
    assert (load, contended) == (4.9, False)


def test_elevated_5m_load_blocks_even_when_1m_idle():
    """A heavy job that JUST finished shows load_1m near 0 but load_5m
    still high — the round-9 PERF.md incident (gate passed at
    load_1m 0.97, run came out 1.29x).  The 5-minute gate must hold
    the run back / flag it."""
    bench = _load_bench()
    sleeps = []
    load, contended = bench._await_idle(
        getloadavg=lambda: (0.1, 6.0, 5.0),
        sleep=sleeps.append, gate=1.0, max_wait=20)
    assert contended is True
    assert sleeps == [5.0] * 4


def test_5m_decay_clears_flag():
    bench = _load_bench()
    readings = iter([(0.2, 4.0, 3.0), (0.2, 2.6, 3.0), (0.1, 2.2, 2.5)])
    load, contended = bench._await_idle(
        getloadavg=lambda: next(readings),
        sleep=lambda s: None, gate=1.0, max_wait=90)
    assert (load, contended) == (0.1, False)
