"""The bench's artifact discipline (VERDICT r3 item 1) is itself logic
worth pinning: a crashing or skipped phase must never lose the record,
and sequence caches must key on their generation parameters."""

import importlib
import json
import sys


def _fresh_bench(monkeypatch, budget="900"):
    monkeypatch.setenv("BENCH_BUDGET_S", budget)
    sys.modules.pop("bench", None)
    import bench

    importlib.reload(bench)
    return bench


def test_phase_crash_keeps_record(monkeypatch, capsys):
    bench = _fresh_bench(monkeypatch)
    bench.RESULTS["value"] = 12.3

    def good():
        bench.RESULTS["a"] = 1

    def bad():
        raise RuntimeError("boom")

    bench.run_phase("good", good, est_cost_s=0)
    bench.run_phase("bad", bad, est_cost_s=0)
    out = capsys.readouterr().out.strip().splitlines()
    # one complete JSON line per phase, crash recorded, earlier fields kept
    assert len(out) == 2
    last = json.loads(out[-1])
    assert last["value"] == 12.3 and last["a"] == 1
    assert last["phases_done"] == ["good"]
    assert last["phases_failed"] == ["bad"]


def test_budget_skip_is_recorded(monkeypatch, capsys):
    bench = _fresh_bench(monkeypatch, budget="0.001")

    def never():
        raise AssertionError("must not run")

    bench.run_phase("long", never, est_cost_s=100)
    last = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert last["phases_skipped"] == ["long"]
    assert "long" not in last["phases_done"]


def test_cache_dir_keys_on_parameters(monkeypatch):
    bench = _fresh_bench(monkeypatch)
    a = bench.seq_cache_dir("seq", duration=10.0, seed=0)
    b = bench.seq_cache_dir("seq", duration=10.0, seed=1)
    c = bench.seq_cache_dir("seq", duration=10.0, seed=0)
    assert a != b and a == c
