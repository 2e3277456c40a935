"""Orchestration-logic tests for the crash-isolated benchmark harness
(bench.py). These exercise the JAX-free parent: hybrid in-process ->
subprocess demotion after a backend fault, per-stage retry, and the
priority-ordered headline selection — the failure modes that produced
BENCH_r04's three-stage erasure (VERDICT r4 weak-1)."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402


def _fake_stages(results):
    """Stage table whose runners report canned results or raise."""
    table = {}
    for key, (out, metric, ref, pri) in results.items():
        def runner(out=out):
            if isinstance(out, Exception):
                raise out
            return dict(out)
        table[key] = (runner, metric, ref, pri, 60)
    return table


def test_headline_priority(monkeypatch, capsys):
    """The emitted headline must be the highest-priority completed stage
    (256-class > 192 > 2D > neural fallback), not the last writer."""
    stages = _fake_stages({
        "a2d": ({"s_per_iter": 0.02}, "2D metric", 0.16, 1),
        "c256": ({"s_per_iter": 0.28}, "256 metric", 2.8, 3),
    })
    monkeypatch.setattr(bench, "_STAGES", stages)
    monkeypatch.setattr(bench, "_STAGE_ORDER", ["a2d", "c256"])
    monkeypatch.setenv("NDR_BENCH_RETRY", "0")
    monkeypatch.delenv("NDR_BENCH_STAGES", raising=False)
    monkeypatch.delenv("NDR_BENCH_ISOLATE", raising=False)
    monkeypatch.setattr(bench, "_inproc_stage",
                        lambda key, fb=None: (dict(stages[key][0]()), None))
    bench.main()
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    final = lines[-1]
    assert final["metric"] == "256 metric"
    assert final["value"] == 0.28
    assert final["vs_baseline"] == 10.0
    # the intermediate emission after stage 1 already carried the 2D number
    assert lines[0]["metric"] == "2D metric"
    assert lines[0]["extra"]["a2d"]["s_per_iter"] == 0.02


def test_inproc_failure_demotes_to_subprocess(monkeypatch, capsys):
    """One in-process fault must poison only that attempt: the retry and
    every later stage go through fresh subprocesses, and earlier results
    survive in the cumulative line (the BENCH_r04 regression)."""
    stages = _fake_stages({
        "ok1": ({"s_per_iter": 0.1}, "m1", 1.0, 1),
        "boom": (RuntimeError("UNAVAILABLE: TPU worker crashed"), "m2", 1.0, 2),
        "ok2": ({"s_per_iter": 0.2}, "m3", 1.0, 3),
    })
    monkeypatch.setattr(bench, "_STAGES", stages)
    monkeypatch.setattr(bench, "_STAGE_ORDER", ["ok1", "boom", "ok2"])
    monkeypatch.setenv("NDR_BENCH_RETRY", "1")
    monkeypatch.delenv("NDR_BENCH_STAGES", raising=False)
    monkeypatch.delenv("NDR_BENCH_ISOLATE", raising=False)

    inproc_calls, spawn_calls = [], []

    def fake_inproc(key, fb=None):
        inproc_calls.append(key)
        try:
            return dict(stages[key][0]()), None
        except Exception as e:  # noqa: BLE001
            return None, str(e)

    def fake_spawn(em, key, timeout_s, fb=None):
        spawn_calls.append(key)
        try:
            return dict(stages[key][0]()), None
        except Exception as e:  # noqa: BLE001
            return None, str(e)

    monkeypatch.setattr(bench, "_inproc_stage", fake_inproc)
    monkeypatch.setattr(bench, "_spawn_stage", fake_spawn)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    bench.main()

    # in-process until the fault, subprocess after
    assert inproc_calls == ["ok1", "boom"]
    assert spawn_calls == ["boom", "ok2"]  # retry of boom + later stage

    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    final = lines[-1]
    # ok1's number survived the boom-stage fault; ok2 still ran and wins
    # the headline by priority
    assert final["extra"]["ok1"]["s_per_iter"] == 0.1
    assert final["metric"] == "m3"
    assert "error" in final["extra"]["boom"]
    assert "note_isolation" in final["extra"]


def test_retry_applies_stage_fallback_env(monkeypatch, capsys):
    """A stage whose primary config faults deterministically (the
    2026-08-21 scan(oc_step(precond=...)) worker crash) must be retried
    with its _STAGE_FALLBACK_ENV override, not the same crashing config."""
    stages = _fake_stages({
        "c256": (RuntimeError("UNAVAILABLE: TPU worker crashed"),
                 "256 metric", 2.8, 3),
    })
    monkeypatch.setattr(bench, "_STAGES", stages)
    monkeypatch.setattr(bench, "_STAGE_ORDER", ["c256"])
    monkeypatch.setattr(bench, "_STAGE_FALLBACK_ENV",
                        {"c256": {"NDR_BENCH_LAG": "0"}})
    monkeypatch.setenv("NDR_BENCH_RETRY", "1")
    monkeypatch.delenv("NDR_BENCH_STAGES", raising=False)
    monkeypatch.delenv("NDR_BENCH_ISOLATE", raising=False)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)

    calls = []

    def fake_inproc(key, fb=None):
        calls.append(("inproc", key, fb))
        return None, "UNAVAILABLE: TPU worker crashed"

    def fake_spawn(em, key, timeout_s, fb=None):
        calls.append(("spawn", key, fb))
        if fb and fb.get("NDR_BENCH_LAG") == "0":
            return {"s_per_iter": 0.356, "precond_lag": 0}, None
        return None, "subprocess rc=1"

    monkeypatch.setattr(bench, "_inproc_stage", fake_inproc)
    monkeypatch.setattr(bench, "_spawn_stage", fake_spawn)
    bench.main()

    assert calls == [
        ("inproc", "c256", None),            # primary config, no override
        ("spawn", "c256", {"NDR_BENCH_LAG": "0"}),  # fallback on retry
    ]
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    final = lines[-1]
    assert final["value"] == 0.356
    assert final["extra"]["c256"]["precond_lag"] == 0
    assert final["extra"]["note_fallback_c256"] == {"NDR_BENCH_LAG": "0"}


def test_spawn_stage_real_subprocess_roundtrip(monkeypatch, capsys):
    """The child protocol (tagged JSON line over stdout) round-trips
    through a real subprocess for a stage key the child cannot run —
    the parent must record an error, not crash or hang."""
    em = bench._Emitter()
    sub, err = bench._spawn_stage(em, "definitely_not_a_stage", 60)
    assert sub is None
    assert err
