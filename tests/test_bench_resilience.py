"""bench.py must be unable to close a round without a parsed JSON line
(VERDICT r4 #2: r3 closed empty on a tunnel outage, r4 on a compile-time
kernel exception that the old remote_compile-only retry did not catch).

Covers: (a) the degradation ladder recovers from a failure in the default
config, (b) total failure replays the persisted BENCH_SELF.json marked
stale, (c) the fully-degraded (all-XLA) configuration actually runs
end-to-end on this backend and emits valid JSON.
"""

import json
import sys

import pytest


@pytest.fixture()
def bench(monkeypatch):
    monkeypatch.setenv("BENCH_PLATFORM", "cpu")
    monkeypatch.setenv("BENCH_DIM", "2")
    monkeypatch.setenv("BENCH_REFINE", "2")
    monkeypatch.setenv("BENCH_SUB", "2")
    monkeypatch.setenv("BENCH_ELL", "1")
    monkeypatch.setenv("BENCH_REPS", "1")
    monkeypatch.setenv("BENCH_CHUNK", "16")
    sys.path.insert(0, str(__import__("pathlib").Path(
        __file__).resolve().parent.parent))
    import bench as bench_mod
    return bench_mod


def _last_json_line(captured: str) -> dict:
    lines = [ln for ln in captured.strip().splitlines() if ln.strip()]
    return json.loads(lines[-1])


def test_ladder_recovers_from_default_config_failure(bench, monkeypatch,
                                                     capsys):
    real_run = bench._run
    calls = []

    def flaky_run(**kw):
        calls.append(kw)
        if not kw.get("eig_lax"):
            raise RuntimeError("synthetic pallas compile failure")
        return real_run(**kw)

    monkeypatch.setattr(bench, "_run", flaky_run)
    bench.main()
    out = _last_json_line(capsys.readouterr().out)
    assert out["unit"] == "patches/s" and out["value"] > 0
    assert "eig_solver=lax" in out["detail"]["degraded"]
    # ladder walked: default, chunk/2, then the first eig_lax rung
    assert len(calls) == 3


def test_total_failure_replays_stale_record(bench, monkeypatch, capsys):
    def dead_run(**kw):
        raise RuntimeError("synthetic: every configuration fails")

    monkeypatch.setattr(bench, "_run", dead_run)
    with pytest.raises(SystemExit) as exc:
        bench.main()
    assert exc.value.code == 0   # stale replay is a SUCCESSFUL exit
    out = _last_json_line(capsys.readouterr().out)
    assert out.get("stale") is True
    assert out["unit"] == "patches/s" and out["value"] > 0
    assert "provenance" in out


def test_fully_degraded_rung_runs_end_to_end(bench, capsys):
    bench._run(chunk_div=2, eig_lax=True, solver_lax=True)
    out = _last_json_line(capsys.readouterr().out)
    assert out["unit"] == "patches/s" and out["value"] > 0
    assert set(out["detail"]["degraded"]) == {
        "chunk/2", "eig_solver=lax", "patch_solver=lax"}
