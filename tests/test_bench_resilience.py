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
    # Each ladder attempt is its own subprocess (the in-process cleanup
    # it replaced was measured insufficient after a compile OOM), so the
    # failure is injected via BENCH_FAULT in the inherited environment —
    # the REAL orchestrator/worker path is what runs here.
    monkeypatch.setenv("BENCH_FAULT", json.dumps({"unless": "eig_lax"}))
    bench.main()
    captured = capsys.readouterr()
    out = _last_json_line(captured.out)
    assert out["unit"] == "patches/s" and out["value"] > 0
    assert "eig_solver=lax" in out["detail"]["degraded"]
    # ladder walked: default and chunk/2 failed, then the eig_lax rung
    assert captured.err.count("failed (rc=") == 2


def test_total_failure_replays_stale_record(bench, monkeypatch, capsys):
    monkeypatch.setenv("BENCH_FAULT", json.dumps({"always": True}))
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
