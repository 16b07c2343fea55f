"""The learning gate itself is a deliverable: its single rule must not
silently weaken again (VERDICT r3 weak #6 — the old fallback and
exemption made a passing run look identical to a full-rule pass)."""

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")


def _run_gate(artdir):
    """Run bench.py --gate against a staged artifacts dir."""
    env = dict(os.environ)
    out = subprocess.run(
        [sys.executable, "bench.py", "--gate"], cwd=artdir,
        capture_output=True, text=True, timeout=120, env=env,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return out.returncode, json.loads(line)


def _stage(tmp_path, mutate=None):
    """Copy bench.py + the committed artifacts; optionally mutate one."""
    os.makedirs(tmp_path / "artifacts")
    shutil.copy(os.path.join(REPO, "bench.py"), tmp_path / "bench.py")
    src = os.path.join(REPO, "artifacts")
    for f in os.listdir(src):
        if f.endswith(".json") and "curve" in f:
            shutil.copy(os.path.join(src, f), tmp_path / "artifacts" / f)
    if mutate:
        mutate(tmp_path / "artifacts")
    return tmp_path


def test_gate_passes_on_committed_artifacts(tmp_path):
    rc, d = _run_gate(_stage(tmp_path))
    assert rc == 0 and d["value"] == 1
    # all FIFTEEN configs present (9 online + breakout_host + pong_per
    # + pong_slice + 3 offline), every one on the single rule
    assert len(d["results"]) == 15
    for name, v in d["results"].items():
        assert v["status"] == "pass", (name, v)
        assert len(v["seeds"]) >= 3, name


def test_gate_fails_without_final_evals(tmp_path):
    """No fallback: stripping final_evals from one seed must FAIL the
    gate (the old rule silently fell back to training evals)."""
    def mutate(art):
        p = art / "pong_curve.json"
        d = json.load(open(p))
        d.pop("final_evals", None)
        json.dump(d, open(p, "w"))

    rc, d = _run_gate(_stage(tmp_path, mutate))
    assert rc != 0 and d["value"] == 0
    assert d["results"]["pong"]["status"] == "FAIL"
    assert d["results"]["pong"]["seeds"]["0"]["status"] == "NO_FINAL_EVALS"


def test_gate_fails_on_missing_seed(tmp_path):
    """No exemptions: fewer than 3 seeds fails any config."""
    def mutate(art):
        os.remove(art / "pong_host_curve_seed2.json")

    rc, d = _run_gate(_stage(tmp_path, mutate))
    assert rc != 0
    assert d["results"]["pong_host"]["status"] == "MISSING_SEEDS"


def test_gate_fails_below_target(tmp_path):
    def mutate(art):
        p = art / "freeway_curve_seed1.json"
        d = json.load(open(p))
        d["final_evals"] = [1.0] * 5
        json.dump(d, open(p, "w"))

    rc, d = _run_gate(_stage(tmp_path, mutate))
    assert rc != 0
    assert d["results"]["freeway"]["status"] == "FAIL"
    assert not d["results"]["freeway"]["seeds"]["1"]["pass"]
