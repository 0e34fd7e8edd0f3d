"""Pin the extension-demo experiment end-to-end at --quick scale.

The demo's scientific numbers live in experiments/EXTENSION_DEMO.md (TPU
runs); this test pins the EXPERIMENT itself — schedule, base warmup,
EMA labeler, self-labeled extension epochs, held-out eval, results.json
shape — on CPU shapes too small to learn anything (round-3 verdict item 1
asked for a slow test pinning a small version of the demo).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_quick_demo_runs_end_to_end(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = str(tmp_path / "demo")
    proc = subprocess.run(
        [sys.executable, "-u",
         os.path.join(REPO, "experiments", "extension_demo.py"),
         "--quick", "--arm", "eyoc-ema", "--out", out],
        env=env, capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]

    res = json.load(open(os.path.join(out, "results.json")))
    assert "eyoc-ema" in res
    arm = res["eyoc-ema"]
    # history: base-warmup eval + per-interval evals, each with RR dict
    assert arm["epochs"] == 4
    assert len(arm["history"]) >= 2
    for h in arm["history"]:
        for v in h["rr"].values():
            assert 0.0 <= float(v) <= 1.0
    # the trainer must actually have reached extension mode (MAX_DIST
    # grew beyond base) — the demo without this is just base training
    assert any((h.get("max_dist") or 0) > 1 for h in arm["history"])
    # checkpoint written by trainer._save at the end
    assert os.path.exists(os.path.join(out, "eyoc-ema", "checkpoint.msgpack"))


def test_round5_results_demonstrate_extension():
    """Pin the round-5 headline (verdict item 1): the committed TPU run's
    table must show progressive extension extending — each eyoc arm
    >= base-only at every band AND strictly above BOTH controls at >= 2
    distance bands. Guards against regressions that silently weaken the
    committed artifact (experiments/results_r5.json; full analysis in
    EXTENSION_DEMO.md)."""
    res = json.load(open(os.path.join(REPO, "experiments",
                                      "results_r5.json")))
    rr = {arm: {float(d): v for d, v in r["rr_final"].items()}
          for arm, r in res.items()}
    for arm in ("eyoc-ema", "eyoc-sync"):
        strictly_above_both = 0
        for d in rr[arm]:
            assert rr[arm][d] >= rr["base-only"].get(d, 0.0), (arm, d)
            if (rr[arm][d] > rr["base-only"].get(d, 0.0)
                    and rr[arm][d] > rr["untrained"].get(d, 0.0)):
                strictly_above_both += 1
        assert strictly_above_both >= 2, (arm, rr)


def test_round5_replication_reproduces_frontier():
    """Pin the session-D replication (experiments/results_r5_30m.json):
    INDEPENDENT eyoc-ema and eyoc-sync runs on a different schedule
    (70 epochs / 14 stages to 30 m) must reproduce the frontier — RR
    held at >= 3 distance bands that an untrained net registers at 0
    (the committed untrained control in results_r5.json is 0 beyond
    15 m), with a stage-by-stage extending trajectory. Guards the
    replication artifact the stability claim in EXTENSION_DEMO.md §4
    rests on."""
    res = json.load(open(os.path.join(REPO, "experiments",
                                      "results_r5_30m.json")))
    for name in ("eyoc-ema", "eyoc-sync"):
        arm = res[name]
        rr = {float(d): v for d, v in arm["rr_final"].items()}
        assert rr[15.0] >= 0.9 and rr[20.0] > 0.0 and rr[25.0] > 0.0, (
            name, rr)
        # trajectory must show the frontier moving outward: the 25 m band
        # is zero while the schedule is short, positive once extended
        hist = arm["history"]
        rr25 = [h["rr"].get("25.0", h["rr"].get(25.0, 0.0)) for h in hist]
        assert rr25[0] == 0.0 and max(rr25) > 0.0, (name, rr25)
