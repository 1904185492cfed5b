"""Golden-trajectory regression tests: fixed-seed random-action rollouts must
reproduce recorded goldens exactly (detects silent physics/task drift).
Regenerate intentionally with REGEN_GOLDENS=1."""
import os

import pytest

import thormang_isaacgym_tpu as tgx
from thormang_isaacgym_tpu.parity.harness import check_or_record


def test_cartpole_golden():
    env = tgx.make("Cartpole", num_envs=8, seed=0)
    assert check_or_record("cartpole_8env_50step", env, steps=50) in ("recorded", "matched")


def test_ant_golden():
    env = tgx.make("Ant", num_envs=4, seed=0)
    assert check_or_record("ant_4env_30step", env, steps=30) in ("recorded", "matched")


@pytest.mark.skipif(not os.path.exists("/root/reference/assets"), reason="no reference assets")
def test_gogoro_golden():
    env = tgx.make("Gogoro", num_envs=4, seed=0)
    assert check_or_record("gogoro_4env_30step", env, steps=30) in ("recorded", "matched")


def test_parity_artifact():
    """PARITY_r05.json (scripts/record_parity.py): reduced-scale learning
    curves at reference hyperparameters must pass the strict r5 metric:
    last-point floor AND max-to-last drawdown cap AND a STRICT rise
    (last > first — the r4 equality carve-out that let a flat
    AnymalTerrain curve pass is gone; that task now gates on its
    velocity-tracking reward term instead of the ~0-net total)."""
    import json
    path = os.path.join(os.path.dirname(__file__), "..", "PARITY_r05.json")
    if not os.path.exists(path):
        pytest.skip("PARITY_r05.json not recorded yet")
    with open(path) as f:
        art = json.load(f)
    assert art["schema"] == "parity_curve_v2"
    assert len(art["tasks"]) >= 9, "r5 coverage bar: >= 9 tasks"
    for name, t in art["tasks"].items():
        assert t["passed"], (name, t["last_reward_mean"], t["floor"])
        sgn = t.get("direction", 1)
        assert sgn * t["last_reward_mean"] > sgn * t["curve"][0][1], \
            (name, t["curve"])
        assert t["floor"] == t["floor"], (name, "uncalibrated floor (NaN)")
