"""Domain-randomization engine tests (engine/dr.py) against the reference
`randomization_params` schema (`vec_task.py:496-768`): schedules, correlated
obs/action noise, friction buckets, setup_only, per-actor masks, actor scale,
and YAML -> engine end-to-end through `make()`."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import yaml

import thormang_isaacgym_tpu as tgx
from thormang_isaacgym_tpu.engine.dr import (
    make_dr_fn, make_noise_fn, parse_randomization_params,
)
from thormang_isaacgym_tpu.tasks.cartpole import Cartpole

SHADOWLIKE = {
    "frequency": 10,
    "observations": {
        "range": [0, 0.002], "range_correlated": [0, 0.001],
        "operation": "additive", "distribution": "gaussian",
        "schedule": "linear", "schedule_steps": 40000,
    },
    "actions": {
        "range": [0.0, 0.05], "range_correlated": [0, 0.015],
        "operation": "additive", "distribution": "gaussian",
        "schedule": "linear", "schedule_steps": 40000,
    },
    "sim_params": {"gravity": {
        "range": [0, 0.4], "operation": "additive",
        "distribution": "gaussian", "schedule": "linear",
        "schedule_steps": 40000}},
    "actor_params": {"hand": {
        "rigid_body_properties": {"mass": {
            "range": [0.5, 1.5], "operation": "scaling",
            "distribution": "uniform", "setup_only": True}},
        "rigid_shape_properties": {"friction": {
            "num_buckets": 8, "range": [0.7, 1.3],
            "operation": "scaling", "distribution": "uniform"}},
        "dof_properties": {"damping": {
            "range": [0.3, 3.0], "operation": "scaling",
            "distribution": "loguniform"}},
        "scale": {"range": [0.95, 1.05], "operation": "scaling",
                  "distribution": "uniform", "setup_only": True},
    }},
}


def test_parse_full_schema():
    task = Cartpole(num_envs=4)
    entries, obs_spec, act_spec, freq = parse_randomization_params(
        SHADOWLIKE, task.model)
    leaves = sorted(e["leaf"] for e in entries)
    assert leaves == ["__scale__", "body_mass", "dof_damping",
                      "geom_friction", "gravity"]
    assert freq == 10 and obs_spec is not None and act_spec is not None


def test_setup_only_and_buckets():
    task = Cartpole(num_envs=4)
    dr_fn, active = make_dr_fn(SHADOWLIKE, task.model)
    assert active
    base = task.model.default_params()
    key = jax.random.key(0)
    p_setup = dr_fn(key, base, base, 0, setup=True)
    p_reset = dr_fn(key, base, base, 0, setup=False)
    # setup_only mass randomization applies only at setup
    assert not np.allclose(np.asarray(p_setup.body_mass),
                           np.asarray(base.body_mass))
    assert np.allclose(np.asarray(p_reset.body_mass),
                       np.asarray(base.body_mass))
    # friction buckets: many samples land on at most num_buckets values
    fr = []
    for i in range(64):
        p = dr_fn(jax.random.fold_in(key, i), base, base, 0, setup=False)
        fr.extend(np.asarray(p.geom_friction).ravel().tolist())
    assert len(set(np.round(fr, 6))) <= 8


def test_linear_schedule_ramps():
    fn = make_noise_fn(SHADOWLIKE["observations"])
    x = jnp.ones((4, 6))
    key = jax.random.key(1)
    early = np.asarray(fn(key, x, None, 0)) - 1.0
    late = np.asarray(fn(key, x, None, 40000)) - 1.0
    assert np.abs(early).max() < 1e-6          # ramp starts at zero noise
    assert np.abs(late).max() > 1e-5


def test_correlated_noise_fixed_between_events():
    fn = make_noise_fn(dict(SHADOWLIKE["observations"], schedule=None))
    x = jnp.zeros((4, 6))
    corr = jax.random.normal(jax.random.key(2), (4, 6))
    a = np.asarray(fn(jax.random.key(3), x, corr, 0))
    b = np.asarray(fn(jax.random.key(4), x, corr, 0))
    # white components differ, correlated component shared: the difference
    # a - b removes corr; a + b retains 2*corr*var_corr
    assert not np.allclose(a, b)
    got_corr = (a + b) / 2
    expect = np.asarray(corr) * 0.001
    assert np.allclose(got_corr, expect, atol=3 * 0.002)


def test_dr_end_to_end_env():
    cfg = {"task": {"randomize": True, "randomization_params": SHADOWLIKE}}
    env = tgx.make("Cartpole", num_envs=8, seed=0, cfg=cfg)
    state = env.reset(jax.random.key(0))
    # per-env masses differ (setup DR applied)
    m = np.asarray(state.params.body_mass)
    assert np.unique(m[:, -1]).size > 1
    # correlated-noise state allocated
    assert "obs" in state.dr_corr and "act" in state.dr_corr
    for _ in range(3):
        state = env.step(state, jnp.zeros((8, 1)))
    assert np.isfinite(np.asarray(state.obs)).all()


def test_yaml_dr_block_roundtrip():
    """A reference-shaped YAML string parses and drives the engine."""
    txt = """
task:
  randomize: true
  randomization_params:
    frequency: 600
    actor_params:
      cartpole:
        rigid_body_properties:
          mass: {range: [0.8, 1.2], operation: scaling, distribution: uniform}
"""
    cfg = yaml.safe_load(txt)
    env = tgx.make("Cartpole", num_envs=4, seed=1, cfg=cfg)
    state = env.reset(jax.random.key(1))
    m = np.asarray(state.params.body_mass)
    assert np.unique(m[:, -1]).size > 1


def test_tendon_mask_per_actor():
    """Per-actor tendon masks select only the named actor's tendons (the r3
    mask had `else 1.0` on both branches — a no-op that never masked)."""
    import dataclasses

    from thormang_isaacgym_tpu.engine.dr import _actor_masks

    m = Cartpole(num_envs=1).model
    m = dataclasses.replace(
        m,
        body_names=tuple("a/" + n for n in m.body_names),
        joint_names=tuple("a/" + n for n in m.joint_names),
        tendons=(((1.0,) * m.nj, -0.1, 0.1, "a/t0"),
                 ((1.0,) * m.nj, -0.1, 0.1, "b/t1")),
    )
    masks = _actor_masks(m, "a")
    assert masks["tendon"] is not None
    np.testing.assert_array_equal(masks["tendon"], [1.0, 0.0])


def test_correlated_dr_noise_cross_process_deterministic():
    """The correlated-noise PRNG stream must not depend on Python's
    process-salted hash() (engine/env.py r3 used `hash(name)`), so replays
    with correlated DR reproduce across interpreter restarts."""
    import subprocess
    import sys

    snippet = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import thormang_isaacgym_tpu as tgx
dr = {
    "frequency": 10,
    "observations": {"range": [0, 0.002], "range_correlated": [0, 0.001],
                     "operation": "additive", "distribution": "gaussian"},
    "actions": {"range": [0.0, 0.05], "range_correlated": [0, 0.015],
                "operation": "additive", "distribution": "gaussian"},
}
cfg = {"task": {"randomize": True, "randomization_params": dr}}
env = tgx.make("Cartpole", num_envs=4, seed=0, cfg=cfg)
state = env.reset(jax.random.key(0))
print("CORRSUM", float(np.asarray(state.dr_corr["obs"]).sum()),
      float(np.asarray(state.dr_corr["act"]).sum()))
"""
    outs = []
    for seed in ("0", "1"):
        env_vars = dict(os.environ, PYTHONHASHSEED=seed)
        r = subprocess.run([sys.executable, "-c", snippet], env=env_vars,
                           capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, r.stderr[-2000:]
        line = [l for l in r.stdout.splitlines() if l.startswith("CORRSUM")]
        assert line, r.stdout
        outs.append(line[0])
    assert outs[0] == outs[1], f"hash-salted corr stream: {outs}"
