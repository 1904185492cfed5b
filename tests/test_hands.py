"""ShadowHand / AllegroHand: model invariants + (gated) rollout smoke.

The full env rollout compiles the 26-body hand+object scene through the
XLA pair-contact path — minutes on the 2-vCPU CI box — so stepping tests
are gated behind THORMANG_SLOW_TESTS=1; the cheap structural checks always
run. The TPU-side verify drives the full task (see .claude/skills/verify).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

SLOW = os.environ.get("THORMANG_SLOW_TESTS") != "1"


def test_shadow_hand_model():
    from thormang_isaacgym_tpu.models.shadow_hand import (
        ACTUATED_DOF_NAMES, FINGERTIP_BODIES, load_shadow_hand)
    m = load_shadow_hand()
    assert m.nj == 24                      # 24 DOFs (shadow_hand.py spec)
    assert len(ACTUATED_DOF_NAMES) == 20   # 20 actuators
    assert len(m.tendons) == 4             # four J0-J1 couplings
    for b in FINGERTIP_BODIES:
        m.body_id(b)
    d = m._defaults
    assert (np.asarray(d["tendon_stiffness"]) == 30.0).all()
    # tendon coefs: +1 on J0, -1 on J1
    for (coef, lo, hi, name) in m.tendons:
        c = np.asarray(coef)
        assert (c != 0).sum() == 2 and c.sum() == 0.0


def test_allegro_hand_model():
    from thormang_isaacgym_tpu.models.allegro_hand import load_allegro_hand
    m = load_allegro_hand()
    assert m.nj == 16
    assert len(m.tendons) == 0


def test_task_obs_dims():
    """Task dim table parity (shadow_hand.py:110-130, allegro_hand.py:107-111)
    without building envs."""
    from thormang_isaacgym_tpu.tasks.shadow_hand import NUM_OBS
    from thormang_isaacgym_tpu.tasks.allegro_hand import ALLEGRO_NUM_OBS
    assert NUM_OBS == {"openai": 42, "full_no_vel": 77, "full": 157,
                       "full_state": 211}
    assert ALLEGRO_NUM_OBS == {"full_no_vel": 50, "full": 72, "full_state": 88}


def test_shadow_hand_rollout():
    """Default-CI hand rollout (trimmed): asymmetric obs/states dims, finite
    rollout, nonzero fingertip force-torque sensor plumbing. Compile cost is
    amortized by the persistent cache (conftest.py)."""
    import thormang_isaacgym_tpu as tgx
    env = tgx.make("ShadowHand", num_envs=2, seed=0, asymmetric_obs=True,
                   obs_type="full")
    state = env.reset(jax.random.key(0))
    assert state.obs.shape == (2, 157)
    assert state.states.shape == (2, 211)
    for i in range(5):
        a = jax.random.uniform(jax.random.key(i), (2, 20), minval=-1, maxval=1)
        state = env.step(state, a)
    assert bool(jnp.isfinite(state.obs).all())
    assert bool(jnp.isfinite(state.states).all())


@pytest.mark.skipif(SLOW, reason="hand scene compile; THORMANG_SLOW_TESTS=1")
def test_allegro_hand_rollout():
    import thormang_isaacgym_tpu as tgx
    env = tgx.make("AllegroHand", num_envs=2, seed=0)
    state = env.reset(jax.random.key(0))
    assert state.obs.shape == (2, 72)
    for i in range(10):
        a = jax.random.uniform(jax.random.key(i), (2, 16), minval=-1, maxval=1)
        state = env.step(state, a)
    assert bool(jnp.isfinite(state.obs).all())
