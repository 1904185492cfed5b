"""Multi-agent framework + MA_OP3 tests. Reference:
tasks/base/multi_vec_task.py:102-125 (per-agent buffer shapes),
tasks/MA_OP3.py (two OP3s + table), completed per the task docstring.

The 47-body two-robot scene's stepped-physics compile takes tens of
minutes on the 2-vCPU CI box, so the rollout/training tests are gated
behind THORMANG_SLOW_TESTS=1 (same policy as the hand rollouts before the
compile cache); reset-path and structural checks always run."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thormang_isaacgym_tpu.tasks import make

SLOW = os.environ.get("THORMANG_SLOW_TESTS") != "1"


@pytest.fixture(scope="module")
def env():
    return make("MA_OP3", num_envs=4, seed=0)


@pytest.fixture(scope="module")
def state0(env):
    return env.reset(jax.random.key(0))


def test_op3_model_spec():
    from thormang_isaacgym_tpu.models.op3 import (
        OP3_DOF_NAMES, load_op3, load_table,
    )
    m = load_op3()
    assert m.nj == 22
    assert tuple(m.joint_names.index(n) >= 0 for n in OP3_DOF_NAMES)
    t = load_table()
    assert t.nj == 0 and t.ng == 5


def test_ma_buffer_shapes(env, state0):
    """MA buffer shapes per multi_vec_task.py:110-121: obs (B, A, O),
    rew (B, A), shared per-env reset."""
    assert state0.obs.shape == (4, 2, 88)
    assert state0.reward.shape == (4, 2)
    assert state0.done.shape == (4,)


@pytest.mark.skipif(SLOW, reason="47-body scene step compile; THORMANG_SLOW_TESTS=1")
def test_ma_op3_rollout(env, state0):
    st = state0
    key = jax.random.key(1)
    for _ in range(8):
        key, k = jax.random.split(key)
        a = 0.1 * jax.random.normal(k, (4, 2, 22))
        st = env.step(st, a)
    assert np.all(np.isfinite(np.asarray(st.obs)))
    assert np.all(np.isfinite(np.asarray(st.reward)))
    # rewards are clipped non-negative (MA_OP3.py:651-652)
    assert np.all(np.asarray(st.reward) >= 0.0)
    # the table hasn't fallen through the floor
    table_z = np.asarray(st.q[:, 16])
    assert np.all(table_z > 0.1)


def test_ma_agents_mirror(env, state0):
    """With symmetric defaults the two agents observe the same
    magnitudes at reset (poses mirror across the table)."""
    obs = np.asarray(state0.obs)
    # dof_pos_scaled block (9:31) is zero at default targets
    np.testing.assert_allclose(obs[:, :, 9:31], 0.0, atol=1e-4)


@pytest.mark.skipif(SLOW, reason="47-body scene train compile; THORMANG_SLOW_TESTS=1")
def test_mappo_trains(env):
    from thormang_isaacgym_tpu.learn.ma import MAPPO
    from thormang_isaacgym_tpu.learn.ppo import PPOConfig
    cfg = PPOConfig(horizon_length=4, minibatch_size=16, mini_epochs=2,
                    units=(32, 32), normalize_input=True,
                    normalize_value=True, mixed_precision=False,
                    learning_rate=1e-4, lr_schedule="constant")
    algo = MAPPO(env, cfg)
    ts, env_state, hist = algo.train(2, seed=0, log_every=1)
    assert np.isfinite(hist[-1]["reward_mean"])
    assert np.isfinite(hist[-1]["kl"])
