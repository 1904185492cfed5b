"""Trifinger tests. Reference: tasks/trifinger.py (dimension spec :58-85,
MDP spaces :327-351, reward :1294-1385, sampling :1427-1513)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thormang_isaacgym_tpu.tasks import make
from thormang_isaacgym_tpu.tasks.trifinger import (
    gen_keypoints, lgsk_kernel, quat_diff_rad,
)


@pytest.fixture(scope="module")
def env():
    return make("Trifinger", num_envs=4, seed=0)


@pytest.fixture(scope="module")
def state0(env):
    return env.reset(jax.random.key(0))


def test_dims_match_spec(env, state0):
    """obs 41 / states 113 / act 9 (trifinger.py:327-351 obs_spec +
    state_spec with asymmetric_obs)."""
    assert env.num_obs == 41
    assert env.task.num_states == 113
    assert env.num_actions == 9
    assert state0.obs.shape == (4, 41)
    assert state0.states.shape == (4, 113)


def test_lgsk_kernel_bounds():
    x = jnp.linspace(0.0, 1.0, 50)
    y = lgsk_kernel(x, scale=30.0, eps=2.0)
    assert float(y[0]) == pytest.approx(1.0 / 4.0, abs=1e-5)
    assert float(y[-1]) < 1e-4
    assert np.all(np.diff(np.asarray(y)) <= 0)


def test_gen_keypoints():
    pos = jnp.array([[0.1, 0.2, 0.3]])
    quat = jnp.array([[1.0, 0, 0, 0]])
    kp = gen_keypoints(pos, quat, size=0.065)
    assert kp.shape == (1, 8, 3)
    # corners at +-size/2 around the center
    np.testing.assert_allclose(np.asarray(kp).mean(1)[0],
                               [0.1, 0.2, 0.3], atol=1e-6)
    assert np.allclose(np.abs(np.asarray(kp)[0] - [0.1, 0.2, 0.3]), 0.0325,
                       atol=1e-6)


def test_object_and_goal_in_arena(env, state0):
    from thormang_isaacgym_tpu.models.trifinger import ARENA_RADIUS
    obj_xy = np.asarray(state0.q[:, 0:2])
    assert np.all(np.linalg.norm(obj_xy, axis=-1) < ARENA_RADIUS)
    goal = np.asarray(state0.task.goal_pos)
    assert np.all(np.linalg.norm(goal[:, :2], axis=-1) < ARENA_RADIUS)
    assert np.all(goal[:, 2] >= 0.065 / 2 - 1e-6)
    assert np.all(goal[:, 2] <= 0.1 + 1e-6)


def test_rollout_physics(env, state0):
    """Random torques: cube stays on/above the floor, obs finite, cube
    does not leave the arena plate in a few steps."""
    st = state0
    key = jax.random.key(1)
    for _ in range(10):
        key, k = jax.random.split(key)
        a = jax.random.uniform(k, (4, 9), minval=-1, maxval=1)
        st = env.step(st, a)
    assert np.all(np.isfinite(np.asarray(st.obs)))
    assert np.all(np.isfinite(np.asarray(st.states)))
    cube_z = np.asarray(st.q[:, 2])
    assert np.all(cube_z > 0.0), cube_z
    assert np.all(np.isfinite(np.asarray(st.reward)))


def test_quat_diff_rad():
    a = jnp.array([[1.0, 0, 0, 0]])
    b = jnp.array([[np.cos(0.25), np.sin(0.25), 0, 0]])  # 0.5 rad about x
    assert float(quat_diff_rad(a, b)[0]) == pytest.approx(0.5, abs=1e-5)
