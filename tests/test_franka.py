"""FrankaCabinet end-to-end: a scripted resolved-rate (jacobian) controller
must physically open the drawer through finger<->handle contact (the
mechanism PhysX provides in the reference, `franka_cabinet.py` — here
penalty contact + Coulomb friction). Also exercises ops.inertia jacobians
as a task-space controller would use them.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thormang_isaacgym_tpu.core import quat as Q
from thormang_isaacgym_tpu.engine.env import VecEnv
from thormang_isaacgym_tpu.ops import inertia as di
from thormang_isaacgym_tpu.ops.kinematics import forward_kinematics
from thormang_isaacgym_tpu.tasks.franka_cabinet import FrankaCabinet

HANDLE = np.array([0.31, 0.0, 0.63])   # drawer bar axis center, world


def _servo(env, state, target_pos, steps, fingers, gain=0.3):
    """Closed-loop resolved-rate control: each step, measure the grasp frame
    in the SIMULATED state, step the dof position targets along the DLS
    jacobian direction toward `target_pos` (hand z -> -x, hand y -> +z)."""
    task = env.task
    model = task.model
    fr = np.array(task.fr_ids)
    arm = fr[:7]
    scale = np.asarray(task.speed_scales) * task.dt * task.action_scale
    off = jnp.asarray(np.array(task.grasp_pos_l, np.float32))
    gql = jnp.asarray(np.array(task.grasp_quat_l, np.float32))
    want_z = np.array([-1.0, 0, 0])
    want_y = np.array([0.0, 0, 1.0])

    for it in range(steps // 2):
        B = state.q.shape[0]
        qs = np.asarray(state.q)
        a = np.zeros((B, 9), np.float32)
        cur_t = np.asarray(state.task.dof_targets)
        for e in range(B):
            qj = jnp.asarray(qs[e])
            frames = forward_kinematics(model, qj, jnp.zeros(model.nv))
            gq = Q.mul(frames.quat[task.grasp_body], gql)
            gp = frames.pos[task.grasp_body] + Q.rotate(
                frames.quat[task.grasp_body], off)
            cur_z = np.asarray(Q.rotate(gq, jnp.array([0.0, 0, 1.0])))
            cur_y = np.asarray(Q.rotate(gq, jnp.array([0.0, 1.0, 0])))
            err = np.concatenate([
                0.5 * (np.cross(cur_z, want_z) + np.cross(cur_y, want_y)),
                target_pos - np.asarray(gp)])
            J = np.asarray(di.point_jacobian(model, qj, task.grasp_body,
                                             tuple(np.asarray(off))))
            Ja = J[:, arm]
            dq = Ja.T @ np.linalg.solve(Ja @ Ja.T + 0.01 * np.eye(6), err)
            n = np.linalg.norm(dq)
            if n > 0.3:
                dq *= 0.3 / n
            # integral action: advance the dof TARGETS along the jacobian
            # direction; equilibrium requires err == 0 (cancels PD droop)
            a[e, :7] = gain * dq / scale[:7]
            a[e, 7:] = (fingers - cur_t[e, 7:]) / scale[7:]
        act = jnp.asarray(np.clip(a, -1, 1))
        state = env.step(state, act)      # apply each servo command twice:
        state = env.step(state, act)      # halves the host-side FK cost
    return state


@pytest.fixture(scope="module")
def env():
    task = FrankaCabinet(num_envs=2)
    return VecEnv(task)


def test_scripted_grasp_opens_drawer(env):
    task = env.task
    state = env.reset(jax.random.key(3))
    # 1. pre-grasp in front of the bar, fingers open
    state = _servo(env, state, HANDLE + np.array([0.10, 0, 0.005]), 120, 0.04)
    # 2. move in: bar between the fingertips
    state = _servo(env, state, HANDLE + np.array([-0.005, 0, 0.005]), 200, 0.04)
    # 3. close the grip on the bar
    state = _servo(env, state, HANDLE + np.array([-0.005, 0, 0.005]), 60, 0.0)
    # 4. pull outward along +x in small increments, tracking the widest
    #    opening achieved (the scripted policy may eventually lose its point
    #    -contact grip; the assertion is that grasp-pull PHYSICALLY opens
    #    the drawer, which is what the RL reward needs)
    best = np.zeros(2)
    best_rew = np.full(2, -np.inf)
    for dx in np.arange(0.02, 0.3, 0.02):
        state = _servo(env, state, HANDLE + np.array([-0.005 + dx, 0, 0.005]),
                       24, 0.0)
        best = np.maximum(best, np.asarray(state.q)[:, task.drawer_dof])
        best_rew = np.maximum(best_rew, np.asarray(state.reward))
    assert np.all(best > 0.03), f"drawer did not open by grasp-pull: {best}"
    # opening the drawer is rewarded (open_reward_scale 7.5)
    assert best_rew.min() > 0.5


def test_env_basics(env):
    state = env.reset(jax.random.key(0))
    assert state.obs.shape == (2, 23)
    key = jax.random.key(1)
    for i in range(30):
        key, k = jax.random.split(key)
        a = jax.random.uniform(k, (2, 9), minval=-1, maxval=1)
        state = env.step(state, a)
    assert not bool(jnp.isnan(state.obs).any())
    assert not bool(jnp.isnan(state.q).any())
