"""Factory nut-bolt family tests (tasks/factory.py vs
`/root/reference/isaacgymenvs/tasks/factory/`)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import thormang_isaacgym_tpu as tgx
from thormang_isaacgym_tpu.tasks.factory import (
    BOLT_LEN, NUT_H, TABLE_Z, FactoryTaskNutBoltPick, FactoryTaskNutBoltScrew,
)


def test_pick_constructs_and_rolls():
    env = tgx.make("FactoryTaskNutBoltPick", num_envs=2, seed=0)
    state = env.reset(jax.random.key(0))
    assert state.obs.shape == (2, 20)
    key = jax.random.key(1)
    for _ in range(10):
        key, k = jax.random.split(key)
        a = jax.random.uniform(k, (2, 12), minval=-1, maxval=1)
        state = env.step(state, a)
    assert np.isfinite(np.asarray(state.obs)).all()
    # nut still on the table (not exploded)
    nz = np.asarray(state.q[:, 2])
    assert np.all(nz > TABLE_Z - 0.01) and np.all(nz < TABLE_Z + 0.3), nz
    # keypoint reward is negative distance
    assert np.all(np.asarray(state.reward) <= 0.0)


def test_place_constructs_and_rolls():
    env = tgx.make("FactoryTaskNutBoltPlace", num_envs=2, seed=0)
    state = env.reset(jax.random.key(0))
    assert state.obs.shape == (2, 27)
    for _ in range(5):
        state = env.step(state, jnp.zeros((2, 12)))
    assert np.isfinite(np.asarray(state.obs)).all()


def test_screw_thread_constraint():
    """Spinning the nut must advance it down the thread: the tendon couples
    travel = -pitch/(2 pi) * spin."""
    env = tgx.make("FactoryTaskNutBoltScrew", num_envs=2, seed=0)
    task = env.task
    state = env.reset(jax.random.key(0))
    assert state.obs.shape == (2, 32)
    # drive the spin DOF directly (external actuation through the q state):
    # spin the nut 4 turns and verify the travel follows the pitch
    q = np.asarray(state.q).copy()
    spin = task.spin_dof
    q[:, spin] = 4 * 2 * np.pi
    state = dataclasses.replace(state, q=jnp.asarray(q))
    for _ in range(30):
        state = env.step(state, jnp.zeros((2, 12)))
    travel = np.asarray(state.q[:, task.travel_dof])
    expect = -4 * 2 * np.pi * (0.002 / (2 * np.pi))   # -pitch * turns
    assert np.all(np.abs(travel - expect) < 0.004), (travel, expect)
    assert np.isfinite(np.asarray(state.obs)).all()


def test_pick_keypoint_reward_improves_when_closer():
    """Moving the fingertips toward the nut grasp frame raises the reward."""
    task = FactoryTaskNutBoltPick(num_envs=2)
    env = tgx.make("FactoryTaskNutBoltPick", num_envs=2, seed=0)
    state = env.reset(jax.random.key(2))
    r0 = np.asarray(state.metrics["keypoint_dist"])
    # step with a pos action descending toward the nut
    gp, _, _, _ = jax.vmap(env.task._eef)(state.q, state.qd)
    nut = np.asarray(state.q[:, :3])
    d = nut - np.asarray(gp)
    a = np.zeros((2, 12), np.float32)
    a[:, :3] = np.clip(d / 0.1, -1, 1)
    for _ in range(20):
        state = env.step(state, jnp.asarray(a))
    r1 = np.asarray(state.metrics["keypoint_dist"])
    assert np.all(r1 < r0), (r0, r1)


def test_insertion_constructs_and_rolls():
    """FactoryTaskInsertion (reference reward is a placeholder,
    factory_task_insertion.py:119-125; completed keypoint reward)."""
    env = tgx.make("FactoryTaskInsertion", num_envs=2, seed=0)
    state = env.reset(jax.random.key(0))
    assert state.obs.shape == (2, 32)
    key = jax.random.key(1)
    for _ in range(5):
        key, k = jax.random.split(key)
        a = jax.random.uniform(k, (2, 12), minval=-1, maxval=1)
        state = env.step(state, a)
    assert np.isfinite(np.asarray(state.obs)).all()
    # plug still on/above the table
    assert np.all(np.asarray(state.q[:, 2]) > 0.35)


def test_gears_constructs_and_rolls():
    """FactoryTaskGears (reference reward is a placeholder,
    factory_task_gears.py:119-125; completed keypoint reward)."""
    env = tgx.make("FactoryTaskGears", num_envs=2, seed=0)
    state = env.reset(jax.random.key(0))
    assert state.obs.shape == (2, 32)
    key = jax.random.key(1)
    for _ in range(5):
        key, k = jax.random.split(key)
        a = jax.random.uniform(k, (2, 12), minval=-1, maxval=1)
        state = env.step(state, a)
    assert np.isfinite(np.asarray(state.obs)).all()
    assert np.all(np.asarray(state.q[:, 2]) > 0.35)
