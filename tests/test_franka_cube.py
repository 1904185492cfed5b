"""FrankaCubeStack: OSC task-space control (mass-matrix/jacobian path) and
box-grasp physics, validated separately:
- reach: closed-loop OSC brings the grasp frame onto cubeA
- grasp+lift: with the cube placed between the fingers, closing and raising
  the gripper must carry the cube (penalty contact + Coulomb friction)
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from thormang_isaacgym_tpu.core import quat as Q
from thormang_isaacgym_tpu.engine.env import VecEnv
from thormang_isaacgym_tpu.tasks.franka_cube_stack import (
    CUBE_A, TABLE_Z, FrankaCubeStack,
)

DOWN, YDIR = np.array([0.0, 0, -1.0]), np.array([0.0, 1.0, 0])


def _step_osc(env, state, target, grip, kp=4.0, yaw_gain=1.0):
    gp, gq, _ = jax.vmap(env.task._eef)(state.q, state.qd)
    gp = np.asarray(gp)
    cz = np.asarray(jax.vmap(lambda q: Q.rotate(q, jnp.array([0.0, 0, 1.0])))(gq))
    cy = np.asarray(jax.vmap(lambda q: Q.rotate(q, jnp.array([0.0, 1.0, 0])))(gq))
    B = gp.shape[0]
    a = np.zeros((B, 7), np.float32)
    a[:, :3] = np.clip(kp * (target - gp), -1, 1)
    a[:, 3:6] = np.clip(
        2.0 * (np.cross(cz, DOWN) + yaw_gain * np.cross(cy, YDIR)), -1, 1)
    a[:, -1] = grip
    return env.step(state, jnp.asarray(a)), gp


def test_osc_reach():
    """Closed-loop OSC: rise, hover above cubeA, guarded descent to it."""
    task = FrankaCubeStack(num_envs=2, control_type="osc")
    # the scripted reach takes ~500 control steps; keep the episode alive
    # (at the task's reference length of 300 the env auto-resets mid-test
    # and the descent chases a freshly respawned cube)
    task.max_episode_length = 10_000
    env = VecEnv(task, ground_height_fn=task.ground_height_fn())
    state = env.reset(jax.random.key(4))
    gp0, _, _ = jax.vmap(task._eef)(state.q, state.qd)
    up = np.asarray(gp0) + np.array([0, 0, 0.25], np.float32)
    for _ in range(60):
        state, _ = _step_osc(env, state, up, +1.0)
    for _ in range(150):
        target = np.asarray(state.q[:, :3]) + np.array([0, 0, 0.20], np.float32)
        state, _ = _step_osc(env, state, target, +1.0)
    # guarded descent with an xy INTEGRATOR: plain OSC carries a ~12 mm
    # steady-state xy error (null-space posture pull) — bigger than the
    # 3 mm pad clearance, so an uncorrected descent lands a pad on the
    # cube's top edge and stirs it away
    zoff = 0.20
    integ = np.zeros((2, 2), np.float32)
    for _ in range(400):
        posA = np.asarray(state.q[:, :3])
        gp, _, _ = jax.vmap(task._eef)(state.q, state.qd)
        xy_err_vec = posA[:, :2] - np.asarray(gp)[:, :2]
        xy_err = np.linalg.norm(xy_err_vec, axis=1)
        integ = np.clip(integ + 0.3 * xy_err_vec, -0.05, 0.05)
        if np.all(xy_err < 0.004):
            zoff = max(0.005, zoff - 0.004)
        target = posA + np.array([0, 0, zoff], np.float32)
        target[:, :2] += integ
        state, _ = _step_osc(env, state, target, +1.0)
        if zoff <= 0.005 and np.all(np.asarray(state.metrics["grasp_dist"]) < 0.03):
            break
    gd = np.asarray(state.metrics["grasp_dist"])
    assert gd.max() < 0.05, f"OSC reach failed: {gd}"


def test_grasp_lift_physics():
    """Cube placed between the fingers; close + raise must carry it."""
    task = FrankaCubeStack(num_envs=2, control_type="osc")
    task.max_episode_length = 10_000
    env = VecEnv(task, ground_height_fn=task.ground_height_fn())
    state = env.reset(jax.random.key(4))
    # level the gripper first: the reset's arm-pose noise leaves the grip
    # tilted 13-16 deg; teleporting an axis-aligned cube into a tilted grip
    # starts with mm-deep PAD-EDGE penetration whose transient ejects the
    # cube (in the real task flow the OSC aligns before the grasp)
    gp0, _, _ = jax.vmap(task._eef)(state.q, state.qd)
    for _ in range(60):
        state, _ = _step_osc(env, state, np.asarray(gp0), +1.0)
    # teleport cubeA into the gripper (between the finger pads), with the
    # cube yawed to the grip frame: the scripted cross-product yaw control
    # leaves the grip yaw arbitrary, and a cube's yaw is arbitrary too —
    # face-parallel pads are the documented 0.2 mm-interference setup
    gp, gq, _ = jax.vmap(task._eef)(state.q, state.qd)
    cy = np.asarray(jax.vmap(lambda q: Q.rotate(q, jnp.array([0.0, 1.0, 0])))(gq))
    yaw = np.arctan2(cy[:, 1], cy[:, 0])
    cube_quat = np.stack([np.cos(yaw / 2), np.zeros(2), np.zeros(2),
                          np.sin(yaw / 2)], axis=1).astype(np.float32)
    # cube sits LOW in the grip: its top must stay below the mid-finger
    # spheres (23 mm above the tips), or they press it out downward
    cube_pos = np.asarray(gp) + np.array([0, 0, -0.013], np.float32)
    q = np.asarray(state.q).copy()
    q[:, 0:3] = cube_pos
    q[:, 3:7] = cube_quat
    # fingers pre-positioned at light touch (0.2 mm interference: cube half
    # 25 mm + pad r 12 mm - 0.2 mm). The implicit-normal contact is stiff
    # (kn 1e5): a deep pre-squeeze would start with a ~200 N transient that
    # kicks the fingers open before the 10 N drive equilibrium (~0.1 mm
    # interference) is reached, and the cube slips the brief gap.
    fr = np.array(task.fr_ids)
    nf7 = 7 * task.model.n_floating
    q[:, nf7 + fr[7]] = 0.0368
    q[:, nf7 + fr[8]] = 0.0368
    state = dataclasses.replace(state, q=jnp.asarray(q),
                                qd=jnp.zeros_like(state.qd))
    hold = cube_pos + np.array([0, 0, 0.013])
    # close the grip; yaw control off — the cube is already yaw-matched,
    # and re-aligning the grip toward world-y would drag the held cube
    # through a 130-deg turn for the rest of the test
    for _ in range(80):
        state, _ = _step_osc(env, state, hold, -1.0, yaw_gain=0.0)
    fq = np.asarray(state.q)[:, nf7:][:, fr[7:]]
    assert np.all(fq > 0.004), f"fingers closed through the cube: {fq}"
    # lift; the cube must ride with the gripper (constant rel-z)
    z0 = np.asarray(state.q[:, 2]).copy()
    target = hold + np.array([0, 0, 0.15], np.float32)
    for _ in range(150):
        state, _ = _step_osc(env, state, target, -1.0, kp=2.0, yaw_gain=0.0)
    hA = np.asarray(state.metrics["cubeA_height"])
    assert np.all(hA - CUBE_A > 0.04), f"cubeA not lifted: {hA}"
    assert np.all(np.asarray(state.q[:, 2]) > z0 + 0.04), "cube did not ride with the gripper"
    assert float(np.asarray(state.reward).min()) >= task.r_lift_scale * 0.9


def test_joint_torque_variant_runs():
    task = FrankaCubeStack(num_envs=2, control_type="joint_tor")
    env = VecEnv(task, ground_height_fn=task.ground_height_fn())
    state = env.reset(jax.random.key(0))
    assert state.obs.shape == (2, 26)
    key = jax.random.key(1)
    for i in range(20):
        key, k = jax.random.split(key)
        a = jax.random.uniform(k, (2, 8), minval=-1, maxval=1)
        state = env.step(state, a)
    assert not bool(jnp.isnan(state.obs).any())
