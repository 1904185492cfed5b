"""Shared task math — replacement for the reference's (missing)
`isaacgymenvs.utils.torch_jit_utils` (imported at
`/root/reference/isaacgymenvs/tasks/humanoid.py:37`): compute_heading_and_up,
compute_rot, unscale, normalize_angle, plus spawn-height solving.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from thormang_isaacgym_tpu.core import quat as Q
from thormang_isaacgym_tpu.models.robot import (
    GEOM_BOX, GEOM_CAPSULE, GEOM_CYLINDER, GEOM_SPHERE, RobotModel,
)


def compute_heading_and_up(torso_quat, inv_start_quat, to_target, vec0, vec1):
    """Returns (torso_quat_rel, up_proj, heading_proj, up_vec, heading_vec).

    Parity with torch_jit_utils.compute_heading_and_up as used by
    ant.py:387 / humanoid.py:389 (up axis = z).
    """
    tq = Q.mul(torso_quat, inv_start_quat)
    up_vec = Q.rotate(tq, vec1)
    heading_vec = Q.rotate(tq, vec0)
    up_proj = up_vec[..., 2]
    tt = to_target / (jnp.linalg.norm(to_target, axis=-1, keepdims=True) + 1e-8)
    heading_proj = jnp.sum(heading_vec * tt, axis=-1)
    return tq, up_proj, heading_proj, up_vec, heading_vec


def compute_rot(torso_quat, velocity, ang_velocity, targets, torso_pos):
    """(vel_loc, angvel_loc, roll, pitch, yaw, angle_to_target)."""
    vel_loc = Q.rotate_inv(torso_quat, velocity)
    angvel_loc = Q.rotate_inv(torso_quat, ang_velocity)
    roll, pitch, yaw = Q.to_euler_xyz(torso_quat)
    d = targets - torso_pos
    walk_target_angle = jnp.arctan2(d[..., 1], d[..., 0])
    angle_to_target = walk_target_angle - yaw
    return vel_loc, angvel_loc, roll, pitch, yaw, angle_to_target


def unscale(x, lower, upper):
    """Map [lower, upper] -> [-1, 1]."""
    return (2.0 * x - upper - lower) / (upper - lower + 1e-8)


def normalize_angle(x):
    return Q.wrap_to_pi(x)


def initial_dof_pos(lower: np.ndarray, upper: np.ndarray) -> np.ndarray:
    """Reference rule (ant.py:97-99): clamp 0 into the limit interval."""
    pos = np.zeros_like(lower)
    pos = np.where(lower > 0, lower, pos)
    pos = np.where(upper < 0, upper, pos)
    return pos.astype(np.float32)


def solve_spawn_height(model: RobotModel, joint_q: np.ndarray,
                       clearance: float = 0.01) -> float:
    """Root z so the lowest collision-geom point touches the ground at the
    given joint pose (host-side, compile time)."""
    from thormang_isaacgym_tpu.ops.kinematics import forward_kinematics

    nq = model.nq
    q = np.zeros(nq, np.float32)
    if model.floating:
        q[3] = 1.0
        q[7:] = joint_q
    else:
        q[:] = joint_q
    frames = forward_kinematics(model, jnp.asarray(q), jnp.zeros(model.nv))
    pos = np.asarray(frames.pos)
    quat = np.asarray(frames.quat)
    zmin = 0.0
    for g in model.geoms:
        bp, bq = pos[g.body], quat[g.body]
        gp = bp + np.asarray(Q.rotate(jnp.asarray(bq), jnp.asarray(np.array(g.pos, np.float32))))
        gq = np.asarray(Q.mul(jnp.asarray(bq), jnp.asarray(np.array(g.quat, np.float32))))
        if g.gtype == GEOM_SPHERE:
            z = gp[2] - g.size[0]
        elif g.gtype == GEOM_CAPSULE:
            axis = np.asarray(Q.rotate(jnp.asarray(gq), jnp.array([0.0, 0, 1.0])))
            z = min(gp[2] + s * g.size[1] * axis[2] for s in (-1, 1)) - g.size[0]
        elif g.gtype == GEOM_CYLINDER:
            axis = np.asarray(Q.rotate(jnp.asarray(gq), jnp.array([0.0, 0, 1.0])))
            drop = g.size[0] * np.sqrt(max(1e-9, 1 - axis[2] ** 2))
            z = min(gp[2] + s * g.size[1] * axis[2] for s in (-1, 1)) - drop
        else:  # box: corners
            R = np.asarray(Q.to_matrix(jnp.asarray(gq)))
            hx, hy, hz = g.size
            z = min((gp + R @ np.array([sx * hx, sy * hy, sz * hz]))[2]
                    for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1))
        zmin = min(zmin, float(z))
    return -zmin + clearance
