"""Forward kinematics: generalized state -> world body poses & velocities.

Replaces the reference's rigid-body state tensor
(`acquire_rigid_body_state_tensor`, e.g.
`/root/reference/isaacgymenvs/tasks/gogoro/gogoro.py:105-126`): instead of
refreshing a C++ buffer, body states are a pure function of (q, qd) computed
inside the same XLA program as dynamics/contact — "refresh" is a no-op.

Level-scheduled: all bodies at the same tree depth update in one vectorized
op (see ops/levels.py), so the op count scales with tree *depth* (~10 for
the scooter), not body count (40).

Written for a single env; the caller vmaps over the env axis.

State layout (floating base):
  q  = [pos_w (3), quat_wxyz (4), joint_q (nj)]         (nq = 7 + nj)
  qd = [omega_body (3), v_world (3), joint_qd (nj)]     (nv = 6 + nj)
MuJoCo free-joint convention: root angular velocity in the BODY frame
(isotropic-stable Euler equations), root linear velocity in the WORLD frame
(free fall integrates exactly; a body-frame linear velocity would couple to
spin as v' = -w x v, which explicit integration amplifies). This also
matches IsaacGym's world-frame root linear velocity
(root_states[:, 7:10]).
Fixed base: q = joint_q, qd = joint_qd.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from thormang_isaacgym_tpu.core import quat as Q
from thormang_isaacgym_tpu.models.robot import PRISMATIC, REVOLUTE, RobotModel
from thormang_isaacgym_tpu.ops.levels import body_levels, level_structure, static_arrays


class BodyFrames(NamedTuple):
    """World-frame pose and velocity of every movable body (single env)."""
    pos: jnp.ndarray    # (nb, 3) body-frame origin in world
    quat: jnp.ndarray   # (nb, 4) wxyz body->world
    omega: jnp.ndarray  # (nb, 3) angular velocity, world frame
    vel: jnp.ndarray    # (nb, 3) linear velocity of body origin, world frame


def split_q(model: RobotModel, q: jnp.ndarray):
    """Returns (root_pos (nr,3), root_quat (nr,4), joint_q (nj,)).

    Floating roots read consecutive 7-blocks from the head of q (in body
    order); fixed roots use the model's static base pose.
    """
    nr = model.n_roots
    flags = model.roots_floating
    nf = model.n_floating
    root_block = q[: 7 * nf].reshape(nf, 7) if nf else jnp.zeros((0, 7))
    joint_q = q[7 * nf:]
    if nr == 1 and flags[0]:
        return root_block[:, 0:3], root_block[:, 3:7], joint_q
    base = np.array(model.root_base_pose if model.root_base_pose is not None
                    else [(0, 0, 0, 1, 0, 0, 0)] * nr, np.float32)
    pos_rows, quat_rows = [], []
    fi = 0
    for r in range(nr):
        if flags[r]:
            pos_rows.append(root_block[fi, 0:3])
            quat_rows.append(root_block[fi, 3:7])
            fi += 1
        else:
            pos_rows.append(jnp.asarray(base[r, 0:3]))
            quat_rows.append(jnp.asarray(base[r, 3:7]))
    return jnp.stack(pos_rows), jnp.stack(quat_rows), joint_q


def split_qd(model: RobotModel, qd: jnp.ndarray):
    """Returns (root_omega_body (nr,3), root_v_world (nr,3), joint_qd) —
    fixed roots are 0."""
    nr = model.n_roots
    flags = model.roots_floating
    nf = model.n_floating
    root_block = qd[: 6 * nf].reshape(nf, 6) if nf else jnp.zeros((0, 6))
    joint_qd = qd[6 * nf:]
    if nr == 1 and flags[0]:
        return root_block[:, 0:3], root_block[:, 3:6], joint_qd
    om_rows, v_rows = [], []
    fi = 0
    for r in range(nr):
        if flags[r]:
            om_rows.append(root_block[fi, 0:3])
            v_rows.append(root_block[fi, 3:6])
            fi += 1
        else:
            om_rows.append(jnp.zeros(3))
            v_rows.append(jnp.zeros(3))
    return jnp.stack(om_rows), jnp.stack(v_rows), joint_qd


def joint_local_pose(model: RobotModel, joint_q: jnp.ndarray):
    """Pose of each non-root body in its parent frame: (nj, 3) pos, (nj, 4)
    quat. Fully vectorized over joints."""
    j_pos = jnp.asarray(np.array(model.joint_pos, dtype=np.float32).reshape(-1, 3))
    j_quat = jnp.asarray(np.array(model.joint_quat, dtype=np.float32).reshape(-1, 4))
    _, axis, is_rev, _ = static_arrays(model)
    axis = jnp.asarray(axis)
    is_rev = jnp.asarray(is_rev)

    rot_angle = joint_q * is_rev[:, 0]
    q_rot = Q.from_axis_angle(axis, rot_angle)
    quat_local = Q.mul(j_quat, q_rot)
    trans = axis * (joint_q * (1.0 - is_rev[:, 0]))[:, None]
    pos_local = j_pos + Q.rotate(j_quat, trans)
    return pos_local, quat_local


def forward_kinematics(model: RobotModel, q: jnp.ndarray, qd: jnp.ndarray,
                       local=None) -> BodyFrames:
    """World pose + velocity of all movable bodies. Single env.

    `local` optionally supplies precomputed (pos_local, quat_local) from
    :func:`joint_local_pose` so the sim step shares it with the dynamics.
    """
    root_pos, root_quat, joint_q = split_q(model, q)
    root_omega_b, root_v_w, joint_qd = split_qd(model, qd)

    pos_local, quat_local = local if local is not None else joint_local_pose(model, joint_q)
    struct = level_structure(model)
    _, axis, is_rev, _ = static_arrays(model)
    axis = jnp.asarray(axis)
    is_rev = jnp.asarray(is_rev)

    # banded sweep: per-level chunks, static slices, constant-index parent
    # gathers; one concatenate at the end. No scatters (TPU-hostile).
    nr = model.n_roots
    pos_c = [root_pos]
    quat_c = [root_quat]
    om_c = [Q.rotate(root_quat, root_omega_b)]
    vel_c = [root_v_w]  # root linear velocity is already world-frame
    for lv in struct:
        j = slice(lv["start"] - nr, lv["end"] - nr)
        p = lv["parent_local"]
        pp, pq = pos_c[-1][p], quat_c[-1][p]
        pom, pvl = om_c[-1][p], vel_c[-1][p]
        pw = pp + Q.rotate(pq, pos_local[j])
        qw = Q.mul(pq, quat_local[j])
        # the joint axis is invariant under the joint's own rotation
        axis_w = Q.rotate(qw, axis[j])
        qdj = joint_qd[j][:, None]
        rev = is_rev[j]
        om = pom + axis_w * (qdj * rev)
        vl = pvl + jnp.cross(pom, pw - pp) + axis_w * (qdj * (1.0 - rev))
        pos_c.append(pw)
        quat_c.append(qw)
        om_c.append(om)
        vel_c.append(vl)

    return BodyFrames(
        pos=jnp.concatenate(pos_c), quat=jnp.concatenate(quat_c),
        omega=jnp.concatenate(om_c), vel=jnp.concatenate(vel_c))


def geom_world_poses(model: RobotModel, frames: BodyFrames):
    """World pose of every collision geom: (ng,3) pos, (ng,4) quat, plus
    per-geom world velocity of the geom origin."""
    gbody = np.array([g.body for g in model.geoms])
    gpos = jnp.asarray(np.array([g.pos for g in model.geoms], dtype=np.float32).reshape(-1, 3))
    gquat = jnp.asarray(np.array([g.quat for g in model.geoms], dtype=np.float32).reshape(-1, 4))
    bpos = frames.pos[gbody]
    bquat = frames.quat[gbody]
    pos_w = bpos + Q.rotate(bquat, gpos)
    quat_w = Q.mul(bquat, gquat)
    omega_w = frames.omega[gbody]
    vel_w = frames.vel[gbody] + jnp.cross(omega_w, pos_w - bpos)
    return pos_w, quat_w, omega_w, vel_w
