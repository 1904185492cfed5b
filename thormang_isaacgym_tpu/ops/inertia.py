"""Jacobians, joint-space mass matrix, and inverse dynamics (RNEA).

TPU-native replacement for the reference's jacobian / mass-matrix Tensor API:
`acquire_jacobian_tensor` + `acquire_mass_matrix_tensor` (spec: usage at
`/root/reference/isaacgymenvs/tasks/franka_cube_stack.py:390-396`,
`/root/reference/isaacgymenvs/tasks/factory/factory_base.py:163-260`,
`/root/reference/isaacgymenvs/tasks/gogoro/gogoro.py:108-114`). Instead of a
C++ buffer refreshed per step, everything here is a pure function of (q,) or
(q, qd) and fuses into the caller's XLA program.

Conventions (single env; callers vmap over the env axis):
- Jacobians are WORLD-frame, angular part first, about the body-frame origin
  (which for this model is the child-joint anchor — IsaacGym convention).
- Generalized-velocity columns: [per floating root (body order):
  (omega_world 3, v_world 3)] then the nj 1-DOF joints. NOTE the root
  angular columns are world-frame here (the dynamics state carries the root
  omega in the BODY frame; rotate with the root quat to convert). For
  fixed-base robots (Franka/factory) the layouts coincide (joints only).
- The mass matrix is H = sum_b J_b^T I_b J_b in those coordinates; its
  joint-joint block is exactly the joint-space inertia used by OSC /
  task-space impedance control.
"""
from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from thormang_isaacgym_tpu.core import quat as Q
from thormang_isaacgym_tpu.core import spatial as sp
from thormang_isaacgym_tpu.models.robot import ModelParams, RobotModel
from thormang_isaacgym_tpu.ops.kinematics import (
    BodyFrames, forward_kinematics, split_q, split_qd,
)
from thormang_isaacgym_tpu.ops.levels import level_structure, static_arrays


@lru_cache(maxsize=64)
def _ancestor_mask(model: RobotModel) -> np.ndarray:
    """(nb, nj) float mask: M[b, j] = 1 iff joint j (child body j+n_roots)
    lies on the path from b's root to b."""
    nb, nr = model.nb, model.n_roots
    parent = np.array(model.parent, np.int32)
    mask = np.zeros((nb, nb - nr), np.float32)
    for b in range(nb):
        a = b
        while a >= nr:
            mask[b, a - nr] = 1.0
            a = parent[a]
    return mask


@lru_cache(maxsize=64)
def _root_mask(model: RobotModel) -> np.ndarray:
    """(nb, n_floating) mask: body b belongs to floating root f."""
    nb = model.nb
    parent = np.array(model.parent, np.int32)
    actors = np.array(model.actors, np.int32)
    flags = model.roots_floating
    float_roots = [r for r in range(model.n_roots) if flags[r]]
    mask = np.zeros((nb, len(float_roots)), np.float32)
    root_of = {}
    for b in range(nb):
        r = b
        while parent[r] >= 0:
            r = parent[r]
        root_of[b] = r
    for fi, r in enumerate(float_roots):
        for b in range(nb):
            if root_of[b] == r:
                mask[b, fi] = 1.0
    return mask


def num_cols(model: RobotModel) -> int:
    return 6 * model.n_floating + model.nj


def body_jacobians(model: RobotModel, q: jnp.ndarray,
                   frames: BodyFrames | None = None) -> jnp.ndarray:
    """World-frame spatial jacobian of every body: (nb, 6, ncols).

    Row layout per body: [omega_w (3); v_w of the body origin (3)].
    Column layout: see module docstring. Fully vectorized via the static
    ancestor mask (no per-joint Python loop in the traced graph beyond the
    FK level sweep).
    """
    if frames is None:
        frames = forward_kinematics(model, q, jnp.zeros(model.nv))
    nr = model.n_roots
    nb, nj = model.nb, model.nj
    _, axis, is_rev, _ = static_arrays(model)
    axis = jnp.asarray(axis)
    is_rev = jnp.asarray(is_rev)           # (nj, 1)

    # joint world axis & anchor (child body origin sits on the joint axis)
    axis_w = Q.rotate(frames.quat[nr:], axis)          # (nj, 3)
    anchor = frames.pos[nr:]                            # (nj, 3)
    amask = jnp.asarray(_ancestor_mask(model))          # (nb, nj)

    # revolute: Jang = axis_w, Jlin = axis_w x (p_b - anchor)
    # prismatic: Jang = 0,      Jlin = axis_w
    r = frames.pos[:, None, :] - anchor[None, :, :]     # (nb, nj, 3)
    lin_rev = jnp.cross(jnp.broadcast_to(axis_w[None], r.shape), r)
    Jlin = jnp.where(is_rev[None] > 0, lin_rev, axis_w[None])
    Jang = jnp.where(is_rev[None] > 0, jnp.broadcast_to(axis_w[None], r.shape), 0.0)
    Jj = jnp.concatenate([Jang, Jlin], axis=-1)         # (nb, nj, 6)
    Jj = Jj * amask[:, :, None]
    Jj = jnp.swapaxes(Jj, 1, 2)                         # (nb, 6, nj)

    nf = model.n_floating
    if nf == 0:
        return Jj
    # floating-root columns: unit world twists about the root origin
    rmask = jnp.asarray(_root_mask(model))              # (nb, nf)
    flags = model.roots_floating
    float_roots = tuple(r_ for r_ in range(model.n_roots) if flags[r_])
    root_pos = frames.pos[jnp.asarray(np.array(float_roots))]   # (nf, 3)
    d = frames.pos[:, None, :] - root_pos[None, :, :]   # (nb, nf, 3)
    eye = jnp.eye(3)
    # angular cols k: ang = e_k, lin = e_k x d ; linear cols k: lin = e_k
    Jr_ang = jnp.concatenate(
        [jnp.broadcast_to(eye[None, None], (nb, nf, 3, 3)),
         -sp.skew(d)[..., :, :]], axis=-2)              # (nb, nf, 6, 3): [e_k; e_k x d]
    # e_k x d = -d x e_k = (-skew(d)) e_k  -> columns of -skew(d)
    Jr_lin = jnp.concatenate(
        [jnp.zeros((nb, nf, 3, 3)),
         jnp.broadcast_to(eye[None, None], (nb, nf, 3, 3))], axis=-2)
    Jr = jnp.concatenate([Jr_ang, Jr_lin], axis=-1)     # (nb, nf, 6, 6)
    Jr = Jr * rmask[:, :, None, None]
    Jr = Jr.reshape(nb, nf, 6, 6).transpose(0, 2, 1, 3).reshape(nb, 6, 6 * nf)
    return jnp.concatenate([Jr, Jj], axis=-1)


def point_jacobian(model: RobotModel, q: jnp.ndarray, body: int,
                   offset=(0.0, 0.0, 0.0),
                   frames: BodyFrames | None = None) -> jnp.ndarray:
    """(6, ncols) world jacobian of a point rigidly attached to `body` at
    `offset` (body frame). Equivalent of slicing the gym jacobian tensor at a
    fingertip/hand link (`franka_cube_stack.py:392`)."""
    if frames is None:
        frames = forward_kinematics(model, q, jnp.zeros(model.nv))
    J = body_jacobians(model, q, frames)[body]
    r = Q.rotate(frames.quat[body], jnp.asarray(offset, jnp.float32))
    # v_point = v_origin + omega x r  ->  Jlin_point = Jlin - skew(r) Jang
    Jang, Jlin = J[:3], J[3:]
    return jnp.concatenate([Jang, Jlin - sp.skew(r) @ Jang], axis=0)


def world_spatial_inertia(model: RobotModel, params: ModelParams,
                          frames: BodyFrames) -> jnp.ndarray:
    """(nb, 6, 6) spatial inertia of each body about its own origin, world
    coordinates."""
    R = Q.to_matrix(frames.quat)                       # (nb, 3, 3)
    com_w = (R @ params.body_com[..., None])[..., 0]
    I_w = R @ params.body_inertia @ jnp.swapaxes(R, -1, -2)
    return sp.inertia_matrix(params.body_mass, com_w, I_w)


def mass_matrix(model: RobotModel, params: ModelParams, q: jnp.ndarray,
                frames: BodyFrames | None = None) -> jnp.ndarray:
    """(ncols, ncols) generalized mass matrix H(q) = sum_b J_b^T I_b J_b,
    plus armature on the joint diagonal.

    The joint-joint block equals PhysX's `acquire_mass_matrix_tensor` output
    for a fixed-base arm (`factory_base.py:228`). Batched einsum — lands on
    the MXU.
    """
    if frames is None:
        frames = forward_kinematics(model, q, jnp.zeros(model.nv))
    J = body_jacobians(model, q, frames)               # (nb, 6, nc)
    I = world_spatial_inertia(model, params, frames)   # (nb, 6, 6)
    H = jnp.einsum("bic,bij,bjd->cd", J, I, J)
    nf6 = 6 * model.n_floating
    arm = jnp.concatenate([jnp.zeros(nf6), params.dof_armature])
    return H + jnp.diag(arm)


def inverse_dynamics(model: RobotModel, params: ModelParams,
                     q: jnp.ndarray, qd: jnp.ndarray,
                     joint_qdd: jnp.ndarray | None = None,
                     root_qdd: jnp.ndarray | None = None,
                     gravity: jnp.ndarray | None = None) -> jnp.ndarray:
    """Recursive Newton-Euler: generalized forces (nj,) that realize the
    given joint accelerations at state (q, qd) under gravity.

    `bias = inverse_dynamics(m, p, q, qd)` is C(q,qd)qd + g(q) — the
    inertial-compensation term of the factory controllers
    (`factory_control.py:73-231` computes the same quantity from M and J).
    `root_qdd` (6,) optionally prescribes the floating root's acceleration
    in the body frame (single-floating-root models); default 0 (root held).

    Level-banded sweeps like the ABA — graph depth scales with tree depth.
    """
    struct = level_structure(model)
    _, _, _, S_np = static_arrays(model)
    S_all = jnp.asarray(S_np)
    nr = model.n_roots
    if gravity is None:
        gravity = params.gravity
    if joint_qdd is None:
        joint_qdd = jnp.zeros(model.nj)

    _, root_quat, joint_q = split_q(model, q)
    root_omega_b, root_v_w, joint_qd = split_qd(model, qd)
    root_v_b = Q.rotate_inv(root_quat, root_v_w)

    from thormang_isaacgym_tpu.ops.kinematics import joint_local_pose
    pos_local, quat_local = joint_local_pose(model, joint_q)
    R_loc = Q.to_matrix(quat_local)

    # outward: velocities and accelerations (gravity via the "root
    # accelerates upward at -g" trick, expressed in each root's link frame)
    v_c = [jnp.concatenate([root_omega_b, root_v_b], axis=-1)]
    g_root = Q.rotate_inv(root_quat, jnp.broadcast_to(gravity, (nr, 3)))
    a0 = jnp.concatenate([jnp.zeros((nr, 3)), -g_root], axis=-1)
    if root_qdd is not None:
        a0 = a0 + jnp.broadcast_to(root_qdd, (nr, 6))
    a_c = [a0]
    qw_c = [root_quat]
    for lv in struct:
        j = slice(lv["start"] - nr, lv["end"] - nr)
        p = lv["parent_local"]
        Sj = S_all[j]
        vj = Sj * joint_qd[j][:, None]
        vi = sp.motion_to_child(R_loc[j], pos_local[j], v_c[-1][p]) + vj
        ai = sp.motion_to_child(R_loc[j], pos_local[j], a_c[-1][p]) \
            + Sj * joint_qdd[j][:, None] + sp.cross_motion(vi, vj)
        v_c.append(vi)
        a_c.append(ai)
        qw_c.append(Q.mul(qw_c[-1][p], quat_local[j]))

    # inward: f_i = I a_i + v x* (I v); tau_i = S^T f_i; accumulate to parent
    mass, com, I_com = params.body_mass, params.body_com, params.body_inertia
    f_c = []
    for k in range(len(struct) + 1):
        lo = 0 if k == 0 else struct[k - 1]["start"]
        hi = nr if k == 0 else struct[k - 1]["end"]
        m_, c_, I_ = mass[lo:hi], com[lo:hi], I_com[lo:hi]
        f = sp.inertia_mul(m_, c_, I_, a_c[k]) \
            + sp.cross_force(v_c[k], sp.inertia_mul(m_, c_, I_, v_c[k]))
        f_c.append(f)
    tau_c = [None] * len(struct)
    for k in range(len(struct) - 1, -1, -1):
        lv = struct[k]
        j = slice(lv["start"] - nr, lv["end"] - nr)
        tau_c[k] = jnp.sum(S_all[j] * f_c[k + 1], axis=-1)
        f_t = sp.force_to_parent(R_loc[j], pos_local[j], f_c[k + 1])
        scat = jnp.asarray(lv["scatter"])
        f_c[k] = f_c[k] + scat @ f_t
    tau = jnp.concatenate(tau_c) if tau_c else jnp.zeros(0)
    return tau + params.dof_armature * joint_qdd


def gravity_compensation(model: RobotModel, params: ModelParams,
                         q: jnp.ndarray) -> jnp.ndarray:
    """g(q): joint torques that cancel gravity (root held)."""
    return inverse_dynamics(model, params, q, jnp.zeros(model.nv))
