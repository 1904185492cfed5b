"""Articulated-body forward dynamics (Featherstone ABA), single env.

TPU-native replacement for the reference's PhysX articulation solver (the
compute inside `gym.simulate`, spec: solver config at
`/root/reference/isaacgymenvs/cfg/task/Gogoro.yaml:15-31` and the Tensor API
surface in SURVEY.md §2.1 N1/N4). Design notes:

- O(depth) *level-scheduled* three-sweep ABA: all joints at the same tree
  depth are processed in one vectorized op (ops/levels.py), so the XLA graph
  scales with tree depth (~10 for the 40-body scooter), not body count.
  Gathers/scatter-adds use static index arrays.
- gravity enters as an explicit per-body external force (no fictitious base
  acceleration), which keeps the floating-base solve a plain 6x6 linear
  solve: a_root = -IA^{-1} pA.
- locked joints (the engine's first-class version of the reference's
  lower==upper DOF-limit freeze, `gogoro_new.py:257-262`) transmit the full
  articulated inertia by inflating the joint-space inertia D, which zeroes
  the joint acceleration while coupling parent/child rigidly.
- per-env heterogeneous inertia/damping/gains arrive via ModelParams leaves,
  so domain randomization costs nothing extra.

All quantities in link-local coordinates per Featherstone's RBDA; motion
vectors are (omega, v) with the angular part first.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from thormang_isaacgym_tpu.core import quat as Q
from thormang_isaacgym_tpu.core import spatial as sp
from thormang_isaacgym_tpu.models.robot import ModelParams, RobotModel
from thormang_isaacgym_tpu.ops.kinematics import joint_local_pose, split_q, split_qd
from thormang_isaacgym_tpu.ops.levels import body_levels, static_arrays

_LOCK_BIG = 1e12


def aba(
    model: RobotModel,
    params: ModelParams,
    q: jnp.ndarray,
    qd: jnp.ndarray,
    tau: jnp.ndarray,        # (nj,) generalized force on 1-DOF joints
    f_ext: jnp.ndarray,      # (nb, 6) spatial force on each body, *link frame*, about link origin
    gravity: jnp.ndarray,    # (3,) world gravity vector
    precomputed=None,        # optional (pos_local, quat_local, quat_w)
) -> jnp.ndarray:
    """Returns qdd: (nv,) = [root_acc (6, body frame), joint_qdd (nj)]."""
    # The small 3x3/6x6 contractions here are numerically load-bearing
    # (articulated inertia propagation); keep them in full f32 even on MXU.
    with jax.default_matmul_precision("highest"):
        return _aba(model, params, q, qd, tau, f_ext, gravity, precomputed)


def _aba(model, params, q, qd, tau, f_ext, gravity, precomputed=None):
    nb = model.nb
    levels, _ = body_levels(model)
    parent_np, _, _, S_np = static_arrays(model)
    S_all = jnp.asarray(S_np)            # (nj, 6)

    _, root_quat, joint_q = split_q(model, q)
    root_omega_b, root_v_b, joint_qd = split_qd(model, qd)

    if precomputed is not None:
        pos_local, quat_local, quat_w = precomputed
    else:
        pos_local, quat_local = joint_local_pose(model, joint_q)
        quat_w = None
    R_loc = Q.to_matrix(quat_local)      # (nj, 3, 3)

    # ---- pass 1: velocities + bias terms (outward, level-batched) ----
    v = jnp.zeros((nb, 6)).at[0].set(jnp.concatenate([root_omega_b, root_v_b]))
    c_bias = jnp.zeros((nb, 6))
    if quat_w is None:
        qw_arr = jnp.zeros((nb, 4)).at[0].set(root_quat)
    for L in levels:
        j = L - 1
        p = parent_np[L]
        vj = S_all[j] * joint_qd[j][:, None]
        vi = sp.motion_to_child(R_loc[j], pos_local[j], v[p]) + vj
        v = v.at[L].set(vi)
        c_bias = c_bias.at[L].set(sp.cross_motion(vi, vj))
        if quat_w is None:
            qw_arr = qw_arr.at[L].set(Q.mul(qw_arr[p], quat_local[j]))
    if quat_w is None:
        quat_w = qw_arr

    # ---- body spatial inertias + bias forces (fully vectorized) ----
    mass = params.body_mass
    com = params.body_com
    I_com = params.body_inertia
    IA = sp.inertia_matrix(mass, com, I_com)             # (nb, 6, 6)
    Iv = sp.inertia_mul(mass, com, I_com, v)             # (nb, 6)
    g_local = Q.rotate_inv(quat_w, jnp.broadcast_to(gravity, (nb, 3)))
    f_grav = jnp.concatenate(
        [jnp.cross(com, mass[:, None] * g_local), mass[:, None] * g_local], axis=-1)
    pA = sp.cross_force(v, Iv) - f_ext - f_grav          # (nb, 6)

    # ---- pass 2: articulated inertia (inward, level-batched) ----
    U_all = jnp.zeros((nb, 6))
    D_all = jnp.ones(nb)
    u_all = jnp.zeros(nb)
    for L in reversed(levels):
        j = L - 1
        p = parent_np[L]
        Sj = S_all[j]                                     # (L, 6)
        IA_L = IA[L]
        Ui = (IA_L @ Sj[..., None])[..., 0]               # (L, 6)
        Di = jnp.sum(Sj * Ui, axis=-1) + params.dof_armature[j] \
            + params.dof_locked[j] * _LOCK_BIG
        ui = tau[j] - jnp.sum(Sj * pA[L], axis=-1)
        U_all = U_all.at[L].set(Ui)
        D_all = D_all.at[L].set(Di)
        u_all = u_all.at[L].set(ui)
        Ia = IA_L - Ui[:, :, None] * (Ui[:, None, :] / Di[:, None, None])
        pa = pA[L] + (Ia @ c_bias[L][..., None])[..., 0] + Ui * (ui / Di)[:, None]
        IA_c = sp.transform_inertia_to_parent(R_loc[j], pos_local[j], Ia)
        pa_c = sp.force_to_parent(R_loc[j], pos_local[j], pa)
        IA = IA.at[p].add(IA_c)
        pA = pA.at[p].add(pa_c)

    # ---- pass 3: accelerations (outward, level-batched) ----
    if model.floating:
        a_root = -jnp.linalg.solve(IA[0] + 1e-9 * jnp.eye(6), pA[0])
    else:
        a_root = jnp.zeros(6)
    a = jnp.zeros((nb, 6)).at[0].set(a_root)
    qdd_j = jnp.zeros(model.nj)
    for L in levels:
        j = L - 1
        p = parent_np[L]
        a_p = sp.motion_to_child(R_loc[j], pos_local[j], a[p]) + c_bias[L]
        qdd_i = (u_all[L] - jnp.sum(U_all[L] * a_p, axis=-1)) / D_all[L]
        a = a.at[L].set(a_p + S_all[j] * qdd_i[:, None])
        qdd_j = qdd_j.at[j].set(qdd_i)

    # locked joints: hard-zero acceleration (D inflation already makes this ~0)
    qdd_j = qdd_j * (1.0 - params.dof_locked)
    if model.floating:
        return jnp.concatenate([a_root, qdd_j])
    return qdd_j


def joint_reflected_inertia(model: RobotModel, params: ModelParams) -> jnp.ndarray:
    """Lower bound of each joint's reflected inertia: S^T I_child S +
    armature (child body's spatial inertia about its own origin along the
    joint axis). Used to stability-cap penalty torques."""
    _, _, _, S_np = static_arrays(model)
    S = jnp.asarray(S_np)                                   # (nj, 6)
    Ic = sp.inertia_matrix(params.body_mass[1:], params.body_com[1:],
                           params.body_inertia[1:])          # (nj, 6, 6)
    return jnp.sum(S * (Ic @ S[..., None])[..., 0], axis=-1) + params.dof_armature


def passive_torques(params: ModelParams, joint_q: jnp.ndarray, joint_qd: jnp.ndarray,
                    limit_stiffness: float = 2000.0, limit_damping: float = 50.0,
                    friction_vel_scale: float = 0.05,
                    dt: float | None = None,
                    joint_inertia: jnp.ndarray | None = None) -> jnp.ndarray:
    """Passive joint torques: viscous damping, regularized dry friction, and
    joint-limit penalty springs.

    Mirrors PhysX joint behavior as configured by the reference
    (dof_props damping/friction/limits, `gogoro_new.py:231,251-275`).

    When (dt, joint_inertia) are given, limit torques are capped at the
    impulse the joint's reflected inertia can absorb in one substep
    (stop the limit-ward velocity + resolve half the violation) — the same
    unconditional-stability device as the contact force cap.
    """
    tau = -params.dof_damping * joint_qd
    tau -= params.dof_friction * jnp.tanh(joint_qd / friction_vel_scale)
    below = jnp.minimum(joint_q - params.dof_lower, 0.0)
    above = jnp.maximum(joint_q - params.dof_upper, 0.0)
    # only apply limit force where limits are finite
    below = jnp.where(jnp.isfinite(params.dof_lower), below, 0.0)
    above = jnp.where(jnp.isfinite(params.dof_upper), above, 0.0)
    violation = below + above          # signed: negative below, positive above
    in_violation = (below < 0) | (above > 0)
    k_lim = jnp.asarray(limit_stiffness)
    d_lim = jnp.asarray(limit_damping)
    if dt is not None and joint_inertia is not None:
        # same per-joint coefficient stability clamp as the contact kernel:
        # omega*h <= 0.5 w.r.t. the joint's reflected inertia
        k_lim = jnp.minimum(k_lim, 0.25 * joint_inertia / dt**2)
        d_lim = jnp.minimum(d_lim, 0.5 * joint_inertia / dt)
    tau_lim = -k_lim * violation \
        + jnp.where(in_violation, -d_lim * joint_qd, 0.0)
    return tau + tau_lim


def drive_torques(params: ModelParams, joint_q: jnp.ndarray, joint_qd: jnp.ndarray,
                  target_pos: jnp.ndarray, target_vel: jnp.ndarray,
                  effort: jnp.ndarray,
                  dt: float | None = None,
                  joint_inertia: jnp.ndarray | None = None) -> jnp.ndarray:
    """Actuator model: DOF_MODE_POS / DOF_MODE_VEL / DOF_MODE_EFFORT.

    Semantics match gymapi drive modes as used at
    `/root/reference/isaacgymenvs/tasks/gogoro_new.py:266-275`:
      POS:    tau = Kp (target_pos - q) - Kd qd         (PD servo)
      VEL:    tau = Kd (target_vel - qd)                (velocity servo)
      EFFORT: tau = effort
    all clamped to +/- drive_effort_limit.

    PhysX integrates joint drives implicitly, so the reference can use
    arbitrarily stiff gains (rear-wheel Kd=1000 on a 0.38 kg m^2 wheel).
    Explicit integration needs the same gains clamped to the stability
    bound w.r.t. the joint's reflected inertia — the behavioral equivalent
    (critically-damped approach to the target, no chatter).
    """
    kp = params.drive_stiffness
    kd = params.drive_damping
    if dt is not None and joint_inertia is not None:
        kp = jnp.minimum(kp, 0.25 * joint_inertia / dt**2)
        kd = jnp.minimum(kd, 0.5 * joint_inertia / dt)
    mode = params.drive_mode
    pd = kp * (target_pos - joint_q) - kd * joint_qd
    vel = kd * (target_vel - joint_qd)
    tau = jnp.where(mode == 1, pd, 0.0) + jnp.where(mode == 2, vel, 0.0) + jnp.where(mode == 3, effort, 0.0)
    return jnp.clip(tau, -params.drive_effort_limit, params.drive_effort_limit)
