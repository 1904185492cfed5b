"""Articulated-body forward dynamics (Featherstone ABA), single env.

TPU-native replacement for the reference's PhysX articulation solver (the
compute inside `gym.simulate`, spec: solver config at
`/root/reference/isaacgymenvs/cfg/task/Gogoro.yaml:15-31` and the Tensor API
surface in SURVEY.md §2.1 N1/N4). Design notes:

- O(nb) three-sweep ABA, unrolled over the (static) body count at trace
  time; every intermediate is a small batched tensor once the caller vmaps
  over envs, so XLA lowers to wide VPU ops + tiny batched matmuls.
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
from thormang_isaacgym_tpu.models.robot import ModelParams, PRISMATIC, REVOLUTE, RobotModel
from thormang_isaacgym_tpu.ops.kinematics import joint_local_pose, split_q, split_qd

_LOCK_BIG = 1e12


def aba(
    model: RobotModel,
    params: ModelParams,
    q: jnp.ndarray,
    qd: jnp.ndarray,
    tau: jnp.ndarray,        # (nj,) generalized force on 1-DOF joints
    f_ext: jnp.ndarray,      # (nb, 6) spatial force on each body, *link frame*, about link origin
    gravity: jnp.ndarray,    # (3,) world gravity vector
) -> jnp.ndarray:
    """Returns qdd: (nv,) = [root_acc (6, body frame), joint_qdd (nj)]."""
    # The small 3x3/6x6 contractions here are numerically load-bearing
    # (articulated inertia propagation); keep them in full f32 even on MXU.
    with jax.default_matmul_precision("highest"):
        return _aba(model, params, q, qd, tau, f_ext, gravity)


def _aba(model, params, q, qd, tau, f_ext, gravity):
    nb = model.nb
    parent = model.parent
    jtype = np.array(model.joint_type)

    _, root_quat, joint_q = split_q(model, q)
    root_omega_b, root_v_b, joint_qd = split_qd(model, qd)

    pos_local, quat_local = joint_local_pose(model, joint_q)
    # rotation matrices child->parent and child origin in parent frame
    R_loc = Q.to_matrix(quat_local)          # (nj, 3, 3)
    axes = jnp.asarray(np.array(model.joint_axis, dtype=np.float32).reshape(-1, 3))

    # ---- pass 1: velocities, bias terms (outward) ----
    v = [jnp.concatenate([root_omega_b, root_v_b])]
    c_bias = [jnp.zeros(6)]
    S = [None]
    for i in range(1, nb):
        j = i - 1
        if jtype[j] == REVOLUTE:
            Sj = jnp.concatenate([axes[j], jnp.zeros(3)])
        else:
            Sj = jnp.concatenate([jnp.zeros(3), axes[j]])
        S.append(Sj)
        vj = Sj * joint_qd[j]
        vi = sp.motion_to_child(R_loc[j], pos_local[j], v[parent[i]]) + vj
        v.append(vi)
        c_bias.append(sp.cross_motion(vi, vj))

    # ---- body spatial inertias + bias forces ----
    # gravity in each body's local frame needs body world orientations;
    # accumulate quats down the tree (cheap, reuses quat_local)
    quat_w = [root_quat]
    for i in range(1, nb):
        quat_w.append(Q.mul(quat_w[parent[i]], quat_local[i - 1]))

    IA = []
    pA = []
    for i in range(nb):
        m_i = params.body_mass[i]
        com_i = params.body_com[i]
        I_i = params.body_inertia[i]
        IA.append(sp.inertia_matrix(m_i, com_i, I_i))
        Iv = sp.inertia_mul(m_i, com_i, I_i, v[i])
        g_local = Q.rotate_inv(quat_w[i], gravity)
        f_grav = jnp.concatenate([jnp.cross(com_i, m_i * g_local), m_i * g_local])
        pA.append(sp.cross_force(v[i], Iv) - f_ext[i] - f_grav)

    # ---- pass 2: articulated inertia (inward) ----
    U = [None] * nb
    D = [None] * nb
    u = [None] * nb
    for i in range(nb - 1, 0, -1):
        j = i - 1
        Sj = S[i]
        Ui = IA[i] @ Sj
        Di = Sj @ Ui + params.dof_armature[j] + params.dof_locked[j] * _LOCK_BIG
        ui = tau[j] - Sj @ pA[i]
        U[i], D[i], u[i] = Ui, Di, ui
        Ia = IA[i] - jnp.outer(Ui, Ui) / Di
        pa = pA[i] + Ia @ c_bias[i] + Ui * (ui / Di)
        p = parent[i]
        IA[p] = IA[p] + sp.transform_inertia_to_parent(R_loc[j], pos_local[j], Ia)
        pA[p] = pA[p] + sp.force_to_parent(R_loc[j], pos_local[j], pa)

    # ---- pass 3: accelerations (outward) ----
    if model.floating:
        a_root = -jnp.linalg.solve(IA[0] + 1e-9 * jnp.eye(6), pA[0])
    else:
        a_root = jnp.zeros(6)
    a = [a_root]
    qdd_j = []
    for i in range(1, nb):
        j = i - 1
        a_p = sp.motion_to_child(R_loc[j], pos_local[j], a[parent[i]]) + c_bias[i]
        qdd_i = (u[i] - U[i] @ a_p) / D[i]
        a.append(a_p + S[i] * qdd_i)
        qdd_j.append(qdd_i)

    joint_qdd = jnp.stack(qdd_j) if qdd_j else jnp.zeros(0)
    # locked joints: hard-zero acceleration (D inflation already makes this ~0)
    joint_qdd = joint_qdd * (1.0 - params.dof_locked)
    if model.floating:
        return jnp.concatenate([a_root, joint_qdd])
    return joint_qdd


def passive_torques(params: ModelParams, joint_q: jnp.ndarray, joint_qd: jnp.ndarray,
                    limit_stiffness: float = 2000.0, limit_damping: float = 50.0,
                    friction_vel_scale: float = 0.05) -> jnp.ndarray:
    """Passive joint torques: viscous damping, regularized dry friction, and
    joint-limit penalty springs.

    Mirrors PhysX joint behavior as configured by the reference
    (dof_props damping/friction/limits, `gogoro_new.py:231,251-275`).
    """
    tau = -params.dof_damping * joint_qd
    tau -= params.dof_friction * jnp.tanh(joint_qd / friction_vel_scale)
    below = jnp.minimum(joint_q - params.dof_lower, 0.0)
    above = jnp.maximum(joint_q - params.dof_upper, 0.0)
    # only apply limit force where limits are finite
    below = jnp.where(jnp.isfinite(params.dof_lower), below, 0.0)
    above = jnp.where(jnp.isfinite(params.dof_upper), above, 0.0)
    in_violation = (below < 0) | (above > 0)
    tau += -limit_stiffness * (below + above)
    tau += jnp.where(in_violation, -limit_damping * joint_qd, 0.0)
    return tau


def drive_torques(params: ModelParams, joint_q: jnp.ndarray, joint_qd: jnp.ndarray,
                  target_pos: jnp.ndarray, target_vel: jnp.ndarray,
                  effort: jnp.ndarray) -> jnp.ndarray:
    """Actuator model: DOF_MODE_POS / DOF_MODE_VEL / DOF_MODE_EFFORT.

    Semantics match gymapi drive modes as used at
    `/root/reference/isaacgymenvs/tasks/gogoro_new.py:266-275`:
      POS:    tau = Kp (target_pos - q) - Kd qd         (PD servo)
      VEL:    tau = Kd (target_vel - qd)                (velocity servo)
      EFFORT: tau = effort
    all clamped to +/- drive_effort_limit.
    """
    mode = params.drive_mode
    pd = params.drive_stiffness * (target_pos - joint_q) - params.drive_damping * joint_qd
    vel = params.drive_damping * (target_vel - joint_qd)
    tau = jnp.where(mode == 1, pd, 0.0) + jnp.where(mode == 2, vel, 0.0) + jnp.where(mode == 3, effort, 0.0)
    return jnp.clip(tau, -params.drive_effort_limit, params.drive_effort_limit)
