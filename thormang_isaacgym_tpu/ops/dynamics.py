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
from thormang_isaacgym_tpu.ops.levels import body_levels, level_structure, static_arrays

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
    extra_diag: jnp.ndarray | None = None,   # (nj,) implicit joint impedance
    extra_body_inertia: jnp.ndarray | None = None,  # (nb, 6, 6) link frame
) -> jnp.ndarray:
    """Returns qdd: (nv,) = [root_acc (6, body frame), joint_qdd (nj)].

    `extra_diag` adds to the joint-space diagonal D in pass 2 — the
    backward-Euler lumped impedance h*kd + h^2*kp of joint drives, passive
    damping, and limit springs (see drive_forces/passive_forces). This is
    how PhysX-style arbitrarily stiff joint drives stay stable under
    explicit integration: the damping/stiffness reaction to the *new*
    velocity moves to the left-hand side of the joint solve.

    `extra_body_inertia` adds a per-body 6x6 (link-frame) term to the
    spatial inertia before pass 2 — the implicit velocity reaction of
    contact springs, h*(h*kn + kd) u u^T per contact (ops/collide.py).
    Same mechanism, applied at the body instead of the joint: makes
    arbitrarily stiff contact unconditionally stable.
    """
    # The small 3x3/6x6 contractions here are numerically load-bearing
    # (articulated inertia propagation); keep them in full f32 even on MXU.
    with jax.default_matmul_precision("highest"):
        return _aba(model, params, q, qd, tau, f_ext, gravity, precomputed,
                    extra_diag, extra_body_inertia)


def _aba(model, params, q, qd, tau, f_ext, gravity, precomputed=None,
         extra_diag=None, extra_body_inertia=None):
    """Banded level sweeps: per-level chunks with static slices, constant
    -index parent gathers, and one-hot-matmul scatter-adds — no XLA scatter
    ops (they serialize badly on TPU)."""
    struct = level_structure(model)
    _, _, _, S_np = static_arrays(model)
    S_all = jnp.asarray(S_np)            # (nj, 6)

    _, root_quat, joint_q = split_q(model, q)
    root_omega_b, root_v_w, joint_qd = split_qd(model, qd)
    # root linear velocity is world-frame (see kinematics state layout);
    # the ABA works in link frames, so rotate it in here
    root_v_b = Q.rotate_inv(root_quat, root_v_w)

    if precomputed is not None:
        pos_local, quat_local, quat_w = precomputed
    else:
        pos_local, quat_local = joint_local_pose(model, joint_q)
        quat_w = None
    R_loc = Q.to_matrix(quat_local)      # (nj, 3, 3)

    # ---- pass 1: velocities + bias terms (outward, banded) ----
    nr = model.n_roots
    v_c = [jnp.concatenate([root_omega_b, root_v_b], axis=-1)]   # (nr, 6)
    c_c = [jnp.zeros((nr, 6))]
    qw_c = [root_quat] if quat_w is None else None
    for lv in struct:
        j = slice(lv["start"] - nr, lv["end"] - nr)
        p = lv["parent_local"]
        vj = S_all[j] * joint_qd[j][:, None]
        vi = sp.motion_to_child(R_loc[j], pos_local[j], v_c[-1][p]) + vj
        v_c.append(vi)
        c_c.append(sp.cross_motion(vi, vj))
        if qw_c is not None:
            qw_c.append(Q.mul(qw_c[-1][p], quat_local[j]))
    v = jnp.concatenate(v_c)
    if quat_w is None:
        quat_w = jnp.concatenate(qw_c)

    # ---- body spatial inertias + bias forces (fully vectorized) ----
    mass = params.body_mass
    com = params.body_com
    I_com = params.body_inertia
    IA_full = sp.inertia_matrix(mass, com, I_com)        # (nb, 6, 6)
    if extra_body_inertia is not None:
        IA_full = IA_full + extra_body_inertia
    Iv = sp.inertia_mul(mass, com, I_com, v)             # (nb, 6)
    nb = model.nb
    g_local = Q.rotate_inv(quat_w, jnp.broadcast_to(gravity, (nb, 3)))
    # per-body gravity scale (asset disable_gravity, franka_cube_stack.py:201)
    g_local = g_local * params.body_gravity_scale[:, None]
    f_grav = jnp.concatenate(
        [jnp.cross(com, mass[:, None] * g_local), mass[:, None] * g_local], axis=-1)
    pA_full = sp.cross_force(v, Iv) - f_ext - f_grav     # (nb, 6)

    # chunk IA/pA per level (index 0 = root chunk, one row per actor root)
    IA_c = [IA_full[0:nr]] + [IA_full[lv["start"]:lv["end"]] for lv in struct]
    pA_c = [pA_full[0:nr]] + [pA_full[lv["start"]:lv["end"]] for lv in struct]

    # ---- pass 2: articulated inertia (inward, banded) ----
    U_c = [None] * len(struct)
    D_c = [None] * len(struct)
    u_c = [None] * len(struct)
    for k in range(len(struct) - 1, -1, -1):
        lv = struct[k]
        j = slice(lv["start"] - nr, lv["end"] - nr)
        Sj = S_all[j]                                     # (n_k, 6)
        IA_L = IA_c[k + 1]
        Ui = (IA_L @ Sj[..., None])[..., 0]               # (n_k, 6)
        Di = jnp.sum(Sj * Ui, axis=-1) + params.dof_armature[j] \
            + params.dof_locked[j] * _LOCK_BIG
        if extra_diag is not None:
            Di = Di + extra_diag[j]
        ui = tau[j] - jnp.sum(Sj * pA_c[k + 1], axis=-1)
        U_c[k], D_c[k], u_c[k] = Ui, Di, ui
        Ia = IA_L - Ui[:, :, None] * (Ui[:, None, :] / Di[:, None, None])
        pa = pA_c[k + 1] + (Ia @ c_c[k + 1][..., None])[..., 0] + Ui * (ui / Di)[:, None]
        IA_t = sp.transform_inertia_to_parent(R_loc[j], pos_local[j], Ia)
        pa_t = sp.force_to_parent(R_loc[j], pos_local[j], pa)
        # accumulate into the parent level by one-hot matmul (n_prev, n_k)
        scat = jnp.asarray(lv["scatter"])
        IA_c[k] = IA_c[k] + jnp.einsum("pk,kij->pij", scat, IA_t)
        pA_c[k] = pA_c[k] + scat @ pa_t

    # ---- pass 3: accelerations (outward, banded) ----
    float_mask = jnp.asarray(
        np.array(model.roots_floating, np.float32))          # (nr,)
    if model.n_floating > 0:
        eye = jnp.broadcast_to(jnp.eye(6), (nr, 6, 6))
        a_solve = -jnp.linalg.solve(IA_c[0] + 1e-9 * eye, pA_c[0][..., None])[..., 0]
        a_root = a_solve * float_mask[:, None]               # fixed roots: a=0
    else:
        a_root = jnp.zeros((nr, 6))
    a_c = [a_root]
    qdd_c = []
    for k, lv in enumerate(struct):
        j = slice(lv["start"] - nr, lv["end"] - nr)
        p = lv["parent_local"]
        a_p = sp.motion_to_child(R_loc[j], pos_local[j], a_c[-1][p]) + c_c[k + 1]
        qdd_i = (u_c[k] - jnp.sum(U_c[k] * a_p, axis=-1)) / D_c[k]
        a_c.append(a_p + S_all[j] * qdd_i[:, None])
        qdd_c.append(qdd_i)

    qdd_j = jnp.concatenate(qdd_c) if qdd_c else jnp.zeros(0)
    # locked joints: hard-zero acceleration (D inflation already makes this ~0)
    qdd_j = qdd_j * (1.0 - params.dof_locked)
    if model.n_floating > 0:
        # pack floating roots' accelerations (in body order) ahead of joints.
        # The spatial linear acceleration a_lin is the derivative of the
        # body-frame velocity; convert to the world-frame derivative the
        # integrator expects: dv_w/dt = R (a_lin + w x v_b).
        a_ang = a_root[:, 0:3]
        a_lin_w = Q.rotate(root_quat,
                           a_root[:, 3:6] + jnp.cross(root_omega_b, root_v_b))
        a_pack = jnp.concatenate([a_ang, a_lin_w], axis=-1)
        flags = model.roots_floating
        rows = [a_pack[r] for r in range(nr) if flags[r]]
        return jnp.concatenate([jnp.concatenate(rows), qdd_j])
    return qdd_j


def joint_reflected_inertia(model: RobotModel, params: ModelParams) -> jnp.ndarray:
    """Lower bound of each joint's reflected inertia: S^T I_child S +
    armature (child body's spatial inertia about its own origin along the
    joint axis). Used to stability-cap penalty torques."""
    _, _, _, S_np = static_arrays(model)
    S = jnp.asarray(S_np)                                   # (nj, 6)
    nr = model.n_roots
    Ic = sp.inertia_matrix(params.body_mass[nr:], params.body_com[nr:],
                           params.body_inertia[nr:])         # (nj, 6, 6)
    return jnp.sum(S * (Ic @ S[..., None])[..., 0], axis=-1) + params.dof_armature


def articulated_joint_inertia(model: RobotModel, params: ModelParams,
                              joint_q: jnp.ndarray,
                              precomputed=None) -> jnp.ndarray:
    """Exact per-joint apparent inertia at the current configuration:
    D_i = S_i^T IA_i S_i + armature from the articulated-body inertia
    recursion (the ABA's pass 2 without the bias terms).

    This is the true instantaneous tau -> qdd relation per joint, and the
    correct mass against which drive/limit gains are stability-clamped: a
    shoulder PD drives the whole (articulated) arm, not just the child
    link — the child-only lower bound under-clamps kd ~20x on a Panda
    shoulder and makes stiff drives artificially sloppy. Locked downstream
    joints (dof_locked) transmit their full subtree inertia, so frozen
    humanoid joints count as payload, as they should.
    """
    struct = level_structure(model)
    _, _, _, S_np = static_arrays(model)
    S_all = jnp.asarray(S_np)
    nr = model.n_roots
    if precomputed is not None:
        pos_local, quat_local = precomputed
    else:
        pos_local, quat_local = joint_local_pose(model, joint_q)
    R_loc = Q.to_matrix(quat_local)

    IA_full = sp.inertia_matrix(params.body_mass, params.body_com,
                                params.body_inertia)
    IA_c = [IA_full[0:nr]] + [IA_full[lv["start"]:lv["end"]] for lv in struct]
    D_c = [None] * len(struct)
    for k in range(len(struct) - 1, -1, -1):
        lv = struct[k]
        j = slice(lv["start"] - nr, lv["end"] - nr)
        Sj = S_all[j]
        IA_L = IA_c[k + 1]
        Ui = (IA_L @ Sj[..., None])[..., 0]
        Di = jnp.sum(Sj * Ui, axis=-1) + params.dof_armature[j]
        D_c[k] = Di
        D_proj = Di + params.dof_locked[j] * _LOCK_BIG
        Ia = IA_L - Ui[:, :, None] * (Ui[:, None, :] / D_proj[:, None, None])
        I_t = sp.transform_inertia_to_parent(R_loc[j], pos_local[j], Ia)
        scat = jnp.asarray(lv["scatter"])
        IA_c[k] = IA_c[k] + jnp.einsum("pk,kij->pij", scat, I_t)
    return jnp.concatenate(D_c) if D_c else jnp.zeros(0)


def passive_forces(params: ModelParams, joint_q: jnp.ndarray,
                   joint_qd: jnp.ndarray, h: float,
                   limit_stiffness: float = 2000.0,
                   limit_damping: float = 50.0,
                   friction_vel_scale: float = 0.05,
                   tendons: tuple = ()):
    """Passive joint forces in implicit (backward-Euler) form.

    Returns (tau_explicit, diag): the realized torque at the new velocity is
    tau_explicit - diag/h * (h qdd) — i.e. `diag` joins the joint-space
    diagonal D inside the ABA (see `aba(extra_diag=...)`), which makes
    viscous damping and limit springs unconditionally stable at ANY
    coefficient, exactly like PhysX's implicit joint solve (the behavior the
    reference's dof_props assume, `gogoro_new.py:231,251-275`).

    - damping: tau -c qd, diag h c
    - dry friction: bounded tanh regularization, explicit
    - limits: spring-damper active in violation, spring evaluated at the
      predicted position q + h qd (full backward Euler: diag h^2 k + h d)
    """
    c = params.dof_damping
    tau = -c * joint_qd
    diag = h * c
    tau -= params.dof_friction * jnp.tanh(joint_qd / friction_vel_scale)

    below = jnp.minimum(joint_q - params.dof_lower, 0.0)
    above = jnp.maximum(joint_q - params.dof_upper, 0.0)
    below = jnp.where(jnp.isfinite(params.dof_lower), below, 0.0)
    above = jnp.where(jnp.isfinite(params.dof_upper), above, 0.0)
    violation = below + above          # signed: negative below, positive above
    in_violation = ((below < 0) | (above > 0)).astype(joint_q.dtype)
    k_lim = jnp.asarray(limit_stiffness)
    d_lim = jnp.asarray(limit_damping)
    tau = tau + in_violation * (-k_lim * (violation + h * joint_qd)
                                - d_lim * joint_qd)
    diag = diag + in_violation * (h * h * k_lim + h * d_lim)

    # fixed tendons (RobotModel.tendons): L = C q spring-limited to [lo, hi]
    # — the reference's MJCF coupled-joint tendons with limit_stiffness /
    # damping props (shadow_hand.py:252-268). Backward-Euler like the limit
    # springs; the diagonal approximation of the rank-1 coupling joins D.
    if tendons:
        C = jnp.asarray(np.array([t[0] for t in tendons], np.float32))  # (nt, nj)
        lo = jnp.asarray(np.array([t[1] for t in tendons], np.float32))
        hi = jnp.asarray(np.array([t[2] for t in tendons], np.float32))
        L = C @ joint_q
        Ld = C @ joint_qd
        below_t = jnp.minimum(L - lo, 0.0)
        above_t = jnp.maximum(L - hi, 0.0)
        viol = below_t + above_t
        in_vio = ((below_t < 0) | (above_t > 0)).astype(joint_q.dtype)
        k_t = params.tendon_stiffness
        d_t = params.tendon_damping
        f_t = in_vio * (-k_t * (viol + h * Ld)) - d_t * Ld   # per-tendon force
        tau = tau + C.T @ f_t
        diag_t = in_vio * (h * h * k_t) + h * d_t
        diag = diag + (C * C).T @ diag_t
    return tau, diag


def drive_forces(params: ModelParams, joint_q: jnp.ndarray,
                 joint_qd: jnp.ndarray, target_pos: jnp.ndarray,
                 target_vel: jnp.ndarray, effort: jnp.ndarray, h: float):
    """Actuator model in implicit form: DOF_MODE_POS / VEL / EFFORT.

    Semantics match gymapi drive modes as used at
    `/root/reference/isaacgymenvs/tasks/gogoro_new.py:266-275`:
      POS:    tau = Kp (target_pos - q) - Kd qd         (PD servo)
      VEL:    tau = Kd (target_vel - qd)                (velocity servo)
      EFFORT: tau = effort
    clamped to +/- drive_effort_limit.

    PhysX integrates joint drives implicitly, so the reference can use
    arbitrarily stiff gains (rear-wheel Kd=1000 on a 0.38 kg m^2 wheel,
    finger drives Kp 1e6). Here the same property comes from backward Euler:
    the spring is evaluated at the predicted position and the (h^2 Kp + h Kd)
    reaction to the new velocity joins the ABA diagonal (returned as `diag`),
    so configured gains apply un-clamped at any dt.
    """
    kp = params.drive_stiffness
    kd = params.drive_damping
    mode = params.drive_mode
    pos_m = (mode == 1).astype(joint_q.dtype)
    vel_m = (mode == 2).astype(joint_q.dtype)
    eff_m = (mode == 3).astype(joint_q.dtype)
    pd = kp * (target_pos - joint_q - h * joint_qd) - kd * joint_qd
    vel = kd * (target_vel - joint_qd)
    tau = pos_m * pd + vel_m * vel + eff_m * effort
    tau = jnp.clip(tau, -params.drive_effort_limit, params.drive_effort_limit)
    diag = pos_m * (h * h * kp + h * kd) + vel_m * (h * kd)
    return tau, diag
