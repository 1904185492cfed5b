"""The physics step: drives + contact + ABA + semi-implicit Euler, substeps.

This is the TPU-native equivalent of the reference's
`for _ in range(control_freq_inv): gym.simulate(sim)` hot loop
(`/root/reference/isaacgymenvs/tasks/base/vec_task.py:332-339`) plus the sim
parameter block (`__parse_sim_params`, `vec_task.py:442-490`). One call steps
ALL envs: the single-env step is vmapped over the env axis and the substep
loop is a `lax.scan`, so the whole thing traces into one XLA program.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from thormang_isaacgym_tpu.core import quat as Q
from thormang_isaacgym_tpu.models.robot import ModelParams, RobotModel
from thormang_isaacgym_tpu.ops import collide as collide_mod
from thormang_isaacgym_tpu.ops import contact as contact_mod
from thormang_isaacgym_tpu.ops import dynamics as dyn
from thormang_isaacgym_tpu.ops.kinematics import (
    forward_kinematics, joint_local_pose, split_q, split_qd,
)


@dataclasses.dataclass(frozen=True)
class SimParams:
    """Static simulation parameters (hashable; closed over by jit).

    Mirrors the reference's sim config block
    (`cfg/task/Gogoro.yaml:9-31`): dt/substeps/gravity map 1:1; the PhysX
    solver-iteration and contact-offset knobs map onto the penalty-contact
    stiffness/damping pair here.
    """
    dt: float = 1.0 / 60.0
    substeps: int = 2
    gravity: tuple = (0.0, 0.0, -9.81)
    contact_stiffness: float = 1.0e5
    contact_damping: float = 3.0e3
    contact_beta: float = 0.5        # Baumgarte fraction for the force cap
    friction_vel: float = 0.05       # regularization velocity for Coulomb friction
    plane_friction: float = 1.0
    joint_limit_stiffness: float = 2000.0
    joint_limit_damping: float = 50.0
    root_linear_damping: float = 0.0   # asset_options.linear_damping (gogoro_new.py:209)
    root_angular_damping: float = 0.0
    max_velocity: float = 1e3          # safety clamp on qd
    # PhysX max_depenetration_velocity analog (vec_task.py:468): caps the
    # exit speed of deeply-penetrated contacts
    max_depenetration_velocity: float = 2.0


class Controls(NamedTuple):
    """Per-step actuation targets — the analog of
    set_dof_{position,velocity}_target_tensor / actuation_force_tensor
    (`gogoro_new.py:364-369`). Shapes: (nj,) single env, (B, nj) batched."""
    target_pos: jnp.ndarray
    target_vel: jnp.ndarray
    effort: jnp.ndarray


def zero_controls(model: RobotModel, batch: int | None = None) -> Controls:
    shape = (model.nj,) if batch is None else (batch, model.nj)
    z = jnp.zeros(shape)
    return Controls(z, z, z)


def _substep(model: RobotModel, sp_: SimParams, params: ModelParams,
             q: jnp.ndarray, qd: jnp.ndarray, ctrl: Controls,
             body_wrench_w: jnp.ndarray, ground_height_fn=None,
             attractors=None, ground_grad_fn=None):
    """One physics substep for one env."""
    h = sp_.dt / sp_.substeps
    # per-env gravity (ModelParams leaf) so DR can scale it; SimParams.gravity
    # is only the default used when building ModelParams
    gravity = params.gravity

    _, _, joint_q = split_q(model, q)
    _, _, joint_qd = split_qd(model, qd)
    # joint-local poses computed once, shared by FK and ABA
    local = joint_local_pose(model, joint_q)
    frames = forward_kinematics(model, q, qd, local=local)
    f_ext_w, net = contact_mod.ground_contact_forces(
        model, params, frames,
        stiffness=sp_.contact_stiffness, damping=sp_.contact_damping,
        friction_vel=sp_.friction_vel, plane_friction=sp_.plane_friction,
        ground_height_fn=ground_height_fn,
        ground_grad_fn=ground_grad_fn,
        dt=h, beta=sp_.contact_beta,
        max_depenetration_velocity=sp_.max_depenetration_velocity,
    )
    # net contact TORQUE about each body origin (world frame): the missing
    # half of the 6-DOF force-sensor reading (create_asset_force_sensor,
    # humanoid.py:163-168) — contact contributions only, so it excludes
    # the injected body_wrench pushes like the sensor would
    net_tq = f_ext_w[:, 0:3]
    f_ext_w = f_ext_w + body_wrench_w  # external pushes (apply_rigid_body_force_tensors)

    # actor-vs-actor contact (multi-actor scenes only; static pair list).
    # The normal is solved IMPLICITLY: the explicit spring force joins
    # f_ext_w, the velocity reaction joins the articulated-body inertia
    # (dIA) so stiff contact is unconditionally stable (see ops/collide.py).
    dIA = None
    if collide_mod.has_pairs(model):
        f_pair, dIA, net_pair = collide_mod.pairwise_contact_forces(
            model, params, frames,
            stiffness=sp_.contact_stiffness, damping=sp_.contact_damping,
            friction_vel=sp_.friction_vel, dt=h,
            max_depenetration_velocity=sp_.max_depenetration_velocity)
        f_ext_w = f_ext_w + f_pair
        net = net + net_pair
        net_tq = net_tq + f_pair[:, 0:3]

    # world-point attractors (gymapi.create_rigid_body_attractor equivalent,
    # e.g. the BallBalance feet pins, ball_balance.py:305-318): translation
    # springs from a body-local point to a fixed world target, coefficients
    # stability-clamped like the contact kernel
    if attractors:
        rows = np.zeros((model.nb, len(attractors)), np.float32)
        fcols, tcols = [], []
        for k_i, (ab, local_p, target, kp, kd) in enumerate(attractors):
            bp, bq = frames.pos[ab], frames.quat[ab]
            wp = bp + Q.rotate(bq, jnp.asarray(local_p))
            vp = frames.vel[ab] + jnp.cross(frames.omega[ab], wp - bp)
            # effective mass incl. the rotational mode at lever arm |local_p|
            m_lin = params.body_mass[ab]
            I_min = jnp.min(jnp.diag(params.body_inertia[ab]))
            r2 = float(np.dot(local_p, local_p))
            m_eff = jnp.minimum(m_lin, I_min / (r2 + 1e-6)) if r2 > 1e-6 else m_lin
            kp_c = jnp.minimum(kp, 0.25 * m_eff / h**2)
            kd_c = jnp.minimum(kd, 0.5 * m_eff / h)
            F = kp_c * (jnp.asarray(target) - wp) - kd_c * vp
            rows[ab, k_i] = 1.0
            fcols.append(F)
            tcols.append(jnp.cross(wp - bp, F))
        Rm = jnp.asarray(rows)
        f_ext_w = f_ext_w + jnp.concatenate(
            [Rm @ jnp.stack(tcols), Rm @ jnp.stack(fcols)], axis=-1)

    # world wrench -> link-frame spatial force
    R_t = jnp.swapaxes(Q.to_matrix(frames.quat), -1, -2)  # (nb,3,3) world->body
    f_ext = jnp.concatenate([
        (R_t @ f_ext_w[:, 0:3, None])[..., 0],
        (R_t @ f_ext_w[:, 3:6, None])[..., 0],
    ], axis=-1)

    # implicit (backward-Euler) joint drives + passive impedances: the
    # h*kd + h^2*kp reaction joins the ABA diagonal, so PhysX-grade gains
    # (Kp 1e6 fingers, Kd 1000 wheels) are stable un-clamped at any dt
    tau_d, diag_d = dyn.drive_forces(params, joint_q, joint_qd,
                                     ctrl.target_pos, ctrl.target_vel,
                                     ctrl.effort, h)
    tau_p, diag_p = dyn.passive_forces(
        params, joint_q, joint_qd, h,
        limit_stiffness=sp_.joint_limit_stiffness,
        limit_damping=sp_.joint_limit_damping,
        tendons=model.tendons)

    qdd = dyn.aba(model, params, q, qd, tau_d + tau_p, f_ext, gravity,
                  precomputed=(local[0], local[1], frames.quat),
                  extra_diag=diag_d + diag_p,
                  extra_body_inertia=dIA)

    # ---- semi-implicit Euler ----
    qd_new = qd + h * qdd
    nf = model.n_floating
    if nf > 0:
        # root damping (asset linear/angular damping), per floating root
        damp_root = jnp.concatenate([
            jnp.full(3, 1.0 - sp_.root_angular_damping * h),
            jnp.full(3, 1.0 - sp_.root_linear_damping * h),
        ])
        damp = jnp.concatenate([jnp.tile(damp_root, nf), jnp.ones(model.nj)])
        qd_new = qd_new * damp
    qd_new = jnp.clip(qd_new, -sp_.max_velocity, sp_.max_velocity)

    # joint velocity limits + locked joints
    jqd = qd_new[6 * nf:]
    jqd = jnp.clip(jqd, -params.dof_velocity_limit, params.dof_velocity_limit)
    jqd = jqd * (1.0 - params.dof_locked)

    jq = q[7 * nf:]
    jq_new = jq + h * jqd
    jq_new = jnp.where(params.dof_locked > 0, params.dof_locked_pos, jq_new)

    if nf > 0:
        root_q = q[: 7 * nf].reshape(nf, 7)
        root_qd = qd_new[: 6 * nf].reshape(nf, 6)
        omega_b, v_w = root_qd[:, 0:3], root_qd[:, 3:6]  # linear part: world
        root_pos, root_quat = root_q[:, 0:3], root_q[:, 3:7]
        omega_w = Q.rotate(root_quat, omega_b)
        new_quat = Q.integrate(root_quat, omega_w, h)
        new_pos = root_pos + h * v_w
        q_new = jnp.concatenate(
            [jnp.concatenate([new_pos, new_quat], axis=-1).reshape(-1), jq_new])
        qd_new = jnp.concatenate([root_qd.reshape(-1), jqd])
    else:
        q_new = jq_new
        qd_new = jqd

    return q_new, qd_new, jnp.concatenate([net, net_tq], axis=-1)


def build_step_fn(model: RobotModel, sim_params: SimParams,
                  ground_height_fn=None, attractors=None,
                  fused: bool | None = None,
                  need_torque=True) -> Callable:
    """Returns step(params, q, qd, ctrl, body_wrench_w) -> (q', qd', net),
    batched. net (B, nb, 3) is the per-body net ground-contact force from the
    last substep — the `acquire_net_contact_force_tensor` equivalent
    (e.g. `/root/reference/isaacgymenvs/tasks/humanoid.py:78-98` feet
    sensors, `anymal.py` termination contacts).

    params leaves carry a leading env axis; q (B, nq); qd (B, nv);
    ctrl leaves (B, nj); body_wrench_w (B, nb, 6) world-frame external
    wrenches (zeros if unused).

    Two interchangeable backends (numerics cross-checked in
    tests/test_fused.py):
    - fused Pallas kernel (ops/fused.py): the entire substep loop in ONE
      TPU kernel, env axis in the vector lanes. Default on TPU when the
      model is eligible (tree articulation, plane ground, no pairs /
      attractors) — ~100x over the op-based path, which is per-op
      dispatch-bound.
    - XLA op path: vmapped `_substep` under a lax.scan. Default on CPU and
      for models needing terrain/pairs/attractors.
    Force with `fused=True/False` or env THORMANG_TPU_FUSED=0/1.
    """
    import os
    from thormang_isaacgym_tpu.engine.terrain import Heightfield
    from thormang_isaacgym_tpu.ops import fused as fused_mod

    # normalize the ground spec: None (plane z=0) / constant height (float,
    # e.g. the factory tabletop) / Heightfield (terrain) / arbitrary
    # callable (XLA path only)
    ground = ground_height_fn
    if isinstance(ground, Heightfield):
        xla_ground_fn = ground.height_fn()
        xla_grad_fn = ground.height_and_grad_fn()
    elif isinstance(ground, (int, float)):
        gz = float(ground)
        xla_ground_fn = (lambda x, y: jnp.full_like(x, gz)) if gz != 0.0 \
            else None
        xla_grad_fn = None
    else:
        xla_ground_fn = ground
        xla_grad_fn = None

    if fused is None:
        envv = os.environ.get("THORMANG_TPU_FUSED")
        if envv is not None:
            fused = envv not in ("0", "false", "False")
        else:
            fused = jax.default_backend() == "tpu"
    fused = fused and fused_mod.fused_eligible(model, ground, attractors)
    if fused:
        fground = ground if isinstance(ground, Heightfield) \
            else float(ground or 0.0)
        return fused_mod.build_fused_step_fn(model, sim_params,
                                             attractors=attractors,
                                             ground=fground,
                                             need_torque=need_torque)

    def single_env_step(params, q, qd, ctrl, body_wrench_w):
        def body(carry, _):
            q, qd = carry
            q, qd, net = _substep(model, sim_params, params, q, qd, ctrl,
                                  body_wrench_w, xla_ground_fn, attractors,
                                  ground_grad_fn=xla_grad_fn)
            return (q, qd), net

        (q, qd), nets = jax.lax.scan(body, (q, qd), None, length=sim_params.substeps)
        return q, qd, nets[-1]

    return jax.vmap(single_env_step)
