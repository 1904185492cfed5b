"""Analytic primitive-vs-ground contact with penalty normal force and
regularized Coulomb friction.

TPU-native replacement for PhysX contact generation + TGS solve (spec:
`contact_offset`/`rest_offset`/friction config at
`/root/reference/isaacgymenvs/cfg/task/Gogoro.yaml:15-31`, ground plane at
`tasks/gogoro_new.py:184-191`, shape friction at `:284-293`). Instead of a
broad/narrow phase over mesh BVHs, every geom emits a *static* number of
candidate contact points (lockstep across envs — no divergence):

  sphere   -> 1 point  (center,          offset radius r)
  capsule  -> 2 points (both cap centers, offset radius r)
  cylinder -> 2 points (rim lowest point of both faces; wheel-style disk,
              axis = local z)
  box      -> 4 bottom / 4 top corners (8 points, offset 0)

All candidates are evaluated unconditionally and masked by penetration —
branch-free, fuses into the surrounding XLA program.

Single env; caller vmaps.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from thormang_isaacgym_tpu.core import quat as Q
from thormang_isaacgym_tpu.models.robot import (
    GEOM_BOX, GEOM_CAPSULE, GEOM_CYLINDER, GEOM_SPHERE, ModelParams, RobotModel,
)
from thormang_isaacgym_tpu.ops.kinematics import BodyFrames


def _static_candidates(model: RobotModel):
    """Precompute (numpy, trace-time) candidate-point table.

    Returns arrays over the total candidate count M:
      cand_geom (M,), local offset points (M,3), radius (M,), is_rim (M,)
    Rim candidates (cylinders) are resolved dynamically from orientation.
    """
    geom_idx, offsets, radii, is_rim, rim_halfw = [], [], [], [], []
    for gi, g in enumerate(model.geoms):
        if not getattr(g, "ground", True):
            continue          # per-geom ground opt-out (models/robot.Geom)
        if g.gtype == GEOM_SPHERE:
            geom_idx.append(gi); offsets.append((0, 0, 0)); radii.append(g.size[0]); is_rim.append(0); rim_halfw.append(0.0)
        elif g.gtype == GEOM_CAPSULE:
            r, hl = g.size
            for s in (-1, 1):
                geom_idx.append(gi); offsets.append((0, 0, s * hl)); radii.append(r); is_rim.append(0); rim_halfw.append(0.0)
        elif g.gtype == GEOM_CYLINDER:
            r, hw = g.size
            for s in (-1, 1):
                geom_idx.append(gi); offsets.append((0, 0, s * hw)); radii.append(r); is_rim.append(1); rim_halfw.append(0.0)
        elif g.gtype == GEOM_BOX:
            hx, hy, hz = g.size
            for sx in (-1, 1):
                for sy in (-1, 1):
                    for sz in (-1, 1):
                        geom_idx.append(gi); offsets.append((sx * hx, sy * hy, sz * hz)); radii.append(0.0); is_rim.append(0); rim_halfw.append(0.0)
    return (
        np.array(geom_idx, np.int32),
        np.array(offsets, np.float32).reshape(-1, 3),
        np.array(radii, np.float32),
        np.array(is_rim, np.float32),
    )


def ground_contact_forces(
    model: RobotModel,
    params: ModelParams,
    frames: BodyFrames,
    *,
    stiffness: float,
    damping: float,
    friction_vel: float = 0.05,
    plane_friction: float = 1.0,
    ground_height_fn=None,
    dt: float | None = None,
    beta: float = 0.5,
    max_depenetration_velocity: float = 2.0,
    ground_grad_fn=None,
):
    """Per-body external spatial force from ground contact.

    Returns (f_ext_world (nb, 6): [torque_about_body_origin, force], world
    frame) and per-body net contact force (nb, 3) — the equivalent of the
    reference's `acquire_net_contact_force_tensor` view.

    `ground_height_fn(x, y) -> z` enables heightfield terrain; None = plane
    z=0. `ground_grad_fn(x, y) -> (z, dz/dx, dz/dy)` additionally enables
    SLOPED contact normals (the true terrain surface normal, like PhysX's
    trimesh terrain contact) — without it the normal is world +z.
    """
    cand_geom, offsets, radii, is_rim = _static_candidates(model)
    if len(cand_geom) == 0:
        z = jnp.zeros((model.nb, 6))
        return z, jnp.zeros((model.nb, 3))

    gbody = np.array([g.body for g in model.geoms])[cand_geom]          # (M,)
    gpos = np.array([g.pos for g in model.geoms], np.float32).reshape(-1, 3)[cand_geom]
    gquat = np.array([g.quat for g in model.geoms], np.float32).reshape(-1, 4)[cand_geom]

    body_pos = frames.pos[gbody]        # (M,3)
    body_quat = frames.quat[gbody]
    omega = frames.omega[gbody]
    vel = frames.vel[gbody]

    # geom frame in world
    geo_pos = body_pos + Q.rotate(body_quat, jnp.asarray(gpos))
    geo_quat = Q.mul(body_quat, jnp.asarray(gquat))

    # candidate point center in world
    p = geo_pos + Q.rotate(geo_quat, jnp.asarray(offsets))

    # rim resolution for cylinders: lowest point of the rim circle whose
    # plane is normal to the local z axis. u = normalize(-(I - a a^T) zhat)
    a = Q.rotate(geo_quat, jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), p.shape))
    zhat = jnp.array([0.0, 0.0, 1.0])
    perp = zhat - a * a[..., 2:3]
    perp_n = jnp.linalg.norm(perp, axis=-1, keepdims=True)
    u = -perp / jnp.maximum(perp_n, 1e-6)
    r_col = jnp.asarray(radii)
    rim = jnp.asarray(is_rim)
    # rim point sits at face-center + r*u in the rim plane; its offset radius is 0
    rim_point = p + r_col[:, None] * u
    p = jnp.where(rim[:, None] > 0, rim_point, p)
    eff_r = r_col * (1.0 - rim)

    # penetration (positive = penetrating) against plane or heightfield
    if ground_grad_fn is not None:
        # sloped terrain: penetration along the local surface normal,
        # n = (-gx, -gy, 1)/|.| (same local-plane model as the fused
        # kernel's per-candidate ground rows, ops/fused.py)
        ground_z, gslope_x, gslope_y = ground_grad_fn(p[:, 0], p[:, 1])
        inv_nn = jax.lax.rsqrt(1.0 + gslope_x ** 2 + gslope_y ** 2)
        n_g = jnp.stack([-gslope_x * inv_nn, -gslope_y * inv_nn, inv_nn],
                        axis=-1)                               # (M, 3)
        depth = (ground_z - p[:, 2]) * inv_nn + eff_r
        contact_p = p - n_g * eff_r[:, None]
    else:
        n_g = None
        if ground_height_fn is None:
            ground_z = jnp.zeros(p.shape[0])
        else:
            ground_z = ground_height_fn(p[:, 0], p[:, 1])
        depth = ground_z - (p[:, 2] - eff_r)
        contact_p = p.at[:, 2].add(-eff_r)       # contact point on surface
    active = depth > 0.0

    # contact point velocity
    v_p = vel + jnp.cross(omega, contact_p - body_pos)
    if n_g is not None:
        vn = jnp.sum(v_p * n_g, axis=-1)
        vt = v_p - n_g * vn[:, None]
    else:
        vn = v_p[:, 2]
        vt = v_p.at[:, 2].set(0.0)
    vt_norm = jnp.linalg.norm(vt, axis=-1)

    mu = params.geom_friction[cand_geom] * plane_friction
    kn = jnp.asarray(stiffness)
    kd = jnp.asarray(damping)
    if dt is not None:
        # Stability clamp on the spring-damper COEFFICIENTS, per contact:
        # explicit integration of a penalty spring on a body of mass m is
        # stable only for omega*h = sqrt(k/m)*h <~ 0.5 and c <~ 0.5 m/h.
        # Light bodies (0.07 kg ant feet) get a proportionally softer
        # contact; heavy ones (the 150 kg scooter) keep the configured
        # stiffness. A stable spring is dissipative — no energy injection,
        # no bounce — unlike capping the force itself. Replaces the role of
        # PhysX's solver iterations + max_depenetration_velocity
        # (cfg/task/Gogoro.yaml:15-31).
        # effective mass at the contact point: the lesser of the body's
        # linear mass and its rotational response I_min / r_perp^2, where
        # r_perp is the lever arm PERPENDICULAR to the (vertical) contact
        # normal — a force parallel to the offset produces no torque, so a
        # straight stance leg keeps its full linear mass
        m_lin = params.body_mass[gbody]
        I_min = jnp.min(jnp.diagonal(params.body_inertia[gbody],
                                     axis1=-2, axis2=-1), axis=-1)
        r = contact_p - body_pos
        r_perp2 = r[:, 0] ** 2 + r[:, 1] ** 2      # |r x zhat|^2
        m_rot = I_min / (r_perp2 + 1e-6)
        m_eff = jnp.minimum(m_lin, jnp.where(r_perp2 < 1e-6, m_lin, m_rot))
        # the stability bound applies to the SUM of contact stiffness on a
        # body: a box resting on 8 corners sees 8 springs in parallel, and
        # per-contact clamping alone would overshoot the bound 8x (light
        # boxes jitter themselves off the table). Split the mass budget
        # across this body's currently-active contacts.
        onehot_c = np.zeros((model.nb, len(gbody)), np.float32)
        onehot_c[gbody, np.arange(len(gbody))] = 1.0
        Bc = jnp.asarray(onehot_c)
        n_active = (Bc @ active.astype(jnp.float32))[gbody]
        m_eff = m_eff / jnp.maximum(n_active, 1.0)
        kn = jnp.minimum(kn, 0.25 * m_eff / dt**2)
        kd = jnp.minimum(kd, 0.5 * m_eff / dt)
    fn = kn * depth - kd * vn
    fn = jnp.where(active, jnp.maximum(fn, 0.0), 0.0)
    if dt is not None:
        # PhysX max_depenetration_velocity equivalent: a deeply-embedded
        # contact (created by an overpowering constraint, e.g. a stiff
        # position-driven gripper) may store large spring energy; cap the
        # normal force so the body exits at <= max_dep_vel instead of being
        # launched ("popped") at the spring's full restitution speed.
        # Gated on SEPARATION — static contacts keep full load capacity.
        cap = jnp.where(vn > 0.0,
                        m_eff * jnp.maximum(max_depenetration_velocity - vn, 0.0) / dt,
                        jnp.inf)
        fn = jnp.minimum(fn, cap)
        fn = jnp.maximum(fn, 0.0)
    # regularized Coulomb friction, capped at the stick limit: the force
    # that stops the tangential slip in one substep (m v_t / dt). Beyond
    # that, friction would REVERSE the velocity — the classic explicit
    # -integration friction instability under impact normal-force spikes.
    ft_mag = mu * fn * jnp.tanh(vt_norm / friction_vel)
    if dt is not None:
        ft_mag = jnp.minimum(ft_mag, params.body_mass[gbody] * vt_norm / dt)
    ft = -ft_mag[:, None] * vt / jnp.maximum(vt_norm, 1e-6)[:, None]

    if n_g is not None:
        f = ft + n_g * fn[:, None]                # (M,3) world force
    else:
        f = ft.at[:, 2].add(fn)                   # (M,3) world force
    torque = jnp.cross(contact_p - body_pos, f)   # about body origin

    # accumulate to bodies by one-hot matmul (constant (nb, M) matrix) —
    # avoids XLA scatter, which serializes on TPU
    onehot = np.zeros((model.nb, len(gbody)), np.float32)
    onehot[gbody, np.arange(len(gbody))] = 1.0
    B = jnp.asarray(onehot)
    f_ext = jnp.concatenate([B @ torque, B @ f], axis=-1)  # (nb, 6)
    net = B @ f
    return f_ext, net
