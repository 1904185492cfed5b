"""Actor-vs-actor primitive collision (penalty, lockstep, static pair list).

TPU-native replacement for PhysX inter-actor contact generation (spec: the
reference's multi-actor scenes — ball on tray `tasks/ball_balance.py`, object
in hand `tasks/shadow_hand.py`, table between robots `tasks/MA_OP3.py`).
Pairs are enumerated at trace time between geoms of DIFFERENT actors
(self-collision within an actor is off, matching IsaacGym's default
collision filtering); every pair is evaluated unconditionally and masked by
penetration — no broadphase, no divergence, which is the right trade at
IsaacGym-style geom counts (a handful per actor).

Supported pairs (round 1): sphere-sphere, sphere-capsule, sphere-box.
The same stability-clamped spring-damper + regularized Coulomb model as the
ground kernel, with the pair's REDUCED mass bounding the coefficients.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from thormang_isaacgym_tpu.core import quat as Q
from thormang_isaacgym_tpu.models.robot import (
    GEOM_BOX, GEOM_CAPSULE, GEOM_CYLINDER, GEOM_SPHERE, ModelParams, RobotModel,
)
from thormang_isaacgym_tpu.ops.kinematics import BodyFrames

_SUPPORTED = {
    (GEOM_SPHERE, GEOM_SPHERE), (GEOM_SPHERE, GEOM_CAPSULE),
    (GEOM_SPHERE, GEOM_BOX), (GEOM_SPHERE, GEOM_CYLINDER),
}


def _free_body_flags(model: RobotModel) -> np.ndarray:
    """(nb,) 1.0 where the body's actor root is floating (free to fall)."""
    flags = model.roots_floating
    actors = model.actors
    # actor index -> is its root floating
    return np.array([1.0 if flags[actors[b]] else 0.0
                     for b in range(model.nb)], np.float32)


def _pairs(model: RobotModel):
    actors = model.actors
    out = []
    for i, g1 in enumerate(model.geoms):
        for jj, g2 in enumerate(model.geoms):
            if jj <= i:
                continue
            if actors[g1.body] == actors[g2.body]:
                continue
            t1, t2 = g1.gtype, g2.gtype
            if (t1, t2) in _SUPPORTED:
                out.append((i, jj, False))
            elif (t2, t1) in _SUPPORTED:
                out.append((jj, i, True))
    return out


def has_pairs(model: RobotModel) -> bool:
    return len(_pairs(model)) > 0


def pairwise_contact_forces(model: RobotModel, params: ModelParams,
                            frames: BodyFrames, *, stiffness: float,
                            damping: float, friction_vel: float,
                            dt: float,
                            max_depenetration_velocity: float = 2.0):
    """Returns world-frame f_ext (nb, 6) additions from actor-actor contact.

    Single env; caller vmaps. Zero array if the model has no eligible pairs.
    """
    pairs = _pairs(model)
    nb = model.nb
    if not pairs:
        return jnp.zeros((nb, 6))

    gpos = np.array([g.pos for g in model.geoms], np.float32).reshape(-1, 3)
    gquat = np.array([g.quat for g in model.geoms], np.float32).reshape(-1, 4)
    gbody = np.array([g.body for g in model.geoms])

    forces = []   # (body_a, body_b, contact_point, force_on_a)
    for (ia, ib, _sw) in pairs:
        ga, gb = model.geoms[ia], model.geoms[ib]
        ba, bb = gbody[ia], gbody[ib]
        qa = Q.mul(frames.quat[ba], jnp.asarray(gquat[ia]))
        qb = Q.mul(frames.quat[bb], jnp.asarray(gquat[ib]))
        pa = frames.pos[ba] + Q.rotate(frames.quat[ba], jnp.asarray(gpos[ia]))
        pb = frames.pos[bb] + Q.rotate(frames.quat[bb], jnp.asarray(gpos[ib]))

        ta, tb = ga.gtype, gb.gtype
        if (ta, tb) == (GEOM_SPHERE, GEOM_SPHERE):
            ra, rb = ga.size[0], gb.size[0]
            d = pb - pa
            dist = jnp.linalg.norm(d) + 1e-9
            n = d / dist                       # from a to b
            depth = ra + rb - dist
            cp = pa + n * (ra - depth * 0.5)
        elif (ta, tb) == (GEOM_SPHERE, GEOM_CAPSULE):
            ra = ga.size[0]
            rb, hl = gb.size
            axis = Q.rotate(qb, jnp.array([0.0, 0, 1.0]))
            t = jnp.clip(jnp.dot(pa - pb, axis), -hl, hl)
            closest = pb + axis * t
            d = closest - pa
            dist = jnp.linalg.norm(d) + 1e-9
            n = d / dist
            depth = ra + rb - dist
            cp = pa + n * (ra - depth * 0.5)
        elif (ta, tb) == (GEOM_SPHERE, GEOM_CYLINDER):
            # flat disk (tray): closest point in cylinder frame
            ra = ga.size[0]
            R_cyl, hw = gb.size
            local = Q.rotate_inv(qb, pa - pb)
            r_xy = jnp.linalg.norm(local[:2]) + 1e-9
            clamped_xy = local[:2] * jnp.minimum(R_cyl / r_xy, 1.0)
            clamped_z = jnp.clip(local[2], -hw, hw)
            closest = jnp.concatenate([clamped_xy, clamped_z[None]])
            d_out = local - closest
            dist_out = jnp.linalg.norm(d_out) + 1e-9
            inside = (r_xy < R_cyl) & (jnp.abs(local[2]) < hw)
            # inside: push toward nearest of the two faces / wall
            face_gap = hw - jnp.abs(local[2])
            wall_gap = R_cyl - r_xy
            n_face = jnp.concatenate([jnp.zeros(2), jnp.sign(local[2])[None]])
            n_wall = jnp.concatenate([local[:2] / r_xy, jnp.zeros(1)])
            n_in = jnp.where(face_gap < wall_gap, n_face, n_wall)
            out_local = jnp.where(inside, n_in, d_out / dist_out)
            depth = jnp.where(inside, ra + jnp.minimum(face_gap, wall_gap),
                              ra - dist_out)
            n = -Q.rotate(qb, out_local)
            cp = pa + n * ra
        else:  # (GEOM_SPHERE, GEOM_BOX)
            ra = ga.size[0]
            half = jnp.asarray(gb.size)
            # sphere center in box frame
            local = Q.rotate_inv(qb, pa - pb)
            clamped = jnp.clip(local, -half, half)
            inside = jnp.all(jnp.abs(local) < half)
            # outside: closest point on surface; inside: push toward the
            # nearest face
            d_out = local - clamped           # surface point -> center (outward)
            dist_out = jnp.linalg.norm(d_out) + 1e-9
            face_gap = half - jnp.abs(local)
            k = jnp.argmin(face_gap)
            # outward push direction on the sphere, in box frame
            out_local = jnp.where(inside, jnp.sign(local) * jax_one_hot(k, 3),
                                  d_out / dist_out)
            depth = jnp.where(inside, ra + face_gap[k], ra - dist_out)
            n = -Q.rotate(qb, out_local)      # from sphere(a) toward box(b)
            cp = pa + n * ra                   # sphere surface point
        forces.append((ba, bb, cp, n, depth))

    # accumulate via one-hot matmuls (static matrices, no scatter)
    rows_a = np.zeros((nb, len(forces)), np.float32)
    rows_b = np.zeros((nb, len(forces)), np.float32)
    # active-contact count per body (this kernel's pairs): the stability
    # budget is shared by all springs acting on a body (see ops/contact.py)
    rows_all = np.zeros((nb, len(forces)), np.float32)
    for k_i, (ba, bb, cp, n, depth) in enumerate(forces):
        rows_all[ba, k_i] = 1.0
        rows_all[bb, k_i] = 1.0
    act_flags = jnp.stack([(d > 0).astype(jnp.float32)
                           for (_, _, _, _, d) in forces])
    n_active_body = jnp.asarray(rows_all) @ act_flags       # (nb,)
    fcols, tacols, tbcols = [], [], []
    for k_i, (ba, bb, cp, n, depth) in enumerate(forces):
        def eff_mass(b, cp, n_hat):
            m_lin = params.body_mass[b]
            I_min = jnp.min(jnp.diag(params.body_inertia[b]))
            r = cp - frames.pos[b]
            r_perp2 = jnp.sum(jnp.cross(r, n_hat) ** 2)
            m_rot = I_min / (r_perp2 + 1e-6)
            return jnp.minimum(m_lin, jnp.where(r_perp2 < 1e-6, m_lin, m_rot))

        m_a = eff_mass(ba, cp, n) / jnp.maximum(n_active_body[ba], 1.0)
        m_b = eff_mass(bb, cp, n) / jnp.maximum(n_active_body[bb], 1.0)
        m_red = m_a * m_b / (m_a + m_b)
        kn = jnp.minimum(stiffness, 0.25 * m_red / dt**2)
        kd = jnp.minimum(damping, 0.5 * m_red / dt)
        va = frames.vel[ba] + jnp.cross(frames.omega[ba], cp - frames.pos[ba])
        vb = frames.vel[bb] + jnp.cross(frames.omega[bb], cp - frames.pos[bb])
        vrel = vb - va
        vn = jnp.dot(vrel, n)
        fn = jnp.maximum(kn * depth - kd * vn, 0.0) * (depth > 0)
        # max_depenetration_velocity cap (see ops/contact.py), gated on
        # SEPARATION (vn > 0): don't launch deeply-embedded bodies at the
        # spring's full restitution speed, but leave static (resting /
        # approaching) contacts free to bear load — an ungated cap limits
        # the static squeeze force to m*v_dep/h and grips fail
        cap = jnp.where(vn > 0.0,
                        m_red * jnp.maximum(max_depenetration_velocity - vn, 0.0) / dt,
                        jnp.inf)
        fn = jnp.clip(fn, 0.0, cap)
        vt = vrel - vn * n
        mu = jnp.sqrt(params.geom_friction[forces_geom_a(pairs, k_i)]
                      * params.geom_friction[forces_geom_b(pairs, k_i)])
        # STICTION via predicted slip: friction opposes the relative
        # tangential velocity the pair would have at the END of the substep
        # (current slip + this substep's gravity kick on the free side),
        # with the impulse capped at what stops that slip. A gripped body at
        # rest gets exactly the gravity-cancelling force while inside the
        # friction cone — true static hold, which pure velocity
        # -proportional (regularized Coulomb) friction cannot provide: it
        # lets grasped objects creep out of any grip at
        # v = load/(mu*fn) * friction_vel.
        g_vec = params.gravity
        g_t = g_vec - jnp.dot(g_vec, n) * n
        # gravity kicks vrel = vb - va only through the FREE (floating
        # -root) side; a fixed-base driven arm holds its position
        free = _free_body_flags(model)
        kick = float(free[bb] - free[ba])
        vt_pred = vt + dt * g_t * kick
        vtp_norm = jnp.linalg.norm(vt_pred) + 1e-9
        m_stick = (params.body_mass[ba] * params.body_mass[bb]
                   / (params.body_mass[ba] + params.body_mass[bb]))
        # impulse budget: reduced mass for stopping SLIP, plus the free
        # body's full weight share for carrying the static load (the
        # reduced mass alone under-caps gravity compensation and grasped
        # objects sag out of the grip)
        if kick != 0.0:
            loaded = bb if kick > 0 else ba
            w_grav = params.body_mass[loaded] * jnp.linalg.norm(g_t) \
                / jnp.maximum(n_active_body[loaded], 1.0)
        else:
            w_grav = 0.0
        ft_mag = jnp.minimum(mu * fn, m_stick * jnp.linalg.norm(vt) / dt + w_grav)
        # friction on b OPPOSES b's predicted relative slip
        ft = -ft_mag * (vt_pred / vtp_norm) * (depth > 0)
        f_on_b = fn * n + ft                 # force pushing b away from a
        rows_a[ba, k_i] = 1.0
        rows_b[bb, k_i] = 1.0
        fcols.append(-f_on_b)                # reaction on a
        tacols.append(jnp.cross(cp - frames.pos[ba], -f_on_b))
        tbcols.append(jnp.cross(cp - frames.pos[bb], f_on_b))

    F_a = jnp.stack(fcols)        # (P, 3) on a
    T_a = jnp.stack(tacols)
    T_b = jnp.stack(tbcols)
    A = jnp.asarray(rows_a)
    Bm = jnp.asarray(rows_b)
    f_ext = jnp.concatenate([A @ T_a + Bm @ T_b,
                             A @ F_a + Bm @ (-F_a)], axis=-1)
    return f_ext


def forces_geom_a(pairs, k):
    return pairs[k][0]


def forces_geom_b(pairs, k):
    return pairs[k][1]


def jax_one_hot(k, n):
    return (jnp.arange(n) == k).astype(jnp.float32)
