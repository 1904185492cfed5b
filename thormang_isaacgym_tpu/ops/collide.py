"""Actor-vs-actor narrowphase collision (lockstep, static candidate lists)
with an IMPLICIT normal solve.

TPU-native replacement for PhysX inter-actor contact generation + TGS solve
(spec: the reference's multi-actor scenes — ball on tray
`tasks/ball_balance.py`, cube grasp/stack `tasks/franka_cube_stack.py:560-600`,
object in hand `tasks/shadow_hand.py`, table between robots `tasks/MA_OP3.py`).
Pairs are enumerated at trace time between geoms of DIFFERENT actors
(self-collision within an actor is off, matching IsaacGym's default
filtering); every candidate is evaluated unconditionally and masked by
penetration — no broadphase, no divergence, the right trade at
IsaacGym-style geom counts.

Narrowphase (static candidate counts per pair):
  sphere  vs sphere/capsule/box/cylinder  -> 1 point
  capsule vs capsule                      -> 1 point (segment-segment)
  box     vs capsule                      -> 4 points (spheres at the two
            endpoints, the axis midpoint, and the closest axis point found
            by ternary search — the latter masked off when it coincides
            with an endpoint, which would double-count stiffness)
  box     vs box                          -> 16 points (8 vertices each way)

Contact model — backward-Euler IMPLICIT normal, the same mechanism that
makes the joint drives unconditionally stable at PhysX-grade gains:
  f_n(t+h) = kn*depth(t) - (h*kn + kd) * vn(t+h)
The explicit part kn*depth enters as an external force; the velocity-
proportional reaction enters the articulated-body solve as a rank-1 ADDED
INERTIA  dIA = h*(h*kn + kd) * u u^T  (u = [r x n; n] in the link frame)
on each contacted body, so arbitrary contact stiffness cannot blow up —
which is what lets a position-driven gripper (implicit drive, Kp 1e6) be
STOPPED by a 0.1 kg object instead of crushing through the old explicitly-
clamped penalty spring. Friction is an implicit regularized-Coulomb damper
(coefficient mu*fn/max(|vt|, friction_vel), cone-bounded) whose velocity
reaction also joins the added inertia along the two tangent directions —
true stiction that cannot reverse the slip velocity at any stiffness.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from thormang_isaacgym_tpu.core import quat as Q
from thormang_isaacgym_tpu.models.robot import (
    GEOM_BOX, GEOM_CAPSULE, GEOM_CYLINDER, GEOM_SPHERE, ModelParams, RobotModel,
)
from thormang_isaacgym_tpu.ops.kinematics import BodyFrames

# geom-type pairs handled by a single-candidate sphere-style kernel
_SPHERE_FIRST = {
    (GEOM_SPHERE, GEOM_SPHERE), (GEOM_SPHERE, GEOM_CAPSULE),
    (GEOM_SPHERE, GEOM_BOX), (GEOM_SPHERE, GEOM_CYLINDER),
}


def _pairs(model: RobotModel):
    """Static geom-pair list: (geom_a, geom_b, kind)."""
    actors = model.actors
    out = []
    for i, g1 in enumerate(model.geoms):
        for jj, g2 in enumerate(model.geoms):
            if jj <= i:
                continue
            if actors[g1.body] == actors[g2.body]:
                continue
            t1, t2 = g1.gtype, g2.gtype
            if (t1, t2) in _SPHERE_FIRST:
                out.append((i, jj, "sphere"))
            elif (t2, t1) in _SPHERE_FIRST:
                out.append((jj, i, "sphere"))
            elif (t1, t2) == (GEOM_CAPSULE, GEOM_CAPSULE):
                out.append((i, jj, "capcap"))
            elif t1 == GEOM_BOX and t2 == GEOM_CAPSULE:
                out.append((jj, i, "capbox"))   # capsule first
            elif t1 == GEOM_CAPSULE and t2 == GEOM_BOX:
                out.append((i, jj, "capbox"))
            elif (t1, t2) == (GEOM_BOX, GEOM_BOX):
                out.append((i, jj, "boxbox"))
    return out


def has_pairs(model: RobotModel) -> bool:
    return len(_pairs(model)) > 0


def _sphere_box_point(center, r, box_pos, box_quat, half):
    """Sphere(center, r) vs box -> (n a->b, depth, contact point)."""
    local = Q.rotate_inv(box_quat, center - box_pos)
    clamped = jnp.clip(local, -half, half)
    inside = jnp.all(jnp.abs(local) < half)
    d_out = local - clamped
    dist_out = jnp.linalg.norm(d_out) + 1e-9
    face_gap = half - jnp.abs(local)
    k = jnp.argmin(face_gap)
    onehot = (jnp.arange(3) == k).astype(jnp.float32)
    out_local = jnp.where(inside, jnp.sign(local) * onehot, d_out / dist_out)
    depth = jnp.where(inside, r + face_gap[k], r - dist_out)
    n = -Q.rotate(box_quat, out_local)       # from sphere(a) toward box(b)
    cp = center + n * r
    return n, depth, cp


def _candidates(model: RobotModel, frames: BodyFrames):
    """All contact candidates for this env.

    Returns a python list of (geom_a, geom_b, body_a, body_b, n, depth, cp)
    with n the unit normal from a to b, cp the contact point (world).
    """
    pairs = _pairs(model)
    if not pairs:
        return []
    gpos = np.array([g.pos for g in model.geoms], np.float32).reshape(-1, 3)
    gquat = np.array([g.quat for g in model.geoms], np.float32).reshape(-1, 4)

    def gpose(i):
        b = model.geoms[i].body
        qw = Q.mul(frames.quat[b], jnp.asarray(gquat[i]))
        pw = frames.pos[b] + Q.rotate(frames.quat[b], jnp.asarray(gpos[i]))
        return pw, qw

    out = []
    for (ia, ib, kind) in pairs:
        ga, gb = model.geoms[ia], model.geoms[ib]
        ba, bb = ga.body, gb.body
        pa, qa = gpose(ia)
        pb, qb = gpose(ib)
        if kind == "sphere":
            ta, tb = ga.gtype, gb.gtype
            ra = ga.size[0]
            if tb == GEOM_SPHERE:
                rb = gb.size[0]
                d = pb - pa
                dist = jnp.linalg.norm(d) + 1e-9
                n = d / dist
                depth = ra + rb - dist
                cp = pa + n * (ra - depth * 0.5)
            elif tb == GEOM_CAPSULE:
                rb, hl = gb.size
                axis = Q.rotate(qb, jnp.array([0.0, 0, 1.0]))
                t = jnp.clip(jnp.dot(pa - pb, axis), -hl, hl)
                closest = pb + axis * t
                d = closest - pa
                dist = jnp.linalg.norm(d) + 1e-9
                n = d / dist
                depth = ra + rb - dist
                cp = pa + n * (ra - depth * 0.5)
            elif tb == GEOM_CYLINDER:
                # flat disk (tray): closest point in cylinder frame
                R_cyl, hw = gb.size
                local = Q.rotate_inv(qb, pa - pb)
                r_xy = jnp.linalg.norm(local[:2]) + 1e-9
                clamped_xy = local[:2] * jnp.minimum(R_cyl / r_xy, 1.0)
                clamped_z = jnp.clip(local[2], -hw, hw)
                closest = jnp.concatenate([clamped_xy, clamped_z[None]])
                d_out = local - closest
                dist_out = jnp.linalg.norm(d_out) + 1e-9
                inside = (r_xy < R_cyl) & (jnp.abs(local[2]) < hw)
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
            else:  # box
                half = jnp.asarray(gb.size)
                n, depth, cp = _sphere_box_point(pa, ra, pb, qb, half)
            out.append((ia, ib, ba, bb, n, depth, cp))
        elif kind == "capcap":
            r1, h1 = ga.size
            r2, h2 = gb.size
            a1 = Q.rotate(qa, jnp.array([0.0, 0, 1.0]))
            a2 = Q.rotate(qb, jnp.array([0.0, 0, 1.0]))
            P1, Q1 = pa - a1 * h1, pa + a1 * h1
            P2, Q2 = pb - a2 * h2, pb + a2 * h2
            d1, d2 = Q1 - P1, Q2 - P2
            r0 = P1 - P2
            a_ = jnp.dot(d1, d1) + 1e-9
            e_ = jnp.dot(d2, d2) + 1e-9
            b_ = jnp.dot(d1, d2)
            c_ = jnp.dot(d1, r0)
            f_ = jnp.dot(d2, r0)
            denom = a_ * e_ - b_ * b_
            s = jnp.where(jnp.abs(denom) > 1e-9,
                          jnp.clip((b_ * f_ - c_ * e_) / jnp.where(
                              jnp.abs(denom) > 1e-9, denom, 1.0), 0.0, 1.0),
                          0.0)
            t = jnp.clip((b_ * s + f_) / e_, 0.0, 1.0)
            s = jnp.clip((b_ * t - c_) / a_, 0.0, 1.0)
            c1 = P1 + d1 * s
            c2 = P2 + d2 * t
            d = c2 - c1
            dist = jnp.linalg.norm(d) + 1e-9
            n = d / dist
            depth = r1 + r2 - dist
            cp = c1 + n * (r1 - depth * 0.5)
            out.append((ia, ib, ba, bb, n, depth, cp))
        elif kind == "capbox":
            # capsule (a) vs box (b): sphere tests at the two endpoints plus
            # the TRUE closest point of the axis segment to the box, found by
            # branch-free ternary search (distance from a point to a convex
            # set is convex along a line, so the 1-D minimization is exact).
            # Fixed-grid sampling is NOT enough: a 1.8 cm gripper pad closing
            # on a 16 cm handle bar tunnels straight through unless a sample
            # lands within the pad footprint.
            r1, h1 = ga.size
            half = jnp.asarray(gb.size)
            axis = Q.rotate(qa, jnp.array([0.0, 0, 1.0]))
            p0 = Q.rotate_inv(qb, (pa - axis * h1) - pb)
            p1 = Q.rotate_inv(qb, (pa + axis * h1) - pb)

            def _seg_dist(t):
                p = p0 + (p1 - p0) * t
                return jnp.linalg.norm(p - jnp.clip(p, -half, half))

            lo = jnp.float32(0.0)
            hi = jnp.float32(1.0)
            for _ in range(18):
                m1 = lo + (hi - lo) * (1.0 / 3.0)
                m2 = hi - (hi - lo) * (1.0 / 3.0)
                left = _seg_dist(m1) < _seg_dist(m2)
                lo = jnp.where(left, lo, m1)
                hi = jnp.where(left, m2, hi)
            t_opt = 0.5 * (lo + hi)
            # mask the t_opt sample when it converges onto an endpoint (the
            # common fingertip-on-face case): two coincident active spheres
            # would double the effective normal stiffness at that point.
            eps = 0.02
            interior = ((t_opt > eps) & (t_opt < 1.0 - eps)
                        & (jnp.abs(t_opt - 0.5) > eps)).astype(jnp.float32)
            # midpoint sample guards the axis-through-box case where
            # _seg_dist is zero on an interval and the ternary search lands
            # on the zero-set edge (depth ~r instead of deepest penetration)
            for tpar, msk in ((jnp.float32(0.0), None), (t_opt, interior),
                              (jnp.float32(0.5), None), (jnp.float32(1.0), None)):
                center = pa + axis * (h1 * (2.0 * tpar - 1.0))
                n, depth, cp = _sphere_box_point(center, r1, pb, qb, half)
                if msk is not None:
                    depth = jnp.where(msk > 0, depth, -1.0)
                out.append((ia, ib, ba, bb, n, depth, cp))
        elif kind == "boxbox":
            out.extend(_box_box_candidates(
                ia, ib, ba, bb, pa, qa, jnp.asarray(np.array(ga.size, np.float32)),
                pb, qb, jnp.asarray(np.array(gb.size, np.float32))))
    return out


def _box_box_candidates(ia, ib, ba, bb, pa, qa, half_a, pb, qb, half_b):
    """Box-box manifold: 16 vertex contacts sharing the PAIR-LEVEL SAT face
    normal + 1 edge-cross contact.

    The normal is the minimum-overlap FACE axis of the pair, not a
    per-vertex argmin: per-vertex face selection flips the normal when a
    vertex nears an edge of the other box (e.g. a gripper pad's top vertex
    reaching a sagging cube's top face turned a +-y pinch grip into a
    downward push that ejected the cube). One shared axis keeps the whole
    manifold consistent — the reference behavior is PhysX's reference-face
    contact gen (`franka_cube_stack.py:560-600` grasp physics)."""
    Ra = Q.to_matrix(qa)
    Rb = Q.to_matrix(qb)
    A_axes = Ra.T                         # rows = world directions of A's axes
    B_axes = Rb.T
    d = pb - pa

    def h_of(axes, half, L):
        return jnp.abs(axes @ L) @ half if L.ndim == 1 else None

    # 6 face axes: min-overlap axis shared by every vertex contact
    axes6 = jnp.concatenate([A_axes, B_axes])            # (6,3)
    hA6 = jnp.abs(axes6 @ A_axes.T) @ half_a             # (6,)
    hB6 = jnp.abs(axes6 @ B_axes.T) @ half_b
    overlap6 = hA6 + hB6 - jnp.abs(axes6 @ d)
    kf = jnp.argmin(overlap6)
    n_raw = axes6[kf]
    n = n_raw * jnp.sign(jnp.dot(n_raw, d) + 1e-12)      # a -> b
    hB_n = jnp.abs(B_axes @ n) @ half_b
    hA_n = jnp.abs(A_axes @ n) @ half_a

    out = []
    corners = [(sx, sy, sz) for sx in (-1, 1) for sy in (-1, 1)
               for sz in (-1, 1)]
    for (sx, sy, sz) in corners:
        # vertex of A inside B: depth = distance past B's near face along n
        vtx = jnp.asarray([sx, sy, sz]) * half_a
        pv = pa + Q.rotate(qa, vtx)
        local = Q.rotate_inv(qb, pv - pb)
        inside = jnp.all(half_b - jnp.abs(local) > 0)
        depth = jnp.where(inside, jnp.dot(pv - pb, n) + hB_n, -1.0)
        out.append((ia, ib, ba, bb, n, depth, pv))
    for (sx, sy, sz) in corners:
        # vertex of B inside A: depth = distance short of A's far face
        vtx = jnp.asarray([sx, sy, sz]) * half_b
        pv = pb + Q.rotate(qb, vtx)
        local = Q.rotate_inv(qa, pv - pa)
        inside = jnp.all(half_a - jnp.abs(local) > 0)
        depth = jnp.where(inside, hA_n - jnp.dot(pv - pa, n), -1.0)
        out.append((ia, ib, ba, bb, n, depth, pv))
    # SAT edge-edge term: boxes meeting edge-to-edge (nut-on-bolt,
    # cube-corner stacking — the Factory workloads) produce no
    # vertex-in-face contact until a vertex penetrates; the minimum-overlap
    # edge-cross axis supplies the missing point (active only when the
    # boxes overlap on ALL 15 axes and an edge axis beats every face axis).
    out.append(_box_box_edge_candidate(ia, ib, ba, bb, pa, qa, half_a,
                                       pb, qb, half_b))
    return out


def _box_box_edge_candidate(ia, ib, ba, bb, pa, qa, half_a, pb, qb, half_b):
    """Single deepest edge-cross SAT contact for a box-box pair.

    Returns (ia, ib, ba, bb, n (a->b), depth, cp) with depth < 0 when no
    edge-type contact applies."""
    Ra = Q.to_matrix(qa)                  # columns = A's axes in world
    Rb = Q.to_matrix(qb)
    d = pb - pa
    A_axes = Ra.T                         # (3,3) rows = world axes of A
    B_axes = Rb.T
    # 9 cross axes a_i x b_j
    cross = jnp.cross(A_axes[:, None, :], B_axes[None, :, :])  # (3,3,3)
    cross = cross.reshape(9, 3)
    norm = jnp.linalg.norm(cross, axis=-1)
    degenerate = norm < 1e-6              # parallel edges
    L = cross / jnp.maximum(norm, 1e-6)[:, None]
    proj_a = jnp.abs(L @ A_axes.T) @ half_a          # (9,)
    proj_b = jnp.abs(L @ B_axes.T) @ half_b
    sep = jnp.abs(L @ d)
    overlap_e = jnp.where(degenerate, jnp.inf, proj_a + proj_b - sep)  # (9,)
    # 6 face axes overlap (for the all-axes-overlap test + face priority)
    def face_overlap(axes):
        pa_ = jnp.abs(axes @ A_axes.T) @ half_a
        pb_ = jnp.abs(axes @ B_axes.T) @ half_b
        return pa_ + pb_ - jnp.abs(axes @ d)
    overlap_f = jnp.concatenate([face_overlap(A_axes), face_overlap(B_axes)])
    all_overlap = jnp.all(overlap_e > 0) & jnp.all(overlap_f > 0)
    k = jnp.argmin(overlap_e)
    depth = overlap_e[k]
    n = L[k] * jnp.sign(jnp.dot(L[k], d))            # a -> b
    active = all_overlap & (depth < jnp.min(overlap_f) * 0.99)
    # support edges: edge of A parallel to a_i most along +n, edge of B
    # parallel to b_j most along -n
    i_, j_ = k // 3, k % 3
    sa = jnp.sign(A_axes @ n)
    sb = jnp.sign(B_axes @ n)
    onehot_i = (jnp.arange(3) == i_).astype(jnp.float32)
    onehot_j = (jnp.arange(3) == j_).astype(jnp.float32)
    ca = pa + ((1.0 - onehot_i) * sa * half_a) @ A_axes
    cb = pb - ((1.0 - onehot_j) * sb * half_b) @ B_axes
    ea = A_axes[i_]                                   # edge directions
    eb = B_axes[j_]
    # closest points of the two edge LINES: ca + s ea, cb + t eb
    r0 = cb - ca
    b_ = jnp.dot(ea, eb)
    denom = jnp.maximum(1.0 - b_ * b_, 1e-6)
    s = (jnp.dot(ea, r0) - b_ * jnp.dot(eb, r0)) / denom
    t = (b_ * jnp.dot(ea, r0) - jnp.dot(eb, r0)) / denom
    ha_k = jnp.sum(onehot_i * half_a)
    hb_k = jnp.sum(onehot_j * half_b)
    s = jnp.clip(s, -ha_k, ha_k)
    t = jnp.clip(t, -hb_k, hb_k)
    cp = 0.5 * (ca + s * ea + cb + t * eb)
    depth = jnp.where(active, depth, -1.0)
    return (ia, ib, ba, bb, n, depth, cp)


def pairwise_contact_forces(model: RobotModel, params: ModelParams,
                            frames: BodyFrames, *, stiffness: float,
                            damping: float, friction_vel: float,
                            dt: float,
                            max_depenetration_velocity: float = 2.0):
    """Actor-actor contact for one env (caller vmaps).

    Returns (f_ext_w (nb, 6), dIA (nb, 6, 6), net (nb, 3)):
    - f_ext_w: world-frame [torque, force] — the EXPLICIT part
      (kn*depth normal + friction).
    - dIA: per-body added inertia in the LINK frame — the IMPLICIT
      velocity reaction h*(h*kn + kd) u u^T per contact; feed to
      `aba(extra_body_inertia=...)`.
    - net: per-body world contact force (sensor view).
    """
    nb = model.nb
    cands = _candidates(model, frames)
    if not cands:
        z6 = jnp.zeros((nb, 6))
        return z6, jnp.zeros((nb, 6, 6)), jnp.zeros((nb, 3))

    h = dt
    kn_cfg = float(stiffness)
    kd_cfg = float(damping)

    rows_a = np.zeros((nb, len(cands)), np.float32)
    rows_b = np.zeros((nb, len(cands)), np.float32)
    fcols, tacols, tbcols = [], [], []
    # implicit-damper terms, link frame: per contact, per touched body —
    # one NORMAL rank-1 column (weight M_n - M_t) + one isotropic G term
    # (lever arm r, weight M_t); tangent damping IS the stiction
    un_cols, un_w, g_r, g_w = [], [], [], []
    u_body_rows = np.zeros((nb, 2 * len(cands)), np.float32)

    for k_i, (ia, ib, ba, bb, n, depth, cp) in enumerate(cands):
        active = depth > 0
        va = frames.vel[ba] + jnp.cross(frames.omega[ba], cp - frames.pos[ba])
        vb = frames.vel[bb] + jnp.cross(frames.omega[bb], cp - frames.pos[bb])
        vrel = vb - va
        vn = jnp.dot(vrel, n)

        # backward-Euler normal force, split in two pieces:
        #   f(t+h) = kn*depth(t) - D*vn(t)  -  D*(vn(t+h) - vn(t)),
        #   D = h*kn + kd.
        # The first piece (current-velocity evaluation) is applied as an
        # explicit external force here; the delta-velocity piece is solved
        # exactly inside the ABA via the h*D u u^T added inertia below.
        m_a = params.body_mass[ba]
        m_b = params.body_mass[bb]
        m_red = m_a * m_b / (m_a + m_b)
        # the SPRING term is explicit, so it carries the explicit-Euler
        # stability bound kn <= 0.25 m/h^2 for the pair's reduced mass —
        # same clamp as the ground kernel. Without it a 30 g nut pinched
        # between kn=1e5 gripper pads (250x the bound) chatters at ~100 N
        # and vibratory friction drops the grip (the factory lift bug).
        # The velocity terms (D_imp) stay implicit — stable unclamped.
        kn_eff = jnp.minimum(kn_cfg, 0.25 * m_red / (h * h))
        D_imp = h * kn_cfg + kd_cfg
        # PhysX max_depenetration_velocity: bound the position-correction
        # (spring) term so the steady-state separation velocity under the
        # implicit damper, kn*depth / D, cannot exceed max_dep — a deeply
        # embedded contact (e.g. an 87 Nm arm pressing a cube into a pad)
        # exits at <= max_dep instead of storing unbounded spring energy
        # and launching the object on release.
        spring = jnp.minimum(kn_eff * depth,
                             D_imp * max_depenetration_velocity)
        fn = jnp.maximum(spring - D_imp * vn, 0.0) * active
        # extra impulse guard while separating
        cap = jnp.where(
            vn > 0.0,
            m_red * jnp.maximum(max_depenetration_velocity - vn, 0.0) / h
            + D_imp * max_depenetration_velocity,
            jnp.inf)
        fn_exp = jnp.minimum(fn, cap)

        # ---- friction: IMPLICIT regularized Coulomb (true stiction) ----
        # A viscous damper with Coulomb-cone-bounded coefficient
        #   c_t = mu*fn / max(|vt|, friction_vel)
        # so the realized force is exactly mu*fn when slipping and a very
        # stiff tangential damper (slope mu*fn/friction_vel) in the stick
        # zone. The explicit part -c_t*vt(t) is bounded by mu*fn by
        # construction; the reaction to the NEW velocity joins the ABA as
        # tangent-direction added inertia below, so the stiff stick damper
        # cannot reverse the velocity (the classic explicit-friction
        # instability) no matter the load — a gripper holds its payload at
        # creep velocity ~ friction_vel * m g / (mu fn) instead of slipping
        # through a per-step force cap.
        vt = vrel - vn * n
        vt_norm = jnp.linalg.norm(vt)
        mu = jnp.sqrt(params.geom_friction[ia] * params.geom_friction[ib])
        c_t = mu * fn_exp / jnp.maximum(vt_norm, friction_vel)
        ft = -c_t * vt * active

        f_on_b = fn_exp * n + ft
        rows_a[ba, k_i] = 1.0
        rows_b[bb, k_i] = 1.0
        fcols.append(-f_on_b)
        tacols.append(jnp.cross(cp - frames.pos[ba], -f_on_b))
        tbcols.append(jnp.cross(cp - frames.pos[bb], f_on_b))

        # ---- implicit velocity reaction as added inertia ----
        # gate: active and not separating fast (no suction on breakaway)
        gate = (active & (vn < 0.5 * max_depenetration_velocity)).astype(jnp.float32)
        M_add_n = h * D_imp * gate
        M_add_t = h * c_t * active.astype(jnp.float32)
        # tangent damping is isotropic in the contact tangent plane, so
        # instead of building an explicit (t1, t2) basis the tangent sum
        # collapses via sum_k u(e_k) u(e_k)^T = U U^T with U = [skew(r); I]:
        # dIA = (M_n - M_t) u(n) u(n)^T + M_t U U^T  (same matrix, ~3x
        # fewer terms; mirrored in the fused kernel's _symI_G_add)
        for body in (ba, bb):
            r_l = Q.rotate_inv(frames.quat[body], cp - frames.pos[body])
            n_l = Q.rotate_inv(frames.quat[body], n)
            u = jnp.concatenate([jnp.cross(r_l, n_l), n_l])
            un_cols.append(u)
            un_w.append(M_add_n - M_add_t)
            g_r.append(r_l)
            g_w.append(M_add_t)
            u_body_rows[body, len(un_cols) - 1] = 1.0

    F_a = jnp.stack(fcols)
    T_a = jnp.stack(tacols)
    T_b = jnp.stack(tbcols)
    A = jnp.asarray(rows_a)
    Bm = jnp.asarray(rows_b)
    f_ext = jnp.concatenate([A @ T_a + Bm @ T_b,
                             A @ F_a + Bm @ (-F_a)], axis=-1)
    # net contact force per body: force ON each body from pair contacts
    # (F_a is the reaction on a; force on b is -F_a)
    net = A @ F_a + Bm @ (-F_a)

    # dIA: per column, (M_n - M_t) u u^T + M_t [[|r|^2 I - r r^T, skew(r)],
    #                                           [skew(r)^T,       I     ]]
    U = jnp.stack(un_cols)                      # (2P, 6)
    w_n = jnp.stack(un_w)                       # (2P,)
    r = jnp.stack(g_r)                          # (2P, 3)
    w_t = jnp.stack(g_w)                        # (2P,)
    sel = jnp.asarray(u_body_rows)              # (nb, 2P)
    outer = (w_n[:, None, None] * U[:, :, None]) * U[:, None, :]
    eye3 = jnp.eye(3)
    rr = jnp.sum(r * r, axis=-1)                # (2P,)
    A = rr[:, None, None] * eye3 - r[:, :, None] * r[:, None, :]
    sk = jnp.zeros((r.shape[0], 3, 3))
    sk = sk.at[:, 0, 1].set(-r[:, 2]).at[:, 0, 2].set(r[:, 1]) \
           .at[:, 1, 0].set(r[:, 2]).at[:, 1, 2].set(-r[:, 0]) \
           .at[:, 2, 0].set(-r[:, 1]).at[:, 2, 1].set(r[:, 0])
    G = jnp.concatenate([
        jnp.concatenate([A, sk], axis=-1),
        jnp.concatenate([jnp.swapaxes(sk, -1, -2),
                         jnp.broadcast_to(eye3, A.shape)], axis=-1),
    ], axis=-2)                                 # (2P, 6, 6)
    outer = outer + w_t[:, None, None] * G
    dIA = jnp.einsum("bp,pij->bij", sel, outer)
    return f_ext, dIA, net
