"""Fused physics step: ONE Pallas TPU kernel for the whole substep loop.

Round-1 profiling showed the XLA-op physics path is per-op-overhead bound:
one substep of the 40-body scooter at 4096 envs = ~1500 small HLO ops on
(4096, k, 6, 6)-shaped data = ~25 ms (~16 us/op dispatch + tile-padding
waste: a 6x6 matrix occupies 36/1024 lanes of a f32 (8,128) tile).

This kernel inverts the layout: the ENV axis lives in the vector lanes and
every per-env scalar is one (S, 128) "sheet" (S*128 envs per grid step, a
full vreg when S=8). All quaternion / spatial-algebra math on 3-vectors,
quats and symmetric 6x6 inertias becomes straight-line elementwise VPU code
over sheets. The articulated-tree topology is STATIC, so the three ABA
sweeps unroll at trace time with exact parent indexing — no gathers, no
scatters, no one-hot matmuls. The full substep loop (drives -> FK ->
ground contact -> ABA -> semi-implicit Euler, x substeps) runs inside one
kernel as a `lax.fori_loop`, so the XLA graph for the whole physics step is
a single pallas_call.

Numerics match `ops.sim._substep` (the reference semantics both implement:
PhysX-style implicit joint drives + penalty contact, spec
`/root/reference/isaacgymenvs/cfg/task/Gogoro.yaml:9-31`); see
tests/test_fused.py for the cross-check.

Eligibility (v1): single- or multi-root tree models with plane ground
contact (optionally at constant height), no actor-pair collision, no
attractors. `ops.sim.build_step_fn` falls back to the XLA path otherwise.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from thormang_isaacgym_tpu.models.robot import (
    GEOM_BOX, GEOM_CAPSULE, GEOM_CYLINDER, GEOM_SPHERE, PRISMATIC, REVOLUTE,
    ModelParams, RobotModel,
)

_LOCK_BIG = 1e12


# ===========================================================================
# sheet micro-math with trace-time constant folding.
#
# Every runtime value is a (S, 128) f32 array ("sheet"); STATIC model
# constants (joint axes, frame quats, offsets) stay python floats. The
# guarded ops below fold x*0 -> 0, x+0 -> x, x*1 -> x and float*float at
# trace time, so e.g. a unit joint axis or an identity frame quat erases
# 60-80% of the naive instruction count — critical for Mosaic compile time
# on a 40-body unrolled tree.
# ===========================================================================

def _isf(x):
    return isinstance(x, (int, float))


def _is0(x):
    return _isf(x) and x == 0.0


def _mul(a, b):
    if _is0(a) or _is0(b):
        return 0.0
    if _isf(a) and a == 1.0:
        return b
    if _isf(b) and b == 1.0:
        return a
    if _isf(a) and a == -1.0:
        return _neg(b)
    if _isf(b) and b == -1.0:
        return _neg(a)
    return a * b


def _add(a, b):
    if _is0(a):
        return b
    if _is0(b):
        return a
    return a + b


def _sub(a, b):
    if _is0(b):
        return a
    if _is0(a):
        return _neg(b)
    return a - b


def _neg(a):
    if _isf(a):
        return -a
    return -a


def _fma(acc, a, b):
    return _add(acc, _mul(a, b))


def _cross(a, b):
    return (_sub(_mul(a[1], b[2]), _mul(a[2], b[1])),
            _sub(_mul(a[2], b[0]), _mul(a[0], b[2])),
            _sub(_mul(a[0], b[1]), _mul(a[1], b[0])))


def _dot3(a, b):
    return _add(_add(_mul(a[0], b[0]), _mul(a[1], b[1])), _mul(a[2], b[2]))


def _vadd(a, b):
    return (_add(a[0], b[0]), _add(a[1], b[1]), _add(a[2], b[2]))


def _vsub(a, b):
    return (_sub(a[0], b[0]), _sub(a[1], b[1]), _sub(a[2], b[2]))


def _vscale(a, s):
    return (_mul(a[0], s), _mul(a[1], s), _mul(a[2], s))


def _qmul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return (
        _sub(_sub(_sub(_mul(aw, bw), _mul(ax, bx)), _mul(ay, by)), _mul(az, bz)),
        _sub(_add(_add(_mul(aw, bx), _mul(ax, bw)), _mul(ay, bz)), _mul(az, by)),
        _add(_add(_sub(_mul(aw, by), _mul(ax, bz)), _mul(ay, bw)), _mul(az, bx)),
        _add(_sub(_add(_mul(aw, bz), _mul(ax, by)), _mul(ay, bx)), _mul(az, bw)),
    )


def _qrot(q, v):
    """Rotate v by q (body->world): v + w*t + qv x t, t = 2 qv x v."""
    w = q[0]
    qv = (q[1], q[2], q[3])
    t = _vscale(_cross(qv, v), 2.0)
    return _vadd(_vadd(v, _vscale(t, w)), _cross(qv, t))


def _qrotinv(q, v):
    return _qrot((q[0], _neg(q[1]), _neg(q[2]), _neg(q[3])), v)


def _qtomat(q):
    """Quat -> 3x3 rotation (row-major 9-tuple, body->world)."""
    w, x, y, z = q
    xx, yy, zz = _mul(x, x), _mul(y, y), _mul(z, z)
    xy, xz, yz = _mul(x, y), _mul(x, z), _mul(y, z)
    wx, wy, wz = _mul(w, x), _mul(w, y), _mul(w, z)
    return (_sub(1.0, _mul(2.0, _add(yy, zz))),
            _mul(2.0, _sub(xy, wz)), _mul(2.0, _add(xz, wy)),
            _mul(2.0, _add(xy, wz)), _sub(1.0, _mul(2.0, _add(xx, zz))),
            _mul(2.0, _sub(yz, wx)),
            _mul(2.0, _sub(xz, wy)), _mul(2.0, _add(yz, wx)),
            _sub(1.0, _mul(2.0, _add(xx, yy))))


def _m3v(M, v):
    """3x3 (row-major 9) @ 3-vec."""
    return (_fma(_fma(_mul(M[0], v[0]), M[1], v[1]), M[2], v[2]),
            _fma(_fma(_mul(M[3], v[0]), M[4], v[1]), M[5], v[2]),
            _fma(_fma(_mul(M[6], v[0]), M[7], v[1]), M[8], v[2]))


def _m3Tv(M, v):
    return (_fma(_fma(_mul(M[0], v[0]), M[3], v[1]), M[6], v[2]),
            _fma(_fma(_mul(M[1], v[0]), M[4], v[1]), M[7], v[2]),
            _fma(_fma(_mul(M[2], v[0]), M[5], v[1]), M[8], v[2]))


def _mm(A, B):
    """3x3 @ 3x3, both row-major 9-tuples."""
    out = []
    for i in range(3):
        for j in range(3):
            out.append(_fma(_fma(_mul(A[3 * i], B[j]),
                                 A[3 * i + 1], B[3 + j]),
                            A[3 * i + 2], B[6 + j]))
    return tuple(out)


def _mmT(A, B):
    """A @ B^T."""
    out = []
    for i in range(3):
        for j in range(3):
            out.append(_fma(_fma(_mul(A[3 * i], B[3 * j]),
                                 A[3 * i + 1], B[3 * j + 1]),
                            A[3 * i + 2], B[3 * j + 2]))
    return tuple(out)


def _sym9(S):
    """Symmetric 6-tuple (xx,xy,xz,yy,yz,zz) -> row-major 9."""
    return (S[0], S[1], S[2], S[1], S[3], S[4], S[2], S[4], S[5])


def _sym_of(M):
    """Row-major 9 -> symmetric 6 (takes upper triangle)."""
    return (M[0], M[1], M[2], M[4], M[5], M[8])


def _skew_mm(p, R):
    """skew(p) @ R for 3-vec p, 3x3 R."""
    x, y, z = p
    return (_sub(_mul(y, R[6]), _mul(z, R[3])),
            _sub(_mul(y, R[7]), _mul(z, R[4])),
            _sub(_mul(y, R[8]), _mul(z, R[5])),
            _sub(_mul(z, R[0]), _mul(x, R[6])),
            _sub(_mul(z, R[1]), _mul(x, R[7])),
            _sub(_mul(z, R[2]), _mul(x, R[8])),
            _sub(_mul(x, R[3]), _mul(y, R[0])),
            _sub(_mul(x, R[4]), _mul(y, R[1])),
            _sub(_mul(x, R[5]), _mul(y, R[2])))


# --- symmetric 6x6 spatial inertia: I = [[A, B], [B^T, C]],
#     A/C symmetric (6-tuples), B full (9-tuple) -------------------------------

def _inertia_body(mass, com, Icom6):
    """Spatial inertia about the link origin from (m, com, I_com sym)."""
    cx, cy, cz = com
    c2 = _add(_add(_mul(cx, cx), _mul(cy, cy)), _mul(cz, cz))
    # A = I_com + m ((c.c) I - c c^T)
    A = (_add(Icom6[0], _mul(mass, _sub(c2, _mul(cx, cx)))),
         _sub(Icom6[1], _mul(mass, _mul(cx, cy))),
         _sub(Icom6[2], _mul(mass, _mul(cx, cz))),
         _add(Icom6[3], _mul(mass, _sub(c2, _mul(cy, cy)))),
         _sub(Icom6[4], _mul(mass, _mul(cy, cz))),
         _add(Icom6[5], _mul(mass, _sub(c2, _mul(cz, cz)))))
    # B = m skew(c)
    B = (0.0, _neg(_mul(mass, cz)), _mul(mass, cy),
         _mul(mass, cz), 0.0, _neg(_mul(mass, cx)),
         _neg(_mul(mass, cy)), _mul(mass, cx), 0.0)
    C = (mass, 0.0, 0.0, mass, 0.0, mass)  # sym storage of m*I
    return (A, B, C)


def _symI_mul(I, m6):
    """I @ motion (w, v) -> force (n, F)."""
    A, B, C = I
    w, v = m6[:3], m6[3:]
    n = _vadd(_m3v(_sym9(A), w), _m3v(B, v))
    F = _vadd(_m3Tv(B, w), _m3v(_sym9(C), v))
    return n + F


def _symI_add(I1, I2):
    return (tuple(_add(a, b) for a, b in zip(I1[0], I2[0])),
            tuple(_add(a, b) for a, b in zip(I1[1], I2[1])),
            tuple(_add(a, b) for a, b in zip(I1[2], I2[2])))


def _symI_rank1_sub(I, U, invD):
    """I - U U^T / D, U a 6-tuple (Ua, Ul)."""
    A, B, C = I
    Ua, Ul = U[:3], U[3:]
    A2 = tuple(_sub(A[k], _mul(_mul(Ua[i], Ua[j]), invD))
               for k, (i, j) in enumerate(
                   [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]))
    B2 = tuple(_sub(B[3 * i + j], _mul(_mul(Ua[i], Ul[j]), invD))
               for i in range(3) for j in range(3))
    C2 = tuple(_sub(C[k], _mul(_mul(Ul[i], Ul[j]), invD))
               for k, (i, j) in enumerate(
                   [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]))
    return (A2, B2, C2)


def _symI_to_parent(R, p, I):
    """Y I Y^T with Y = [[R, skew(p)R], [0, R]] (force transform child->parent)."""
    A, B, C = I
    PR = _skew_mm(p, R)
    A9, C9 = _sym9(A), _sym9(C)
    Bt = (B[0], B[3], B[6], B[1], B[4], B[7], B[2], B[5], B[8])
    M1 = tuple(_add(a, b) for a, b in zip(_mm(R, A9), _mm(PR, Bt)))
    M2 = tuple(_add(a, b) for a, b in zip(_mm(R, B), _mm(PR, C9)))
    A_new = _sym_of(tuple(_add(a, b) for a, b in zip(_mmT(M1, R), _mmT(M2, PR))))
    B_new = _mmT(M2, R)
    C_new = _sym_of(_mmT(_mm(R, C9), R))
    return (A_new, B_new, C_new)


def _motion_to_child(R, p, m6):
    """Motion vector parent->child coords."""
    w, v = m6[:3], m6[3:]
    v2 = _vsub(v, _cross(p, w))
    return _m3Tv(R, w) + _m3Tv(R, v2)


def _force_to_parent(R, p, f6):
    n, F = f6[:3], f6[3:]
    Fp = _m3v(R, F)
    return _vadd(_m3v(R, n), _cross(p, Fp)) + Fp


def _cross_motion(a, b):
    aw, av = a[:3], a[3:]
    bw, bv = b[:3], b[3:]
    return _cross(aw, bw) + _vadd(_cross(aw, bv), _cross(av, bw))


def _cross_force(a, f):
    aw, av = a[:3], a[3:]
    n, F = f[:3], f[3:]
    return _vadd(_cross(aw, n), _cross(av, F)) + _cross(aw, F)


def _ldlt_solve(M, b, eps=1e-9):
    """Solve M x = b for symmetric positive-definite M given as an n x n
    nested list of sheets; b a list of n sheets. LDL^T, fully unrolled."""
    n = len(b)
    L = [[None] * n for _ in range(n)]
    D = [None] * n
    invD = [None] * n
    for j in range(n):
        s = M[j][j]
        for k in range(j):
            s = _sub(s, _mul(_mul(L[j][k], L[j][k]), D[k]))
        D[j] = _add(s, eps)
        invD[j] = 1.0 / D[j]
        for i in range(j + 1, n):
            s = M[i][j]
            for k in range(j):
                s = _sub(s, _mul(_mul(L[i][k], L[j][k]), D[k]))
            L[i][j] = _mul(s, invD[j])
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = _sub(s, _mul(L[i][k], y[k]))
        y[i] = s
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = _mul(y[i], invD[i])
        for k in range(i + 1, n):
            s = _sub(s, _mul(L[k][i], x[k]))
        x[i] = s
    return x


def _symI_to_full(I):
    """(A,B,C) -> 6x6 nested list."""
    A9, C9 = _sym9(I[0]), _sym9(I[2])
    B = I[1]
    M = [[None] * 6 for _ in range(6)]
    for i in range(3):
        for j in range(3):
            M[i][j] = A9[3 * i + j]
            M[i][3 + j] = B[3 * i + j]
            M[3 + i][j] = B[3 * j + i]
            M[3 + i][3 + j] = C9[3 * i + j]
    return M


# ===========================================================================
# static model tables (trace-time numpy)
# ===========================================================================

def _contact_candidates(model: RobotModel):
    """Static ground-contact candidate list (mirrors ops.contact)."""
    cands = []
    for gi, g in enumerate(model.geoms):
        base = dict(geom=gi, body=g.body,
                    gpos=tuple(float(x) for x in g.pos),
                    gquat=tuple(float(x) for x in g.quat))
        if g.gtype == GEOM_SPHERE:
            cands.append(dict(base, off=(0.0, 0.0, 0.0), r=float(g.size[0]), rim=False))
        elif g.gtype == GEOM_CAPSULE:
            r, hl = float(g.size[0]), float(g.size[1])
            for s in (-1.0, 1.0):
                cands.append(dict(base, off=(0.0, 0.0, s * hl), r=r, rim=False))
        elif g.gtype == GEOM_CYLINDER:
            r, hw = float(g.size[0]), float(g.size[1])
            for s in (-1.0, 1.0):
                cands.append(dict(base, off=(0.0, 0.0, s * hw), r=r, rim=True))
        elif g.gtype == GEOM_BOX:
            hx, hy, hz = (float(x) for x in g.size)
            for sx in (-1.0, 1.0):
                for sy in (-1.0, 1.0):
                    for sz in (-1.0, 1.0):
                        cands.append(dict(base, off=(sx * hx, sy * hy, sz * hz),
                                          r=0.0, rim=False))
    return cands


def fused_eligible(model: RobotModel, ground_height_fn, attractors) -> bool:
    from thormang_isaacgym_tpu.ops import collide as collide_mod
    if ground_height_fn is not None or attractors:
        return False
    if collide_mod.has_pairs(model):
        return False
    if getattr(model, "tendons", ()):
        return False
    return True


@dataclasses.dataclass
class _Rows:
    """Row offsets into the packed (R, B) input array."""
    q: int = 0
    qd: int = 0
    tp: int = 0
    tv: int = 0
    eff: int = 0
    mass: int = 0
    com: int = 0
    inertia: int = 0
    gscale: int = 0
    armature: int = 0
    damping: int = 0
    friction: int = 0
    lower: int = 0
    upper: int = 0
    vel_limit: int = 0
    posm: int = 0
    velm: int = 0
    effm: int = 0
    kp: int = 0
    kd: int = 0
    eff_lim: int = 0
    locked: int = 0
    locked_pos: int = 0
    geom_fric: int = 0
    gravity: int = 0
    wrench: int = 0
    total: int = 0


def _make_rows(model: RobotModel) -> _Rows:
    nq, nv, nj, nb, ng = model.nq, model.nv, model.nj, model.nb, model.ng
    r = _Rows()
    off = 0
    for name, n in [("q", nq), ("qd", nv), ("tp", nj), ("tv", nj), ("eff", nj),
                    ("mass", nb), ("com", 3 * nb), ("inertia", 6 * nb),
                    ("gscale", nb),
                    ("armature", nj), ("damping", nj), ("friction", nj),
                    ("lower", nj), ("upper", nj), ("vel_limit", nj),
                    ("posm", nj), ("velm", nj), ("effm", nj),
                    ("kp", nj), ("kd", nj), ("eff_lim", nj),
                    ("locked", nj), ("locked_pos", nj),
                    ("geom_fric", ng), ("gravity", 3), ("wrench", 6 * nb)]:
        setattr(r, name, off)
        off += n
    r.total = off
    return r


# ===========================================================================
# the kernel
# ===========================================================================

def _make_kernel(model: RobotModel, sp, n_steps: int, ground_z: float):
    nq, nv, nj, nb = model.nq, model.nv, model.nj, model.nb
    nr = model.n_roots
    rows = _make_rows(model)
    h = float(sp.dt / sp.substeps)

    parent = np.array(model.parent, np.int32)
    jtype = np.array(model.joint_type, np.int32)
    jaxis = np.array(model.joint_axis, np.float64).reshape(-1, 3)
    jpos = np.array(model.joint_pos, np.float64).reshape(-1, 3)
    jquat = np.array(model.joint_quat, np.float64).reshape(-1, 4)
    flags = model.roots_floating
    base = np.array(model.root_base_pose if model.root_base_pose is not None
                    else [(0, 0, 0, 1, 0, 0, 0)] * nr, np.float64)
    # floating index per root (-1 if fixed)
    fidx = []
    fi = 0
    for r_i in range(nr):
        fidx.append(fi if flags[r_i] else -1)
        fi += 1 if flags[r_i] else 0
    nf = model.n_floating
    cands = _contact_candidates(model)
    geom_bodies = sorted({c["body"] for c in cands})

    lin_damp = float(sp.root_linear_damping)
    ang_damp = float(sp.root_angular_damping)

    def kernel(in_ref, out_ref):
        f32 = jnp.float32

        def rd(i):
            return in_ref[i, 0]

        def rd3(i):
            return (rd(i), rd(i + 1), rd(i + 2))

        sheet = rd(0).shape
        zero = jnp.zeros(sheet, f32)

        def mat(x):
            """Materialize a (possibly trace-time-folded float) value."""
            return jnp.full(sheet, float(x), f32) if _isf(x) else x

        # ---- static-per-call params (read once) ----
        mass = [rd(rows.mass + b) for b in range(nb)]
        com = [rd3(rows.com + 3 * b) for b in range(nb)]
        Icom = [tuple(rd(rows.inertia + 6 * b + k) for k in range(6))
                for b in range(nb)]
        gscale = [rd(rows.gscale + b) for b in range(nb)]
        armature = [rd(rows.armature + j) for j in range(nj)]
        j_damp = [rd(rows.damping + j) for j in range(nj)]
        j_fric = [rd(rows.friction + j) for j in range(nj)]
        j_lower = [rd(rows.lower + j) for j in range(nj)]
        j_upper = [rd(rows.upper + j) for j in range(nj)]
        j_vlim = [rd(rows.vel_limit + j) for j in range(nj)]
        posm = [rd(rows.posm + j) for j in range(nj)]
        velm = [rd(rows.velm + j) for j in range(nj)]
        effm = [rd(rows.effm + j) for j in range(nj)]
        kp_d = [rd(rows.kp + j) for j in range(nj)]
        kd_d = [rd(rows.kd + j) for j in range(nj)]
        eff_lim = [rd(rows.eff_lim + j) for j in range(nj)]
        locked = [rd(rows.locked + j) for j in range(nj)]
        locked_pos = [rd(rows.locked_pos + j) for j in range(nj)]
        geom_fric = [rd(rows.geom_fric + g) for g in range(model.ng)]
        gvec = rd3(rows.gravity)
        wrench = [tuple(rd(rows.wrench + 6 * b + k) for k in range(6))
                  for b in range(nb)]
        tgt_pos = [rd(rows.tp + j) for j in range(nj)]
        tgt_vel = [rd(rows.tv + j) for j in range(nj)]
        eff_in = [rd(rows.eff + j) for j in range(nj)]

        # body spatial inertias (constant over substeps)
        I_body = [_inertia_body(mass[b], com[b], Icom[b]) for b in range(nb)]
        I_min = [jnp.minimum(jnp.minimum(Icom[b][0], Icom[b][3]), Icom[b][5])
                 for b in range(nb)]

        q0 = tuple(rd(rows.q + i) for i in range(nq))
        qd0 = tuple(rd(rows.qd + i) for i in range(nv))
        net0 = tuple(zero for _ in range(3 * nb))

        def substep(q, qd):
            jq = [q[7 * nf + j] for j in range(nj)]
            jqd = [qd[6 * nf + j] for j in range(nj)]

            # ---- root state ----
            root_pos, root_quat, root_wb, root_vw = [], [], [], []
            for r_i in range(nr):
                fi = fidx[r_i]
                if fi >= 0:
                    root_pos.append((q[7 * fi], q[7 * fi + 1], q[7 * fi + 2]))
                    root_quat.append((q[7 * fi + 3], q[7 * fi + 4],
                                      q[7 * fi + 5], q[7 * fi + 6]))
                    root_wb.append((qd[6 * fi], qd[6 * fi + 1], qd[6 * fi + 2]))
                    root_vw.append((qd[6 * fi + 3], qd[6 * fi + 4], qd[6 * fi + 5]))
                else:
                    # fixed root: static pose — stays trace-time floats
                    root_pos.append(tuple(float(base[r_i, k]) for k in range(3)))
                    root_quat.append(tuple(float(base[r_i, 3 + k]) for k in range(4)))
                    root_wb.append((0.0, 0.0, 0.0))
                    root_vw.append((0.0, 0.0, 0.0))

            # ---- joint local poses ----
            pos_local, quat_local, R_loc = [None] * nj, [None] * nj, [None] * nj
            for j in range(nj):
                ax = tuple(float(jaxis[j, k]) for k in range(3))
                jqc = tuple(float(jquat[j, k]) for k in range(4))
                jp = tuple(float(jpos[j, k]) for k in range(3))
                jq_s = jq[j]
                if jtype[j] == REVOLUTE:
                    half = jq_s * 0.5
                    cw, sw = jnp.cos(half), jnp.sin(half)
                    q_rot = (cw, _mul(ax[0], sw), _mul(ax[1], sw), _mul(ax[2], sw))
                    quat_local[j] = _qmul(jqc, q_rot)
                    pos_local[j] = jp
                else:  # PRISMATIC
                    quat_local[j] = jqc
                    tr = _qrot(jqc, _vscale(ax, jq_s))
                    pos_local[j] = tuple(_add(jp[k], tr[k]) for k in range(3))
                R_loc[j] = _qtomat(quat_local[j])

            # ---- pass 1 (outward): link-frame velocities + world poses ----
            v = [None] * nb          # spatial velocity, link frame
            cbias = [None] * nb      # velocity-product bias
            quat_w = [None] * nb
            pos_w = [None] * nb
            for r_i in range(nr):
                v[r_i] = root_wb[r_i] + _qrotinv(root_quat[r_i], root_vw[r_i])
                cbias[r_i] = (0.0,) * 6
                quat_w[r_i] = root_quat[r_i]
                pos_w[r_i] = root_pos[r_i]
            for b in range(nr, nb):
                j = b - nr
                p = parent[b]
                ax = tuple(float(jaxis[j, k]) for k in range(3))
                if jtype[j] == REVOLUTE:
                    vj = _vscale(ax, jqd[j]) + (0.0, 0.0, 0.0)
                else:
                    vj = (0.0, 0.0, 0.0) + _vscale(ax, jqd[j])
                vi = _motion_to_child(R_loc[j], pos_local[j], v[p])
                vi = tuple(_add(a, b2) for a, b2 in zip(vi, vj))
                v[b] = vi
                cbias[b] = _cross_motion(vi, vj)
                quat_w[b] = _qmul(quat_w[p], quat_local[j])
                pos_w[b] = _vadd(pos_w[p], _qrot(quat_w[p], pos_local[j]))

            # ---- ground contact (plane z = ground_z) ----
            f_ext_w = [[0.0] * 6 for _ in range(nb)]   # world [torque, force]
            net_w = [[0.0] * 3 for _ in range(nb)]
            if cands:
                # world velocity of candidate bodies
                om_w, vl_w = {}, {}
                for b in geom_bodies:
                    om_w[b] = _qrot(quat_w[b], v[b][:3])
                    vl_w[b] = _qrot(quat_w[b], v[b][3:])
                # phase 1: candidate geometry + active flags
                infos = []
                n_active = {b: 0.0 for b in geom_bodies}
                for c in cands:
                    b = c["body"]
                    gq = _qmul(quat_w[b], c["gquat"])
                    gp = _vadd(pos_w[b], _qrot(quat_w[b], c["gpos"]))
                    p_c = _vadd(gp, _qrot(gq, c["off"]))
                    if c["rim"]:
                        a_ax = _qrot(gq, (0.0, 0.0, 1.0))
                        perp = (_neg(_mul(a_ax[0], a_ax[2])),
                                _neg(_mul(a_ax[1], a_ax[2])),
                                _sub(1.0, _mul(a_ax[2], a_ax[2])))
                        pn = jnp.maximum(
                            jnp.sqrt(mat(_dot3(perp, perp))), 1e-6)
                        u = _vscale(perp, -1.0 / pn)
                        p_c = _vadd(p_c, _vscale(u, c["r"]))
                        eff_r = 0.0
                    else:
                        eff_r = c["r"]
                    depth = ground_z - (mat(p_c[2]) - eff_r)
                    cp = (p_c[0], p_c[1], _sub(p_c[2], eff_r))
                    active = (depth > 0.0).astype(f32)
                    n_active[b] = _add(n_active[b], active)
                    infos.append((c, cp, depth, active))
                # phase 2: forces
                for (c, cp, depth, active) in infos:
                    b = c["body"]
                    r_arm = _vsub(cp, pos_w[b])
                    v_p = _vadd(vl_w[b], _cross(om_w[b], r_arm))
                    vn = mat(v_p[2])
                    vt = (v_p[0], v_p[1], 0.0)
                    vt_norm = jnp.sqrt(mat(_add(_mul(vt[0], vt[0]),
                                                _mul(vt[1], vt[1]))) + 1e-18)
                    mu = geom_fric[c["geom"]] * float(sp.plane_friction)
                    r_perp2 = mat(_add(_mul(r_arm[0], r_arm[0]),
                                       _mul(r_arm[1], r_arm[1])))
                    m_rot = I_min[b] / (r_perp2 + 1e-6)
                    m_eff = jnp.minimum(
                        mass[b], jnp.where(r_perp2 < 1e-6, mass[b], m_rot))
                    m_eff = m_eff / jnp.maximum(mat(n_active[b]), 1.0)
                    kn = jnp.minimum(float(sp.contact_stiffness),
                                     0.25 * m_eff / (h * h))
                    kd = jnp.minimum(float(sp.contact_damping), 0.5 * m_eff / h)
                    fn = kn * depth - kd * vn
                    fn = jnp.where(active > 0, jnp.maximum(fn, 0.0), 0.0)
                    cap = jnp.where(
                        vn > 0.0,
                        m_eff * jnp.maximum(
                            float(sp.max_depenetration_velocity) - vn, 0.0) / h,
                        3.4e38)
                    fn = jnp.maximum(jnp.minimum(fn, cap), 0.0)
                    ft_mag = mu * fn * jnp.tanh(vt_norm / float(sp.friction_vel))
                    ft_mag = jnp.minimum(ft_mag, mass[b] * vt_norm / h)
                    scale = -ft_mag / jnp.maximum(vt_norm, 1e-6)
                    f = (_mul(vt[0], scale), _mul(vt[1], scale), fn)
                    tq = _cross(r_arm, f)
                    for k in range(3):
                        f_ext_w[b][k] = _add(f_ext_w[b][k], tq[k])
                        f_ext_w[b][3 + k] = _add(f_ext_w[b][3 + k], f[k])
                        net_w[b][k] = _add(net_w[b][k], f[k])

            # external wrenches
            for b in range(nb):
                for k in range(6):
                    f_ext_w[b][k] = _add(f_ext_w[b][k], wrench[b][k])

            # ---- drives + passive joint forces (implicit form) ----
            tau = [None] * nj
            extra_diag = [None] * nj
            for j in range(nj):
                pd = kp_d[j] * (tgt_pos[j] - jq[j] - h * jqd[j]) - kd_d[j] * jqd[j]
                vl = kd_d[j] * (tgt_vel[j] - jqd[j])
                t = posm[j] * pd + velm[j] * vl + effm[j] * eff_in[j]
                t = jnp.clip(t, -eff_lim[j], eff_lim[j])
                diag = posm[j] * (h * h * kp_d[j] + h * kd_d[j]) + velm[j] * (h * kd_d[j])
                # passive
                t = t - j_damp[j] * jqd[j]
                diag = diag + h * j_damp[j]
                t = t - j_fric[j] * jnp.tanh(jqd[j] / 0.05)
                below = jnp.minimum(jq[j] - j_lower[j], 0.0)
                above = jnp.maximum(jq[j] - j_upper[j], 0.0)
                below = jnp.where(jnp.isfinite(j_lower[j]), below, zero)
                above = jnp.where(jnp.isfinite(j_upper[j]), above, zero)
                violation = below + above
                in_vio = ((below < 0) | (above > 0)).astype(f32)
                k_lim = float(sp.joint_limit_stiffness)
                d_lim = float(sp.joint_limit_damping)
                t = t + in_vio * (-k_lim * (violation + h * jqd[j])
                                  - d_lim * jqd[j])
                diag = diag + in_vio * (h * h * k_lim + h * d_lim)
                tau[j] = t
                extra_diag[j] = diag

            # ---- bias forces pA (link frame) ----
            IA = [None] * nb
            pA = [None] * nb
            for b in range(nb):
                IA[b] = I_body[b]
                Iv = _symI_mul(I_body[b], v[b])
                g_l = _qrotinv(quat_w[b], gvec)
                g_l = _vscale(g_l, gscale[b])
                f_grav = _cross(com[b], _vscale(g_l, mass[b])) + _vscale(g_l, mass[b])
                # rotate world wrench+contact into link frame
                f_ang = _qrotinv(quat_w[b], (f_ext_w[b][0], f_ext_w[b][1], f_ext_w[b][2]))
                f_lin = _qrotinv(quat_w[b], (f_ext_w[b][3], f_ext_w[b][4], f_ext_w[b][5]))
                cf = _cross_force(v[b], Iv)
                f6 = f_ang + f_lin
                pA[b] = tuple(_sub(_sub(cf[k], f6[k]), f_grav[k])
                              for k in range(6))

            # ---- pass 2 (inward): articulated inertia ----
            U_j = [None] * nj
            invD_j = [None] * nj
            u_j = [None] * nj
            for b in range(nb - 1, nr - 1, -1):
                j = b - nr
                p = parent[b]
                A, B, C = IA[b]
                axc = tuple(float(jaxis[j, k]) for k in range(3))
                if jtype[j] == REVOLUTE:
                    Ua = _m3v(_sym9(A), axc)
                    Ul = _m3Tv(B, axc)
                    U = Ua + Ul
                    D = _dot3(axc, Ua)
                    Su_pA = _dot3(axc, pA[b][:3])
                else:
                    Ua = _m3v(B, axc)
                    Ul = _m3v(_sym9(C), axc)
                    U = Ua + Ul
                    D = _dot3(axc, Ul)
                    Su_pA = _dot3(axc, pA[b][3:])
                D = mat(D) + armature[j] + locked[j] * _LOCK_BIG + extra_diag[j]
                invD = 1.0 / D
                u = _sub(tau[j], Su_pA)
                U_j[j], invD_j[j], u_j[j] = U, invD, u
                Ia = _symI_rank1_sub(IA[b], U, invD)
                Ic = _symI_mul(Ia, cbias[b])
                uD = _mul(u, invD)
                pa = tuple(_add(_add(pA[b][k], Ic[k]), _mul(U[k], uD))
                           for k in range(6))
                IA[p] = _symI_add(IA[p], _symI_to_parent(R_loc[j], pos_local[j], Ia))
                fp = _force_to_parent(R_loc[j], pos_local[j], pa)
                pA[p] = tuple(_add(pA[p][k], fp[k]) for k in range(6))

            # ---- pass 3 (outward): accelerations ----
            a = [None] * nb
            for r_i in range(nr):
                if flags[r_i]:
                    M = _symI_to_full(IA[r_i])
                    bvec = [_neg(pA[r_i][k]) for k in range(6)]
                    a[r_i] = tuple(_ldlt_solve(M, bvec))
                else:
                    a[r_i] = (0.0,) * 6
            qdd = [None] * nj
            for b in range(nr, nb):
                j = b - nr
                p = parent[b]
                a_p = _motion_to_child(R_loc[j], pos_local[j], a[p])
                a_p = tuple(_add(a_p[k], cbias[b][k]) for k in range(6))
                Ua = _add(_dot3((U_j[j][0], U_j[j][1], U_j[j][2]), a_p[:3]),
                          _dot3((U_j[j][3], U_j[j][4], U_j[j][5]), a_p[3:]))
                qdd_i = _mul(_sub(u_j[j], Ua), invD_j[j])
                qdd_i = mat(qdd_i) * (1.0 - locked[j])
                qdd[j] = qdd_i
                axc = tuple(float(jaxis[j, k]) for k in range(3))
                if jtype[j] == REVOLUTE:
                    Sq = _vscale(axc, qdd_i) + (0.0, 0.0, 0.0)
                else:
                    Sq = (0.0, 0.0, 0.0) + _vscale(axc, qdd_i)
                a[b] = tuple(_add(a_p[k], Sq[k]) for k in range(6))

            # ---- semi-implicit Euler ----
            max_v = float(sp.max_velocity)
            q_new = list(q)
            qd_new = list(qd)
            for r_i in range(nr):
                fi = fidx[r_i]
                if fi < 0:
                    continue
                wb, vw = root_wb[r_i], root_vw[r_i]
                a_ang = a[r_i][:3]
                a_lin_b = a[r_i][3:]
                # world-frame derivative of linear velocity
                a_lin_w = _qrot(root_quat[r_i],
                                _vadd(a_lin_b, _cross(wb, _qrotinv(root_quat[r_i], vw))))
                damp_a = 1.0 - ang_damp * h
                damp_l = 1.0 - lin_damp * h
                wb2 = tuple(jnp.clip(mat(_mul(_add(wb[k], _mul(h, a_ang[k])),
                                              damp_a)),
                                     -max_v, max_v) for k in range(3))
                vw2 = tuple(jnp.clip(mat(_mul(_add(vw[k], _mul(h, a_lin_w[k])),
                                              damp_l)),
                                     -max_v, max_v) for k in range(3))
                # integrate quat with world omega
                om_w2 = _qrot(root_quat[r_i], wb2)
                qold = root_quat[r_i]
                dq = _qmul((0.0, om_w2[0], om_w2[1], om_w2[2]), qold)
                qn = tuple(_add(qold[k], _mul(0.5 * h, dq[k])) for k in range(4))
                norm = jnp.sqrt(mat(
                    _add(_add(_mul(qn[0], qn[0]), _mul(qn[1], qn[1])),
                         _add(_mul(qn[2], qn[2]), _mul(qn[3], qn[3]))))) + 1e-9
                qn = tuple(mat(x) / norm for x in qn)
                for k in range(3):
                    q_new[7 * fi + k] = root_pos[r_i][k] + h * vw2[k]
                    qd_new[6 * fi + k] = wb2[k]
                    qd_new[6 * fi + 3 + k] = vw2[k]
                for k in range(4):
                    q_new[7 * fi + 3 + k] = qn[k]

            for j in range(nj):
                v2 = mat(_add(jqd[j], _mul(h, qdd[j])))
                v2 = jnp.clip(v2, -max_v, max_v)
                v2 = jnp.clip(v2, -j_vlim[j], j_vlim[j])
                v2 = v2 * (1.0 - locked[j])
                q2 = jq[j] + h * v2
                q2 = jnp.where(locked[j] > 0, locked_pos[j], q2)
                q_new[7 * nf + j] = q2
                qd_new[6 * nf + j] = v2

            net_flat = tuple(mat(net_w[b][k])
                             for b in range(nb) for k in range(3))
            return tuple(q_new), tuple(qd_new), net_flat

        def body_fn(k, carry):
            q, qd, _ = carry
            return substep(q, qd)

        q, qd, net = jax.lax.fori_loop(
            0, n_steps, body_fn, (q0, qd0, net0), unroll=False)

        for i in range(nq):
            out_ref[i, 0] = q[i]
        for i in range(nv):
            out_ref[nq + i, 0] = qd[i]
        for i in range(3 * nb):
            out_ref[nq + nv + i, 0] = net[i]

    return kernel, rows


class _FakeRef:
    """Minimal pl.Ref stand-in so the (pure-jnp) kernel body can run as a
    plain traced function on any backend — used for CPU tests/CI, where
    Pallas interpret mode is orders of magnitude too slow for 40-body
    models. Covers 100% of the kernel math; only the pallas_call plumbing
    differs from the TPU path."""

    def __init__(self, arr):
        self.arr = arr

    def __getitem__(self, idx):
        return self.arr[idx]

    def __setitem__(self, idx, val):
        self.arr = self.arr.at[idx].set(val)


def build_fused_step_fn(model: RobotModel, sim_params, *, n_steps=None,
                        ground_z: float = 0.0, env_block: int = 512,
                        interpret: bool | None = None):
    """Returns step(params, q, qd, ctrl, wrench) -> (q', qd', net), batched,
    running `n_steps` substeps (default sim_params.substeps) in ONE kernel.

    interpret=True (default off-TPU) runs the kernel body as a plain traced
    jnp function via _FakeRef instead of lowering through Mosaic."""
    n_steps = int(n_steps if n_steps is not None else sim_params.substeps)
    kernel, rows = _make_kernel(model, sim_params, n_steps, ground_z)
    nq, nv, nb = model.nq, model.nv, model.nb
    out_rows = nq + nv + 3 * nb

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def step(params: ModelParams, q, qd, ctrl, wrench):
        B = q.shape[0]

        def TT(x):
            x = jnp.asarray(x, jnp.float32)
            if x.ndim >= 1 and x.shape[0] == B:
                return x.reshape(B, -1).T
            # unbatched param leaf: broadcast
            flat = x.reshape(-1)
            return jnp.broadcast_to(flat[:, None], (flat.shape[0], B))

        Ic = params.body_inertia
        sym = jnp.stack([Ic[..., 0, 0], Ic[..., 0, 1], Ic[..., 0, 2],
                         Ic[..., 1, 1], Ic[..., 1, 2], Ic[..., 2, 2]], axis=-1)
        dm = params.drive_mode
        posm = (dm == 1).astype(jnp.float32)
        velm = (dm == 2).astype(jnp.float32)
        effm = (dm == 3).astype(jnp.float32)
        cols = [TT(q), TT(qd), TT(ctrl.target_pos), TT(ctrl.target_vel),
                TT(ctrl.effort), TT(params.body_mass), TT(params.body_com),
                TT(sym), TT(params.body_gravity_scale),
                TT(params.dof_armature), TT(params.dof_damping),
                TT(params.dof_friction), TT(params.dof_lower),
                TT(params.dof_upper), TT(params.dof_velocity_limit),
                TT(posm), TT(velm), TT(effm),
                TT(params.drive_stiffness), TT(params.drive_damping),
                TT(params.drive_effort_limit), TT(params.dof_locked),
                TT(params.dof_locked_pos), TT(params.geom_friction),
                TT(params.gravity), TT(wrench)]
        packed = jnp.concatenate(cols, axis=0)          # (R, B)
        assert packed.shape[0] == rows.total

        eb = env_block
        while eb > 128 and B % eb != 0:
            eb //= 2
        Bp = -(-B // eb) * eb          # pad up
        if Bp != B:
            packed = jnp.pad(packed, ((0, 0), (0, Bp - B)))
        if interpret:
            # single block over the whole (padded) batch, plain jnp
            S = Bp // 128
            arr = packed.reshape(rows.total, 1, S, 128)
            fake_out = _FakeRef(jnp.zeros((out_rows, 1, S, 128), jnp.float32))
            kernel(_FakeRef(arr), fake_out)
            out = fake_out.arr.reshape(out_rows, Bp)[:, :B]
            q2 = out[:nq].T
            qd2 = out[nq:nq + nv].T
            net = out[nq + nv:].T.reshape(B, nb, 3)
            return q2, qd2, net
        S = eb // 128
        nblk = Bp // eb
        # 4D (rows, n_blocks, S, 128): the block's trailing two dims equal
        # the array's, satisfying the Mosaic (8,128)-divisibility rule for
        # any S while the grid walks the block axis
        packed = packed.reshape(rows.total, nblk, S, 128)

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((out_rows, nblk, S, 128),
                                           jnp.float32),
            grid=(nblk,),
            in_specs=[pl.BlockSpec((rows.total, 1, S, 128),
                                   lambda i: (0, i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((out_rows, 1, S, 128),
                                   lambda i: (0, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                # the unrolled tree sweeps keep ~40 bodies x 21-sheet
                # articulated inertias live; default 16M scoped vmem is too
                # small for the spill stack at useful env blocks
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(packed)

        out = out.reshape(out_rows, Bp)[:, :B]
        q2 = out[:nq].T
        qd2 = out[nq:nq + nv].T
        net = out[nq + nv:].T.reshape(B, nb, 3)
        return q2, qd2, net

    return step
