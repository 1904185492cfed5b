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


# scalar helpers that fold float/float at trace time but accept sheets
def _ssqrt(x):
    import math as _math
    return _math.sqrt(x) if _isf(x) else jnp.sqrt(x)


def _smax(a, b):
    if _isf(a) and _isf(b):
        return max(a, b)
    return jnp.maximum(a, b)


def _smin(a, b):
    if _isf(a) and _isf(b):
        return min(a, b)
    return jnp.minimum(a, b)


def _sclip(x, lo, hi):
    return _smin(_smax(x, lo), hi)


def _sabs(x):
    if _isf(x):
        return abs(x)
    return jnp.abs(x)


def _ssign(x):
    if _isf(x):
        return float(np.sign(x))
    return jnp.sign(x)


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


_SYM_IDX = ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))


def _symI_rank1_add(I, u, M):
    """I + M * u u^T for a 6-vector u of sheets and scalar/sheet M — the
    implicit contact velocity-reaction added inertia (ops/collide.py dIA)."""
    A, B, C = I
    Mu = tuple(_mul(M, u[k]) for k in range(6))
    A2 = tuple(_add(A[k], _mul(Mu[i], u[j]))
               for k, (i, j) in enumerate(_SYM_IDX))
    B2 = tuple(_add(B[3 * i + j], _mul(Mu[i], u[3 + j]))
               for i in range(3) for j in range(3))
    C2 = tuple(_add(C[k], _mul(Mu[3 + i], u[3 + j]))
               for k, (i, j) in enumerate(_SYM_IDX))
    return (A2, B2, C2)


def _symI_G_add(I, r, M):
    """I + M * U U^T with U = [skew(r); I3] — the SUM of M u(t)u(t)^T over
    any orthonormal 3-basis {t} of contact directions at lever arm r, since
    U U^T = [[|r|^2 I - r r^T, skew(r)], [skew(r)^T, I]]. Combined with one
    rank-1 term this reproduces the per-direction dIA of ops/collide.py at
    a third of the multiply count (the isotropic-tangent-damping identity:
    u(t1)u(t1)^T + u(t2)u(t2)^T = U U^T - u(n)u(n)^T)."""
    A, B, C = I
    r0, r1, r2 = r
    rr = _dot3(r, r)
    Mrr = _mul(M, rr)
    Mr0, Mr1, Mr2 = _mul(M, r0), _mul(M, r1), _mul(M, r2)
    A2 = (_add(A[0], _sub(Mrr, _mul(Mr0, r0))),
          _sub(A[1], _mul(Mr0, r1)),
          _sub(A[2], _mul(Mr0, r2)),
          _add(A[3], _sub(Mrr, _mul(Mr1, r1))),
          _sub(A[4], _mul(Mr1, r2)),
          _add(A[5], _sub(Mrr, _mul(Mr2, r2))))
    B2 = (B[0], _sub(B[1], Mr2), _add(B[2], Mr1),
          _add(B[3], Mr2), B[4], _sub(B[5], Mr0),
          _sub(B[6], Mr1), _add(B[7], Mr0), B[8])
    C2 = (_add(C[0], M), C[1], C[2], _add(C[3], M), C[4], _add(C[5], M))
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
        if not getattr(g, "ground", True):
            continue
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


# ===========================================================================
# actor-pair narrowphase in sheet math (mirrors ops/collide.py formulas
# exactly — the candidate lists, masks, caps and epsilons must match the
# XLA path for the fused-vs-XLA cross-check, tests/test_fused.py)
# ===========================================================================

def _s_sphere_box(center, r, box_pos, box_quat, half):
    """Sheet version of collide._sphere_box_point. half: 3 floats."""
    local = _qrotinv(box_quat, _vsub(center, box_pos))
    clamped = tuple(_sclip(local[k], -half[k], half[k]) for k in range(3))
    inside = ((_sabs(local[0]) < half[0]) & (_sabs(local[1]) < half[1])
              & (_sabs(local[2]) < half[2]))
    d_out = _vsub(local, clamped)
    dist_out = _add(_ssqrt(_dot3(d_out, d_out)), 1e-9)
    g = tuple(_sub(half[k], _sabs(local[k])) for k in range(3))
    # argmin over the 3 face gaps (first-minimum tie-break, like jnp.argmin)
    c01 = g[0] <= g[1]
    c02 = g[0] <= g[2]
    c12 = g[1] <= g[2]
    k0 = c01 & c02
    k1 = (~c01) & c12
    oh = (jnp.where(k0, 1.0, 0.0), jnp.where(k1, 1.0, 0.0),
          jnp.where(k0 | k1, 0.0, 1.0))
    gap_min = jnp.where(k0, g[0], jnp.where(k1, g[1], g[2]))
    inv_d = 1.0 / dist_out
    out_local = tuple(
        jnp.where(inside, _mul(_ssign(local[k]), oh[k]),
                  _mul(d_out[k], inv_d)) for k in range(3))
    depth = jnp.where(inside, _add(r, gap_min), _sub(r, dist_out))
    n = _vscale(_qrot(box_quat, out_local), -1.0)
    cp = _vadd(center, _vscale(n, r))
    return n, depth, cp


def _s_pair_candidates(model, pairs, gpose, mat):
    """Sheet candidates: list of (ia, ib, ba, bb, n, depth, cp), mirroring
    collide._candidates. gpose(i) -> (pos 3-tuple, quat 4-tuple) sheets."""
    out = []
    for (ia, ib, kind) in pairs:
        ga, gb = model.geoms[ia], model.geoms[ib]
        ba, bb = ga.body, gb.body
        pa, qa = gpose(ia)
        pb, qb = gpose(ib)
        if kind == "sphere":
            tb = gb.gtype
            ra = float(ga.size[0])
            if tb == GEOM_SPHERE:
                rb = float(gb.size[0])
                d = _vsub(pb, pa)
                dist = _add(_ssqrt(_dot3(d, d)), 1e-9)
                n = _vscale(d, 1.0 / dist)
                depth = _sub(ra + rb, dist)
                cp = _vadd(pa, _vscale(n, _sub(ra, _mul(depth, 0.5))))
            elif tb == GEOM_CAPSULE:
                rb, hl = float(gb.size[0]), float(gb.size[1])
                axis = _qrot(qb, (0.0, 0.0, 1.0))
                t = _sclip(_dot3(_vsub(pa, pb), axis), -hl, hl)
                closest = _vadd(pb, _vscale(axis, t))
                d = _vsub(closest, pa)
                dist = _add(_ssqrt(_dot3(d, d)), 1e-9)
                n = _vscale(d, 1.0 / dist)
                depth = _sub(ra + rb, dist)
                cp = _vadd(pa, _vscale(n, _sub(ra, _mul(depth, 0.5))))
            elif tb == GEOM_CYLINDER:
                R_cyl, hw = float(gb.size[0]), float(gb.size[1])
                local = _qrotinv(qb, _vsub(pa, pb))
                r_xy = _add(_ssqrt(_add(_mul(local[0], local[0]),
                                        _mul(local[1], local[1]))), 1e-9)
                sc = _smin(R_cyl / r_xy, 1.0)
                cl = (_mul(local[0], sc), _mul(local[1], sc),
                      _sclip(local[2], -hw, hw))
                d_out = _vsub(local, cl)
                dist_out = _add(_ssqrt(_dot3(d_out, d_out)), 1e-9)
                inside = (r_xy < R_cyl) & (_sabs(local[2]) < hw)
                face_gap = _sub(hw, _sabs(local[2]))
                wall_gap = _sub(R_cyl, r_xy)
                inv_rxy = 1.0 / r_xy
                face_first = face_gap < wall_gap
                n_in = (jnp.where(face_first, 0.0, _mul(local[0], inv_rxy)),
                        jnp.where(face_first, 0.0, _mul(local[1], inv_rxy)),
                        jnp.where(face_first, _ssign(local[2]), 0.0))
                inv_d = 1.0 / dist_out
                out_local = tuple(
                    jnp.where(inside, n_in[k], _mul(d_out[k], inv_d))
                    for k in range(3))
                depth = jnp.where(inside,
                                  _add(ra, _smin(face_gap, wall_gap)),
                                  _sub(ra, dist_out))
                n = _vscale(_qrot(qb, out_local), -1.0)
                cp = _vadd(pa, _vscale(n, ra))
            else:  # box
                half = tuple(float(x) for x in gb.size)
                n, depth, cp = _s_sphere_box(pa, ra, pb, qb, half)
            out.append((ia, ib, ba, bb, n, depth, cp))
        elif kind == "capcap":
            r1, h1 = float(ga.size[0]), float(ga.size[1])
            r2, h2 = float(gb.size[0]), float(gb.size[1])
            a1 = _qrot(qa, (0.0, 0.0, 1.0))
            a2 = _qrot(qb, (0.0, 0.0, 1.0))
            P1 = _vsub(pa, _vscale(a1, h1))
            Q1 = _vadd(pa, _vscale(a1, h1))
            P2 = _vsub(pb, _vscale(a2, h2))
            Q2 = _vadd(pb, _vscale(a2, h2))
            d1, d2 = _vsub(Q1, P1), _vsub(Q2, P2)
            r0 = _vsub(P1, P2)
            a_ = _add(_dot3(d1, d1), 1e-9)
            e_ = _add(_dot3(d2, d2), 1e-9)
            b_ = _dot3(d1, d2)
            c_ = _dot3(d1, r0)
            f_ = _dot3(d2, r0)
            denom = _sub(_mul(a_, e_), _mul(b_, b_))
            nz = _sabs(denom) > 1e-9
            denom_safe = jnp.where(nz, denom, 1.0)
            s = jnp.where(
                nz, _sclip(_sub(_mul(b_, f_), _mul(c_, e_)) / denom_safe,
                           0.0, 1.0), 0.0)
            t = _sclip(_add(_mul(b_, s), f_) / e_, 0.0, 1.0)
            s = _sclip(_sub(_mul(b_, t), c_) / a_, 0.0, 1.0)
            c1 = _vadd(P1, _vscale(d1, s))
            c2 = _vadd(P2, _vscale(d2, t))
            d = _vsub(c2, c1)
            dist = _add(_ssqrt(_dot3(d, d)), 1e-9)
            n = _vscale(d, 1.0 / dist)
            depth = _sub(r1 + r2, dist)
            cp = _vadd(c1, _vscale(n, _sub(r1, _mul(depth, 0.5))))
            out.append((ia, ib, ba, bb, n, depth, cp))
        elif kind == "capbox":
            r1, h1 = float(ga.size[0]), float(ga.size[1])
            half = tuple(float(x) for x in gb.size)
            axis = _qrot(qa, (0.0, 0.0, 1.0))
            e0 = _qrotinv(qb, _vsub(_vsub(pa, _vscale(axis, h1)), pb))
            e1 = _qrotinv(qb, _vsub(_vadd(pa, _vscale(axis, h1)), pb))
            de = _vsub(e1, e0)

            def seg_dist(t):
                p = _vadd(e0, _vscale(de, t))
                c = tuple(_sclip(p[k], -half[k], half[k]) for k in range(3))
                dd = _vsub(p, c)
                return _ssqrt(_dot3(dd, dd))

            lo, hi = 0.0, 1.0
            for _ in range(18):
                span = _sub(hi, lo)
                m1 = _add(lo, _mul(span, 1.0 / 3.0))
                m2 = _sub(hi, _mul(span, 1.0 / 3.0))
                left = seg_dist(m1) < seg_dist(m2)
                lo = jnp.where(left, lo, m1)
                hi = jnp.where(left, m2, hi)
            t_opt = _mul(_add(lo, hi), 0.5)
            eps = 0.02
            interior = jnp.where(
                (t_opt > eps) & (t_opt < 1.0 - eps)
                & (_sabs(_sub(t_opt, 0.5)) > eps), 1.0, 0.0)
            for tpar, msk in ((0.0, None), (t_opt, interior),
                              (0.5, None), (1.0, None)):
                center = _vadd(pa, _vscale(axis, _mul(h1, _sub(
                    _mul(2.0, tpar), 1.0))))
                n, depth, cp = _s_sphere_box(center, r1, pb, qb, half)
                if msk is not None:
                    depth = jnp.where(msk > 0, depth, -1.0)
                out.append((ia, ib, ba, bb, n, depth, cp))
        elif kind == "boxbox":
            out.extend(_s_box_box(ia, ib, ba, bb, pa, qa,
                                  tuple(float(x) for x in ga.size),
                                  pb, qb,
                                  tuple(float(x) for x in gb.size), mat))
    return out


def _s_box_box(ia, ib, ba, bb, pa, qa, half_a, pb, qb, half_b, mat):
    """Sheet version of collide._box_box_candidates + edge candidate.

    Gottschalk OBB-SAT closed forms: with R[i][j] = A_i . B_j and the
    center offset d expressed on each box's axes (dA, dB), every face /
    edge overlap, corner-inside test, corner depth, and edge closest-point
    parameter is plain scalar arithmetic over {R, |R|, dA, dB} - the only
    per-candidate VECTOR math left is the contact point itself. Same 17
    candidates and contact semantics as the direct formulation it replaces
    (cross-checked against ops/collide.py by tests/test_fused.py), at a
    fraction of the sheet ops - box-box pairs dominate the factory
    kernel (20 pairs, factory_task_nut_bolt_pick scenes)."""
    Ma = _qtomat(qa)
    Mb = _qtomat(qb)
    # world directions of each box's local axes = matrix columns
    A_axes = [(Ma[j], Ma[3 + j], Ma[6 + j]) for j in range(3)]
    B_axes = [(Mb[j], Mb[3 + j], Mb[6 + j]) for j in range(3)]
    d = _vsub(pb, pa)
    ha, hb = half_a, half_b
    R = [[_dot3(A_axes[i], B_axes[j]) for j in range(3)] for i in range(3)]
    aR = [[_sabs(R[i][j]) for j in range(3)] for i in range(3)]
    dA = [_dot3(d, A_axes[i]) for i in range(3)]
    dB = [_dot3(d, B_axes[j]) for j in range(3)]
    # scaled axis vectors and scalar tables shared by corners and edges
    hA_vec = [tuple(_mul(ha[i], A_axes[i][c]) for c in range(3))
              for i in range(3)]
    hB_vec = [tuple(_mul(hb[j], B_axes[j][c]) for c in range(3))
              for j in range(3)]
    haR = [[_mul(ha[i], R[i][j]) for j in range(3)] for i in range(3)]
    hbR = [[_mul(hb[j], R[i][j]) for j in range(3)] for i in range(3)]

    # 6 face overlaps (closed form); min-overlap axis shared by all
    # vertex contacts. proj(A_i onto A) == ha[i] exactly (orthonormal).
    projB_on_A = [ _add(_add(_mul(aR[i][0], hb[0]), _mul(aR[i][1], hb[1])),
                        _mul(aR[i][2], hb[2])) for i in range(3)]
    projA_on_B = [ _add(_add(_mul(aR[0][j], ha[0]), _mul(aR[1][j], ha[1])),
                        _mul(aR[2][j], ha[2])) for j in range(3)]
    overlap_f = (
        [_sub(_add(ha[i], projB_on_A[i]), _sabs(dA[i])) for i in range(3)]
        + [_sub(_add(projA_on_B[j], hb[j]), _sabs(dB[j])) for j in range(3)])

    # per-axis selection tables: normal vector, signed distance dn =
    # n_raw . d, face extents along n, and the axis coordinates
    # nA[i] = A_i . n_raw, nB[j] = B_j . n_raw (all closed-form)
    axes6 = A_axes + B_axes
    dn6 = dA + dB
    hA6 = [ha[0], ha[1], ha[2]] + projA_on_B
    hB6 = projB_on_A + [hb[0], hb[1], hb[2]]
    nA6 = [[1.0 if i == k else 0.0 for i in range(3)] for k in range(3)] + \
          [[R[i][j] for i in range(3)] for j in range(3)]
    nB6 = [[R[k][j] for j in range(3)] for k in range(3)] + \
          [[1.0 if j == k else 0.0 for j in range(3)] for k in range(3)]

    best_f = mat(overlap_f[0])
    n_raw = tuple(mat(x) for x in axes6[0])
    dn = mat(dn6[0])
    hA_n = mat(hA6[0])
    hB_n = mat(hB6[0])
    nA = [mat(x) for x in nA6[0]]
    nB = [mat(x) for x in nB6[0]]
    for k in range(1, 6):
        better = overlap_f[k] < best_f
        best_f = jnp.where(better, overlap_f[k], best_f)
        n_raw = tuple(jnp.where(better, mat(axes6[k][c]), n_raw[c])
                      for c in range(3))
        dn = jnp.where(better, mat(dn6[k]), dn)
        hA_n = jnp.where(better, mat(hA6[k]), hA_n)
        hB_n = jnp.where(better, mat(hB6[k]), hB_n)
        nA = [jnp.where(better, mat(nA6[k][i]), nA[i]) for i in range(3)]
        nB = [jnp.where(better, mat(nB6[k][j]), nB[j]) for j in range(3)]
    s_n = _ssign(_add(dn, 1e-12))
    n = _vscale(n_raw, s_n)
    dn_s = _mul(dn, s_n)                       # d . n  (sign-corrected)
    ha_nA = [_mul(ha[i], _mul(nA[i], s_n)) for i in range(3)]
    hb_nB = [_mul(hb[j], _mul(nB[j], s_n)) for j in range(3)]

    out = []
    corners = [(sx, sy, sz) for sx in (-1, 1) for sy in (-1, 1)
               for sz in (-1, 1)]
    # corners of A against B: every test and the depth are scalar
    # combinations of the precomputed tables; only the contact point pv
    # needs vector adds
    for (sx, sy, sz) in corners:
        s3 = (sx, sy, sz)

        def acc(base, table):
            v = base
            for i in range(3):
                v = _add(v, _mul(float(s3[i]), table[i]))
            return v

        pv = tuple(
            acc(pa[c], [hA_vec[i][c] for i in range(3)]) for c in range(3))
        local = [acc(_neg(dB[k]), [haR[i][k] for i in range(3)])
                 for k in range(3)]
        inside = ((_sabs(local[0]) < hb[0]) & (_sabs(local[1]) < hb[1])
                  & (_sabs(local[2]) < hb[2]))
        # dot(pv - pb, n) = -d.n + sum_i s_i ha[i] (A_i . n)
        dv_n = acc(_neg(dn_s), ha_nA)
        depth = jnp.where(inside, _add(dv_n, hB_n), -1.0)
        out.append((ia, ib, ba, bb, n, depth, pv))
    # corners of B against A (symmetric)
    for (sx, sy, sz) in corners:
        s3 = (sx, sy, sz)

        def acc(base, table):
            v = base
            for j in range(3):
                v = _add(v, _mul(float(s3[j]), table[j]))
            return v

        pv = tuple(
            acc(pb[c], [hB_vec[j][c] for j in range(3)]) for c in range(3))
        local = [acc(dA[i], [hbR[i][j] for j in range(3)])
                 for i in range(3)]
        inside = ((_sabs(local[0]) < ha[0]) & (_sabs(local[1]) < ha[1])
                  & (_sabs(local[2]) < ha[2]))
        dv_n = acc(dn_s, hb_nB)               # dot(pv - pa, n)
        depth = jnp.where(inside, _sub(hA_n, dv_n), -1.0)
        out.append((ia, ib, ba, bb, n, depth, pv))

    min_f = overlap_f[0]
    for k in range(1, 6):
        min_f = _smin(min_f, overlap_f[k])
    all_f = (overlap_f[0] > 0)
    for k in range(1, 6):
        all_f = all_f & (overlap_f[k] > 0)

    # SAT edge-edge candidate. Closed forms for the cross axes
    # L = A_i x B_j:  |L|^2 = 1 - R[i][j]^2,
    #   A_(i+1).L = -R[i+2][j]   A_(i+2).L = R[i+1][j]   (A_i.L = 0)
    #   B_(j+1).L =  R[i][j+2]   B_(j+2).L = -R[i][j+1]  (B_j.L = 0)
    #   d.L = dA[i+2] R[i+1][j] - dA[i+1] R[i+2][j]
    best_e = None
    n_e = None
    cp_e = None
    all_e = None
    for i_ in range(3):
        i1, i2 = (i_ + 1) % 3, (i_ + 2) % 3
        for j_ in range(3):
            j1, j2 = (j_ + 1) % 3, (j_ + 2) % 3
            len2 = _sub(1.0, _mul(R[i_][j_], R[i_][j_]))
            norm = _ssqrt(_smax(len2, 1e-12))
            degenerate = norm < 1e-6
            inv_n = 1.0 / _smax(norm, 1e-6)
            dLd = _sub(_mul(dA[i2], R[i1][j_]), _mul(dA[i1], R[i2][j_]))
            proj_a = _add(_mul(ha[i1], aR[i2][j_]), _mul(ha[i2], aR[i1][j_]))
            proj_b = _add(_mul(hb[j1], aR[i_][j2]), _mul(hb[j2], aR[i_][j1]))
            ov = _mul(_sub(_add(proj_a, proj_b), _sabs(dLd)), inv_n)
            ov = jnp.where(degenerate, jnp.inf, mat(ov))
            s_L = _ssign(dLd)
            L0 = _cross(A_axes[i_], B_axes[j_])
            nk = _vscale(L0, _mul(inv_n, s_L))
            # support-edge signs: sign(A_k . nk) / sign(B_k . nk) from the
            # closed-form axis coordinates of L
            sa1 = _ssign(_mul(_neg(R[i2][j_]), s_L))
            sa2 = _ssign(_mul(R[i1][j_], s_L))
            sb1 = _ssign(_mul(R[i_][j2], s_L))
            sb2 = _ssign(_mul(_neg(R[i_][j1]), s_L))
            ca = tuple(_add(pa[c], _add(_mul(sa1, hA_vec[i1][c]),
                                        _mul(sa2, hA_vec[i2][c])))
                       for c in range(3))
            cb_ = tuple(_sub(pb[c], _add(_mul(sb1, hB_vec[j1][c]),
                                         _mul(sb2, hB_vec[j2][c])))
                        for c in range(3))
            # closest points on the two support edges: the edge-frame dots
            # also reduce to the scalar tables
            b_ = R[i_][j_]
            denom = _smax(_sub(1.0, _mul(b_, b_)), 1e-6)
            # ea.r0: A_i.(cb_-ca) = dA[i] - sb1 hb[j1] R[i][j1] - sb2 hb[j2] R[i][j2]
            ear0 = _sub(_sub(dA[i_], _mul(sb1, hbR[i_][j1])),
                        _mul(sb2, hbR[i_][j2]))
            # eb.r0: B_j.(cb_-ca) = dB[j] - sa1 ha[i1] R[i1][j] - sa2 ha[i2] R[i2][j]
            ebr0 = _sub(_sub(dB[j_], _mul(sa1, haR[i1][j_])),
                        _mul(sa2, haR[i2][j_]))
            s = _sub(ear0, _mul(b_, ebr0)) / denom
            t = _sub(_mul(b_, ear0), ebr0) / denom
            s = _sclip(s, -ha[i_], ha[i_])
            t = _sclip(t, -hb[j_], hb[j_])
            ea, eb = A_axes[i_], B_axes[j_]
            cpk = _vscale(_vadd(_vadd(ca, _vscale(ea, s)),
                                _vadd(cb_, _vscale(eb, t))), 0.5)
            ovk_pos = ov > 0
            if best_e is None:
                best_e, n_e, cp_e = ov, tuple(mat(x) for x in nk), \
                    tuple(mat(x) for x in cpk)
                all_e = ovk_pos
            else:
                better = ov < best_e
                best_e = jnp.where(better, ov, best_e)
                n_e = tuple(jnp.where(better, mat(nk[c]), n_e[c])
                            for c in range(3))
                cp_e = tuple(jnp.where(better, mat(cpk[c]), cp_e[c])
                             for c in range(3))
                all_e = all_e & ovk_pos
    active = all_e & all_f & (best_e < min_f * 0.99)
    depth_e = jnp.where(active, best_e, -1.0)
    out.append((ia, ib, ba, bb, n_e, depth_e, cp_e))
    return out


def _pair_candidate_count(model: RobotModel) -> int:
    from thormang_isaacgym_tpu.ops import collide as collide_mod
    counts = {"sphere": 1, "capcap": 1, "capbox": 4, "boxbox": 17}
    return sum(counts[k] for (_, _, k) in collide_mod._pairs(model))


# pair-candidate budget: a runaway guard on the unrolled narrowphase.
# Measured Mosaic compiles (1 v5e chip): ShadowHand 94 cands ~38 s,
# Factory nut+bolt 340 ~75 s, MA_OP3 (two full humanoids + table) 699
# ~194 s — all yielding ~0.2-1.5M env-steps/s vs the per-op XLA path's
# tens of k. Scenes beyond the budget fall back to the XLA path.
_MAX_PAIR_CANDIDATES = 1024


def fused_eligible(model: RobotModel, ground, attractors) -> bool:
    """ground is the normalized spec from ops.sim.build_step_fn: None / a
    constant height (float) / an engine.terrain.Heightfield — all fused-able
    — or an arbitrary callable, which only the XLA path can evaluate."""
    if ground is not None and not isinstance(ground, (int, float)) \
            and not _is_heightfield(ground):
        return False
    if _pair_candidate_count(model) > _MAX_PAIR_CANDIDATES:
        return False
    return True


def _is_heightfield(ground) -> bool:
    from thormang_isaacgym_tpu.engine.terrain import Heightfield
    return isinstance(ground, Heightfield)


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
    tstiff: int = 0
    tdamp: int = 0
    gplane: int = 0
    total: int = 0


def _make_rows(model: RobotModel, ground_rows: int = 0) -> _Rows:
    nq, nv, nj, nb, ng = model.nq, model.nv, model.nj, model.nb, model.ng
    nt = len(getattr(model, "tendons", ()) or ())
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
                    ("geom_fric", ng), ("gravity", 3), ("wrench", 6 * nb),
                    ("tstiff", nt), ("tdamp", nt),
                    ("gplane", ground_rows)]:
        setattr(r, name, off)
        off += n
    r.total = off
    return r


# ===========================================================================
# the kernel
# ===========================================================================

def _norm_torque_bodies(need_torque, nb: int) -> tuple:
    """Normalize the need_torque spec (bool | iterable of body ids) to the
    sorted tuple of bodies whose net contact torque is accumulated."""
    if need_torque is True:
        return tuple(range(nb))
    if not need_torque:
        return ()
    return tuple(sorted({int(b) for b in need_torque}))


def _make_kernel(model: RobotModel, sp, n_steps: int, ground_z: float,
                 attractors=(), hf_ground: bool = False,
                 need_torque=True):
    """hf_ground: heightfield mode — the ground under each contact candidate
    is a per-env LOCAL PLANE z = c + gx*x + gy*y whose 3 coefficients arrive
    as input rows (rows.gplane), sampled from the heightfield outside the
    kernel once per control step (build_fused_step_fn). For the flat case
    the coefficients are trace-time floats (ground_z, 0, 0) and the sheet
    micro-math folds the slope terms away, recovering the v1 instruction
    stream exactly.

    need_torque: per-body net contact TORQUE accumulation (the 6-DOF
    force-sensor half, engine/env.py EnvState.net_torque). False skips it
    entirely; True accumulates for every body; a sequence of body ids
    accumulates ONLY for those bodies (the ones whose sensors the task
    reads — humanoid feet, fingertips, ...). The torque rows ride the
    substep fori_loop carry, so every skipped body saves 3 loop-carried
    vector rows plus its per-contact cross-product adds — the cause of the
    r3->r4 humanoid bench regression when all ~17 bodies paid for 2 feet
    sensors."""
    from thormang_isaacgym_tpu.ops import collide as collide_mod

    nq, nv, nj, nb = model.nq, model.nv, model.nj, model.nb
    tq_bodies = _norm_torque_bodies(need_torque, nb)
    nr = model.n_roots
    cands_n = len(_contact_candidates(model))
    rows = _make_rows(model, ground_rows=3 * cands_n if hf_ground else 0)
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
    # actor-pair collision + tendons + attractors (fused v2)
    pairs = collide_mod._pairs(model)
    pair_bodies = sorted({model.geoms[ia].body for ia, ib, _ in pairs}
                         | {model.geoms[ib].body for ia, ib, _ in pairs})
    attractors = tuple(attractors or ())
    attr_bodies = sorted({a[0] for a in attractors})
    vel_bodies = sorted(set(geom_bodies) | set(pair_bodies)
                        | set(attr_bodies))
    tendons = tuple(getattr(model, "tendons", ()) or ())

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
        t_stiff = [rd(rows.tstiff + t) for t in range(len(tendons))]
        t_damp = [rd(rows.tdamp + t) for t in range(len(tendons))]
        tgt_pos = [rd(rows.tp + j) for j in range(nj)]
        tgt_vel = [rd(rows.tv + j) for j in range(nj)]
        eff_in = [rd(rows.eff + j) for j in range(nj)]

        # body spatial inertias (constant over substeps)
        I_body = [_inertia_body(mass[b], com[b], Icom[b]) for b in range(nb)]
        I_min = [jnp.minimum(jnp.minimum(Icom[b][0], Icom[b][3]), Icom[b][5])
                 for b in range(nb)]

        q0 = tuple(rd(rows.q + i) for i in range(nq))
        qd0 = tuple(rd(rows.qd + i) for i in range(nv))
        net0 = tuple(zero for _ in range(3 * nb + 3 * len(tq_bodies)))

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

            # ---- ground contact (plane z = ground_z, or per-candidate
            # local plane rows in heightfield mode) ----
            f_ext_w = [[0.0] * 6 for _ in range(nb)]   # world [torque, force]
            net_w = [[0.0] * 3 for _ in range(nb)]
            # net contact torque: only for the declared sensor bodies
            net_t = {b: [0.0] * 3 for b in tq_bodies}
            # world velocity of every body touched by contact/attractors
            om_w, vl_w = {}, {}
            for b in vel_bodies:
                om_w[b] = _qrot(quat_w[b], v[b][:3])
                vl_w[b] = _qrot(quat_w[b], v[b][3:])
            if cands:
                # phase 1: candidate geometry + active flags
                infos = []
                n_active = {b: 0.0 for b in geom_bodies}
                for ci, c in enumerate(cands):
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
                    if hf_ground:
                        # local ground plane under this candidate:
                        # z(x, y) = gc + ggx*x + ggy*y (sampled outside)
                        gc = rd(rows.gplane + 3 * ci)
                        ggx = rd(rows.gplane + 3 * ci + 1)
                        ggy = rd(rows.gplane + 3 * ci + 2)
                        plane_z = _add(gc, _add(_mul(ggx, p_c[0]),
                                                _mul(ggy, p_c[1])))
                        # unit upward normal + cos(tilt)
                        inv_nn = jax.lax.rsqrt(
                            mat(_add(1.0, _add(_mul(ggx, ggx),
                                               _mul(ggy, ggy)))))
                        n_g = (_neg(_mul(ggx, inv_nn)),
                               _neg(_mul(ggy, inv_nn)), inv_nn)
                        # penetration along the normal: vertical gap x cos
                        depth = _add(_mul(_sub(plane_z, p_c[2]), inv_nn),
                                     eff_r)
                        cp = tuple(_sub(p_c[k], _mul(n_g[k], eff_r))
                                   for k in range(3))
                    else:
                        n_g = None       # flat: world +z, folded paths below
                        depth = ground_z - (mat(p_c[2]) - eff_r)
                        cp = (p_c[0], p_c[1], _sub(p_c[2], eff_r))
                    active = (depth > 0.0).astype(f32)
                    n_active[b] = _add(n_active[b], active)
                    infos.append((c, cp, depth, active, n_g))
                # phase 2: forces
                for (c, cp, depth, active, n_g) in infos:
                    b = c["body"]
                    r_arm = _vsub(cp, pos_w[b])
                    v_p = _vadd(vl_w[b], _cross(om_w[b], r_arm))
                    if n_g is None:
                        vn = mat(v_p[2])
                        vt = (v_p[0], v_p[1], 0.0)
                        vt_norm = jnp.sqrt(mat(_add(_mul(vt[0], vt[0]),
                                                    _mul(vt[1], vt[1])))
                                           + 1e-18)
                    else:
                        vn = mat(_dot3(v_p, n_g))
                        vt = tuple(_sub(v_p[k], _mul(n_g[k], vn))
                                   for k in range(3))
                        vt_norm = jnp.sqrt(mat(_dot3(vt, vt)) + 1e-18)
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
                    if n_g is None:
                        f = (_mul(vt[0], scale), _mul(vt[1], scale), fn)
                    else:
                        f = tuple(_add(_mul(n_g[k], fn), _mul(vt[k], scale))
                                  for k in range(3))
                    tq = _cross(r_arm, f)
                    for k in range(3):
                        f_ext_w[b][k] = _add(f_ext_w[b][k], tq[k])
                        f_ext_w[b][3 + k] = _add(f_ext_w[b][3 + k], f[k])
                        net_w[b][k] = _add(net_w[b][k], f[k])
                        if b in net_t:
                            net_t[b][k] = _add(net_t[b][k], tq[k])

            # external wrenches
            for b in range(nb):
                for k in range(6):
                    f_ext_w[b][k] = _add(f_ext_w[b][k], wrench[b][k])

            # ---- actor-pair contact (mirrors ops/collide.py): explicit
            # spring force + friction here; the implicit velocity reaction
            # accumulates as rank-1 added inertia per touched body ----
            dIA_acc = {b: ((0.0,) * 6, (0.0,) * 9, (0.0,) * 6)
                       for b in pair_bodies}
            if pairs:
                gpose_cache = {}

                def gpose(i):
                    if i in gpose_cache:
                        return gpose_cache[i]
                    g = model.geoms[i]
                    b = g.body
                    gp_s = tuple(float(x) for x in g.pos)
                    gq_s = tuple(float(x) for x in g.quat)
                    gq = _qmul(quat_w[b], gq_s)
                    gp = _vadd(pos_w[b], _qrot(quat_w[b], gp_s))
                    gpose_cache[i] = (gp, gq)
                    return gp, gq

                kn_cfg = float(sp.contact_stiffness)
                kd_cfg = float(sp.contact_damping)
                D_imp = h * kn_cfg + kd_cfg
                max_dep = float(sp.max_depenetration_velocity)
                fv = float(sp.friction_vel)
                for (ia, ib, ba, bb, n, depth, cp) in _s_pair_candidates(
                        model, pairs, gpose, mat):
                    active = depth > 0
                    activef = jnp.where(active, 1.0, 0.0)
                    va = _vadd(vl_w[ba],
                               _cross(om_w[ba], _vsub(cp, pos_w[ba])))
                    vb = _vadd(vl_w[bb],
                               _cross(om_w[bb], _vsub(cp, pos_w[bb])))
                    vrel = _vsub(vb, va)
                    vn = _dot3(vrel, n)
                    m_a, m_b = mass[ba], mass[bb]
                    m_red = m_a * m_b / (m_a + m_b)
                    # explicit-spring stability clamp for the pair's
                    # reduced mass (mirrors ops/collide.py kn_eff)
                    kn_eff = jnp.minimum(kn_cfg, (0.25 / (h * h)) * m_red)
                    spring = _smin(_mul(kn_eff, depth), D_imp * max_dep)
                    fn = _mul(_smax(_sub(spring, _mul(D_imp, vn)), 0.0),
                              activef)
                    cap = jnp.where(
                        vn > 0.0,
                        m_red * _smax(_sub(max_dep, vn), 0.0) / h
                        + D_imp * max_dep, jnp.inf)
                    fn_exp = _smin(fn, cap)
                    vt = _vsub(vrel, _vscale(n, vn))
                    vt_norm = _ssqrt(_dot3(vt, vt))
                    mu = _ssqrt(_mul(geom_fric[ia], geom_fric[ib]))
                    c_t = _mul(mu, fn_exp) / _smax(vt_norm, fv)
                    ft = _vscale(vt, _mul(_neg(c_t), activef))
                    f_on_b = _vadd(_vscale(n, fn_exp), ft)
                    r_a = _vsub(cp, pos_w[ba])
                    r_b = _vsub(cp, pos_w[bb])
                    t_a = _cross(r_a, _vscale(f_on_b, -1.0))
                    t_b = _cross(r_b, f_on_b)
                    for k in range(3):
                        f_ext_w[ba][k] = _add(f_ext_w[ba][k], t_a[k])
                        f_ext_w[ba][3 + k] = _sub(f_ext_w[ba][3 + k],
                                                  f_on_b[k])
                        f_ext_w[bb][k] = _add(f_ext_w[bb][k], t_b[k])
                        f_ext_w[bb][3 + k] = _add(f_ext_w[bb][3 + k],
                                                  f_on_b[k])
                        net_w[ba][k] = _sub(net_w[ba][k], f_on_b[k])
                        net_w[bb][k] = _add(net_w[bb][k], f_on_b[k])
                        if ba in net_t:
                            net_t[ba][k] = _add(net_t[ba][k], t_a[k])
                        if bb in net_t:
                            net_t[bb][k] = _add(net_t[bb][k], t_b[k])
                    # implicit velocity reaction -> added inertia.
                    # Tangent damping is isotropic in the contact tangent
                    # plane, so instead of building an explicit (t1, t2)
                    # basis and three rank-1 updates (ops/collide.py), add
                    # M_t * U U^T (all 3 directions) + (M_n - M_t) * u_n
                    # u_n^T — identical matrix, ~3x fewer multiplies.
                    gate = jnp.where(active & (vn < 0.5 * max_dep), 1.0, 0.0)
                    M_n = _mul(h * D_imp, gate)
                    M_t = _mul(_mul(h, c_t), activef)
                    for body in (ba, bb):
                        r_l = _qrotinv(quat_w[body], _vsub(cp, pos_w[body]))
                        n_l = _qrotinv(quat_w[body], n)
                        u_n = _cross(r_l, n_l) + n_l
                        dIA_acc[body] = _symI_G_add(dIA_acc[body], r_l, M_t)
                        dIA_acc[body] = _symI_rank1_add(
                            dIA_acc[body], u_n, _sub(M_n, M_t))

            # ---- attractors (gymapi rigid-body attractor equivalent,
            # ops/sim.py attractor block): world-point springs, clamped ----
            for (ab, local_p, target, kp_a, kd_a) in attractors:
                lp = tuple(float(x) for x in local_p)
                wp = _vadd(pos_w[ab], _qrot(quat_w[ab], lp))
                vp = _vadd(vl_w[ab],
                           _cross(om_w[ab], _vsub(wp, pos_w[ab])))
                m_lin = mass[ab]
                r2 = float(np.dot(np.asarray(local_p, np.float64),
                                  np.asarray(local_p, np.float64)))
                if r2 > 1e-6:
                    m_eff = _smin(m_lin, I_min[ab] / (r2 + 1e-6))
                else:
                    m_eff = m_lin
                kp_c = _smin(float(kp_a), 0.25 * m_eff / (h * h))
                kd_c = _smin(float(kd_a), 0.5 * m_eff / h)
                tgt = tuple(float(x) for x in target)
                F = _vsub(_vscale(_vsub(tgt, wp), kp_c), _vscale(vp, kd_c))
                tq = _cross(_vsub(wp, pos_w[ab]), F)
                for k in range(3):
                    f_ext_w[ab][k] = _add(f_ext_w[ab][k], tq[k])
                    f_ext_w[ab][3 + k] = _add(f_ext_w[ab][3 + k], F[k])

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

            # ---- fixed tendons (L = C q spring-limited to [lo, hi];
            # mirrors ops/dynamics.passive_forces' tendon block) ----
            for t_i, tdn in enumerate(tendons):
                coef = [float(c) for c in tdn[0]]
                lo_t, hi_t = float(tdn[1]), float(tdn[2])
                L = 0.0
                Ld = 0.0
                for j in range(nj):
                    if coef[j] != 0.0:
                        L = _fma(L, coef[j], jq[j])
                        Ld = _fma(Ld, coef[j], jqd[j])
                below_t = _smin(_sub(L, lo_t), 0.0)
                above_t = _smax(_sub(L, hi_t), 0.0)
                viol_t = _add(below_t, above_t)
                in_vio_t = jnp.where((below_t < 0) | (above_t > 0), 1.0, 0.0)
                k_t = t_stiff[t_i]
                d_t = t_damp[t_i]
                f_t = _sub(_mul(in_vio_t,
                                _neg(_mul(k_t, _add(viol_t, _mul(h, Ld))))),
                           _mul(d_t, Ld))
                diag_t = _add(_mul(in_vio_t, _mul(h * h, k_t)),
                              _mul(h, d_t))
                for j in range(nj):
                    if coef[j] != 0.0:
                        tau[j] = _add(tau[j], _mul(coef[j], f_t))
                        extra_diag[j] = _add(
                            extra_diag[j],
                            _mul(coef[j] * coef[j], diag_t))

            # ---- bias forces pA (link frame) ----
            IA = [None] * nb
            pA = [None] * nb
            for b in range(nb):
                IA[b] = I_body[b]
                if b in dIA_acc:
                    IA[b] = _symI_add(IA[b], dIA_acc[b])
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

            # layout: all force rows (3*nb), then torque rows for the
            # declared sensor bodies only (3*len(tq_bodies))
            net_flat = tuple(
                mat(net_w[b][k]) for b in range(nb) for k in range(3)
            ) + tuple(
                mat(net_t[b][k]) for b in tq_bodies for k in range(3))
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
        for i in range(3 * nb + 3 * len(tq_bodies)):
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


def _ground_plane_sampler(model: RobotModel, hf):
    """Batched (B, nq) q -> (B, 3C) per-candidate local ground plane rows
    (c, gx, gy) with z(x, y) = c + gx*x + gy*y, sampled from the heightfield
    at each candidate's CURRENT world xy — once per control step, in plain
    XLA where gathers are free, then frozen across the kernel's substeps.
    At <= a few cm of motion per control step this is a sub-cell
    approximation of the bilinear surface (terrain cells are 10 cm)."""
    from thormang_isaacgym_tpu.core import quat as Q
    from thormang_isaacgym_tpu.ops.kinematics import forward_kinematics

    cands = _contact_candidates(model)
    bodies = np.array([c["body"] for c in cands])
    gpos = np.array([c["gpos"] for c in cands], np.float32)
    gquat = np.array([c["gquat"] for c in cands], np.float32)
    offs = np.array([c["off"] for c in cands], np.float32)
    # clustered patch sampler: a robot's contact candidates all sit within
    # its body extent (<< 32 cells), and a plain table gather inside the
    # jitted train/bench loop is ~16x slower on TPU (terrain.clustered_fn)
    hgfn = hf.clustered_fn(patch_cells=32, grad=True)
    zeros_qd = jnp.zeros(model.nv)

    def one_env(q):
        frames = forward_kinematics(model, q, zeros_qd)
        bq = frames.quat[bodies]
        bp = frames.pos[bodies]
        gq = Q.mul(bq, jnp.asarray(gquat))
        gp = bp + Q.rotate(bq, jnp.asarray(gpos))
        return gp + Q.rotate(gq, jnp.asarray(offs))        # (C, 3)

    def sample(q):
        pc = jax.vmap(one_env)(q)                          # (B, C, 3)
        x, y = pc[..., 0], pc[..., 1]
        z0, gx, gy = hgfn(x, y)                            # (B, C) each
        c0 = z0 - gx * x - gy * y
        return jnp.stack([c0, gx, gy], axis=-1).reshape(q.shape[0], -1)

    return sample


def build_fused_step_fn(model: RobotModel, sim_params, *, n_steps=None,
                        ground=0.0, env_block: int = 512,
                        interpret: bool | None = None, attractors=(),
                        need_torque=True):
    """Returns step(params, q, qd, ctrl, wrench) -> (q', qd', net), batched,
    running `n_steps` substeps (default sim_params.substeps) in ONE kernel.

    ground: constant plane height (float) or an engine.terrain.Heightfield
    (per-candidate local-plane terrain contact; see _ground_plane_sampler).

    interpret=True (default off-TPU) runs the kernel body as a plain traced
    jnp function via _FakeRef instead of lowering through Mosaic."""
    n_steps = int(n_steps if n_steps is not None else sim_params.substeps)
    hf = ground if _is_heightfield(ground) else None
    ground_z = 0.0 if hf is not None else float(ground or 0.0)
    kernel, rows = _make_kernel(model, sim_params, n_steps, ground_z,
                                attractors=attractors,
                                hf_ground=hf is not None,
                                need_torque=need_torque)
    plane_rows_fn = _ground_plane_sampler(model, hf) if hf is not None else None
    nq, nv, nb = model.nq, model.nv, model.nb
    tq_bodies = _norm_torque_bodies(need_torque, nb)
    tq_ids = np.array(tq_bodies, np.int32)
    out_rows = nq + nv + 3 * nb + 3 * len(tq_bodies)

    def unpack_net(out, B):
        """(out_rows, B) kernel output -> (B, nb, 6) [force | torque], torque
        zero for bodies outside the declared sensor set."""
        net3 = out[nq + nv:nq + nv + 3 * nb].T.reshape(B, nb, 3)
        tq = jnp.zeros((B, nb, 3), net3.dtype)
        if len(tq_bodies):
            tq_rows = out[nq + nv + 3 * nb:].T.reshape(B, len(tq_bodies), 3)
            tq = tq.at[:, tq_ids, :].set(tq_rows)
        return jnp.concatenate([net3, tq], axis=-1)

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
        nt = len(getattr(model, "tendons", ()) or ())
        if nt:
            cols += [TT(params.tendon_stiffness), TT(params.tendon_damping)]
        if plane_rows_fn is not None:
            cols.append(TT(plane_rows_fn(q)))
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
            return out[:nq].T, out[nq:nq + nv].T, unpack_net(out, B)
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
        return out[:nq].T, out[nq:nq + nv].T, unpack_net(out, B)

    return step
