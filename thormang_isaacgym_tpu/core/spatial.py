"""Spatial (6D) vector algebra for articulated rigid-body dynamics.

Featherstone-convention spatial vectors: motion vectors m = (omega, v) and
force vectors f = (n, F), each a (...,6) array with the angular part first.
A body's velocity is expressed in its own link frame at the link-frame origin.

This is the TPU-native replacement for the linear algebra inside the
reference's PhysX solver (spec'd by its use at
`/root/reference/isaacgymenvs/tasks/base/vec_task.py:332-339`): everything is
pure jnp on f32 arrays, written for a single env and `vmap`-ed over the env
axis by the dynamics layer, so XLA sees large batched elementwise ops (VPU)
and small batched matmuls (MXU).

Transforms are (R, p) pairs: R is a 3x3 rotation mapping child(B)-frame
coordinates into parent(A)-frame coordinates, p is the origin of B in A.
"""
from __future__ import annotations

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# cross products
# ---------------------------------------------------------------------------

def skew(v: jnp.ndarray) -> jnp.ndarray:
    """3-vector -> 3x3 skew-symmetric matrix (v x)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


def cross_motion(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Spatial cross product a x b for motion vectors (vel x vel)."""
    aw, av = a[..., :3], a[..., 3:]
    bw, bv = b[..., :3], b[..., 3:]
    return jnp.concatenate(
        [jnp.cross(aw, bw), jnp.cross(aw, bv) + jnp.cross(av, bw)], axis=-1
    )


def cross_force(a: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Spatial cross product a x* f (motion x force), e.g. gyroscopic bias."""
    aw, av = a[..., :3], a[..., 3:]
    n, F = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(aw, n) + jnp.cross(av, F), jnp.cross(aw, F)], axis=-1
    )


# ---------------------------------------------------------------------------
# frame transforms of motion / force vectors
# ---------------------------------------------------------------------------

def motion_to_parent(R: jnp.ndarray, p: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Motion vector expressed in child frame B -> parent frame A."""
    w = (R @ m[..., :3, None])[..., 0]
    v = (R @ m[..., 3:, None])[..., 0] + jnp.cross(p, w)
    return jnp.concatenate([w, v], axis=-1)


def motion_to_child(R: jnp.ndarray, p: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Motion vector expressed in parent frame A -> child frame B."""
    w = m[..., :3]
    v = m[..., 3:] - jnp.cross(p, w)
    Rt = jnp.swapaxes(R, -1, -2)
    return jnp.concatenate([(Rt @ w[..., None])[..., 0], (Rt @ v[..., None])[..., 0]], axis=-1)


def force_to_parent(R: jnp.ndarray, p: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Force vector expressed in child frame B -> parent frame A."""
    F = (R @ f[..., 3:, None])[..., 0]
    n = (R @ f[..., :3, None])[..., 0] + jnp.cross(p, F)
    return jnp.concatenate([n, F], axis=-1)


def force_to_child(R: jnp.ndarray, p: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Force vector expressed in parent frame A -> child frame B."""
    Rt = jnp.swapaxes(R, -1, -2)
    F = f[..., 3:]
    n = f[..., :3] - jnp.cross(p, F)
    return jnp.concatenate([(Rt @ n[..., None])[..., 0], (Rt @ F[..., None])[..., 0]], axis=-1)


def motion_xform(R: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """6x6 motion transform child->parent: m_A = X @ m_B.

    X = [[R, 0], [p~ R, R]] with p~ = skew(p).
    """
    Z = jnp.zeros_like(R)
    top = jnp.concatenate([R, Z], axis=-1)
    bot = jnp.concatenate([skew(p) @ R, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


# ---------------------------------------------------------------------------
# spatial inertia
# ---------------------------------------------------------------------------

def inertia_matrix(mass: jnp.ndarray, com: jnp.ndarray, I_com: jnp.ndarray) -> jnp.ndarray:
    """Full 6x6 spatial inertia about the link-frame origin.

    mass: (...,), com: (...,3) (com offset in link frame),
    I_com: (...,3,3) rotational inertia about the com.

    I = [[I_com + m c~ c~^T, m c~], [m c~^T, m 1]]
    """
    c = skew(com)
    ct = jnp.swapaxes(c, -1, -2)
    m = mass[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=I_com.dtype), I_com.shape)
    top = jnp.concatenate([I_com + m * (c @ ct), m * c], axis=-1)
    bot = jnp.concatenate([m * ct, m * eye], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def inertia_mul(mass, com, I_com, m_vec: jnp.ndarray) -> jnp.ndarray:
    """Compact I @ v without forming the 6x6 matrix.

    f = ( I_com w + m c x (v + w x c),  m (v + w x c) )
    """
    w, v = m_vec[..., :3], m_vec[..., 3:]
    v_com = v + jnp.cross(w, com)
    F = mass[..., None] * v_com
    n = (I_com @ w[..., None])[..., 0] + jnp.cross(com, F)
    return jnp.concatenate([n, F], axis=-1)


def force_xform(R: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """6x6 force transform child->parent: f_A = Y @ f_B.

    Y = [[R, p~ R], [0, R]] — the matrix form of :func:`force_to_parent`,
    and the inverse-transpose of :func:`motion_xform`.
    """
    Z = jnp.zeros_like(R)
    top = jnp.concatenate([R, skew(p) @ R], axis=-1)
    bot = jnp.concatenate([Z, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def transform_inertia_to_parent(R: jnp.ndarray, p: jnp.ndarray, IA: jnp.ndarray) -> jnp.ndarray:
    """Transform a 6x6 articulated-body inertia from child to parent coords.

    Inertia maps motion -> force, so it transforms with the force transform:
    I_A = Y I_B Y^T,  Y = force_xform(R, p).
    Batched (…,6,6) @ (…,6,6) — maps onto the MXU.
    """
    Y = force_xform(R, p)
    return Y @ IA @ jnp.swapaxes(Y, -1, -2)
