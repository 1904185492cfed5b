"""Spatial algebra unit tests against explicit 6x6 matrix constructions."""
import numpy as np
import jax.numpy as jnp

from thormang_isaacgym_tpu.core import spatial, quat


def rand_rp(seed):
    rng = np.random.RandomState(seed)
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    R = np.asarray(quat.to_matrix(jnp.array(q)))
    p = rng.randn(3)
    return R, p


def test_motion_transform_roundtrip():
    R, p = rand_rp(0)
    m = np.random.RandomState(1).randn(6)
    up = spatial.motion_to_parent(jnp.array(R), jnp.array(p), jnp.array(m))
    back = spatial.motion_to_child(jnp.array(R), jnp.array(p), up)
    np.testing.assert_allclose(np.asarray(back), m, atol=1e-5)


def test_motion_matches_xform_matrix():
    R, p = rand_rp(2)
    m = np.random.RandomState(3).randn(6)
    X = np.asarray(spatial.motion_xform(jnp.array(R), jnp.array(p)))
    np.testing.assert_allclose(
        np.asarray(spatial.motion_to_parent(jnp.array(R), jnp.array(p), jnp.array(m))),
        X @ m, atol=1e-5)


def test_force_matches_xform_matrix():
    R, p = rand_rp(4)
    f = np.random.RandomState(5).randn(6)
    Y = np.asarray(spatial.force_xform(jnp.array(R), jnp.array(p)))
    np.testing.assert_allclose(
        np.asarray(spatial.force_to_parent(jnp.array(R), jnp.array(p), jnp.array(f))),
        Y @ f, atol=1e-5)
    back = spatial.force_to_child(jnp.array(R), jnp.array(p),
                                  spatial.force_to_parent(jnp.array(R), jnp.array(p), jnp.array(f)))
    np.testing.assert_allclose(np.asarray(back), f, atol=1e-5)


def test_force_is_inverse_transpose_of_motion():
    R, p = rand_rp(6)
    X = np.asarray(spatial.motion_xform(jnp.array(R), jnp.array(p)))
    Y = np.asarray(spatial.force_xform(jnp.array(R), jnp.array(p)))
    np.testing.assert_allclose(Y, np.linalg.inv(X).T, atol=1e-5)


def test_power_invariance():
    # f . m is frame-invariant: (Y f) . (X m) = f . m
    R, p = rand_rp(7)
    rng = np.random.RandomState(8)
    m, f = rng.randn(6), rng.randn(6)
    mp = spatial.motion_to_parent(jnp.array(R), jnp.array(p), jnp.array(m))
    fp = spatial.force_to_parent(jnp.array(R), jnp.array(p), jnp.array(f))
    np.testing.assert_allclose(float(jnp.dot(mp, fp)), float(np.dot(m, f)), atol=1e-4)


def test_inertia_point_mass_transform():
    # point mass m at child origin, child at offset p from parent (R = I):
    # parent-frame inertia must be that of a point mass at offset p.
    m = 2.5
    p = np.array([0.3, -0.2, 0.7])
    I_child = np.asarray(spatial.inertia_matrix(
        jnp.array(m), jnp.zeros(3), jnp.zeros((3, 3))))
    I_parent = np.asarray(spatial.transform_inertia_to_parent(
        jnp.eye(3), jnp.array(p), jnp.array(I_child)))
    expected = np.asarray(spatial.inertia_matrix(
        jnp.array(m), jnp.array(p), jnp.zeros((3, 3))))
    np.testing.assert_allclose(I_parent, expected, atol=1e-5)


def test_inertia_mul_matches_matrix():
    rng = np.random.RandomState(9)
    mass = 3.0
    com = rng.randn(3) * 0.1
    A = rng.randn(3, 3)
    I_com = A @ A.T + np.eye(3)
    v = rng.randn(6)
    I66 = np.asarray(spatial.inertia_matrix(jnp.array(mass), jnp.array(com), jnp.array(I_com)))
    f1 = np.asarray(spatial.inertia_mul(jnp.array(mass), jnp.array(com), jnp.array(I_com), jnp.array(v)))
    np.testing.assert_allclose(f1, I66 @ v, atol=1e-4)


def test_cross_motion_force_duality():
    # d/dt (I v) includes v x* (I v); check  (a x b) . f = -b . (a x* f)
    rng = np.random.RandomState(10)
    a, b, f = rng.randn(6), rng.randn(6), rng.randn(6)
    lhs = float(jnp.dot(spatial.cross_motion(jnp.array(a), jnp.array(b)), jnp.array(f)))
    rhs = -float(jnp.dot(jnp.array(b), spatial.cross_force(jnp.array(a), jnp.array(f))))
    np.testing.assert_allclose(lhs, rhs, atol=1e-4)
