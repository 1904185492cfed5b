"""Unit tests for the quaternion library against numpy/scipy-style references."""
import numpy as np
import jax.numpy as jnp

from thormang_isaacgym_tpu.core import quat


def random_quats(n, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(n, 4)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def np_quat_to_matrix(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def test_rotate_matches_matrix():
    qs = random_quats(32)
    vs = np.random.RandomState(1).randn(32, 3)
    out = np.asarray(quat.rotate(jnp.array(qs), jnp.array(vs)))
    for i in range(32):
        expect = np_quat_to_matrix(qs[i]) @ vs[i]
        np.testing.assert_allclose(out[i], expect, atol=1e-5)


def test_mul_composes_rotations():
    qa, qb = random_quats(8, 2), random_quats(8, 3)
    v = np.random.RandomState(4).randn(8, 3)
    ab = quat.mul(jnp.array(qa), jnp.array(qb))
    out1 = np.asarray(quat.rotate(ab, jnp.array(v)))
    out2 = np.asarray(quat.rotate(jnp.array(qa), quat.rotate(jnp.array(qb), jnp.array(v))))
    np.testing.assert_allclose(out1, out2, atol=1e-5)


def test_rotate_inv_roundtrip():
    qs = random_quats(16, 5)
    vs = np.random.RandomState(6).randn(16, 3)
    v2 = quat.rotate_inv(jnp.array(qs), quat.rotate(jnp.array(qs), jnp.array(vs)))
    np.testing.assert_allclose(np.asarray(v2), vs, atol=1e-5)


def test_euler_roundtrip():
    rng = np.random.RandomState(7)
    roll = rng.uniform(-3, 3, 64)
    pitch = rng.uniform(-1.5, 1.5, 64)  # avoid gimbal lock
    yaw = rng.uniform(-3, 3, 64)
    q = quat.from_euler_xyz(jnp.array(roll), jnp.array(pitch), jnp.array(yaw))
    r2, p2, y2 = quat.to_euler_xyz(q)
    np.testing.assert_allclose(np.asarray(r2), roll, atol=1e-4)
    np.testing.assert_allclose(np.asarray(p2), pitch, atol=1e-4)
    np.testing.assert_allclose(np.asarray(y2), yaw, atol=1e-4)


def test_euler_matches_urdf_rpy_convention():
    # URDF rpy applies Rz(yaw) @ Ry(pitch) @ Rx(roll)
    roll, pitch, yaw = 0.3, -0.4, 1.1
    q = quat.from_euler_xyz(jnp.array(roll), jnp.array(pitch), jnp.array(yaw))
    R = np.asarray(quat.to_matrix(q))

    def rx(a):
        return np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]])

    def ry(a):
        return np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]])

    def rz(a):
        return np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]])

    np.testing.assert_allclose(R, rz(yaw) @ ry(pitch) @ rx(roll), atol=1e-6)


def test_matrix_roundtrip():
    qs = random_quats(64, 8)
    m = quat.to_matrix(jnp.array(qs))
    q2 = np.asarray(quat.from_matrix(m))
    # q and -q are the same rotation
    dot = np.abs(np.sum(q2 * qs, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_from_axis_angle():
    q = quat.from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.array(np.pi / 2))
    v = quat.rotate(q, jnp.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(v), [0.0, 1.0, 0.0], atol=1e-6)


def test_integrate_constant_omega():
    # integrating omega_z = 1 rad/s for 1s in small steps ~ 1 rad yaw
    import jax

    omega = jnp.array([0.0, 0.0, 1.0])

    @jax.jit
    def run(q):
        return jax.lax.fori_loop(0, 1000, lambda i, q: quat.integrate(q, omega, 1e-3), q)

    q = run(quat.identity())
    _, _, yaw = quat.to_euler_xyz(q)
    np.testing.assert_allclose(float(yaw), 1.0, atol=1e-3)


def test_wrap_and_shortest_distance():
    # 3*pi wraps to an angle equivalent to pi (boundary maps to -pi)
    w = float(quat.wrap_to_pi(jnp.array(3 * np.pi)))
    np.testing.assert_allclose(np.cos(w), -1.0, atol=1e-6)
    assert -np.pi - 1e-5 <= w <= np.pi + 1e-5
    d = quat.shortest_angle_distance(jnp.array(3.0), jnp.array(-3.0))
    np.testing.assert_allclose(float(d), 2 * np.pi - 6.0, atol=1e-6)
    np.testing.assert_allclose(float(quat.wrap_to_pi(jnp.array(0.5))), 0.5, atol=1e-6)
    np.testing.assert_allclose(float(quat.wrap_to_pi(jnp.array(2 * np.pi + 0.5))), 0.5, atol=1e-6)
