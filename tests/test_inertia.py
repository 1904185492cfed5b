"""Jacobian / mass-matrix / RNEA validation against FK and the ABA.

The reference exposes these quantities as opaque C++ tensors
(`acquire_jacobian_tensor` / `acquire_mass_matrix_tensor`); here they are
pure functions and must satisfy the defining identities exactly:
  J(q) qd == body world velocities from FK
  H(q) qdd + bias(q, qd) == tau   (vs. the independent ABA implementation)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thormang_isaacgym_tpu.models import load_urdf
from thormang_isaacgym_tpu.ops import inertia as di
from thormang_isaacgym_tpu.ops.dynamics import aba
from thormang_isaacgym_tpu.ops.kinematics import forward_kinematics
from thormang_isaacgym_tpu.core import quat as Q

ASSETS = "assets"


@pytest.fixture(scope="module")
def dp():
    return load_urdf(f"{ASSETS}/double_pendulum.urdf", fix_base_link=True)


@pytest.fixture(scope="module")
def cartpole():
    return load_urdf(f"{ASSETS}/cartpole.urdf", fix_base_link=True)


def rand_state(model, key, floating=False):
    k1, k2, k3 = jax.random.split(key, 3)
    q = 0.7 * jax.random.normal(k1, (model.nq,))
    if floating:
        quat = q[3:7] / jnp.linalg.norm(q[3:7])
        q = q.at[3:7].set(quat)
    qd = 0.5 * jax.random.normal(k2, (model.nv,))
    tau = jax.random.normal(k3, (model.nj,))
    return q, qd, tau


def test_jacobian_matches_fk_velocity_fixed_base(dp):
    q, qd, _ = rand_state(dp, jax.random.key(0))
    frames = forward_kinematics(dp, q, qd)
    J = di.body_jacobians(dp, q, frames)          # (nb, 6, nj)
    v = J @ qd                                    # cols == joint_qd
    np.testing.assert_allclose(np.asarray(v[:, :3]), np.asarray(frames.omega),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(v[:, 3:]), np.asarray(frames.vel),
                               atol=1e-5)


def test_jacobian_matches_fk_velocity_floating():
    model = load_urdf(f"{ASSETS}/double_pendulum.urdf", fix_base_link=False)
    q, qd, _ = rand_state(model, jax.random.key(1), floating=True)
    frames = forward_kinematics(model, q, qd)
    # convert state qd [omega_body, v_world, joint] -> world-twist columns
    omega_w = Q.rotate(q[3:7], qd[0:3])
    cols = jnp.concatenate([omega_w, qd[3:6], qd[6:]])
    J = di.body_jacobians(model, q, frames)
    v = J @ cols
    np.testing.assert_allclose(np.asarray(v[:, :3]), np.asarray(frames.omega),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(v[:, 3:]), np.asarray(frames.vel),
                               atol=1e-5)


def test_point_jacobian_offset(dp):
    q, qd, _ = rand_state(dp, jax.random.key(2))
    frames = forward_kinematics(dp, q, qd)
    off = (0.1, -0.2, 0.3)
    b = dp.nb - 1
    Jp = di.point_jacobian(dp, q, b, off, frames)
    v = Jp @ qd
    r_w = Q.rotate(frames.quat[b], jnp.asarray(off))
    v_expect = frames.vel[b] + jnp.cross(frames.omega[b], r_w)
    np.testing.assert_allclose(np.asarray(v[3:]), np.asarray(v_expect), atol=1e-5)


@pytest.mark.parametrize("fixture", ["dp", "cartpole"])
def test_mass_matrix_rnea_vs_aba(fixture, request):
    model = request.getfixturevalue(fixture)
    params = model.default_params()
    for seed in range(3):
        q, qd, tau = rand_state(model, jax.random.key(seed))
        g = jnp.asarray([0.0, 0.0, -9.81])
        qdd = aba(model, params, q, qd, tau,
                  jnp.zeros((model.nb, 6)), g)
        H = di.mass_matrix(model, params, q)
        bias = di.inverse_dynamics(model, params, q, qd, gravity=g)
        np.testing.assert_allclose(np.asarray(H), np.asarray(H.T), atol=1e-5)
        assert np.all(np.linalg.eigvalsh(np.asarray(H)) > 0)
        tau_rec = H @ qdd + bias
        np.testing.assert_allclose(np.asarray(tau_rec), np.asarray(tau),
                                   rtol=1e-3, atol=1e-3)


def test_rnea_roundtrip_with_prescribed_qdd(dp):
    params = dp.default_params()
    q, qd, _ = rand_state(dp, jax.random.key(7))
    qdd_target = jnp.asarray([0.3, -1.2])
    g = jnp.asarray([0.0, 0.0, -9.81])
    tau = di.inverse_dynamics(dp, params, q, qd, joint_qdd=qdd_target, gravity=g)
    qdd = aba(dp, params, q, qd, tau, jnp.zeros((dp.nb, 6)), g)
    np.testing.assert_allclose(np.asarray(qdd), np.asarray(qdd_target),
                               rtol=1e-4, atol=1e-4)


def test_gravity_compensation_holds_static(dp):
    params = dp.default_params()
    q = jnp.asarray([0.9, -0.4])
    tau_g = di.gravity_compensation(dp, params, q)
    qdd = aba(dp, params, q, jnp.zeros(dp.nv), tau_g,
              jnp.zeros((dp.nb, 6)), params.gravity)
    np.testing.assert_allclose(np.asarray(qdd), 0.0, atol=1e-4)
