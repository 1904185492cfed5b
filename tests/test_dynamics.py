"""Physics validation against analytic mechanics (SURVEY.md §4: "unit tests
for spatial algebra / ABA / contact kernels against analytic cases")."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thormang_isaacgym_tpu.models import load_urdf
from thormang_isaacgym_tpu.ops import SimParams, build_step_fn, zero_controls
from thormang_isaacgym_tpu.ops.dynamics import aba
from thormang_isaacgym_tpu.ops.kinematics import forward_kinematics

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets")
G = 9.81


@pytest.fixture(scope="module")
def pendulum():
    return load_urdf(os.path.join(ASSETS, "pendulum.urdf"), fix_base_link=True)


def batched(params, n=1):
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (n,) + x.shape), params)


def test_pendulum_analytic_acceleration(pendulum):
    """qdd = -(g/l) sin(theta) for a point-mass pendulum."""
    params = pendulum.default_params()
    l = 0.7
    for theta in [0.0, 0.3, 1.0, -2.0]:
        q = jnp.array([theta])
        qd = jnp.array([0.0])
        qdd = aba(pendulum, params, q, qd, jnp.zeros(1),
                  jnp.zeros((pendulum.nb, 6)), jnp.array([0.0, 0.0, -G]))
        expected = -(G / l) * np.sin(theta) * (1.2 * l**2) / (1.2 * l**2 + 1e-6)
        np.testing.assert_allclose(float(qdd[0]), expected, rtol=2e-3, atol=1e-4)


def test_pendulum_energy_conservation(pendulum):
    """Undamped pendulum conserves E = 0.5 m l^2 w^2 - m g l cos(theta)."""
    sp = SimParams(dt=0.002, substeps=1, gravity=(0.0, 0.0, -G))
    step = build_step_fn(pendulum, sp)
    params = batched(pendulum.default_params())
    q = jnp.array([[1.2]])
    qd = jnp.array([[0.0]])
    ctrl = zero_controls(pendulum, 1)
    wrench = jnp.zeros((1, pendulum.nb, 6))

    m, l = 1.2, 0.7

    def energy(q, qd):
        return 0.5 * m * l**2 * float(qd[0, 0]) ** 2 - m * G * l * np.cos(float(q[0, 0]))

    e0 = energy(q, qd)

    @jax.jit
    def run(q, qd):
        def body(c, _):
            q, qd = c
            return step(params, q, qd, ctrl, wrench)[:2], None
        (q, qd), _ = jax.lax.scan(body, (q, qd), None, length=2500)
        return q, qd

    q, qd = run(q, qd)
    e1 = energy(q, qd)
    # symplectic Euler: bounded energy error
    assert abs(e1 - e0) < 0.05 * abs(e0) + 0.05, (e0, e1)


def test_pendulum_small_oscillation_period(pendulum):
    """Small-angle period T = 2 pi sqrt(l/g)."""
    sp = SimParams(dt=0.001, substeps=1, gravity=(0.0, 0.0, -G))
    step = build_step_fn(pendulum, sp)
    params = batched(pendulum.default_params())
    q = jnp.array([[0.05]])
    qd = jnp.array([[0.0]])
    ctrl = zero_controls(pendulum, 1)
    wrench = jnp.zeros((1, pendulum.nb, 6))

    @jax.jit
    def run(q, qd):
        def body(c, _):
            q, qd = c
            q, qd, _ = step(params, q, qd, ctrl, wrench)
            return (q, qd), q[0, 0]
        (_, _), traj = jax.lax.scan(body, (q, qd), None, length=4000)
        return traj

    traj = np.asarray(run(q, qd))
    # find zero crossings (downward)
    sign = np.sign(traj)
    crossings = np.where((sign[:-1] > 0) & (sign[1:] <= 0))[0]
    period = np.diff(crossings).mean() * 0.001
    expected = 2 * np.pi * np.sqrt(0.7 / G)
    np.testing.assert_allclose(period, expected, rtol=0.01)


def test_double_pendulum_energy(pendulum):
    model = load_urdf(os.path.join(ASSETS, "double_pendulum.urdf"), fix_base_link=True)
    sp = SimParams(dt=0.001, substeps=1, gravity=(0.0, 0.0, -G))
    step = build_step_fn(model, sp)
    params = batched(model.default_params())
    q = jnp.array([[2.0, 1.0]])
    qd = jnp.array([[0.0, 0.0]])
    ctrl = zero_controls(model, 1)
    wrench = jnp.zeros((1, model.nb, 6))

    def total_energy(qv, qdv):
        # compute via FK: KE from body velocities, PE from com heights
        frames = forward_kinematics(model, qv, qdv)
        d = model.default_params()
        E = 0.0
        for i in range(model.nb):
            mi = float(d.body_mass[i])
            com_w = np.asarray(frames.pos[i]) + np.asarray(
                jax.vmap(lambda q, v: v, in_axes=(None, 0))(0, jnp.zeros((1, 3))))[0] * 0
            from thormang_isaacgym_tpu.core import quat as Q
            com_w = np.asarray(frames.pos[i] + Q.rotate(frames.quat[i], d.body_com[i]))
            v_com = np.asarray(frames.vel[i] + jnp.cross(frames.omega[i], Q.rotate(frames.quat[i], d.body_com[i])))
            om_b = np.asarray(Q.rotate_inv(frames.quat[i], frames.omega[i]))
            I = np.asarray(d.body_inertia[i])
            E += 0.5 * mi * v_com @ v_com + 0.5 * om_b @ I @ om_b + mi * G * com_w[2]
        return E

    e0 = total_energy(q[0], qd[0])

    @jax.jit
    def run(q, qd):
        def body(c, _):
            q, qd = c
            return step(params, q, qd, ctrl, wrench)[:2], None
        (q, qd), _ = jax.lax.scan(body, (q, qd), None, length=3000)
        return q, qd

    q, qd = run(q, qd)
    e1 = total_energy(np.asarray(q[0]), np.asarray(qd[0]))
    scale = abs(e0) + 1.0
    assert abs(e1 - e0) / scale < 0.05, (e0, e1)


def test_prismatic_free_fall():
    urdf = """
    <robot name="lift">
      <link name="base"><inertial><mass value="10"/><inertia ixx="1" iyy="1" izz="1" ixy="0" ixz="0" iyz="0"/></inertial></link>
      <joint name="lift" type="prismatic"><parent link="base"/><child link="m"/>
        <origin xyz="0 0 5"/><axis xyz="0 0 1"/><limit lower="-100" upper="100" effort="1000" velocity="1000"/></joint>
      <link name="m"><inertial><mass value="3"/><inertia ixx="0.1" iyy="0.1" izz="0.1" ixy="0" ixz="0" iyz="0"/></inertial></link>
    </robot>"""
    model = load_urdf(urdf, fix_base_link=True)
    params = model.default_params()
    qdd = aba(model, params, jnp.zeros(1), jnp.zeros(1), jnp.zeros(1),
              jnp.zeros((model.nb, 6)), jnp.array([0.0, 0.0, -G]))
    np.testing.assert_allclose(float(qdd[0]), -G, rtol=1e-5)


def test_floating_free_fall_and_momentum():
    """A tumbling free-floating body: com follows projectile arc, angular
    momentum is conserved."""
    urdf = """
    <robot name="brick">
      <link name="b"><inertial><mass value="2.0"/>
        <inertia ixx="0.02" iyy="0.08" izz="0.1" ixy="0" ixz="0" iyz="0"/></inertial></link>
    </robot>"""
    model = load_urdf(urdf)
    assert model.floating and model.nq == 7 and model.nv == 6
    sp = SimParams(dt=0.001, substeps=1, gravity=(0.0, 0.0, -G))
    step = build_step_fn(model, sp)
    params = jax.tree.map(lambda x: x[None], model.default_params())
    q = jnp.concatenate([jnp.array([0.0, 0, 10.0]), jnp.array([1.0, 0, 0, 0])])[None]
    # initial spin about the unstable middle axis + world-frame velocity
    qd = jnp.array([[0.1, 3.0, 0.1, 1.0, 0.0, 2.0]])
    ctrl = zero_controls(model, 1)
    wrench = jnp.zeros((1, model.nb, 6))

    from thormang_isaacgym_tpu.core import quat as Q

    def ang_momentum(q, qd):
        quat = q[0, 3:7]
        om_b = qd[0, 0:3]
        I = np.diag([0.02, 0.08, 0.1])
        L_b = I @ np.asarray(om_b)
        return np.asarray(Q.rotate(quat, jnp.array(L_b)))

    L0 = ang_momentum(q, qd)

    @jax.jit
    def run(q, qd):
        def body(c, _):
            q, qd = c
            return step(params, q, qd, ctrl, wrench)[:2], None
        (q, qd), _ = jax.lax.scan(body, (q, qd), None, length=1000)
        return q, qd

    q1, qd1 = run(q, qd)
    # projectile: z = z0 + vz t - g t^2 / 2 (v stored in body frame; initial
    # quat=identity so v_world(0) = (1, 0, 2)); t=1s
    np.testing.assert_allclose(float(q1[0, 2]), 10.0 + 2.0 - 0.5 * G, atol=0.02)
    np.testing.assert_allclose(float(q1[0, 0]), 1.0, atol=0.02)
    L1 = ang_momentum(q1, qd1)
    np.testing.assert_allclose(L1, L0, atol=2e-3)


def test_ball_drop_settles():
    urdf = """
    <robot name="ball">
      <link name="b"><inertial><mass value="1.0"/>
        <inertia ixx="0.004" iyy="0.004" izz="0.004" ixy="0" ixz="0" iyz="0"/></inertial>
        <collision><geometry><sphere radius="0.1"/></geometry></collision>
      </link>
    </robot>"""
    model = load_urdf(urdf)
    sp = SimParams(dt=0.005, substeps=4, gravity=(0.0, 0.0, -G),
                   contact_stiffness=2e4, contact_damping=300.0)
    step = build_step_fn(model, sp)
    params = jax.tree.map(lambda x: x[None], model.default_params())
    q = jnp.array([[0.0, 0, 0.5, 1.0, 0, 0, 0]])
    qd = jnp.zeros((1, 6))
    ctrl = zero_controls(model, 1)
    wrench = jnp.zeros((1, model.nb, 6))

    @jax.jit
    def run(q, qd):
        def body(c, _):
            q, qd = c
            return step(params, q, qd, ctrl, wrench)[:2], None
        (q, qd), _ = jax.lax.scan(body, (q, qd), None, length=600)
        return q, qd

    q1, qd1 = run(q, qd)
    # settles at z ~ r - mg/k penetration; never explodes
    z = float(q1[0, 2])
    pen = 1.0 * G / 2e4
    np.testing.assert_allclose(z, 0.1 - pen, atol=5e-3)
    assert float(jnp.abs(qd1).max()) < 0.05


def test_locked_joints_transmit_inertia(pendulum):
    """A locked pendulum joint must behave like a fixed joint: no motion."""
    params = pendulum.default_params()
    import dataclasses as dc
    params = dc.replace(params, dof_locked=jnp.ones(1), dof_locked_pos=jnp.array([0.7]))
    sp = SimParams(dt=0.005, substeps=2, gravity=(0.0, 0.0, -G))
    step = build_step_fn(pendulum, sp)
    pb = jax.tree.map(lambda x: x[None], params)
    q = jnp.array([[0.7]])
    qd = jnp.array([[0.0]])
    for _ in range(10):
        q, qd, _ = step(pb, q, qd, zero_controls(pendulum, 1), jnp.zeros((1, pendulum.nb, 6)))
    np.testing.assert_allclose(float(q[0, 0]), 0.7, atol=1e-6)
    np.testing.assert_allclose(float(qd[0, 0]), 0.0, atol=1e-8)


def test_pd_drive_tracks_target(pendulum):
    import dataclasses as dc
    params = pendulum.default_params()
    params = dc.replace(
        params,
        drive_mode=jnp.array([1], dtype=jnp.int32),
        drive_stiffness=jnp.array([80.0]),
        drive_damping=jnp.array([12.0]),
        drive_effort_limit=jnp.array([200.0]),
    )
    sp = SimParams(dt=0.005, substeps=2, gravity=(0.0, 0.0, -G))
    step = build_step_fn(pendulum, sp)
    pb = jax.tree.map(lambda x: x[None], params)
    q = jnp.array([[0.0]])
    qd = jnp.array([[0.0]])
    from thormang_isaacgym_tpu.ops import Controls
    target = 0.8
    ctrl = Controls(jnp.array([[target]]), jnp.zeros((1, 1)), jnp.zeros((1, 1)))
    wrench = jnp.zeros((1, pendulum.nb, 6))

    @jax.jit
    def run(q, qd):
        def body(c, _):
            q, qd = c
            return step(pb, q, qd, ctrl, wrench)[:2], None
        (q, qd), _ = jax.lax.scan(body, (q, qd), None, length=1000)
        return q, qd

    q1, _ = run(q, qd)
    # steady state: Kp(t - q) = m g l sin(q) -> near target for stiff Kp
    ss_err = 1.2 * G * 0.7 * np.sin(target) / 80.0
    np.testing.assert_allclose(float(q1[0, 0]), target - ss_err, atol=0.03)
