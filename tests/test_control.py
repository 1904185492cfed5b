"""Controller-zoo tests (ops/control.py) vs the reference Factory spec
(`factory_control.py:40-292`, `factory_base.py:273-417`)."""
import jax
import jax.numpy as jnp
import numpy as np

from thormang_isaacgym_tpu.core import quat as Q
from thormang_isaacgym_tpu.ops import control as C


def test_axis_angle_round_trip():
    axis = jnp.asarray([0.36, -0.48, 0.8])
    for angle in (0.0, 1e-8, 0.3, 2.0, 3.0):
        q = Q.from_axis_angle(axis, jnp.asarray(angle))
        aa = C.axis_angle_from_quat(q)
        np.testing.assert_allclose(np.asarray(aa), np.asarray(axis) * angle,
                                   atol=1e-5)


def test_pose_error_geometric():
    q0 = Q.from_axis_angle(jnp.asarray([0.0, 0, 1.0]), jnp.asarray(0.2))
    qt = Q.from_axis_angle(jnp.asarray([0.0, 0, 1.0]), jnp.asarray(0.5))
    pe, re = C.get_pose_error(jnp.zeros(3), q0, jnp.asarray([1.0, 0, 0]), qt)
    np.testing.assert_allclose(np.asarray(pe), [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(re), [0, 0, 0.3], atol=1e-5)


def test_ik_methods_solve():
    key = jax.random.key(0)
    J = jax.random.normal(key, (6, 7))
    delta = jax.random.normal(jax.random.fold_in(key, 1), (6,))
    for method in ("pinv", "dls", "svd"):
        dq = C.ik_delta(delta, J, method)
        res = np.asarray(J @ dq - delta)
        tol = 0.35 if method == "dls" else 1e-4  # dls is damped by design
        assert np.linalg.norm(res) < tol * max(1.0, np.linalg.norm(np.asarray(delta))), method
    # transpose method: a descent direction, not a solve
    dq = C.ik_delta(delta, J, "trans")
    assert float(jnp.dot(J @ dq, delta)) > 0


_MODES = {
    "gym_default": dict(motor_ctrl_mode="gym", gain_space="joint"),
    "joint_space_ik": dict(motor_ctrl_mode="manual", gain_space="joint",
                           do_inertial_comp=False),
    "joint_space_id": dict(motor_ctrl_mode="manual", gain_space="joint",
                           do_inertial_comp=True),
    "task_space_impedance": dict(gain_space="task", do_motion_ctrl=True,
                                 do_inertial_comp=False, do_force_ctrl=False),
    "operational_space_motion": dict(gain_space="task", do_motion_ctrl=True,
                                     do_inertial_comp=True, do_force_ctrl=False),
    "open_loop_force": dict(gain_space="task", do_motion_ctrl=False,
                            do_force_ctrl=True, force_ctrl_method="open"),
    "closed_loop_force": dict(gain_space="task", do_motion_ctrl=False,
                              do_force_ctrl=True, force_ctrl_method="closed"),
    "hybrid_force_motion": dict(gain_space="task", do_motion_ctrl=True,
                                do_inertial_comp=True, do_force_ctrl=True,
                                force_ctrl_method="closed"),
}


def test_parse_all_eight_modes():
    for mode, expect in _MODES.items():
        cfg = C.parse_controller_spec({"ctrl_type": mode})
        for k, v in expect.items():
            assert cfg[k] == v, (mode, k, cfg[k])


def _scene():
    key = jax.random.key(3)
    J = jax.random.normal(key, (6, 7)) * 0.3
    M = jnp.eye(7) + 0.1 * jnp.ones((7, 7))
    dof_pos = jnp.zeros(9)
    dof_vel = jnp.zeros(9)
    eef_pos = jnp.zeros(3)
    eef_quat = Q.identity()
    return J, M, dof_pos, dof_vel, eef_pos, eef_quat


def test_zero_error_zero_torque():
    J, M, dof_pos, dof_vel, eef_pos, eef_quat = _scene()
    for mode in ("task_space_impedance", "operational_space_motion",
                 "joint_space_id"):
        cfg = C.parse_controller_spec({"ctrl_type": mode})
        tau = C.compute_dof_torque(
            cfg, dof_pos, dof_vel, eef_pos, eef_quat, jnp.zeros(3),
            jnp.zeros(3), jnp.zeros(3), J, M, jnp.asarray(0.0),
            eef_pos, eef_quat, jnp.zeros(6))
        np.testing.assert_allclose(np.asarray(tau[:7]), 0.0, atol=1e-5)


def test_motion_torque_pushes_toward_target():
    J, M, dof_pos, dof_vel, eef_pos, eef_quat = _scene()
    target = jnp.asarray([0.1, 0.0, 0.0])
    for mode in ("task_space_impedance", "operational_space_motion",
                 "joint_space_ik", "joint_space_id"):
        cfg = C.parse_controller_spec({"ctrl_type": mode})
        tau = C.compute_dof_torque(
            cfg, dof_pos, dof_vel, eef_pos, eef_quat, jnp.zeros(3),
            jnp.zeros(3), jnp.zeros(3), J, M, jnp.asarray(0.0),
            target, eef_quat, jnp.zeros(6))
        # resulting task velocity direction J M^-1 tau has positive
        # component along the position error
        qdd = jnp.linalg.solve(M, tau[:7])
        assert float((J @ qdd)[0]) > 0, mode


def test_force_modes():
    J, M, dof_pos, dof_vel, eef_pos, eef_quat = _scene()
    tgt_wrench = jnp.asarray([0.0, 0, -10.0, 0, 0, 0])
    cfg = C.parse_controller_spec({"ctrl_type": "open_loop_force"})
    tau = C.compute_dof_torque(
        cfg, dof_pos, dof_vel, eef_pos, eef_quat, jnp.zeros(3), jnp.zeros(3),
        jnp.zeros(3), J, M, jnp.asarray(0.0), eef_pos, eef_quat, tgt_wrench)
    np.testing.assert_allclose(np.asarray(tau[:7]),
                               np.asarray(J.T @ tgt_wrench), atol=1e-5)
    # closed loop: measured wrench == target -> correction term vanishes
    cfg = C.parse_controller_spec({"ctrl_type": "closed_loop_force"})
    finger_sum = jnp.asarray([0.0, 0, 10.0])   # reaction on fingers
    tau_c = C.compute_dof_torque(
        cfg, dof_pos, dof_vel, eef_pos, eef_quat, jnp.zeros(3), jnp.zeros(3),
        finger_sum, J, M, jnp.asarray(0.0), eef_pos, eef_quat, tgt_wrench)
    np.testing.assert_allclose(np.asarray(tau_c[:7]),
                               np.asarray(J.T @ tgt_wrench), atol=1e-5)


def test_dof_pos_target_ik_step():
    J, M, dof_pos, dof_vel, eef_pos, eef_quat = _scene()
    cfg = C.parse_controller_spec({"ctrl_type": "gym_default",
                                   "gym_default": {"ik_method": "pinv"}})
    tgt = C.compute_dof_pos_target(
        cfg, dof_pos[:7], eef_pos, eef_quat, J,
        jnp.asarray([0.05, 0, 0]), eef_quat, jnp.asarray(0.02))
    assert tgt.shape == (9,)
    # the IK step moves the eef toward the target
    d_arm = tgt[:7] - dof_pos[:7]
    assert float((J @ d_arm)[0]) > 0
    np.testing.assert_allclose(np.asarray(tgt[7:9]), 0.02, atol=1e-7)
