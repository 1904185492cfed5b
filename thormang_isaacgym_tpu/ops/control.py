"""Controller zoo: the Factory 8-mode controller spec as pure functions.

TPU-native re-expression of the reference's
`tasks/factory/factory_control.py:40-292` (control math) and
`factory_base.py:273-417` (`parse_controller_spec`: gym_default /
joint_space_ik / joint_space_id / task_space_impedance /
operational_space_motion / open_loop_force / closed_loop_force /
hybrid_force_motion) plus `generate_ctrl_signals` (:418-480). The torch
per-env batched tensors become single-env functions over this framework's
`ops.inertia` outputs (mass matrix, point jacobian); callers vmap.

All jacobians here use the [lin; ang] row convention of the reference
(gym world-space geometric jacobian); rotation errors are axis-angle
(`get_pose_error`, factory_control.py:179-216).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from thormang_isaacgym_tpu.core import quat as Q

# --------------------------------------------------------------------------
# pose / wrench errors
# --------------------------------------------------------------------------


def axis_angle_from_quat(q, eps: float = 1.0e-6):
    """Quat (w,x,y,z) -> rotation vector (axis * angle).

    Parity: factory_control.py `axis_angle_from_quat` (numerically-stable
    sin(x)/x Taylor branch near zero angle)."""
    mag = jnp.linalg.norm(q[1:4])
    half_angle = jnp.arctan2(mag, q[0])
    angle = 2.0 * half_angle
    sin_half_over_angle = jnp.where(
        jnp.abs(angle) > eps,
        jnp.sin(half_angle) / jnp.where(jnp.abs(angle) > eps, angle, 1.0),
        0.5 - angle * angle / 48.0)
    return q[1:4] / jnp.maximum(sin_half_over_angle, 1e-9)


def get_pose_error(pos, quat, target_pos, target_quat,
                   jacobian_type: str = "geometric",
                   rot_error_type: str = "axis_angle"):
    """Task-space pose error (factory_control.py:179-216).

    geometric: quat difference -> axis-angle; analytic: difference of
    rotation vectors."""
    pos_error = target_pos - pos
    if jacobian_type == "geometric":
        quat_norm = jnp.sum(quat * quat)          # |q|^2 (unit in practice)
        quat_inv = Q.conj(quat) / jnp.maximum(quat_norm, 1e-9)
        quat_error = Q.mul(target_quat, quat_inv)
        axis_angle_error = axis_angle_from_quat(quat_error)
    else:  # analytic
        axis_angle_error = axis_angle_from_quat(target_quat) \
            - axis_angle_from_quat(quat)
    if rot_error_type == "quat":
        return pos_error, quat_error
    return pos_error, axis_angle_error


def get_wrench_error(finger_force_sum, target_wrench):
    """factory_control.py:219-233: measured fingertip wrench is the net
    contact force on the fingers (torque channels zero — same information
    the reference has)."""
    measured = jnp.concatenate([finger_force_sum, jnp.zeros(3)])
    return target_wrench - (-measured)


# --------------------------------------------------------------------------
# IK variants (factory_control.py:236-271)
# --------------------------------------------------------------------------


def ik_delta(delta_pose, jacobian, method: str = "pinv"):
    """delta task pose (6,) -> delta joint pos (n,), per ik_method."""
    J = jacobian
    if method == "pinv":
        return jnp.linalg.pinv(J) @ delta_pose
    if method == "trans":
        return J.T @ delta_pose
    if method == "dls":
        lam = 0.1
        JJt = J @ J.T + (lam ** 2) * jnp.eye(J.shape[0])
        return J.T @ jnp.linalg.solve(JJt, delta_pose)
    if method == "svd":
        U, S, Vh = jnp.linalg.svd(J, full_matrices=False)
        S_inv = jnp.where(S > 1.0e-5, 1.0 / jnp.maximum(S, 1e-12), 0.0)
        return Vh.T @ (S_inv * (U.T @ delta_pose))
    raise ValueError(f"unknown ik_method {method!r}")


def apply_task_space_gains(delta_pose, linvel, angvel, kp, kd):
    """factory_control.py:274-292: PD in task space -> wrench [force; torque]."""
    return jnp.concatenate([
        kp[0:3] * delta_pose[0:3] + kd[0:3] * (0.0 - linvel),
        kp[3:6] * delta_pose[3:6] + kd[3:6] * (0.0 - angvel),
    ])


# --------------------------------------------------------------------------
# controller spec (factory_base.py:273-417)
# --------------------------------------------------------------------------

_CTRL_DEFAULTS = dict(
    jacobian_type="geometric",
    gripper_prop_gains=(200.0, 200.0),
    gripper_deriv_gains=(1.0, 1.0),
    motor_ctrl_mode="manual",
    gain_space="task",
    ik_method="dls",
    joint_prop_gains=(1.0,) * 7,
    joint_deriv_gains=(0.1,) * 7,
    do_motion_ctrl=True,
    task_prop_gains=(100.0,) * 6,
    task_deriv_gains=(20.0,) * 6,
    do_inertial_comp=False,
    motion_ctrl_axes=(1.0,) * 6,
    do_force_ctrl=False,
    force_ctrl_method="open",
    wrench_prop_gains=(0.1,) * 6,
    force_ctrl_axes=(1.0,) * 6,
)


def parse_controller_spec(ctrl_cfg: dict) -> dict:
    """Reference `parse_controller_spec` (factory_base.py:273-417): the
    YAML `ctrl` block (ctrl_type + per-type subdict, FactoryTask*.yaml) to
    the flat controller config consumed by `compute_dof_torque` /
    `compute_dof_pos_target`. Returns plain python/tuple statics — the
    result is closed over by jit."""
    ctrl_type = ctrl_cfg.get("ctrl_type", "joint_space_id")
    cfg = dict(_CTRL_DEFAULTS)
    allc = ctrl_cfg.get("all", {})
    for k in ("jacobian_type", "gripper_prop_gains", "gripper_deriv_gains"):
        if k in allc:
            cfg[k] = allc[k]
    sub = ctrl_cfg.get(ctrl_type, {})

    def take(*keys):
        for k in keys:
            if k in sub:
                cfg[k] = sub[k]

    if ctrl_type == "gym_default":
        cfg.update(motor_ctrl_mode="gym", gain_space="joint")
        take("ik_method", "joint_prop_gains", "joint_deriv_gains",
             "gripper_prop_gains", "gripper_deriv_gains")
    elif ctrl_type == "joint_space_ik":
        cfg.update(motor_ctrl_mode="manual", gain_space="joint",
                   do_inertial_comp=False)
        take("ik_method", "joint_prop_gains", "joint_deriv_gains")
    elif ctrl_type == "joint_space_id":
        cfg.update(motor_ctrl_mode="manual", gain_space="joint",
                   do_inertial_comp=True)
        take("ik_method", "joint_prop_gains", "joint_deriv_gains")
    elif ctrl_type == "task_space_impedance":
        cfg.update(motor_ctrl_mode="manual", gain_space="task",
                   do_motion_ctrl=True, do_inertial_comp=False,
                   do_force_ctrl=False)
        take("task_prop_gains", "task_deriv_gains", "motion_ctrl_axes")
    elif ctrl_type == "operational_space_motion":
        cfg.update(motor_ctrl_mode="manual", gain_space="task",
                   do_motion_ctrl=True, do_inertial_comp=True,
                   do_force_ctrl=False)
        take("task_prop_gains", "task_deriv_gains", "motion_ctrl_axes")
    elif ctrl_type == "open_loop_force":
        cfg.update(motor_ctrl_mode="manual", gain_space="task",
                   do_motion_ctrl=False, do_force_ctrl=True,
                   force_ctrl_method="open")
        take("force_ctrl_axes")
    elif ctrl_type == "closed_loop_force":
        cfg.update(motor_ctrl_mode="manual", gain_space="task",
                   do_motion_ctrl=False, do_force_ctrl=True,
                   force_ctrl_method="closed")
        take("wrench_prop_gains", "force_ctrl_axes")
    elif ctrl_type == "hybrid_force_motion":
        cfg.update(motor_ctrl_mode="manual", gain_space="task",
                   do_motion_ctrl=True, do_inertial_comp=True,
                   do_force_ctrl=True, force_ctrl_method="closed")
        take("task_prop_gains", "task_deriv_gains", "motion_ctrl_axes",
             "wrench_prop_gains", "force_ctrl_axes")
    else:
        raise ValueError(f"unknown ctrl_type {ctrl_type!r}")
    cfg["ctrl_type"] = ctrl_type
    for k, v in cfg.items():
        if isinstance(v, (list, tuple)):
            cfg[k] = tuple(float(x) for x in v)
    return cfg


# --------------------------------------------------------------------------
# controller outputs (factory_control.py:40-176)
# --------------------------------------------------------------------------


def compute_dof_pos_target(cfg: dict, arm_dof_pos, eef_pos, eef_quat,
                           jacobian, target_pos, target_quat,
                           gripper_target):
    """gym_default mode: IK step toward the target pose -> 9 DOF position
    targets (factory_control.py:40-70). Single env."""
    pos_err, rot_err = get_pose_error(eef_pos, eef_quat, target_pos,
                                      target_quat, cfg["jacobian_type"],
                                      "axis_angle")
    delta = jnp.concatenate([pos_err, rot_err])
    d_arm = ik_delta(delta, jacobian, cfg["ik_method"])
    return jnp.concatenate([arm_dof_pos + d_arm,
                            jnp.broadcast_to(gripper_target, (2,))])


def compute_dof_torque(cfg: dict, dof_pos, dof_vel, eef_pos, eef_quat,
                       eef_linvel, eef_angvel, finger_force_sum,
                       jacobian, arm_mass_matrix, gripper_target,
                       target_pos, target_quat, target_wrench):
    """Manual-mode torque controller (factory_control.py:73-176): joint- or
    task-gain-space motion control with optional inertial compensation,
    open/closed-loop force control, hybrid force-motion split. Single env;
    returns 9 torques (7 arm + 2 gripper)."""
    tau_arm = jnp.zeros(7)
    if cfg["gain_space"] == "joint":
        pos_err, rot_err = get_pose_error(eef_pos, eef_quat, target_pos,
                                          target_quat, cfg["jacobian_type"],
                                          "axis_angle")
        delta = jnp.concatenate([pos_err, rot_err])
        d_arm = ik_delta(delta, jacobian, cfg["ik_method"])
        tau_arm = jnp.asarray(cfg["joint_prop_gains"]) * d_arm \
            + jnp.asarray(cfg["joint_deriv_gains"]) * (0.0 - dof_vel[0:7])
        if cfg["do_inertial_comp"]:
            tau_arm = arm_mass_matrix @ tau_arm
    else:  # task gain space
        wrench = jnp.zeros(6)
        if cfg["do_motion_ctrl"]:
            pos_err, rot_err = get_pose_error(
                eef_pos, eef_quat, target_pos, target_quat,
                cfg["jacobian_type"], "axis_angle")
            delta = jnp.concatenate([pos_err, rot_err])
            w_motion = apply_task_space_gains(
                delta, eef_linvel, eef_angvel,
                jnp.asarray(cfg["task_prop_gains"]),
                jnp.asarray(cfg["task_deriv_gains"]))
            if cfg["do_inertial_comp"]:
                # task-space mass matrix Lambda = (J M^-1 J^T)^-1 (ETH 3.86)
                mm_inv = jnp.linalg.inv(
                    arm_mass_matrix + 1e-6 * jnp.eye(7))
                lam = jnp.linalg.inv(
                    jacobian @ mm_inv @ jacobian.T + 1e-6 * jnp.eye(6))
                w_motion = lam @ w_motion
            wrench = wrench + jnp.asarray(cfg["motion_ctrl_axes"]) * w_motion
        if cfg["do_force_ctrl"]:
            w_force = target_wrench
            if cfg["force_ctrl_method"] == "closed":
                w_force = w_force + jnp.asarray(cfg["wrench_prop_gains"]) \
                    * get_wrench_error(finger_force_sum, target_wrench)
            wrench = wrench + jnp.asarray(cfg["force_ctrl_axes"]) * w_force
        tau_arm = jacobian.T @ wrench
    tau_grip = jnp.asarray(cfg["gripper_prop_gains"]) \
        * (gripper_target - dof_pos[7:9]) \
        + jnp.asarray(cfg["gripper_deriv_gains"]) * (0.0 - dof_vel[7:9])
    return jnp.clip(jnp.concatenate([tau_arm, tau_grip]), -100.0, 100.0)
