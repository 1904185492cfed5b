"""FrankaCubeStack — Panda stacking cubeA on cubeB with OSC or joint-torque
control.

Parity with `/root/reference/isaacgymenvs/tasks/franka_cube_stack.py` +
`cfg/task/FrankaCubeStack.yaml`. The operational-space controller is the
reference's `_compute_osc_torques` (:602-628, Khatib 1987) re-expressed on
this framework's pure-function dynamics: the mass matrix and end-effector
jacobian come from `ops.inertia` (the `acquire_mass_matrix_tensor` /
`acquire_jacobian_tensor` equivalents) inside the same jitted step.

Spec mapping:
- scene: table surface z=1.025 (ground-height plane), franka base at
  (-0.45, 0, 1.125) on its stand (:211-284), cubeA 5 cm / cubeB 7 cm free
  boxes spawned with xy noise 0.25 and yaw noise 0.785 (:560-600)
- obs (19, osc): [cubeA_quat(4), cubeA_pos(3), cubeA_to_cubeB(3), eef_pos(3),
  eef_quat(4), q_gripper(2)] (:453-455); joint_tor variant obs 26 appends q(7)
- actions (7, osc): 6-dof task-space dpose * cmd_limit [0.1m, 0.5rad] ->
  OSC torques with null-space posture control (kp 150, kp_null 10,
  critically damped, :153-162, :602-628); +1 binary gripper (:646-652)
- reward (:699-748): dist = 1-tanh(10*(d+d_lf+d_rf)/3), lift at
  height>size+0.04, align (1-tanh(10*d_ab))*lifted, stack bonus 16 when
  aligned within 2 cm + on-height + gripper released; scales 0.1/1.5/2.0/16
- reset: stacked or timeout 300
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from thormang_isaacgym_tpu.core import quat as Q
from thormang_isaacgym_tpu.engine.env import Task
from thormang_isaacgym_tpu.models import load_urdf
from thormang_isaacgym_tpu.models.franka import (
    FRANKA_CUBE_DOF_POS, franka_dof_ids, load_franka,
)
from thormang_isaacgym_tpu.models.robot import DRIVE_EFFORT, DRIVE_POS
from thormang_isaacgym_tpu.models.scene import compose
from thormang_isaacgym_tpu.ops import inertia as di
from thormang_isaacgym_tpu.ops.kinematics import forward_kinematics
from thormang_isaacgym_tpu.ops.sim import Controls, SimParams

TABLE_Z = 1.025            # table surface height (:278)
FRANKA_POS = (-0.45, 0.0, 1.125)
CUBE_A = 0.050
CUBE_B = 0.070


def _cube_urdf(name, size, mass=0.1):
    """Free cube: a single box geom. Cube-on-cube stacking goes through the
    box-box vertex narrowphase; finger pads grip it through sphere-box —
    both with the implicit-normal contact solve (ops/collide.py)."""
    i = mass * size * size / 6
    return f"""
<robot name="{name}">
  <link name="{name}">
    <inertial><mass value="{mass}"/>
      <inertia ixx="{i:.6f}" iyy="{i:.6f}" izz="{i:.6f}" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision name="{name}_box"><geometry><box size="{size} {size} {size}"/></geometry></collision>
  </link>
</robot>"""


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CubeStackTaskState:
    actions: jnp.ndarray       # (B, na) last raw actions
    finger_target: jnp.ndarray  # (B,) current gripper target (0 or 0.04)


class FrankaCubeStack(Task):
    max_episode_length = 300
    clip_obs = 5.0
    action_scale = 1.0
    start_position_noise = 0.25
    start_rotation_noise = 0.785
    franka_dof_noise = 0.25
    r_dist_scale = 0.1
    r_lift_scale = 1.5
    r_align_scale = 2.0
    r_stack_scale = 16.0

    def __init__(self, num_envs: int = 8192, seed: int = 42,
                 control_type: str = "osc", **_):
        super().__init__(num_envs, seed)
        assert control_type in ("osc", "joint_tor")
        self.control_type = control_type
        self.num_obs = 19 if control_type == "osc" else 26
        self.num_actions = 7 if control_type == "osc" else 8

        franka = load_franka()
        cubeA = load_urdf(_cube_urdf("cubeA", CUBE_A))
        cubeB = load_urdf(_cube_urdf("cubeB", CUBE_B))
        scene = compose([
            (franka, FRANKA_POS + (1.0, 0.0, 0.0, 0.0), "franka/"),
            (cubeA, (0.0, 0.0, TABLE_Z + CUBE_A / 2, 1.0, 0.0, 0.0, 0.0), "A/"),
            (cubeB, (0.0, 0.15, TABLE_Z + CUBE_B / 2, 1.0, 0.0, 0.0, 0.0), "B/"),
        ], name="franka_cube_stack")
        self.model = scene
        self.fr_ids = np.array(franka_dof_ids(scene, "franka/"))
        d = scene._defaults
        # arm joints: torque-controlled (OSC/joint_tor both write efforts,
        # :640-657); fingers: position drive
        mode = np.array(d["drive_mode"])
        for k in self.fr_ids[:7]:
            mode[k] = DRIVE_EFFORT
        d["drive_mode"] = mode
        self.fr_lower = jnp.asarray(np.array(d["dof_lower"])[self.fr_ids])
        self.fr_upper = jnp.asarray(np.array(d["dof_upper"])[self.fr_ids])
        self.effort_limit = jnp.asarray(
            np.array(d["drive_effort_limit"])[self.fr_ids])
        self.default_dof = jnp.asarray(FRANKA_CUBE_DOF_POS)

        gb, gp, gq = scene.sites["franka/panda_grasp"]
        self.grasp_body, self.grasp_pos_l, self.grasp_quat_l = gb, gp, gq
        self.lfinger_body = scene.body_id("franka/panda_leftfinger")
        self.rfinger_body = scene.body_id("franka/panda_rightfinger")
        self.cubeA_body = scene.body_id("A/cubeA")
        self.cubeB_body = scene.body_id("B/cubeB")
        # floating-root q offsets: roots in actor order (franka fixed)
        self.qA = 0       # cubeA root 7-block start
        self.qB = 7

        # OSC gains (:153-157)
        self.kp = jnp.asarray([150.0] * 6)
        self.kd = 2.0 * jnp.sqrt(self.kp)
        self.kp_null = jnp.asarray([10.0] * 7)
        self.kd_null = 2.0 * jnp.sqrt(self.kp_null)
        self.cmd_limit = jnp.asarray([0.1] * 3 + [0.5] * 3) \
            if control_type == "osc" else self.effort_limit[:7]

        self.sim_params = SimParams(
            dt=1.0 / 60.0, substeps=6, gravity=(0.0, 0.0, -9.81),
            contact_stiffness=1.0e5, contact_damping=1.0e3,
            friction_vel=0.004, plane_friction=0.8,
            max_depenetration_velocity=0.5)
        self.dt = self.sim_params.dt

    def ground_height_fn(self):
        """The table: a flat working plane at the tabletop height
        (create_box table actor, :207-213 — env geometry, not terrain).
        A float constant so the fused kernel's plane path takes it."""
        return TABLE_Z

    # ------------------------------------------------------------------
    def default_task_state(self, key):
        B = self.num_envs
        return CubeStackTaskState(
            jnp.zeros((B, self.num_actions)), jnp.full((B,), 0.04))

    def reset_fn(self, key, params, task):
        ks = jax.random.split(key, 6)
        # franka dofs: default + noise*0.25 scaled (:521-528)
        pos = self.default_dof + self.franka_dof_noise * 0.5 * (
            jax.random.uniform(ks[0], (9,)) * 2.0 - 1.0)
        pos = jnp.clip(pos, self.fr_lower, self.fr_upper)
        pos = pos.at[7:].set(0.04)   # fingers open
        jq = jnp.zeros(self.model.nj)
        jq = jq.at[jnp.asarray(self.fr_ids)].set(pos)
        # cubeB: center region + xy noise; cubeA: polar offset >= 0.12 from B
        # (the reference rejection-samples min dist 0.1, :560-600)
        bxy = self.start_position_noise * 0.4 * (
            jax.random.uniform(ks[1], (2,)) * 2.0 - 1.0) + jnp.asarray([0.0, 0.1])
        ang = jax.random.uniform(ks[2], (), minval=-jnp.pi, maxval=jnp.pi)
        rad = jax.random.uniform(ks[3], (), minval=0.13, maxval=0.22)
        axy = bxy + rad * jnp.stack([jnp.cos(ang), jnp.sin(ang)])
        yawA = self.start_rotation_noise * (jax.random.uniform(ks[4], ()) * 2 - 1)
        yawB = self.start_rotation_noise * (jax.random.uniform(ks[5], ()) * 2 - 1)
        qa = jnp.concatenate([
            axy, jnp.asarray([TABLE_Z + CUBE_A / 2]),
            Q.from_axis_angle(jnp.asarray([0.0, 0, 1.0]), yawA)])
        qb = jnp.concatenate([
            bxy, jnp.asarray([TABLE_Z + CUBE_B / 2]),
            Q.from_axis_angle(jnp.asarray([0.0, 0, 1.0]), yawB)])
        q = jnp.concatenate([qa, qb, jq])
        qd = jnp.zeros(self.model.nv)
        return q, qd, params, CubeStackTaskState(
            jnp.zeros(self.num_actions), jnp.asarray(0.04))

    # ------------------------------------------------------------------
    def _eef(self, q, qd):
        """(pos, quat, vel6) of the grasp frame, single env."""
        frames = forward_kinematics(self.model, q, qd)
        bq = frames.quat[self.grasp_body]
        gq = Q.mul(bq, jnp.asarray(self.grasp_quat_l))
        r = Q.rotate(bq, jnp.asarray(self.grasp_pos_l))
        gp = frames.pos[self.grasp_body] + r
        w = frames.omega[self.grasp_body]
        v = frames.vel[self.grasp_body] + jnp.cross(w, r)
        return gp, gq, jnp.concatenate([v, w])   # vel layout: [lin, ang] (:612)

    def _osc_torques(self, q, qd, dpose, params):
        """Reference `_compute_osc_torques` (:602-628), single env."""
        model = self.model
        fr = jnp.asarray(self.fr_ids)
        arm = fr[:7]
        nf6 = 6 * model.n_floating
        jq = q[7 * model.n_floating:]
        jqd = qd[nf6:]
        frames = forward_kinematics(model, q, jnp.zeros(model.nv))
        H = di.mass_matrix(model, params, q, frames)
        # joint-block of the franka arm
        cols = nf6 + arm
        mm = H[jnp.ix_(cols, cols)]
        J6 = di.point_jacobian(model, q, self.grasp_body,
                               self.grasp_pos_l, frames)
        # reference jacobian rows are [lin, ang]
        j_eef = jnp.concatenate([J6[3:], J6[:3]], axis=0)[:, cols]
        _, _, eef_vel = self._eef(q, qd)

        mm_inv = jnp.linalg.inv(mm + 1e-6 * jnp.eye(7))
        m_eef_inv = j_eef @ mm_inv @ j_eef.T
        m_eef = jnp.linalg.inv(m_eef_inv + 1e-6 * jnp.eye(6))
        u = j_eef.T @ (m_eef @ (self.kp * dpose - self.kd * eef_vel))
        # null-space posture control
        j_eef_inv = m_eef @ j_eef @ mm_inv
        qe = ((self.default_dof[:7] - jq[arm] + jnp.pi) % (2 * jnp.pi)) - jnp.pi
        u_null = self.kd_null * (-jqd[arm]) + self.kp_null * qe
        u_null = mm @ u_null
        u = u + (jnp.eye(7) - j_eef.T @ j_eef_inv) @ u_null
        return jnp.clip(u, -self.effort_limit[:7], self.effort_limit[:7])

    def pre_physics(self, state, actions):
        B = actions.shape[0]
        model = self.model
        u_arm_raw, u_grip = actions[:, :-1], actions[:, -1]
        if self.control_type == "osc":
            dpose = u_arm_raw[:, :6] * self.cmd_limit / self.action_scale
            u_arm = jax.vmap(self._osc_torques)(state.q, state.qd, dpose,
                                                state.params)
        else:
            u_arm = u_arm_raw[:, :7] * self.cmd_limit / self.action_scale
            u_arm = jnp.clip(u_arm, -self.effort_limit[:7],
                             self.effort_limit[:7])
        finger_target = jnp.where(u_grip >= 0, 0.04, 0.0)

        fr = jnp.asarray(self.fr_ids)
        effort = jnp.zeros((B, model.nj))
        effort = effort.at[:, fr[:7]].set(u_arm)
        tpos = jnp.zeros((B, model.nj))
        tpos = tpos.at[:, fr[7]].set(finger_target)
        tpos = tpos.at[:, fr[8]].set(finger_target)
        ctrl = Controls(tpos, jnp.zeros((B, model.nj)), effort)
        wrench = jnp.zeros((B, model.nb, 6))
        return ctrl, wrench, CubeStackTaskState(actions, finger_target)

    def post_physics(self, state, prev_task):
        model = self.model
        B = state.q.shape[0]
        gp, gq, _ = jax.vmap(self._eef)(state.q, state.qd)
        frames = jax.vmap(lambda q, qd: forward_kinematics(model, q, qd))(
            state.q, state.qd)
        lf = frames.pos[:, self.lfinger_body]
        rf = frames.pos[:, self.rfinger_body]
        posA = state.q[:, self.qA:self.qA + 3]
        quatA = state.q[:, self.qA + 3:self.qA + 7]
        posB = state.q[:, self.qB:self.qB + 3]
        a_to_b = posB - posA
        fr = jnp.asarray(self.fr_ids)
        nf = 7 * model.n_floating
        q_gripper = state.q[:, nf:][:, fr[7:]]

        obs = [quatA, posA, a_to_b, gp, gq, q_gripper]
        if self.control_type != "osc":
            obs.insert(5, state.q[:, nf:][:, fr[:7]])
        obs = jnp.concatenate(obs, axis=-1)

        # ---- reward (compute_franka_reward, :699-748) ----
        d = jnp.linalg.norm(posA - gp, axis=-1)
        d_lf = jnp.linalg.norm(posA - lf, axis=-1)
        d_rf = jnp.linalg.norm(posA - rf, axis=-1)
        dist_reward = 1 - jnp.tanh(10.0 * (d + d_lf + d_rf) / 3)
        heightA = posA[:, 2] - TABLE_Z
        lifted = (heightA - CUBE_A) > 0.04
        offset = jnp.asarray([0.0, 0.0, (CUBE_A + CUBE_B) / 2])
        d_ab = jnp.linalg.norm(a_to_b + offset, axis=-1)
        align_reward = (1 - jnp.tanh(10.0 * d_ab)) * lifted
        dist_reward = jnp.maximum(dist_reward, align_reward)
        target_h = CUBE_B + CUBE_A / 2
        aligned = jnp.linalg.norm(a_to_b[:, :2], axis=-1) < 0.02
        on_top = jnp.abs(heightA - target_h) < 0.02
        released = d > 0.04
        stack = aligned & on_top & released
        reward = jnp.where(
            stack, self.r_stack_scale,
            self.r_dist_scale * dist_reward + self.r_lift_scale * lifted
            + self.r_align_scale * align_reward)
        done = stack.astype(jnp.float32)

        metrics = dict(state.metrics)
        metrics["cubeA_height"] = heightA
        metrics["stack_rate"] = stack.astype(jnp.float32)
        metrics["grasp_dist"] = d
        return obs, reward, done, prev_task, metrics
