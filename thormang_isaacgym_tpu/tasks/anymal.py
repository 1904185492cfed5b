"""Anymal quadruped velocity-command tracking.

Parity with `/root/reference/isaacgymenvs/tasks/anymal.py` (fork-modified) and
`cfg/task/Anymal.yaml`. The `urdf/anymal_c` asset is ABSENT from the snapshot
(SURVEY.md §0), so an ANYmal-C-like morphology is generated here from public
dimensions (base 0.53x0.3x0.24 m ~16.8 kg, HAA/HFE/KFE legs, thigh 0.25 m,
shank 0.33 m, ~80 Nm joints, total ~30 kg).

Spec mapping:
- obs (61, compute_anymal_observations_V2, anymal.py:399-436):
  [base_lin_vel(3), base_ang_vel(3), torques(12), projected_gravity(3),
   per-body |contact|(13), dof_pos_scaled(12), dof_vel*0.05(12), commands(3)]
- actions: PD position targets = action * 0.5 + default angles, Kp 85 Kd 2
  (Anymal.yaml:31-35)
- reward (compute_anymal_reward, anymal.py:325-370, scales *dt):
  exp(-|cmd_xy - v_xy|^2/0.25) * 1.0 + exp(-(cmd_yaw - w_z)^2/0.25) * 0.5
  - 2.5e-5 * |tau|^2, clipped >= 0
- reset: base or knee contact force > 1 N, or timeout (50 s)
- commands: vx U(-2,2), vy U(-1,1), yaw rate U(-1,1) (Anymal.yaml:25-28)
- reset state: dof_pos = default * U(0.5, 1.5), dof_vel U(-0.1, 0.1)
  (anymal.py:294-298)
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from thormang_isaacgym_tpu.core import quat as Q
from thormang_isaacgym_tpu.engine.env import Task
from thormang_isaacgym_tpu.models import load_urdf
from thormang_isaacgym_tpu.models.robot import DRIVE_POS
from thormang_isaacgym_tpu.ops.sim import Controls, SimParams

# (name, sign_x, sign_y): LF, LH, RF, RH
_LEGS = [("LF", 1, 1), ("LH", -1, 1), ("RF", 1, -1), ("RH", -1, -1)]

DEFAULT_ANGLES = {  # Anymal.yaml:37-50
    "LF_HAA": 0.03, "LH_HAA": 0.03, "RF_HAA": -0.03, "RH_HAA": -0.03,
    "LF_HFE": 0.4, "LH_HFE": -0.4, "RF_HFE": 0.4, "RH_HFE": -0.4,
    "LF_KFE": -0.8, "LH_KFE": 0.8, "RF_KFE": -0.8, "RH_KFE": 0.8,
}


def make_anymal_urdf() -> str:
    base_m = 16.8
    hx, hy, hz = 0.265, 0.15, 0.12
    bi = (base_m / 3.0 * (hy**2 + hz**2), base_m / 3.0 * (hx**2 + hz**2),
          base_m / 3.0 * (hx**2 + hy**2))
    thigh_l, shank_l = 0.25, 0.33
    parts = [f"""
  <link name="base">
    <inertial><mass value="{base_m}"/>
      <inertia ixx="{bi[0]:.4f}" iyy="{bi[1]:.4f}" izz="{bi[2]:.4f}" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision><geometry><box size="{2*hx} {2*hy} {2*hz}"/></geometry></collision>
  </link>"""]
    for name, sx, sy in _LEGS:
        hip_x, hip_y = sx * 0.3, sy * 0.104
        parts.append(f"""
  <joint name="{name}_HAA" type="revolute">
    <parent link="base"/><child link="{name}_HIP"/>
    <origin xyz="{hip_x} {hip_y} 0"/><axis xyz="1 0 0"/>
    <limit lower="-0.72" upper="0.72" effort="80" velocity="15"/>
  </joint>
  <link name="{name}_HIP">
    <inertial><mass value="1.4"/>
      <inertia ixx="0.003" iyy="0.003" izz="0.003" ixy="0" ixz="0" iyz="0"/></inertial>
  </link>
  <joint name="{name}_HFE" type="revolute">
    <parent link="{name}_HIP"/><child link="{name}_THIGH"/>
    <origin xyz="0 {sy*0.1} 0"/><axis xyz="0 1 0"/>
    <limit lower="-3.14" upper="3.14" effort="80" velocity="15"/>
  </joint>
  <link name="{name}_THIGH">
    <inertial><origin xyz="0 0 {-thigh_l/2}"/><mass value="1.6"/>
      <inertia ixx="{1.6*thigh_l**2/12:.5f}" iyy="{1.6*thigh_l**2/12:.5f}" izz="0.002" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision><origin xyz="0 0 {-thigh_l/2}"/>
      <geometry><capsule radius="0.045" length="{thigh_l-0.09}"/></geometry></collision>
  </link>
  <joint name="{name}_KFE" type="revolute">
    <parent link="{name}_THIGH"/><child link="{name}_SHANK"/>
    <origin xyz="0 0 {-thigh_l}"/><axis xyz="0 1 0"/>
    <limit lower="-3.14" upper="3.14" effort="80" velocity="15"/>
  </joint>
  <link name="{name}_SHANK">
    <inertial><origin xyz="0 0 {-shank_l/2}"/><mass value="0.5"/>
      <inertia ixx="{0.5*shank_l**2/12:.5f}" iyy="{0.5*shank_l**2/12:.5f}" izz="0.001" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision name="{name}_FOOT"><origin xyz="0 0 {-shank_l}"/>
      <geometry><sphere radius="0.03"/></geometry></collision>
  </link>""")
    return f'<robot name="anymal">{"".join(parts)}\n</robot>'


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AnymalTaskState:
    commands: jnp.ndarray   # (B, 3) vx, vy, yaw_rate
    actions: jnp.ndarray    # (B, 12)


class Anymal(Task):
    num_actions = 12
    num_obs = 61
    clip_obs = 5.0          # Anymal.yaml:10

    # control (Anymal.yaml:31-35)
    Kp = 85.0
    Kd = 2.0
    action_scale = 0.5
    # reward scales (Anymal.yaml:60-63), multiplied by dt at init (anymal.py:99-100)
    rew_lin_vel_xy = 1.0
    rew_ang_vel_z = 0.5
    rew_torque = -0.000025
    # normalization (Anymal.yaml:65-69)
    lin_vel_scale = 2.0
    ang_vel_scale = 0.25
    dof_pos_scale = 1.0
    dof_vel_scale = 0.05
    command_x_range = (-2.0, 2.0)
    command_y_range = (-1.0, 1.0)
    command_yaw_range = (-1.0, 1.0)

    def __init__(self, num_envs: int = 4096, seed: int = 42, **_):
        super().__init__(num_envs, seed)
        model = load_urdf(make_anymal_urdf(), name="anymal")
        d = model._defaults
        d["drive_mode"] = np.full(model.nj, DRIVE_POS, np.int32)
        d["drive_stiffness"] = np.full(model.nj, self.Kp, np.float32)
        d["drive_damping"] = np.full(model.nj, self.Kd, np.float32)
        d["drive_effort_limit"] = np.full(model.nj, 80.0, np.float32)
        self.model = model
        self.sim_params = SimParams(
            dt=1.0 / 60.0, substeps=4, gravity=(0.0, 0.0, -9.81),
            contact_stiffness=3.0e4, contact_damping=800.0,
            friction_vel=0.05, plane_friction=1.0)
        self.dt = self.sim_params.dt
        self.max_episode_length = int(50.0 / self.dt + 0.5)  # 50 s episodes
        self.default_dof_pos = jnp.asarray(
            np.array([DEFAULT_ANGLES[n] for n in model.joint_names], np.float32))
        self.dof_lower = jnp.asarray(np.array(d["dof_lower"]))
        self.dof_upper = jnp.asarray(np.array(d["dof_upper"]))
        self.base_init_z = 0.62      # Anymal.yaml:20
        self.knees = [model.body_id(f"{n}_THIGH") for n, _, _ in _LEGS]
        self.base_index = 0

    # ------------------------------------------------------------------
    def default_task_state(self, key):
        B = self.num_envs
        return AnymalTaskState(jnp.zeros((B, 3)), jnp.zeros((B, 12)))

    def _sample_commands(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        cx = jax.random.uniform(k1, (), minval=self.command_x_range[0], maxval=self.command_x_range[1])
        cy = jax.random.uniform(k2, (), minval=self.command_y_range[0], maxval=self.command_y_range[1])
        cw = jax.random.uniform(k3, (), minval=self.command_yaw_range[0], maxval=self.command_yaw_range[1])
        return jnp.stack([cx, cy, cw])

    def reset_fn(self, key, params, task):
        k1, k2, k3 = jax.random.split(key, 3)
        nj = self.model.nj
        jq = self.default_dof_pos * jax.random.uniform(k1, (nj,), minval=0.5, maxval=1.5)
        jqd = jax.random.uniform(k2, (nj,), minval=-0.1, maxval=0.1)
        q = jnp.concatenate([
            jnp.array([0.0, 0.0, self.base_init_z]), jnp.array([1.0, 0, 0, 0]), jq])
        qd = jnp.concatenate([jnp.zeros(6), jqd])
        task = AnymalTaskState(self._sample_commands(k3), jnp.zeros(12))
        return q, qd, params, task

    def pre_physics(self, state, actions):
        B = actions.shape[0]
        targets = self.action_scale * actions + self.default_dof_pos[None]
        ctrl = Controls(targets, jnp.zeros((B, self.model.nj)), jnp.zeros((B, self.model.nj)))
        wrench = jnp.zeros((B, self.model.nb, 6))
        return ctrl, wrench, dataclasses.replace(state.task, actions=actions)

    def _torques(self, state, t):
        """Estimated applied PD torque (for obs + reward; the drive itself
        runs inside the sim step)."""
        jq = state.q[:, 7:]
        jqd = state.qd[:, 6:]
        targets = self.action_scale * t.actions + self.default_dof_pos[None]
        tau = self.Kp * (targets - jq) - self.Kd * jqd
        return jnp.clip(tau, -80.0, 80.0)

    def post_physics(self, state, prev_task):
        t = prev_task
        B = state.q.shape[0]
        quat = state.q[:, 3:7]
        base_lin_vel = Q.rotate_inv(quat, state.qd[:, 3:6])  # world -> base frame
        base_ang_vel = state.qd[:, 0:3]
        jq = state.q[:, 7:]
        jqd = state.qd[:, 6:]
        projected_gravity = Q.rotate_inv(quat, jnp.array([0.0, 0.0, -1.0]))
        torques = self._torques(state, t)
        contact = jnp.linalg.norm(state.net_contact, axis=-1)  # (B, nb)

        obs = jnp.concatenate([
            base_lin_vel, base_ang_vel, torques,
            jnp.broadcast_to(projected_gravity, (B, 3)),
            contact,
            (jq - self.default_dof_pos[None]) * self.dof_pos_scale,
            jqd * self.dof_vel_scale,
            t.commands,
        ], axis=-1)

        lin_vel_err = jnp.sum((t.commands[:, :2] - base_lin_vel[:, :2]) ** 2, axis=1)
        ang_vel_err = (t.commands[:, 2] - base_ang_vel[:, 2]) ** 2
        r_lin = jnp.exp(-lin_vel_err / 0.25) * (self.rew_lin_vel_xy * self.dt)
        r_ang = jnp.exp(-ang_vel_err / 0.25) * (self.rew_ang_vel_z * self.dt)
        r_tau = jnp.sum(torques**2, axis=1) * (self.rew_torque * self.dt)
        reward = jnp.clip(r_lin + r_ang + r_tau, 0.0, None)

        base_hit = jnp.linalg.norm(state.net_contact[:, self.base_index], axis=-1) > 1.0
        knee_hit = jnp.any(
            jnp.linalg.norm(state.net_contact[:, self.knees], axis=-1) > 1.0, axis=1)
        done = base_hit | knee_hit

        metrics = dict(state.metrics)
        metrics["rew_lin_vel"] = r_lin
        metrics["rew_ang_vel"] = r_ang
        metrics["base_height"] = state.q[:, 2]
        return obs, reward, done.astype(jnp.float32), t, metrics
