"""Ant locomotion task — parity with `/root/reference/isaacgymenvs/tasks/ant.py`
and `cfg/task/Ant.yaml`.

The reference's `mjcf/nv_ant.xml` asset is ABSENT from the snapshot
(SURVEY.md §0 gap table), so the classic ant morphology is re-derived here
from the canonical MuJoCo ant (torso sphere r=0.25, four 2-segment legs at
45-degree spokes, capsule r=0.08, geom density 5 kg/m^3, hip range +/-40 deg,
ankle 30..100 deg, actuator gear 15 — matching `joint_gears` usage at
ant.py:146-149) and generated as URDF at build time.

Spec mapping:
- obs (60): [torso_z, vel_loc(3), angvel_loc(3), yaw, roll, angle_to_target,
  up_proj, heading_proj, dof_pos_scaled(8), dof_vel*0.2(8),
  feet force-torque(24)*0.1, actions(8)] (compute_ant_observations,
  ant.py:369-409)
- actions: 8 joint efforts * gear 15 * powerScale (ant.py:275-279)
- reward: progress(potentials) + alive 0.5 + up(>0.93:+0.1) +
  heading(>0.8:0.5 else scaled) - 0.005 action cost - 0.05 electricity -
  0.1 joints-at-limit; death -2.0 below z=0.31 (compute_ant_reward,
  ant.py:319-364; weights Ant.yaml:18-28)
- reset: dof pos U(-0.2,0.2) around initial, vel U(-0.1,0.1)
  (ant.py:237-247); target (1000,0,0), potentials -1000/dt (ant.py:111-114)
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from thormang_isaacgym_tpu.core import quat as Q
from thormang_isaacgym_tpu.engine.env import Task
from thormang_isaacgym_tpu.models import load_urdf
from thormang_isaacgym_tpu.models.robot import DRIVE_EFFORT
from thormang_isaacgym_tpu.ops.sim import Controls, SimParams
from thormang_isaacgym_tpu.tasks import common


def _capsule_inertial(mass, r, l):
    """Inertia of a capsule about its center, axis z (approx as cylinder)."""
    ixx = mass * (3 * r**2 + l**2) / 12.0
    izz = mass * r**2 / 2.0
    return ixx, ixx, izz


def make_ant_urdf() -> str:
    """Generate the ant URDF (see module docstring for provenance)."""
    density = 5.0
    r = 0.08
    torso_r = 0.25
    torso_m = density * 4.0 / 3.0 * np.pi * torso_r**3
    torso_i = 0.4 * torso_m * torso_r**2

    legs = [
        ("front_left", 45.0), ("front_right", -45.0),
        ("back_left", 135.0), ("back_right", -135.0),
    ]
    seg1 = 0.2 * np.sqrt(2)   # upper leg length
    seg2 = 0.4 * np.sqrt(2)   # foot length

    def cap_mass(length):
        return density * (np.pi * r**2 * length + 4.0 / 3.0 * np.pi * r**3)

    parts = [f"""
  <link name="torso">
    <inertial><mass value="{torso_m:.4f}"/>
      <inertia ixx="{torso_i:.5f}" iyy="{torso_i:.5f}" izz="{torso_i:.5f}" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision><geometry><sphere radius="{torso_r}"/></geometry></collision>
  </link>"""]

    for name, ang in legs:
        a = np.radians(ang)
        c, s = np.cos(a), np.sin(a)
        hip_xy = (0.2 * np.sqrt(2)) * np.array([c, s])
        m1, m2 = cap_mass(seg1), cap_mass(seg2)
        i1 = _capsule_inertial(m1, r, seg1)
        i2 = _capsule_inertial(m2, r, seg2)
        # capsule local axis z; orient along leg direction d=(c,s,0):
        # rotate z onto d: pitch 90deg about y then yaw `a` about z
        rpy = f"0 1.5707963 {a:.7f}"
        # hip: rotation about world z at the torso attachment point
        parts.append(f"""
  <joint name="hip_{name}" type="revolute">
    <parent link="torso"/><child link="leg_{name}"/>
    <origin xyz="{hip_xy[0]:.4f} {hip_xy[1]:.4f} 0"/>
    <axis xyz="0 0 1"/>
    <limit lower="-0.6981" upper="0.6981" effort="15" velocity="100"/>
  </joint>
  <link name="leg_{name}">
    <inertial><origin xyz="{c*seg1/2:.4f} {s*seg1/2:.4f} 0" rpy="{rpy}"/>
      <mass value="{m1:.4f}"/>
      <inertia ixx="{i1[0]:.6f}" iyy="{i1[1]:.6f}" izz="{i1[2]:.6f}" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision><origin xyz="{c*seg1/2:.4f} {s*seg1/2:.4f} 0" rpy="{rpy}"/>
      <geometry><capsule radius="{r}" length="{seg1:.4f}"/></geometry></collision>
  </link>
  <joint name="ankle_{name}" type="revolute">
    <parent link="leg_{name}"/><child link="foot_{name}"/>
    <origin xyz="{c*seg1:.4f} {s*seg1:.4f} 0"/>
    <axis xyz="{-s:.6f} {c:.6f} 0"/>
    <limit lower="0.5236" upper="1.7453" effort="15" velocity="100"/>
  </joint>
  <link name="foot_{name}">
    <inertial><origin xyz="{c*seg2/2:.4f} {s*seg2/2:.4f} 0" rpy="{rpy}"/>
      <mass value="{m2:.4f}"/>
      <inertia ixx="{i2[0]:.6f}" iyy="{i2[1]:.6f}" izz="{i2[2]:.6f}" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision><origin xyz="{c*seg2/2:.4f} {s*seg2/2:.4f} 0" rpy="{rpy}"/>
      <geometry><capsule radius="{r}" length="{seg2:.4f}"/></geometry></collision>
  </link>""")

    return f'<robot name="ant">{"".join(parts)}\n</robot>'


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AntTaskState:
    potentials: jnp.ndarray        # (B,)
    prev_potentials: jnp.ndarray   # (B,)
    actions: jnp.ndarray           # (B, 8) last actions (obs + reward)


class Ant(Task):
    num_actions = 8
    num_obs = 60
    max_episode_length = 1000
    control_freq_inv = 1

    # Ant.yaml:18-28
    power_scale = 1.0
    heading_weight = 0.5
    up_weight = 0.1
    actions_cost_scale = 0.005
    energy_cost_scale = 0.05
    dof_vel_scale = 0.2
    contact_force_scale = 0.1
    joints_at_limit_cost_scale = 0.1
    death_cost = -2.0
    termination_height = 0.31

    def __init__(self, num_envs: int = 4096, seed: int = 42, **_):
        super().__init__(num_envs, seed)
        model = load_urdf(make_ant_urdf(), name="ant")
        d = model._defaults
        d["drive_mode"] = np.full(model.nj, DRIVE_EFFORT, np.int32)
        d["drive_effort_limit"] = np.full(model.nj, 1e6, np.float32)
        self.model = model
        self.sim_params = SimParams(
            dt=1.0 / 60.0, substeps=4, gravity=(0.0, 0.0, -9.81),
            contact_stiffness=2.0e3, contact_damping=60.0,
            friction_vel=0.05, plane_friction=1.0)
        self.joint_gears = jnp.full(model.nj, 15.0)
        self.dt = self.sim_params.dt
        dlower = np.array(d["dof_lower"], np.float32)
        dupper = np.array(d["dof_upper"], np.float32)
        self._init_jq = common.initial_dof_pos(dlower, dupper)
        self.dof_lower = jnp.asarray(dlower)
        self.dof_upper = jnp.asarray(dupper)
        self.spawn_z = common.solve_spawn_height(model, self._init_jq, clearance=0.01)
        self.feet = [model.body_id(f"foot_{n}") for n in
                     ("front_left", "front_right", "back_left", "back_right")]
        self.targets = jnp.array([1000.0, 0.0, 0.0])
        self.basis_vec0 = jnp.array([1.0, 0.0, 0.0])
        self.basis_vec1 = jnp.array([0.0, 0.0, 1.0])

    # ------------------------------------------------------------------
    def default_task_state(self, key):
        B = self.num_envs
        p = jnp.full(B, -1000.0 / self.dt)
        return AntTaskState(p, p, jnp.zeros((B, self.num_actions)))

    def reset_fn(self, key, params, task):
        k1, k2 = jax.random.split(key)
        nj = self.model.nj
        jq = jnp.asarray(self._init_jq) + jax.random.uniform(k1, (nj,), minval=-0.2, maxval=0.2)
        jq = jnp.clip(jq, self.dof_lower, self.dof_upper)
        jqd = jax.random.uniform(k2, (nj,), minval=-0.1, maxval=0.1)
        q = jnp.concatenate([
            jnp.array([0.0, 0.0, self.spawn_z]), jnp.array([1.0, 0, 0, 0]), jq])
        qd = jnp.concatenate([jnp.zeros(6), jqd])
        to_target = self.targets - q[0:3]
        pot = -jnp.linalg.norm(to_target.at[2].set(0.0)) / self.dt
        task = AntTaskState(pot, pot, jnp.zeros(self.num_actions))
        return q, qd, params, task

    def pre_physics(self, state, actions):
        efforts = actions * self.joint_gears[None, :] * self.power_scale
        B = actions.shape[0]
        ctrl = Controls(jnp.zeros((B, self.model.nj)), jnp.zeros((B, self.model.nj)), efforts)
        wrench = jnp.zeros((B, self.model.nb, 6))
        return ctrl, wrench, dataclasses.replace(state.task, actions=actions)

    def post_physics(self, state, prev_task):
        t = prev_task
        pos = state.q[:, 0:3]
        quat = state.q[:, 3:7]
        vel_w = state.qd[:, 3:6]            # root linear velocity: world frame
        angvel_w = Q.rotate(quat, state.qd[:, 0:3])
        jq = state.q[:, 7:]
        jqd = state.qd[:, 6:]

        to_target = (self.targets[None] - pos).at[:, 2].set(0.0)
        prev_pot = t.potentials
        potentials = -jnp.linalg.norm(to_target, axis=-1) / self.dt

        _, up_proj, heading_proj, _, _ = common.compute_heading_and_up(
            quat, Q.identity((pos.shape[0],)), to_target,
            self.basis_vec0, self.basis_vec1)
        vel_loc, angvel_loc, roll, _, yaw, angle_to_target = common.compute_rot(
            quat, vel_w, angvel_w, self.targets[None], pos)

        dof_pos_scaled = common.unscale(jq, self.dof_lower[None], self.dof_upper[None])
        # force "sensors": per-foot net contact force + zero torque
        # (create_asset_force_sensor equivalent, ant.py:82-85)
        feet = state.net_contact[:, self.feet, :]                  # (B,4,3)
        sensors = jnp.concatenate(
            [feet, jnp.zeros_like(feet)], axis=-1).reshape(pos.shape[0], 24)

        obs = jnp.concatenate([
            pos[:, 2:3], vel_loc, angvel_loc,
            yaw[:, None], roll[:, None], angle_to_target[:, None],
            up_proj[:, None], heading_proj[:, None],
            dof_pos_scaled, jqd * self.dof_vel_scale,
            sensors * self.contact_force_scale,
            t.actions,
        ], axis=-1)

        # reward (compute_ant_reward)
        heading_reward = jnp.where(
            heading_proj > 0.8, self.heading_weight,
            self.heading_weight * heading_proj / 0.8)
        up_reward = jnp.where(up_proj > 0.93, self.up_weight, 0.0)
        actions_cost = jnp.sum(t.actions**2, axis=-1)
        electricity = jnp.sum(jnp.abs(t.actions * jqd * self.dof_vel_scale), axis=-1)
        at_limit = jnp.sum((dof_pos_scaled > 0.99).astype(jnp.float32), axis=-1)
        alive = 0.5
        progress = potentials - prev_pot
        reward = (progress + alive + up_reward + heading_reward
                  - self.actions_cost_scale * actions_cost
                  - self.energy_cost_scale * electricity
                  - self.joints_at_limit_cost_scale * at_limit)
        fallen = pos[:, 2] < self.termination_height
        reward = jnp.where(fallen, self.death_cost, reward)

        task = dataclasses.replace(t, potentials=potentials, prev_potentials=prev_pot)
        metrics = dict(state.metrics)
        metrics["torso_height"] = pos[:, 2]
        metrics["heading_proj"] = heading_proj
        return obs, reward, fallen.astype(jnp.float32), task, metrics
