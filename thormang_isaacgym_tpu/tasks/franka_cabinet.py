"""FrankaCabinet — Panda opening the top drawer of a cabinet.

Parity with `/root/reference/isaacgymenvs/tasks/franka_cabinet.py` +
`cfg/task/FrankaCabinet.yaml`. The sektion-cabinet asset is absent from the
snapshot; a functionally equivalent cabinet (2 doors + 2 drawers, dof 3 =
drawer_top, prismatic stroke 0.4 m with a graspable handle bar) is generated
here.

Spec mapping:
- scene: franka at (1,0,0) yaw 180deg, cabinet at (0,0,0.4)
  (franka_cabinet.py:208-213); finger<->handle/drawer contact is real
  (penalty spheres vs handle capsule), so the drawer physically opens by
  grasp friction — the same mechanism as PhysX.
- obs (23): [franka dof_pos scaled to [-1,1] (9), dof_vel*0.1 (9),
  drawer_grasp - franka_grasp (3), drawer_pos (1), drawer_vel (1)]
  (compute_observations, :361-386)
- actions (9): dof position-target rates: target += speed_scale * dt * a *
  7.5, clamped to limits (:421-426); finger speed scale 0.1 (:194)
- reward (compute_franka_reward, :488-553): squared-inverse distance
  (doubled inside 2 cm), signed-square axis alignment, around-handle bonus,
  finger-distance shaping, open reward (drawer_pos scaled 7.5), action
  penalty 0.01, milestone bonuses at 0.01/0.2/0.39, -1 style penalty when a
  finger is behind the handle plane
- reset: franka dofs = default + U(-0.125, 0.125) clamped, cabinet dofs 0
  (:389-418); done when drawer_pos > 0.39 or timeout 500
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
    FRANKA_DEFAULT_DOF_POS, franka_dof_ids, load_franka,
)
from thormang_isaacgym_tpu.models.scene import compose
from thormang_isaacgym_tpu.ops.kinematics import forward_kinematics
from thormang_isaacgym_tpu.ops.sim import Controls, SimParams

DRAWER_STROKE = 0.4
HANDLE_X = 0.31          # handle bar x in drawer frame (front face + standoff)
DRAWER_Z = 0.23          # drawer joint height in cabinet frame (world z 0.63)


def make_cabinet_urdf() -> str:
    """Sektion-cabinet equivalent: chassis + 2 doors + 2 drawers; dof order
    [door_left, door_right, drawer_bottom, drawer_top] so dof index 3 is
    drawer_top_joint, matching `cabinet_dof_pos[:, 3]` in the reference."""
    def drawer(name, z):
        return f"""
  <joint name="{name}_joint" type="prismatic">
    <parent link="chassis"/><child link="{name}"/>
    <origin xyz="0 0 {z}"/><axis xyz="1 0 0"/>
    <limit lower="0.0" upper="{DRAWER_STROKE}" effort="1000" velocity="2"/>
    <dynamics damping="5.0" friction="1.0"/>
  </joint>
  <link name="{name}">
    <inertial><mass value="2.0"/>
      <inertia ixx="0.05" iyy="0.05" izz="0.05" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision name="{name}_box"><origin xyz="0 0 0"/>
      <geometry><box size="0.56 0.6 0.12"/></geometry></collision>
    <collision name="{name}_handle"><origin xyz="{HANDLE_X} 0 0" rpy="1.57079632679 0 0"/>
      <geometry><capsule radius="0.01" length="0.16"/></geometry></collision>
  </link>"""

    def door(name, y, sign):
        return f"""
  <joint name="{name}_joint" type="revolute">
    <parent link="chassis"/><child link="{name}"/>
    <origin xyz="0.3 {y} -0.1"/><axis xyz="0 0 {sign}"/>
    <limit lower="0.0" upper="1.57" effort="1000" velocity="2"/>
    <dynamics damping="5.0" friction="1.0"/>
  </joint>
  <link name="{name}">
    <inertial><origin xyz="0 {-y/2} 0"/><mass value="1.5"/>
      <inertia ixx="0.02" iyy="0.02" izz="0.02" ixy="0" ixz="0" iyz="0"/></inertial>
  </link>"""

    return f"""
<robot name="cabinet">
  <link name="chassis">
    <inertial><mass value="50.0"/>
      <inertia ixx="5" iyy="5" izz="5" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision name="chassis_box"><origin xyz="-0.05 0 -0.05"/>
      <geometry><box size="0.5 0.7 0.7"/></geometry></collision>
  </link>
  {door("door_left", 0.35, 1)}
  {door("door_right", -0.35, -1)}
  {drawer("drawer_bottom", -0.05)}
  {drawer("drawer_top", DRAWER_Z)}
</robot>"""


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FrankaCabinetTaskState:
    dof_targets: jnp.ndarray   # (B, 9) franka dof position targets
    actions: jnp.ndarray       # (B, 9) last raw actions (action penalty)


class FrankaCabinet(Task):
    num_obs = 23
    num_actions = 9
    max_episode_length = 500   # FrankaCabinet.yaml:10
    clip_obs = 5.0             # FrankaCabinet.yaml:13
    action_scale = 7.5
    dof_vel_scale = 0.1
    dist_reward_scale = 2.0
    rot_reward_scale = 0.5
    around_handle_reward_scale = 0.25
    open_reward_scale = 7.5
    finger_dist_reward_scale = 5.0
    action_penalty_scale = 0.01
    distX_offset = 0.04

    def __init__(self, num_envs: int = 4096, seed: int = 42, **_):
        super().__init__(num_envs, seed)
        franka = load_franka()
        cabinet = load_urdf(make_cabinet_urdf(), fix_base_link=True)
        # franka at (1,0,0) yawed 180 deg; cabinet center at z=0.4
        scene = compose([
            (franka, (1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0), "franka/"),
            (cabinet, (0.0, 0.0, 0.4, 1.0, 0.0, 0.0, 0.0), "cabinet/"),
        ], name="franka_cabinet")
        self.model = scene
        self.fr_ids = np.array(franka_dof_ids(scene, "franka/"))
        self.drawer_dof = scene.dof_id("cabinet/drawer_top_joint")
        self.drawer_body = scene.body_id("cabinet/drawer_top")
        self.lfinger_body = scene.body_id("franka/panda_leftfinger")
        self.rfinger_body = scene.body_id("franka/panda_rightfinger")
        gb, gp, gq = scene.sites["franka/panda_grasp"]
        self.grasp_body, self.grasp_pos_l, self.grasp_quat_l = gb, gp, gq

        d = scene._defaults
        self.fr_lower = jnp.asarray(np.array(d["dof_lower"])[self.fr_ids])
        self.fr_upper = jnp.asarray(np.array(d["dof_upper"])[self.fr_ids])
        self.default_dof = jnp.asarray(FRANKA_DEFAULT_DOF_POS)
        self.speed_scales = jnp.asarray(np.array([1.0] * 7 + [0.1] * 2, np.float32))

        self.sim_params = SimParams(
            dt=1.0 / 60.0, substeps=4, gravity=(0.0, 0.0, -9.81),
            contact_stiffness=1.0e5, contact_damping=1.0e3,
            friction_vel=0.004, plane_friction=1.0,
            max_depenetration_velocity=0.5)
        self.dt = self.sim_params.dt

    # ------------------------------------------------------------------
    def default_task_state(self, key):
        return FrankaCabinetTaskState(
            jnp.tile(self.default_dof, (self.num_envs, 1)),
            jnp.zeros((self.num_envs, 9)))

    def reset_fn(self, key, params, task):
        pos = self.default_dof + 0.25 * (jax.random.uniform(key, (9,)) - 0.5)
        pos = jnp.clip(pos, self.fr_lower, self.fr_upper)
        jq = jnp.zeros(self.model.nj)
        jq = jq.at[jnp.asarray(self.fr_ids)].set(pos)
        q = jq          # no floating roots: q == joint_q
        qd = jnp.zeros(self.model.nv)
        return q, qd, params, FrankaCabinetTaskState(pos, jnp.zeros(9))

    def pre_physics(self, state, actions):
        B = actions.shape[0]
        t = state.task
        targets = t.dof_targets + self.speed_scales * self.dt * actions * self.action_scale
        targets = jnp.clip(targets, self.fr_lower[None], self.fr_upper[None])
        full = jnp.zeros((B, self.model.nj))
        full = full.at[:, jnp.asarray(self.fr_ids)].set(targets)
        ctrl = Controls(full, jnp.zeros_like(full), jnp.zeros_like(full))
        wrench = jnp.zeros((B, self.model.nb, 6))
        return ctrl, wrench, FrankaCabinetTaskState(targets, actions)

    def post_physics(self, state, prev_task):
        model = self.model
        frames = jax.vmap(lambda q, qd: forward_kinematics(model, q, qd))(
            state.q, state.qd)
        jq, jqd = state.q, state.qd        # fixed-base scene: q is joint_q
        fr_ids = jnp.asarray(self.fr_ids)
        fr_pos, fr_vel = jq[:, fr_ids], jqd[:, fr_ids]
        drawer_pos = jq[:, self.drawer_dof]
        drawer_vel = jqd[:, self.drawer_dof]

        # grasp frames (compute_grasp_transforms, :325-338)
        gq = Q.mul(frames.quat[:, self.grasp_body], jnp.asarray(self.grasp_quat_l))
        gp = frames.pos[:, self.grasp_body] + Q.rotate(
            frames.quat[:, self.grasp_body], jnp.asarray(self.grasp_pos_l))
        dq_ = frames.quat[:, self.drawer_body]
        dp_ = frames.pos[:, self.drawer_body] + Q.rotate(
            dq_, jnp.asarray([HANDLE_X, 0.0, 0.01], dtype=jnp.float32))
        lf = frames.pos[:, self.lfinger_body]
        rf = frames.pos[:, self.rfinger_body]

        dof_pos_scaled = 2.0 * (fr_pos - self.fr_lower) / (self.fr_upper - self.fr_lower) - 1.0
        to_target = dp_ - gp
        obs = jnp.concatenate([
            dof_pos_scaled, fr_vel * self.dof_vel_scale, to_target,
            drawer_pos[:, None], drawer_vel[:, None]], axis=-1)

        reward, done = self._reward(prev_task.actions, gp, gq, dp_, dq_,
                                    lf, rf, drawer_pos)
        metrics = dict(state.metrics)
        metrics["drawer_pos"] = drawer_pos
        metrics["grasp_dist"] = jnp.linalg.norm(to_target, axis=-1)
        return obs, reward, done, prev_task, metrics

    def _reward(self, actions, gp, gq, dp_, dq_, lf, rf, drawer_pos):
        d = jnp.linalg.norm(gp - dp_, axis=-1)
        dist_reward = 1.0 / (1.0 + d ** 2)
        dist_reward = dist_reward * dist_reward
        dist_reward = jnp.where(d <= 0.02, dist_reward * 2, dist_reward)

        axis1 = Q.rotate(gq, jnp.asarray([0.0, 0.0, 1.0]))   # gripper forward
        axis2 = Q.rotate(dq_, jnp.asarray([-1.0, 0.0, 0.0]))  # drawer inward
        axis3 = Q.rotate(gq, jnp.asarray([0.0, 1.0, 0.0]))   # gripper up
        axis4 = Q.rotate(dq_, jnp.asarray([0.0, 0.0, 1.0]))  # drawer up
        dot1 = jnp.sum(axis1 * axis2, axis=-1)
        dot2 = jnp.sum(axis3 * axis4, axis=-1)
        rot_reward = 0.5 * (jnp.sign(dot1) * dot1 ** 2 + jnp.sign(dot2) * dot2 ** 2)

        around = jnp.where((lf[:, 2] > dp_[:, 2]) & (rf[:, 2] < dp_[:, 2]), 0.5, 0.0)
        lfd = jnp.abs(lf[:, 2] - dp_[:, 2])
        rfd = jnp.abs(rf[:, 2] - dp_[:, 2])
        finger_dist = jnp.where((lf[:, 2] > dp_[:, 2]) & (rf[:, 2] < dp_[:, 2]),
                                (0.04 - lfd) + (0.04 - rfd), 0.0)
        open_reward = drawer_pos * around + drawer_pos      # :533
        action_penalty = jnp.sum(actions ** 2, axis=-1)

        rewards = (self.dist_reward_scale * dist_reward
                   + self.rot_reward_scale * rot_reward
                   + self.around_handle_reward_scale * around
                   + self.open_reward_scale * open_reward
                   + self.finger_dist_reward_scale * finger_dist
                   - self.action_penalty_scale * action_penalty)

        rewards = jnp.where(drawer_pos > 0.01, rewards + 0.5, rewards)
        rewards = jnp.where(drawer_pos > 0.2, rewards + around, rewards)
        rewards = jnp.where(drawer_pos > 0.39, rewards + 2.0 * around, rewards)
        # style: finger behind handle plane
        rewards = jnp.where(lf[:, 0] < dp_[:, 0] - self.distX_offset, -1.0, rewards)
        rewards = jnp.where(rf[:, 0] < dp_[:, 0] - self.distX_offset, -1.0, rewards)

        done = (drawer_pos > 0.39).astype(jnp.float32)
        return rewards, done
