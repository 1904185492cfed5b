"""THORMANG humanoid flat-ground locomotion.

Parity with `/root/reference/isaacgymenvs/tasks/humanoid.py` (the fork's
modified Humanoid) using the reference's OWN humanoid asset
(`assets/urdf/gogoro/urdf/only_thormang.urdf`) — the `mjcf/nv_humanoid.xml`
the upstream task loads is absent from the snapshot (SURVEY.md §0), while the
THORMANG URDF is the fork's actual robot and the driver's config #3 target.

Spec mapping (obs layout generalizes humanoid.py:398-414 from 21 to N dofs;
for N=36 thormang dofs obs_dim = 12 + 4N + 14 = 170):
- obs: [torso_z, vel_loc(3), angvel_loc(3)*0.25, yaw, roll, angle_to_target,
  up_proj, heading_proj, dof_pos_scaled(N), dof_vel(N)*0.1,
  dof_force(N)*0.01, feet force-torque(12)*0.01, actions(N),
  potentials/60000, prev_potentials/60000]
- actions: N joint efforts * motor_efforts * powerScale
  (humanoid.py:280-285)
- reward (fork-modified, humanoid.py:360-377): alive 2.0 + up(>0.93:+0.1)
  + progress; heading/energy terms commented out in the fork; death -1.0
  below terminationHeight 0.8
- feet force sensors (humanoid.py:163-168) -> per-foot net contact force
- dof force sensors (humanoid.py:85-86,196) -> applied drive torque
"""
from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from thormang_isaacgym_tpu.core import quat as Q
from thormang_isaacgym_tpu.engine.env import Task
from thormang_isaacgym_tpu.models import load_urdf
from thormang_isaacgym_tpu.models.robot import DRIVE_EFFORT
from thormang_isaacgym_tpu.ops.kinematics import forward_kinematics
from thormang_isaacgym_tpu.ops.sim import Controls, SimParams
from thormang_isaacgym_tpu.tasks import common

REF_THORMANG = "/root/reference/assets/urdf/gogoro/urdf/thormang3.urdf"

# foot soles from robotis_l_leg_foot.obj bbox (x +-0.108, y -0.057..0.087,
# z -0.0275..0.015)
_FOOT_BOX = {"type": "box", "size": (0.108, 0.072, 0.021),
             "pos": (0.0, 0.015, -0.006), "quat": (1.0, 0, 0, 0)}


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HumanoidTaskState:
    potentials: jnp.ndarray
    prev_potentials: jnp.ndarray
    actions: jnp.ndarray
    applied_torque: jnp.ndarray


class Humanoid(Task):
    uses_net_torque = True   # 6-DOF force sensors read net_torque
    max_episode_length = 1000
    control_freq_inv = 1

    # cfg/task/Humanoid.yaml upstream values (fork uses same file shape)
    power_scale = 1.0
    heading_weight = 0.5
    up_weight = 0.1
    actions_cost_scale = 0.01
    energy_cost_scale = 0.05
    dof_vel_scale = 0.1
    angular_velocity_scale = 0.25
    contact_force_scale = 0.01
    joints_at_limit_cost_scale = 0.25
    death_cost = -1.0
    termination_height = 0.8

    def __init__(self, num_envs: int = 4096, seed: int = 42,
                 asset_path: str | None = None, randomize: bool = False, **_):
        super().__init__(num_envs, seed)
        path = asset_path or REF_THORMANG
        if not os.path.exists(path):
            raise FileNotFoundError(f"thormang asset not found at {path}")
        model = load_urdf(
            path,
            mesh_overrides={
                "l_leg_foot_link": _FOOT_BOX, "r_leg_foot_link": _FOOT_BOX,
                # coarse body collisions so falls make contact
                "pelvis_link": {"type": "sphere", "size": (0.15,), "pos": (0, 0, 0), "quat": (1, 0, 0, 0)},
                "chest_link": {"type": "sphere", "size": (0.18,), "pos": (0, 0, 0.1), "quat": (1, 0, 0, 0)},
                "l_leg_kn_p_link": {"type": "sphere", "size": (0.07,), "pos": (0, 0, -0.15), "quat": (1, 0, 0, 0)},
                "r_leg_kn_p_link": {"type": "sphere", "size": (0.07,), "pos": (0, 0, -0.15), "quat": (1, 0, 0, 0)},
            },
            armature=0.01,
        )
        d = model._defaults
        d["drive_mode"] = np.full(model.nj, DRIVE_EFFORT, np.int32)
        d["drive_effort_limit"] = np.full(model.nj, 1e6, np.float32)
        # passive joint damping helps stability of a 36-dof chain
        d["dof_damping"] = np.maximum(np.array(d["dof_damping"]), 0.5).astype(np.float32)
        self.model = model
        self.num_actions = model.nj
        self.num_obs = 12 + 4 * model.nj + 14
        self.sim_params = SimParams(
            dt=0.0166, substeps=4, gravity=(0.0, 0.0, -9.81),
            contact_stiffness=4.0e4, contact_damping=1.5e3,
            friction_vel=0.05, plane_friction=1.0)
        self.dt = self.sim_params.dt
        # motor strength: thormang URDF effort limits are a nominal 1000 Nm;
        # cap at 300 Nm for a realistic actuator gear (documented deviation
        # from the missing nv_humanoid motor table)
        self.motor_efforts = jnp.full(model.nj, 300.0)
        self.max_motor_effort = 300.0
        dlower = np.array(d["dof_lower"], np.float32)
        dupper = np.array(d["dof_upper"], np.float32)
        self.dof_lower = jnp.asarray(dlower)
        self.dof_upper = jnp.asarray(dupper)
        self._init_jq = common.initial_dof_pos(dlower, dupper)
        self.spawn_z = common.solve_spawn_height(model, self._init_jq, clearance=0.02)
        self.feet = [model.body_id("l_leg_an_r_link"), model.body_id("r_leg_an_r_link")]
        self.net_torque_bodies = tuple(self.feet)
        self.targets = jnp.array([1000.0, 0.0, 0.0])
        self.basis_vec0 = jnp.array([1.0, 0.0, 0.0])
        self.basis_vec1 = jnp.array([0.0, 0.0, 1.0])
        if randomize:
            self.dr_config = {
                "frequency": 600,
                "actor_params": {"humanoid": {"rigid_body_properties": {
                    "mass": {"range": [0.9, 1.1], "operation": "scaling",
                             "distribution": "uniform"}}}},
            }

    # ------------------------------------------------------------------
    def default_task_state(self, key):
        B = self.num_envs
        p = jnp.full(B, -1000.0 / self.dt)
        return HumanoidTaskState(p, p, jnp.zeros((B, self.num_actions)),
                                 jnp.zeros((B, self.num_actions)))

    def reset_fn(self, key, params, task):
        k1, k2 = jax.random.split(key)
        nj = self.model.nj
        jq = jnp.asarray(self._init_jq) + jax.random.uniform(k1, (nj,), minval=-0.1, maxval=0.1)
        jq = jnp.clip(jq, self.dof_lower, self.dof_upper)
        jqd = jax.random.uniform(k2, (nj,), minval=-0.05, maxval=0.05)
        q = jnp.concatenate([
            jnp.array([0.0, 0.0, self.spawn_z]), jnp.array([1.0, 0, 0, 0]), jq])
        qd = jnp.concatenate([jnp.zeros(6), jqd])
        to_target = self.targets - q[0:3]
        pot = -jnp.linalg.norm(to_target.at[2].set(0.0)) / self.dt
        z = jnp.zeros(self.num_actions)
        return q, qd, params, HumanoidTaskState(pot, pot, z, z)

    def pre_physics(self, state, actions):
        B = actions.shape[0]
        efforts = actions * self.motor_efforts[None, :] * self.power_scale
        ctrl = Controls(jnp.zeros((B, self.model.nj)), jnp.zeros((B, self.model.nj)), efforts)
        wrench = jnp.zeros((B, self.model.nb, 6))
        task = dataclasses.replace(state.task, actions=actions, applied_torque=efforts)
        return ctrl, wrench, task

    def post_physics(self, state, prev_task):
        t = prev_task
        B = state.q.shape[0]
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
            quat, Q.identity((B,)), to_target, self.basis_vec0, self.basis_vec1)
        vel_loc, angvel_loc, roll, _, yaw, angle_to_target = common.compute_rot(
            quat, vel_w, angvel_w, self.targets[None], pos)
        roll = common.normalize_angle(roll)
        yaw = common.normalize_angle(yaw)
        angle_to_target = common.normalize_angle(angle_to_target)

        dof_pos_scaled = common.unscale(jq, self.dof_lower[None], self.dof_upper[None])
        # 6-DOF feet force sensors (create_asset_force_sensor at identity
        # pose, humanoid.py:163-168): full contact wrench about each foot
        # origin, reported in the sensor (= foot body) frame
        frames = jax.vmap(
            lambda q1, qd1: forward_kinematics(self.model, q1, qd1))(
            state.q, state.qd)
        fq = frames.quat[:, jnp.asarray(self.feet)]            # (B,2,4)
        feet_f = Q.rotate_inv(fq, state.net_contact[:, self.feet, :])
        feet_t = Q.rotate_inv(fq, state.net_torque[:, self.feet, :])
        sensors = jnp.concatenate([feet_f, feet_t], axis=-1).reshape(B, 12)

        obs = jnp.concatenate([
            pos[:, 2:3], vel_loc, angvel_loc * self.angular_velocity_scale,
            yaw[:, None], roll[:, None], angle_to_target[:, None],
            up_proj[:, None], heading_proj[:, None],
            dof_pos_scaled, jqd * self.dof_vel_scale,
            t.applied_torque * self.contact_force_scale,
            sensors * self.contact_force_scale,
            t.actions,
            potentials[:, None] / 60000.0, prev_pot[:, None] / 60000.0,
        ], axis=-1)

        # fork-modified reward: alive + up (+ progress), heading/energy
        # commented out (humanoid.py:365-371)
        up_reward = jnp.where(up_proj > 0.93, self.up_weight, 0.0)
        alive = 2.0
        progress = potentials - prev_pot
        reward = progress + alive + up_reward
        fallen = pos[:, 2] < self.termination_height
        reward = jnp.where(fallen, self.death_cost, reward)

        task = dataclasses.replace(t, potentials=potentials, prev_potentials=prev_pot)
        metrics = dict(state.metrics)
        metrics["torso_height"] = pos[:, 2]
        metrics["up_proj"] = up_proj
        return obs, reward, fallen.astype(jnp.float32), task, metrics


class HumanoidMJCF(Humanoid):
    """The upstream classic Humanoid spec: nv_humanoid MJCF, 21 DOFs,
    obs 110 / act 21 (`/root/reference/isaacgymenvs/tasks/humanoid.py:67-68,
    143`). The obs layout generalization above (12 + 4N + 14) lands exactly
    on 110 at N=21. Motor efforts come from the MJCF actuator gears
    (humanoid.py:161-162) instead of the THORMANG 300 Nm cap."""

    termination_height = 0.8

    def __init__(self, num_envs: int = 4096, seed: int = 42,
                 randomize: bool = False, **_):
        Task.__init__(self, num_envs, seed)
        from thormang_isaacgym_tpu.models.mjcf import load_mjcf
        path = os.path.join(os.path.dirname(__file__), "..", "..",
                            "assets", "mjcf", "nv_humanoid.xml")
        model = load_mjcf(os.path.abspath(path))
        d = model._defaults
        d["drive_mode"] = np.full(model.nj, DRIVE_EFFORT, np.int32)
        d["drive_effort_limit"] = np.full(model.nj, 1e6, np.float32)
        self.model = model
        self.num_actions = model.nj                      # 21
        self.num_obs = 12 + 4 * model.nj + 14            # 110
        assert self.num_obs == 110 and self.num_actions == 21
        self.sim_params = SimParams(
            dt=0.0166, substeps=4, gravity=(0.0, 0.0, -9.81),
            contact_stiffness=4.0e4, contact_damping=1.5e3,
            friction_vel=0.05, plane_friction=1.0)
        self.dt = self.sim_params.dt
        self.motor_efforts = jnp.asarray(model.motor_efforts)
        self.max_motor_effort = float(np.max(model.motor_efforts))
        dlower = np.array(d["dof_lower"], np.float32)
        dupper = np.array(d["dof_upper"], np.float32)
        self.dof_lower = jnp.asarray(dlower)
        self.dof_upper = jnp.asarray(dupper)
        self._init_jq = common.initial_dof_pos(dlower, dupper)
        self.spawn_z = common.solve_spawn_height(model, self._init_jq,
                                                 clearance=0.02)
        self.feet = [model.body_id("right_foot"), model.body_id("left_foot")]
        self.net_torque_bodies = tuple(self.feet)
        self.targets = jnp.array([1000.0, 0.0, 0.0])
        self.basis_vec0 = jnp.array([1.0, 0.0, 0.0])
        self.basis_vec1 = jnp.array([0.0, 0.0, 1.0])
        if randomize:
            self.dr_config = {
                "frequency": 600,
                "actor_params": {"humanoid": {"rigid_body_properties": {
                    "mass": {"range": [0.9, 1.1], "operation": "scaling",
                             "distribution": "uniform"}}}},
            }
