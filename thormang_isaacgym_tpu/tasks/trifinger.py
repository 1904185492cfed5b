"""Trifinger — cube repositioning/reorientation with the TriFingerPro.

Parity with `/root/reference/isaacgymenvs/tasks/trifinger.py` (the largest
reference task, 1513 LoC), `cfg/task/Trifinger.yaml`:

- MDP spec dims (obs_spec, trifinger.py:327-351): obs 41 = robot_q 9 +
  robot_u 9 + object_q 7 + object_q_des 7 + command 9; states 113 = obs +
  object_u 6 + fingertip_state 39 + robot_a(joint torques) 9 +
  fingertip_wrench 18 (asymmetric_obs: true)
- normalized obs/actions (normalize_obs/normalize_action: scale by the
  spec limit tables, trifinger.py:599-676)
- command_mode torque (default): actions in [-1,1] -> +-0.36 Nm, plus
  safety damping (apply_safety_damping, trifinger.py:1034-1038,
  safety_damping [0.08, 0.08, 0.04] per finger)
- reward (compute_trifinger_reward:1294-1385): finger-movement penalty
  (-0.5), finger-reach-object rate (-250, scheduled off after 5e7 steps),
  keypoints distance (2000) through the lgsk kernel (:1261-1277)
- reset distributions (trifinger.py:882-1000): robot default + noise
  (dof_pos_stddev 0.4, dof_vel_stddev 0.2), object random xy-in-arena +
  yaw; goal by task_difficulty (4 = random position + orientation)
- success: position tolerance 0.02 m, orientation tolerance 0.4 rad
  (termination_conditions, Trifinger.yaml:52-54); consecutive-success
  bookkeeping (trifinger.py:1056-1100)
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from thormang_isaacgym_tpu.core import quat as Q
from thormang_isaacgym_tpu.engine.env import Task
from thormang_isaacgym_tpu.models.scene import compose
from thormang_isaacgym_tpu.models.trifinger import (
    ARENA_RADIUS, FINGER_ANGLES, JOINT_DEFAULT, JOINT_HIGH, JOINT_LOW,
    MAX_TORQUE, MAX_VELOCITY, load_trifinger, make_cube_urdf,
    trifinger_dof_ids,
)
from thormang_isaacgym_tpu.models.urdf import load_urdf
from thormang_isaacgym_tpu.ops.kinematics import forward_kinematics
from thormang_isaacgym_tpu.ops.sim import Controls, SimParams

CUBE_SIZE = 0.065


def lgsk_kernel(x, scale=50.0, eps=2.0):
    """Logistic kernel bounding the input to [0, 1/(2+eps))
    (trifinger.py:1261-1277)."""
    scaled = x * scale
    return 1.0 / (jnp.exp(scaled) + eps + jnp.exp(-scaled))


def gen_keypoints(pos, quat, size=CUBE_SIZE):
    """8 cube-corner keypoints in world frame (gen_keypoints,
    trifinger.py:1279-1292). pos (...,3), quat (...,4) -> (...,8,3)."""
    corners = []
    for i in range(8):
        corner = [((1 if ((i >> k) & 1) == 0 else -1)) * size / 2
                  for k in range(3)]
        corners.append(corner)
    c = jnp.asarray(np.array(corners, np.float32))      # (8,3)
    return pos[..., None, :] + Q.rotate(quat[..., None, :], c)


def quat_diff_rad(a, b):
    """Angular distance between quats (torch_jit_utils quat_diff_rad)."""
    d = jnp.abs(jnp.sum(a * b, axis=-1))
    return 2.0 * jnp.arccos(jnp.clip(d, -1.0, 1.0))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TrifingerTaskState:
    actions: jnp.ndarray          # (B, 9) raw [-1,1]
    goal_pos: jnp.ndarray         # (B, 3)
    goal_quat: jnp.ndarray        # (B, 4) wxyz
    last_object: jnp.ndarray      # (B, 13) previous object state
    last_fingertip: jnp.ndarray   # (B, 3, 13)
    torques: jnp.ndarray          # (B, 9) applied torques
    successes: jnp.ndarray        # (B,) consecutive-success flag


class Trifinger(Task):
    uses_net_torque = True   # 6-DOF force sensors read net_torque
    max_episode_length = 750
    clip_obs = 5.0
    task_difficulty = 4
    normalize_obs = True
    normalize_action = True
    apply_safety_damping = True
    command_mode = "torque"
    use_keypoints = True
    finger_move_penalty_weight = -0.5
    finger_reach_object_weight = -250.0
    # reach-reward schedule window in aggregate env steps
    # (reference trifinger.py:1313-1314,1335: ft_sched_val gates the reach
    # term to [0, 5e7] env_steps_count = frame_count * num_envs)
    ft_sched_start = 0.0
    ft_sched_end = 5e7
    object_dist_weight = 2000.0
    object_rot_weight = 2000.0
    position_tolerance = 0.02
    orientation_tolerance = 0.4
    dof_pos_stddev = 0.4
    dof_vel_stddev = 0.2
    safety_damping = (0.08, 0.08, 0.04)

    def __init__(self, num_envs: int = 16384, seed: int = 42,
                 asymmetric_obs: bool = True, randomize: bool = False, **_):
        super().__init__(num_envs, seed)
        robot = load_trifinger()
        cube = load_urdf(make_cube_urdf(CUBE_SIZE))
        scene = compose([
            (robot, (0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0), "robot/"),
            (cube, (0.0, 0.0, CUBE_SIZE / 2, 1.0, 0.0, 0.0, 0.0), "obj/"),
        ], name="trifinger_scene")
        self.model = scene
        self.asymmetric_obs = asymmetric_obs
        self.num_obs = 41
        self.num_states = 113 if asymmetric_obs else 0
        self.num_actions = 9
        self.dof_ids = jnp.asarray(
            np.array(trifinger_dof_ids(scene, "robot/"), np.int32))
        self.tips = [scene.sites[f"robot/finger_tip_link_{int(a)}"]
                     for a in FINGER_ANGLES]
        self.net_torque_bodies = tuple(b for b, _, _ in self.tips)
        self.cube_body = scene.body_id("obj/cube")
        self.q_lo = jnp.asarray(np.tile(JOINT_LOW, 3).astype(np.float32))
        self.q_hi = jnp.asarray(np.tile(JOINT_HIGH, 3).astype(np.float32))
        self.q_def = jnp.asarray(np.tile(JOINT_DEFAULT, 3).astype(np.float32))
        self.safety_kd = jnp.asarray(
            np.tile(self.safety_damping, 3).astype(np.float32))
        self.sim_params = SimParams(
            dt=0.02, substeps=4, gravity=(0.0, 0.0, -9.81),
            contact_stiffness=4.0e4, contact_damping=8.0e2,
            friction_vel=0.01, plane_friction=1.0)
        self.dt = self.sim_params.dt

    # ------------------------------------------------------------------
    def _fingertip_state(self, q, qd):
        """(3, 13) fingertip pos/quat/vel/angvel (single env)."""
        frames = forward_kinematics(self.model, q, qd)
        out = []
        for b, pos, quat in self.tips:
            p = frames.pos[b] + Q.rotate(frames.quat[b], jnp.asarray(pos))
            qq = Q.mul(frames.quat[b], jnp.asarray(quat))
            v = frames.vel[b] + jnp.cross(frames.omega[b], p - frames.pos[b])
            out.append(jnp.concatenate([p, qq, v, frames.omega[b]]))
        return jnp.stack(out)

    def _object_state(self, q, qd):
        """(B, 13) cube root state. The cube is the only floating root."""
        pos = q[:, 0:3]
        quat = q[:, 3:7]
        omega = Q.rotate(quat, qd[:, 0:3])
        vel = qd[:, 3:6]
        return jnp.concatenate([pos, quat, vel, omega], axis=-1)

    # ------------------------------------------------------------------
    def _sample_goal(self, key):
        """Goal pose by difficulty (_sample_object_goal_poses,
        trifinger.py:928-1000). Difficulty 4: random position (xy in
        arena, z in [min, 0.1]) + random orientation."""
        k1, k2, k3, k4 = jax.random.split(key, 4)
        r = jnp.sqrt(jax.random.uniform(k1)) * (ARENA_RADIUS - CUBE_SIZE)
        th = jax.random.uniform(k2) * 2 * jnp.pi
        if self.task_difficulty <= 1:
            z = CUBE_SIZE / 2
        else:
            z = jax.random.uniform(k3, minval=CUBE_SIZE / 2, maxval=0.1)
        pos = jnp.array([r * jnp.cos(th), r * jnp.sin(th), 0.0]) \
            + jnp.array([0.0, 0.0, 1.0]) * z
        if self.task_difficulty >= 4:
            quat = Q.normalize(jax.random.normal(k4, (4,)))
        else:
            yaw = jax.random.uniform(k4) * 2 * jnp.pi
            quat = Q.from_axis_angle(jnp.array([0.0, 0.0, 1.0]), yaw)
        return pos, quat

    def default_task_state(self, key):
        B = self.num_envs
        return TrifingerTaskState(
            actions=jnp.zeros((B, 9)),
            goal_pos=jnp.zeros((B, 3)),
            goal_quat=Q.identity((B,)),
            last_object=jnp.zeros((B, 13)),
            last_fingertip=jnp.zeros((B, 3, 13)),
            torques=jnp.zeros((B, 9)),
            successes=jnp.zeros(B))

    def reset_fn(self, key, params, task):
        kq, kv, ko, kg = jax.random.split(key, 4)
        # robot: default + gaussian noise (trifinger.py:852-880)
        jq9 = self.q_def + self.dof_pos_stddev * jax.random.normal(kq, (9,))
        jq9 = jnp.clip(jq9, self.q_lo, self.q_hi)
        jqd9 = self.dof_vel_stddev * jax.random.normal(kv, (9,))
        jq = jnp.zeros(self.model.nj).at[self.dof_ids].set(jq9)
        jqd = jnp.zeros(self.model.nj).at[self.dof_ids].set(jqd9)
        # object: random xy in arena + yaw (trifinger.py:882-926 'random')
        k1, k2, k3 = jax.random.split(ko, 3)
        r = jnp.sqrt(jax.random.uniform(k1)) * (ARENA_RADIUS - CUBE_SIZE)
        th = jax.random.uniform(k2) * 2 * jnp.pi
        yaw = jax.random.uniform(k3) * 2 * jnp.pi
        obj_pos = jnp.array([0.0, 0.0, CUBE_SIZE / 2]) + \
            jnp.array([1.0, 0.0, 0.0]) * (r * jnp.cos(th)) + \
            jnp.array([0.0, 1.0, 0.0]) * (r * jnp.sin(th))
        obj_quat = Q.from_axis_angle(jnp.array([0.0, 0.0, 1.0]), yaw)
        q = jnp.concatenate([obj_pos, obj_quat, jq])
        qd = jnp.concatenate([jnp.zeros(6), jqd])
        goal_pos, goal_quat = self._sample_goal(kg)
        ft = self._fingertip_state(q, qd)
        obj = jnp.concatenate([obj_pos, obj_quat, jnp.zeros(6)])
        return q, qd, params, TrifingerTaskState(
            actions=jnp.zeros(9), goal_pos=goal_pos, goal_quat=goal_quat,
            last_object=obj, last_fingertip=ft, torques=jnp.zeros(9),
            successes=jnp.asarray(0.0))

    # ------------------------------------------------------------------
    def pre_physics(self, state, actions):
        B = actions.shape[0]
        if self.command_mode == "torque":
            tau = actions * MAX_TORQUE if self.normalize_action else actions
        else:  # position mode: actions -> targets tracked by a PD here
            lo, hi = self.q_lo, self.q_hi
            tgt = 0.5 * (actions + 1.0) * (hi - lo) + lo \
                if self.normalize_action else actions
            jq = state.q[:, 7:][:, self.dof_ids]
            jqd = state.qd[:, 6:][:, self.dof_ids]
            kp = jnp.asarray(np.tile([10.0, 10.0, 10.0], 3))
            kd = jnp.asarray(np.tile([0.1, 0.3, 0.001], 3))
            tau = kp * (tgt - jq) - kd * jqd
        if self.apply_safety_damping:
            jqd = state.qd[:, 6:][:, self.dof_ids]
            tau = tau - self.safety_kd[None] * jqd
        tau = jnp.clip(tau, -MAX_TORQUE, MAX_TORQUE)
        effort = jnp.zeros((B, self.model.nj)).at[:, self.dof_ids].set(tau)
        # effort-mode drive applies `effort` where drive_mode == 3; the
        # trifinger drives are NONE, so route through target-free efforts
        ctrl = Controls(jnp.zeros_like(effort), jnp.zeros_like(effort),
                        effort)
        wrench = jnp.zeros((B, self.model.nb, 6))
        task = dataclasses.replace(state.task, actions=actions, torques=tau)
        return ctrl, wrench, task

    def post_physics(self, state, prev_task):
        t = prev_task
        B = state.q.shape[0]
        jq = state.q[:, 7:][:, self.dof_ids]
        jqd = state.qd[:, 6:][:, self.dof_ids]
        obj = self._object_state(state.q, state.qd)
        ft = jax.vmap(self._fingertip_state)(state.q, state.qd)

        # ---- reward (compute_trifinger_reward:1294-1385) ----
        ft_vel = (ft[:, :, 0:3] - t.last_fingertip[:, :, 0:3]) / self.dt
        move_pen = self.finger_move_penalty_weight * \
            jnp.sum(ft_vel.reshape(B, 9) ** 2, axis=-1)
        curr_n = jnp.linalg.norm(ft[:, :, 0:3] - obj[:, None, 0:3], axis=-1)
        prev_n = jnp.linalg.norm(
            t.last_fingertip[:, :, 0:3] - t.last_object[:, None, 0:3],
            axis=-1)
        # ft_sched_val gate (trifinger.py:1335): reach shaping switches off
        # once aggregate env steps leave [ft_sched_start, ft_sched_end].
        # env_steps_count = global control steps * num_envs (:1253-1255).
        env_steps = state.global_step.astype(jnp.float32) * B
        sched = ((env_steps >= self.ft_sched_start)
                 & (env_steps <= self.ft_sched_end)).astype(jnp.float32)
        reach = self.finger_reach_object_weight * sched * \
            jnp.sum(curr_n - prev_n, axis=-1)
        if self.use_keypoints:
            kp_obj = gen_keypoints(obj[:, 0:3], obj[:, 3:7])
            kp_goal = gen_keypoints(t.goal_pos, t.goal_quat)
            d = jnp.linalg.norm(kp_obj - kp_goal, axis=-1)
            pose_rew = self.object_dist_weight * self.dt * \
                lgsk_kernel(d, scale=30.0, eps=2.0).mean(-1)
        else:
            dist = jnp.linalg.norm(obj[:, 0:3] - t.goal_pos, axis=-1)
            rot = quat_diff_rad(obj[:, 3:7], t.goal_quat)
            pose_rew = self.object_dist_weight * self.dt * \
                lgsk_kernel(dist, 50.0, 2.0) + \
                self.object_rot_weight * self.dt / (3 * jnp.abs(rot) + 0.01)
        reward = move_pen + reach + pose_rew

        # ---- success bookkeeping (_check_termination:1064-1100) ----
        pos_ok = jnp.linalg.norm(obj[:, 0:3] - t.goal_pos, axis=-1) \
            < self.position_tolerance
        quat_ok = quat_diff_rad(obj[:, 3:7], t.goal_quat) \
            < self.orientation_tolerance
        success = pos_ok & quat_ok if self.task_difficulty == 4 else pos_ok

        # ---- observations ----
        obs = jnp.concatenate([
            jq, jqd, obj[:, 0:7],
            jnp.concatenate([t.goal_pos, t.goal_quat], -1),
            t.actions], axis=-1)
        if self.normalize_obs:
            lo = jnp.concatenate([
                self.q_lo, jnp.full(9, -MAX_VELOCITY),
                jnp.array([-0.3, -0.3, 0.0, -1, -1, -1, -1]),
                jnp.array([-0.3, -0.3, 0.0, -1, -1, -1, -1]),
                jnp.full(9, -1.0)])
            hi = jnp.concatenate([
                self.q_hi, jnp.full(9, MAX_VELOCITY),
                jnp.array([0.3, 0.3, 0.3, 1, 1, 1, 1]),
                jnp.array([0.3, 0.3, 0.3, 1, 1, 1, 1]),
                jnp.full(9, 1.0)])
            obs = 2.0 * (obs - lo) / (hi - lo) - 1.0

        done = jnp.zeros(B)          # success-only termination: none early
        task = dataclasses.replace(
            t, last_object=obj, last_fingertip=ft,
            successes=success.astype(jnp.float32))
        metrics = dict(state.metrics)
        metrics["success"] = success.astype(jnp.float32)
        metrics["pose_reward"] = pose_rew
        # mean fingertip-to-object distance: the early learning signal the
        # reach shaping drives (falls as fingers find the cube) — the
        # reduced-scale parity gate (scripts/record_parity.py)
        metrics["finger_obj_dist"] = curr_n.mean(axis=-1)
        return obs, reward, done, task, metrics

    def compute_states(self, state, task_state):
        """Privileged states (trifinger.py:1408-1420): obs + object vel +
        fingertip states + joint torques + 6-DOF tip wrenches (the
        fingertip force sensors, trifinger.py create_asset_force_sensor):
        contact force + torque per tip, rotated into the tip frame."""
        t = task_state
        B = state.q.shape[0]
        jq = state.q[:, 7:][:, self.dof_ids]
        jqd = state.qd[:, 6:][:, self.dof_ids]
        obj = t.last_object
        obs = jnp.concatenate([
            jq, jqd, obj[:, 0:7],
            jnp.concatenate([t.goal_pos, t.goal_quat], -1),
            t.actions], axis=-1)
        tipb = [b for b, _, _ in self.tips]
        tq = t.last_fingertip[:, :, 3:7]                      # tip quats
        f_l = Q.rotate_inv(tq, state.net_contact[:, tipb, :])
        t_l = Q.rotate_inv(tq, state.net_torque[:, tipb, :])
        wrench = jnp.concatenate([f_l, t_l], axis=-1).reshape(B, 18)
        return jnp.concatenate([
            obs, obj[:, 7:13], t.last_fingertip.reshape(B, -1),
            t.torques, wrench], axis=-1)
