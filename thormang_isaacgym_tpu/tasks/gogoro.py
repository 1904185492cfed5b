"""Gogoro scooter balance/steer task — the flagship.

Parity with `/root/reference/isaacgymenvs/tasks/gogoro_new.py` (class Gogoro,
registered as "Gogoro" at `tasks/__init__.py:49`) and
`/root/reference/isaacgymenvs/cfg/task/Gogoro.yaml`.

Spec mapping (reference file:line):
- asset: scooter_V13.urdf, 39 movable DOFs (gogoro_new.py:200-213); wheels are
  0.2 m-radius disks (measured from wheel_V3.obj), modeled as cylinder geoms
- 31 THORMANG joints + head are *locked* at the riding pose
  (gogoro_new.py:257-262 pins lower==upper; here: first-class dof_locked mask)
- rear wheel: DOF_MODE_VEL, damping 1000, effort 170 (gogoro_new.py:266-269)
- steering: DOF_MODE_POS; after the first reset the reference re-writes the
  drive to Kp 3000, Kd ~ U(100,1000) per env, effort 100
  (set_env_dof_prop, gogoro_new.py:577-601)
- base_x/y/z prismatic seat offsets: locked at N(0, 0.02) per env
  (gogoro_new.py:554-572)
- incremental steering: cmd += clip(a*0.2); cmd in [-0.5, 0.5]
  (gogoro_new.py:352-359, INCREMENTAL_STEER=True :27)
- obs (6): roll, d_roll, d_yaw, speed, delta_yaw, last_command
  (compute_gogoro_observations, gogoro_new.py:692-723)
- sensor noise + IMU/steer/speed offsets (gogoro_new.py:449-461; tables from
  Gogoro.yaml:34-57). NOTE the reference's speed-sensor clamp/round lines
  write obs[3] from obs[4] (gogoro_new.py:457-458) — an indexing slip that
  turns the speed channel into round(delta_yaw). We implement the evident
  intent (clamp+round the *speed* channel); set `reproduce_ref_obs_bug=True`
  for bug-for-bug parity.
- reward (compute_gogoro_reward, gogoro_new.py:645-684):
  5/(1+(30 yaw_err)^2) + 0.2 (1-tilt_err^2) + 0.3 (1-dtilt_err^2)
  + 0.5 sum(1-a^2 over 5-action history); fall (|roll|>=0.3) -> -100, reset
- commands: wheel-speed U(4,13) rad/s, resampled at step 300; yaw target
  U(-pi, pi) resampled at step 300 (Gogoro.yaml:54-58, gogoro_new.py:384-389)
- spawn: z=0.03, yaw = target + U(-1.57, 1.57) (gogoro_new.py:485-537)
- sim: dt 0.03, 3 substeps (Gogoro.yaml:10-14); ground friction 0.99, rear
  0.98 / front 0.9 (gogoro_new.py:184-293)
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
from thormang_isaacgym_tpu.models.robot import DRIVE_POS, DRIVE_VEL
from thormang_isaacgym_tpu.ops.sim import Controls, SimParams

REF_SCOOTER = "/root/reference/assets/urdf/gogoro/urdf/scooter_V13.urdf"

# THORMANG riding pose (cfg/task/Gogoro.yaml:61-93)
JOINTS_POS = {
    "l_arm_el_y": 0.0, "l_arm_wr_r": 0.0, "head_y": 0.0, "r_arm_grip": 0.0,
    "l_arm_wr_p": 0.0, "torso_y": 0.0, "r_arm_sh_r": -1.57, "l_arm_sh_p1": 0.0,
    "l_arm_sh_r": 1.57, "l_leg_an_r": 0.0, "l_leg_an_p": 0.0, "r_leg_hip_p": 1.4,
    "r_leg_an_p": 0.0, "l_arm_wr_y": 0.0, "l_leg_hip_p": -1.4, "r_leg_hip_y": 0.0,
    "l_leg_hip_r": 0.0, "l_leg_kn_p": 1.4, "r_arm_sh_p2": 0.0, "r_arm_sh_p1": 0.0,
    "l_leg_hip_y": 0.0, "r_leg_hip_r": 0.0, "l_arm_sh_p2": 0.0, "r_arm_wr_y": 0.0,
    "head_p": 0.0, "r_arm_wr_p": 0.0, "r_arm_wr_r": 0.0, "r_arm_el_y": 0.0,
    "l_arm_grip": 0.0, "r_leg_an_r": 0.0, "r_leg_kn_p": -1.4,
}

# noise / command tables (cfg/task/Gogoro.yaml:34-58)
NOISES = dict(
    seat_offset_x_range=(0, 0.02), seat_offset_y_range=(0, 0.02),
    seat_offset_z_range=(0, 0.02), steering_offset=(0, 0.01),
    imu_filter_noise=(0, 0.001), imu_noise=(0, 0.001),
    seat_offset_xr_range=(0, 0.05), speed_sensor_offset=(-0.5, 0.5),
    speed_sensor_noise=(0, 0.3), steering_action_noise=(0, 0.03),
    spawn_x_angle=(0, 0.05), steering_damping_range=(100, 1000),
    speed_range=(4.0, 13.0), speed_freq_update=300, yaw_freq_update=300,
)

WHEEL_OVERRIDE = {
    # wheel mesh -> disk: r=0.2, half-width 0.045 (measured from
    # wheel_V3.obj: disk in mesh xy-plane, thin axis = mesh z). The override
    # composes with the URDF collision origin rpy(1.5708,0,0), which already
    # maps mesh z onto the link's y spin axis -> identity quat here.
    "type": "cylinder", "size": (0.2, 0.045),
    "pos": (0, 0, 0), "quat": (1.0, 0.0, 0.0, 0.0),
}


def _build_model(asset_path: str | None = None):
    path = asset_path or REF_SCOOTER
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"gogoro asset not found at {path}; pass asset_path=")
    model = load_urdf(
        path,
        mesh_overrides={"front": WHEEL_OVERRIDE, "back": WHEEL_OVERRIDE},
        armature=1e-4,  # asset_options.armature (gogoro_new.py:210)
    )
    d = model._defaults
    nj = model.nj

    sid = model.dof_id("steering_joint")
    rid = model.dof_id("rear_wheel_joint")

    # lock thormang pose + seat offsets (defaults; per-env offsets at reset)
    locked = np.zeros(nj, np.float32)
    locked_pos = np.zeros(nj, np.float32)
    for jn, pos in JOINTS_POS.items():
        i = model.dof_id(jn)
        locked[i] = 1.0
        locked_pos[i] = pos
    for jn in ("base_x", "base_y", "base_z"):
        locked[model.dof_id(jn)] = 1.0
    d["dof_locked"] = locked
    d["dof_locked_pos"] = locked_pos

    mode = np.zeros(nj, np.int32)
    kp = np.zeros(nj, np.float32)
    kd = np.zeros(nj, np.float32)
    eff = np.full(nj, 0.0, np.float32)
    # steering: post-first-reset drive (gogoro_new.py:595-601)
    mode[sid] = DRIVE_POS; kp[sid] = 3000.0; kd[sid] = 200.0; eff[sid] = 100.0
    # rear wheel velocity servo (gogoro_new.py:266-269)
    mode[rid] = DRIVE_VEL; kd[rid] = 1000.0; eff[rid] = 170.0
    d["drive_mode"] = mode
    d["drive_stiffness"] = kp
    d["drive_damping"] = kd
    d["drive_effort_limit"] = eff
    # steering velocity limit 200 rad/s (set_env_dof_prop), wheels free
    vl = np.array(d["dof_velocity_limit"], np.float32)
    vl[sid] = 200.0
    d["dof_velocity_limit"] = vl

    # friction: rear 0.98, front 0.9 x ground 0.99 (gogoro_new.py:184-293)
    gf = np.ones(model.ng, np.float32)
    for gi, g in enumerate(model.geoms):
        if g.body == model.body_id("back"):
            gf[gi] = 0.98
        elif g.body == model.body_id("front"):
            gf[gi] = 0.9
    d["geom_friction"] = gf
    return model


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GogoroTaskState:
    steer_cmd: jnp.ndarray      # (B,) integrated steering command
    speed_cmd: jnp.ndarray      # (B,) rear wheel speed command (rad/s)
    yaw_cmd: jnp.ndarray        # (B,) target heading
    action_history: jnp.ndarray  # (B, 5)
    imu_offset: jnp.ndarray     # (B,)
    steer_offset: jnp.ndarray   # (B,)
    speed_offset: jnp.ndarray   # (B,)


def _uniform(key, shape, lo, hi):
    return lo + jax.random.uniform(key, shape) * (hi - lo)


def _normal(key, shape, mean, std):
    return mean + jax.random.normal(key, shape) * std


class Gogoro(Task):
    """Scooter balance + heading tracking, PPO, 1 action."""

    num_obs = 6
    num_actions = 1
    max_episode_length = 1000
    max_steering = 0.5          # gogoro_new.py:86
    max_steering_change = 0.2   # gogoro_new.py:87

    def __init__(self, num_envs: int = 4096, seed: int = 42,
                 asset_path: str | None = None,
                 reproduce_ref_obs_bug: bool = False,
                 randomize: bool = False, **_):
        super().__init__(num_envs, seed)
        self.model = _build_model(asset_path)
        self.reproduce_ref_obs_bug = reproduce_ref_obs_bug
        if randomize:
            # parity: cfg/task/Gogoro.yaml:95-113 randomization_params
            self.dr_config = {
                "frequency": 600,
                "sim_params": {"gravity": {
                    "range": [0.95, 1.05], "operation": "scaling",
                    "distribution": "uniform"}},
                "actor_params": {"Gogoro": {"rigid_body_properties": {
                    "mass": {"range": [0.95, 1.05], "operation": "scaling",
                             "distribution": "uniform"}}}},
            }
        self.sim_params = SimParams(
            dt=0.03, substeps=6,  # ref: 3 PhysX TGS substeps; penalty contact needs 5ms
            gravity=(0.0, 0.0, -9.81),
            contact_stiffness=4.0e4, contact_damping=2.0e3,
            friction_vel=0.1,
            plane_friction=0.99,
            root_linear_damping=0.01,   # asset_options.linear_damping (gogoro_new.py:209)
            max_velocity=200.0,
        )
        m = self.model
        self.sid = m.dof_id("steering_joint")
        self.rid = m.dof_id("rear_wheel_joint")
        self.base_dofs = tuple(m.dof_id(j) for j in ("base_x", "base_y", "base_z"))
        qd0 = 7 if m.floating else 0
        self.jq0 = qd0          # joint q offset into state q
        self.jv0 = 6 if m.floating else 0
        # initial dof pose = locked pose
        self._init_joint_q = np.array(m._defaults["dof_locked_pos"], np.float32)

    # ------------------------------------------------------------------
    def default_task_state(self, key):
        B = self.num_envs
        z = jnp.zeros(B)
        return GogoroTaskState(z, z + 8.0, z, jnp.zeros((B, 5)), z, z, z)

    # ------------------------------------------------------------------
    def reset_fn(self, key, params, task):
        """Single-env reset (vmapped by the engine). Parity: reset_idx
        (gogoro_new.py:505-591) + randomize (:474-482) + generate_spawn_r
        (:485-492)."""
        ks = jax.random.split(key, 10)
        n = NOISES

        # commands + offsets
        speed_cmd = _uniform(ks[0], (), *n["speed_range"])
        yaw_target = _uniform(ks[1], (), -jnp.pi, jnp.pi)
        init_yaw = yaw_target + _uniform(ks[2], (), -1.57, 1.57)
        steer_offset = _normal(ks[3], (), *n["steering_offset"])
        speed_offset = _uniform(ks[4], (), *n["speed_sensor_offset"])
        imu_offset = _normal(ks[5], (), *n["seat_offset_xr_range"])

        # per-env steering damping (gogoro_new.py:577, set_env_dof_prop)
        damp = _uniform(ks[6], (), *n["steering_damping_range"])
        drive_damping = params.drive_damping.at[self.sid].set(damp)

        # per-env seat offsets via locked prismatic positions (:554-572)
        locked_pos = params.dof_locked_pos
        for i, (axis_dof, rng_name) in enumerate(zip(
                self.base_dofs,
                ("seat_offset_x_range", "seat_offset_y_range", "seat_offset_z_range"))):
            off = _normal(jax.random.fold_in(ks[7], i), (), *n[rng_name])
            locked_pos = locked_pos.at[axis_dof].set(off)

        params = dataclasses.replace(
            params, drive_damping=drive_damping, dof_locked_pos=locked_pos)

        # spawn state: z=0.03, yaw rotation only, zero velocity (:518-552)
        root_pos = jnp.array([0.0, 0.0, 0.03])
        root_quat = Q.from_euler_xyz(jnp.zeros(()), jnp.zeros(()), init_yaw)
        joint_q = jnp.asarray(self._init_joint_q)
        # seat offsets live in locked prismatic dofs
        for axis_dof in self.base_dofs:
            joint_q = joint_q.at[axis_dof].set(locked_pos[axis_dof])
        q = jnp.concatenate([root_pos, root_quat, joint_q])
        qd = jnp.zeros(self.model.nv)

        task = GogoroTaskState(
            steer_cmd=jnp.zeros(()),
            speed_cmd=speed_cmd,
            yaw_cmd=yaw_target,
            action_history=jnp.zeros(5),
            imu_offset=imu_offset,
            steer_offset=steer_offset,
            speed_offset=speed_offset,
        )
        return q, qd, params, task

    # ------------------------------------------------------------------
    def pre_physics(self, state, actions):
        """Parity: pre_physics_step (gogoro_new.py:347-369)."""
        B = actions.shape[0]
        t = state.task
        a = actions[:, 0]
        history = jnp.concatenate([t.action_history[:, 1:], a[:, None]], axis=1)

        # incremental steering (INCREMENTAL_STEER=True)
        delta = jnp.clip(a * self.max_steering_change,
                         -self.max_steering_change, self.max_steering_change)
        steer_cmd = jnp.clip(t.steer_cmd + delta, -self.max_steering, self.max_steering)

        key = jax.random.fold_in(state.key, 101)
        noise = _normal(key, (B,), *NOISES["steering_action_noise"])
        target_pos = jnp.zeros((B, self.model.nj)).at[:, self.sid].set(
            steer_cmd + t.steer_offset + noise)
        target_vel = jnp.zeros((B, self.model.nj)).at[:, self.rid].set(t.speed_cmd)
        ctrl = Controls(target_pos, target_vel, jnp.zeros((B, self.model.nj)))
        wrench = jnp.zeros((B, self.model.nb, 6))
        return ctrl, wrench, dataclasses.replace(t, steer_cmd=steer_cmd,
                                                 action_history=history)

    # ------------------------------------------------------------------
    def post_physics(self, state, prev_task):
        """Parity: post_physics_step + compute_obs_rwd
        (gogoro_new.py:373-462, 645-723)."""
        t = prev_task
        B = state.q.shape[0]
        root_quat = state.q[:, 3:7]
        roll, _, yaw = Q.to_euler_xyz(root_quat)
        omega_b = state.qd[:, 0:3]   # body frame
        v_b = Q.rotate_inv(root_quat, state.qd[:, 3:6])  # world -> body (quat_rotate_inverse parity)
        d_roll = omega_b[:, 0]
        d_yaw = omega_b[:, 2]
        speed = v_b[:, 0]
        delta_yaw = Q.shortest_angle_distance(yaw, t.yaw_cmd)

        obs = jnp.stack([roll, d_roll, d_yaw, speed, delta_yaw, t.steer_cmd], axis=-1)

        # reward (gogoro_new.py:645-684)
        tilt_err = jnp.clip(roll / 0.30, -1.0, 1.0)
        yaw_err = jnp.clip(delta_yaw / jnp.pi, -1.0, 1.0)
        dtilt_err = jnp.clip(d_roll / 0.3, -1.0, 1.0)
        r1 = 1.0 / (1.0 + (yaw_err * 30.0) ** 2)
        r2 = 1.0 - tilt_err**2
        r4 = 1.0 - dtilt_err**2
        command_energy = jnp.sum(1.0 - t.action_history**2, axis=-1)
        reward = r1 * 5.0 + r2 * 0.2 + r4 * 0.3 + command_energy * 0.5
        felt = jnp.abs(roll) >= 0.30
        reward = jnp.where(felt, -100.0, reward)

        # command resampling at fixed steps (gogoro_new.py:384-389)
        key = jax.random.fold_in(state.key, 202)
        k1, k2 = jax.random.split(key)
        speed_change = state.progress == NOISES["speed_freq_update"]
        yaw_change = state.progress == NOISES["yaw_freq_update"]
        new_speed = _uniform(k1, (B,), *NOISES["speed_range"])
        new_yaw = Q.wrap_to_pi(_uniform(k2, (B,), -jnp.pi, jnp.pi))
        task = dataclasses.replace(
            t,
            speed_cmd=jnp.where(speed_change, new_speed, t.speed_cmd),
            yaw_cmd=jnp.where(yaw_change, new_yaw, t.yaw_cmd),
        )

        metrics = dict(state.metrics)
        metrics["rew_yaw"] = r1 * 5.0
        metrics["rew_tilt"] = r2 * 0.2
        metrics["roll_abs"] = jnp.abs(roll)
        metrics["speed"] = speed
        return obs, reward, felt.astype(jnp.float32), task, metrics

    # ------------------------------------------------------------------
    def observation_noise(self, key, obs, task_state):
        """Sensor noise + offsets (gogoro_new.py:449-461)."""
        n = NOISES
        t = task_state
        B = obs.shape[0]
        ks = jax.random.split(key, 5)
        obs = obs.at[:, 0].add(_normal(ks[0], (B,), *n["imu_filter_noise"]) + t.imu_offset)
        obs = obs.at[:, 1].add(_normal(ks[1], (B,), *n["imu_noise"]))
        obs = obs.at[:, 2].add(_normal(ks[2], (B,), *n["imu_noise"]))
        if self.reproduce_ref_obs_bug:
            # gogoro_new.py:457-458 writes channel 3 from channel 4
            obs = obs.at[:, 3].set(jnp.round(obs[:, 4]))
        else:
            speed = obs[:, 3] + _normal(ks[3], (B,), *n["speed_sensor_noise"]) + t.speed_offset
            obs = obs.at[:, 3].set(jnp.round(jnp.clip(speed, 0.0, 5.0)))
        obs = obs.at[:, 4].add(_normal(ks[4], (B,), *n["imu_filter_noise"]))
        return obs
