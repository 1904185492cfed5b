"""Gogoro paper variant — realistic turning with actuation delay + pushes.

Parity with `/root/reference/isaacgymenvs/tasks/
gogoro_realistic_turning_sim_paper.py` + `cfg/task/Gogoro_paper.yaml` (the
fork's research contribution):

- DIRECT steering: command = action * 0.5 (`:344-345`, no increment)
- per-env actuation delay: 5-slot command ring buffer, applied command =
  history[-delay] with delay ~ U{0..4} (`:92-93,352-357`;
  `command_delay: [0,5]`); note the reference's `-delay` indexing makes
  delay=0 the OLDEST slot — reproduced
- 20-frame observation window of 8 channels (buff_size=20, `:112-117`):
  [roll, yaw, d_roll, d_yaw, speed, delta_yaw, command, delay_norm]
  (`compute_gogoro_observations:771-805`), normalized /pi, /3, /5, /0.5
  (`:534-538`), with the "noise-removal trick" feeding command diffs into
  the noisy droll/roll channels (`:541-542`) and the yaw channel zeroed
  (`:544`) -> obs dim 160
- random pushes: every 10 steps on the FIRST HALF of the envs, 30 N
  lateral force (perpendicular to heading) + downward force on
  `head_p_link` (`:442-457` PUSH_ROBOT)
- reward (`compute_gogoro_reward:714-762`): 0.45 (1-yaw_err^2) +
  0.1 (1-tilt_err^2) + 0.35 (1-dtilt_err^2) + 2.0 (1 - a^2 *
  tanh-gated-near-upright) + 0.2 (1 - mean(diff(act)^2)); clip >= 0;
  fall at |roll| >= 0.38 -> reward -1, reset
- speed command U(5, 20) resampled at step 300; 3600-step episodes
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from thormang_isaacgym_tpu.core import quat as Q
from thormang_isaacgym_tpu.engine.env import Task
from thormang_isaacgym_tpu.ops.sim import Controls
from thormang_isaacgym_tpu.tasks.gogoro import Gogoro, _normal, _uniform

# cfg/task/Gogoro_paper.yaml noises block
PAPER_NOISES = dict(
    imu_filter_noise=(-0.003, 0.003), imu_noise=(-0.003, 0.003),
    speed_sensor_offset=(-0.3, 0.3), speed_sensor_noise=(0.0, 0.3),
    seat_offset_x_range=(-0.1, 0.1), seat_offset_y_range=(-0.1, 0.1),
    seat_offset_z_range=(-0.05, 0.05), imu_x_offset=(-0.02, 0.02),
    spawn_x_angle=(-0.02, 0.02), steering_action_noise=(-0.05, 0.05),
    steering_offset=(-0.05, 0.05), steering_damping_range=(50, 1000),
    speed_range=(5.0, 20.0), speed_freq_update=300, yaw_freq_update=300,
)
DELAY_W = 5            # command_delay: [0, 5]
BUFF = 20              # buff_size (:112)
NUM_CH = 8
MAX_TILT = 0.38        # (:726)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GogoroPaperTaskState:
    speed_cmd: jnp.ndarray       # (B,)
    yaw_cmd: jnp.ndarray         # (B,)
    command_history: jnp.ndarray  # (B, 5) steering-command ring
    steer_delay: jnp.ndarray     # (B,) int32 in [0, 5)
    obs_clean: jnp.ndarray       # (B, 20, 8) raw frame window
    obs_noisy: jnp.ndarray       # (B, 20, 8) normalized noisy window
    imu_x_offset: jnp.ndarray    # (B,)
    speed_offset: jnp.ndarray    # (B,)
    cur_command: jnp.ndarray     # (B,) this step's raw command


class GogoroPaper(Gogoro):
    num_obs = BUFF * NUM_CH
    num_actions = 1
    max_episode_length = 3600      # Gogoro_paper.yaml max_steps
    push_force = 30.0

    def __init__(self, num_envs: int = 4096, seed: int = 42, **kw):
        super().__init__(num_envs, seed, **kw)
        self.head_body = self.model.body_id("head_p_link")

    # ------------------------------------------------------------------
    def default_task_state(self, key):
        B = self.num_envs
        z = jnp.zeros(B)
        return GogoroPaperTaskState(
            z + 8.0, z, jnp.zeros((B, DELAY_W)),
            jnp.zeros(B, jnp.int32), jnp.zeros((B, BUFF, NUM_CH)),
            jnp.zeros((B, BUFF, NUM_CH)), z, z, z)

    def reset_fn(self, key, params, task):
        ks = jax.random.split(key, 10)
        n = PAPER_NOISES
        speed_cmd = _uniform(ks[0], (), *n["speed_range"])
        yaw_target = _uniform(ks[1], (), -jnp.pi, jnp.pi)
        init_yaw = yaw_target + _uniform(ks[2], (), -1.57, 1.57)
        delay = jax.random.randint(ks[3], (), 0, DELAY_W)
        imu_x = _uniform(ks[4], (), *n["imu_x_offset"])
        speed_off = _uniform(ks[5], (), *n["speed_sensor_offset"])
        damp = _uniform(ks[6], (), *n["steering_damping_range"])
        params = dataclasses.replace(
            params, drive_damping=params.drive_damping.at[self.sid].set(damp))

        root_pos = jnp.array([0.0, 0.0, 0.03])
        spawn_roll = _uniform(ks[7], (), *n["spawn_x_angle"])
        root_quat = Q.from_euler_xyz(spawn_roll, jnp.zeros(()), init_yaw)
        joint_q = jnp.asarray(self._init_joint_q)
        q = jnp.concatenate([root_pos, root_quat, joint_q])
        qd = jnp.zeros(self.model.nv)
        t = GogoroPaperTaskState(
            speed_cmd=speed_cmd, yaw_cmd=yaw_target,
            command_history=jnp.zeros(DELAY_W),
            steer_delay=delay.astype(jnp.int32),
            obs_clean=jnp.zeros((BUFF, NUM_CH)),
            obs_noisy=jnp.zeros((BUFF, NUM_CH)),
            imu_x_offset=imu_x, speed_offset=speed_off,
            cur_command=jnp.zeros(()))
        return q, qd, params, t

    # ------------------------------------------------------------------
    def pre_physics(self, state, actions):
        B = actions.shape[0]
        t = state.task
        a = jnp.clip(actions[:, 0], -1.0, 1.0)
        command = a * self.max_steering                   # direct (:344-345)
        history = jnp.concatenate(
            [t.command_history[:, 1:], command[:, None]], axis=1)
        # applied = history[-delay] (-0 indexes the OLDEST slot, :355)
        idx = (DELAY_W - t.steer_delay) % DELAY_W
        applied = jnp.take_along_axis(history, idx[:, None], axis=1)[:, 0]

        target_pos = jnp.zeros((B, self.model.nj)).at[:, self.sid].set(applied)
        target_vel = jnp.zeros((B, self.model.nj)).at[:, self.rid].set(
            t.speed_cmd)
        ctrl = Controls(target_pos, target_vel,
                        jnp.zeros((B, self.model.nj)))

        # pushes (:442-457): every 10 steps, first half of the envs
        key = jax.random.fold_in(state.key, 303)
        k1, k2 = jax.random.split(key)
        yaw = t.obs_clean[:, -1, 1]
        need = ((state.progress + 1) % 10 == 0) & \
            (jnp.arange(B) < B // 2)
        x_force = _uniform(k1, (B,), -self.push_force, self.push_force)
        z_force = -jax.random.uniform(k2, (B,)) * self.push_force
        f = jnp.stack([x_force * jnp.cos(yaw + jnp.pi / 2),
                       x_force * jnp.sin(yaw + jnp.pi / 2), z_force], -1)
        f = f * need[:, None]
        wrench = jnp.zeros((B, self.model.nb, 6)).at[
            :, self.head_body, 0:3].set(f)
        return ctrl, wrench, dataclasses.replace(
            t, command_history=history, cur_command=command)

    # ------------------------------------------------------------------
    def post_physics(self, state, prev_task):
        t = prev_task
        B = state.q.shape[0]
        n = PAPER_NOISES
        root_quat = state.q[:, 3:7]
        roll, _, yaw = Q.to_euler_xyz(root_quat)
        omega_b = state.qd[:, 0:3]
        v_b = Q.rotate_inv(root_quat, state.qd[:, 3:6])
        d_roll, d_yaw = omega_b[:, 0], omega_b[:, 2]
        speed = v_b[:, 0]
        delta_yaw = Q.shortest_angle_distance(yaw, t.yaw_cmd)
        delay_n = t.steer_delay.astype(jnp.float32) / DELAY_W

        frame = jnp.stack([roll, yaw, d_roll, d_yaw, speed, delta_yaw,
                           t.cur_command, delay_n], axis=-1)
        obs_clean = jnp.concatenate(
            [t.obs_clean[:, 1:], frame[:, None]], axis=1)

        # ---- noisy, normalized frame (:520-544) ----
        key = jax.random.fold_in(state.key, 404)
        ks = jax.random.split(key, 4)
        nf = frame
        nf = nf.at[:, 0:2].add(_uniform(ks[0], (B, 2), *n["imu_filter_noise"]))
        nf = nf.at[:, 0].add(t.imu_x_offset)
        nf = nf.at[:, 2:4].add(_uniform(ks[1], (B, 2), *n["imu_noise"]))
        sp = nf[:, 4] + _uniform(ks[2], (B,), *n["speed_sensor_noise"]) \
            + t.speed_offset
        nf = nf.at[:, 4].set(jnp.maximum(sp, 0.0))
        nf = nf.at[:, 5].add(_uniform(ks[3], (B,), *n["imu_filter_noise"]))
        nf = nf.at[:, 0:2].divide(jnp.pi)
        nf = nf.at[:, 2:4].divide(3.0)
        nf = nf.at[:, 4].divide(5.0)
        nf = nf.at[:, 5].divide(jnp.pi)
        nf = nf.at[:, 6].divide(self.max_steering)
        # noise-removal trick (:541-542): command diffs into droll / roll
        cmd_diff = obs_clean[:, -2, 6] - obs_clean[:, -1, 6]
        nf = nf.at[:, 2].add(cmd_diff)
        nf = nf.at[:, 0].add(cmd_diff * 0.3)
        obs_noisy = jnp.concatenate([t.obs_noisy[:, 1:], nf[:, None]], axis=1)
        obs_noisy = obs_noisy.at[:, :, 1].set(0.0)        # yaw zeroed (:544)
        obs = obs_noisy.reshape(B, BUFF * NUM_CH)

        # ---- reward (compute_gogoro_reward:714-762) ----
        act_buff = obs_clean[:, :, 6] / self.max_steering
        tilt_err = jnp.clip(roll / MAX_TILT, -1.0, 1.0)
        yaw_err = jnp.clip(delta_yaw / jnp.pi, -1.0, 1.0)
        dtilt_err = jnp.clip(d_roll / 0.3, -1.0, 1.0)
        r1 = 1.0 - yaw_err ** 2
        r2 = 1.0 - tilt_err ** 2
        r4 = 1.0 - dtilt_err ** 2
        tilt_w = 1.0 - jnp.tanh(50.0 * tilt_err ** 2)
        dtilt_w = 1.0 - jnp.tanh(50.0 * dtilt_err ** 2)
        r5 = 1.0 - (act_buff[:, -1] ** 2) * (tilt_w * dtilt_w)
        r7 = 1.0 - jnp.mean(jnp.diff(act_buff, axis=1) ** 2, axis=1)
        reward = r1 * 0.45 + r2 * 0.1 + r4 * 0.35 + r5 * 2.0 + r7 * 0.2
        reward = jnp.clip(reward, 0.0, None)
        felt = jnp.abs(roll) >= MAX_TILT
        reward = jnp.where(felt, -1.0, reward)

        # command resampling at step 300 (:400-410)
        key2 = jax.random.fold_in(state.key, 505)
        k1, k2 = jax.random.split(key2)
        speed_change = state.progress == n["speed_freq_update"]
        yaw_change = state.progress == n["yaw_freq_update"]
        new_speed = _uniform(k1, (B,), *n["speed_range"])
        new_yaw = Q.wrap_to_pi(_uniform(k2, (B,), -jnp.pi, jnp.pi))
        task = dataclasses.replace(
            t, obs_clean=obs_clean, obs_noisy=obs_noisy,
            speed_cmd=jnp.where(speed_change, new_speed, t.speed_cmd),
            yaw_cmd=jnp.where(yaw_change, new_yaw, t.yaw_cmd))

        metrics = dict(state.metrics)
        metrics["roll_abs"] = jnp.abs(roll)
        metrics["yaw_err_abs"] = jnp.abs(delta_yaw)
        metrics["speed"] = speed
        return obs, reward, felt.astype(jnp.float32), task, metrics

    def observation_noise(self, key, obs, task_state):
        """Noise is injected per-frame inside post_physics (the window
        stores each frame's noise draw); no extra output noise."""
        return obs
