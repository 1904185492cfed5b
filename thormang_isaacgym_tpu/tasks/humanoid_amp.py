"""HumanoidAMP — adversarial-motion-prior humanoid.

Parity with `/root/reference/isaacgymenvs/tasks/humanoid_amp.py` +
`tasks/amp/humanoid_amp_base.py`:

- 28-DOF AMP humanoid (models/amp_humanoid.py), PD position control with
  the extended action offset/scale map (`_build_pd_action_offset_scale`,
  humanoid_amp_base.py:262-295: 3-DOF joints span +-pi, 1-DOF joints
  mid +- 0.7*range)
- obs = the 105-dim AMP feature (humanoid_amp_base.py:43): [root_h,
  root_rot tan-norm(6), local root vel(3), local root ang vel(3),
  dof_obs(52), dof_vel(28), local key body pos(12)]
- AMP observation window: numAMPObsSteps frames (current + history,
  humanoid_amp.py:80-82), rolled every step (`_update_hist_amp_obs`)
- reference-state init from MotionLib (StateInit Default/Start/Random/
  Hybrid, humanoid_amp.py:153-225) — fully on-device here (jittable
  gather), where the reference runs a host numpy loop
- contact-based early termination (compute_humanoid_reset,
  humanoid_amp_base.py:537-561): any non-foot body in contact AND any
  non-foot body below terminationHeight, after step 1
- task reward = 1.0 (compute_humanoid_reward:531-534); the style reward
  comes from the discriminator in learn/amp.py
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from thormang_isaacgym_tpu.core import quat as Q
from thormang_isaacgym_tpu.engine.env import Task
from thormang_isaacgym_tpu.learn.motion_lib import MotionLib, default_motion_lib
from thormang_isaacgym_tpu.models import amp_humanoid as AH
from thormang_isaacgym_tpu.models.amp_humanoid import load_amp_humanoid, amp_dof_perm
from thormang_isaacgym_tpu.ops.kinematics import forward_kinematics
from thormang_isaacgym_tpu.ops.sim import Controls, SimParams

NUM_AMP_OBS_PER_STEP = 13 + 52 + 28 + 12    # humanoid_amp.py:47


def dof_to_obs(dof_pos_amp: jnp.ndarray) -> jnp.ndarray:
    """(..., 28) AMP-layout DOF pos -> (..., 52) features: 3-DOF joints as
    the tan-norm of their rotation, 1-DOF joints raw
    (humanoid_amp_base.py:462-492)."""
    parts = []
    for j, (_, _, _, size) in enumerate(AH._JOINTS):
        o = AH.DOF_OFFSETS[j]
        if size == 3:
            # intrinsic z-y-x Euler -> quat (models/amp_humanoid.py chart)
            qz, qy, qx = (dof_pos_amp[..., o], dof_pos_amp[..., o + 1],
                          dof_pos_amp[..., o + 2])
            quat = Q.from_euler_xyz(qx, qy, qz)
            parts.append(Q.to_tan_norm(quat))
        else:
            parts.append(dof_pos_amp[..., o:o + 1])
    return jnp.concatenate(parts, axis=-1)


def build_amp_observations(root_pos, root_rot, root_vel, root_ang_vel,
                           dof_pos_amp, dof_vel_amp, key_pos_world,
                           local_root_obs: bool = False) -> jnp.ndarray:
    """The shared obs/AMP-feature builder (`build_amp_observations`,
    humanoid_amp.py:299-333 == compute_humanoid_observations,
    humanoid_amp_base.py:494-528). Broadcasts over leading axes."""
    root_h = root_pos[..., 2:3]
    heading_inv = Q.heading_quat_inv(root_rot)
    rot_obs = Q.mul(heading_inv, root_rot) if local_root_obs else root_rot
    rot_obs = Q.to_tan_norm(rot_obs)
    local_vel = Q.rotate(heading_inv, root_vel)
    local_ang_vel = Q.rotate(heading_inv, root_ang_vel)
    rel_key = key_pos_world - root_pos[..., None, :]
    local_key = Q.rotate(heading_inv[..., None, :], rel_key)
    local_key = local_key.reshape(local_key.shape[:-2] + (-1,))
    return jnp.concatenate([
        root_h, rot_obs, local_vel, local_ang_vel,
        dof_to_obs(dof_pos_amp), dof_vel_amp, local_key], axis=-1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AMPTaskState:
    amp_obs: jnp.ndarray     # (B, S, 105) current-first window


class HumanoidAMP(Task):
    """State-init modes: 0 Default, 1 Start, 2 Random, 3 Hybrid
    (HumanoidAMP.StateInit, humanoid_amp.py:52-56)."""

    max_episode_length = 300           # HumanoidAMP.yaml episodeLength
    control_freq_inv = 2               # 30 Hz control
    power_scale = 1.0
    pd_control = True                  # humanoid_amp_base.py:54
    termination_height = 0.5
    enable_early_termination = True
    local_root_obs = False
    hybrid_init_prob = 0.5

    def __init__(self, num_envs: int = 4096, seed: int = 42,
                 state_init: str = "Random", num_amp_obs_steps: int = 2,
                 motion_file: str | None = None,
                 motion_lib: MotionLib | None = None,
                 randomize: bool = False, **_):
        super().__init__(num_envs, seed)
        assert num_amp_obs_steps >= 2     # humanoid_amp.py:65
        self.state_init = {"Default": 0, "Start": 1, "Random": 2,
                           "Hybrid": 3}[state_init]
        self.num_amp_obs_steps = num_amp_obs_steps
        self.num_amp_obs = num_amp_obs_steps * NUM_AMP_OBS_PER_STEP
        self.model = load_amp_humanoid()
        self.perm = jnp.asarray(amp_dof_perm(self.model))
        self.motion_lib = motion_lib or default_motion_lib(motion_file)
        self.num_obs = NUM_AMP_OBS_PER_STEP
        self.num_actions = AH.NUM_DOF
        self.sim_params = SimParams(
            dt=0.0166, substeps=2, gravity=(0.0, 0.0, -9.81),
            contact_stiffness=4.0e4, contact_damping=1.5e3,
            friction_vel=0.1, plane_friction=1.0)
        self.dt = self.sim_params.dt * self.control_freq_inv  # humanoid_amp_base.py:76

        # PD action offset/scale (humanoid_amp_base.py:262-295), built in
        # AMP layout then scattered into model DOF layout
        d = self.model._defaults
        lo = np.array(d["dof_lower"], np.float64).copy()
        hi = np.array(d["dof_upper"], np.float64).copy()
        perm = amp_dof_perm(self.model)
        for j, (_, _, _, size) in enumerate(AH._JOINTS):
            o = AH.DOF_OFFSETS[j]
            idx = perm[o:o + size]
            if size == 3:
                lo[idx], hi[idx] = -np.pi, np.pi
            else:
                mid = 0.5 * (hi[idx] + lo[idx])
                half = 0.7 * (hi[idx] - lo[idx])
                lo[idx], hi[idx] = mid - half, mid + half
        self.pd_offset = jnp.asarray(0.5 * (hi + lo), dtype=jnp.float32)
        self.pd_scale = jnp.asarray(0.5 * (hi - lo), dtype=jnp.float32)

        # default init pose: arms out (right_shoulder_x = pi/2, left = -pi/2,
        # humanoid_amp_base.py:106-109 — x sub-DOF of the upper-arm sphere)
        init_j = np.zeros(self.model.nj, np.float32)
        init_j[self.model.dof_id("right_upper_arm_x")] = 0.5 * np.pi
        init_j[self.model.dof_id("left_upper_arm_x")] = -0.5 * np.pi
        self._init_jq = jnp.asarray(init_j)

        self.key_sites = [
            self.model.sites[k] if k in self.model.sites else None
            for k in AH.KEY_BODY_NAMES]
        self.key_bodies = [
            None if s else self.model.body_id(k)
            for k, s in zip(AH.KEY_BODY_NAMES, self.key_sites)]
        self.contact_body_ids = np.array(
            [self.model.body_id(n) for n in AH.CONTACT_BODY_NAMES], np.int32)
        nb = self.model.nb
        mask = np.ones(nb, np.float32)
        mask[self.contact_body_ids] = 0.0
        # intermediate sub-joint links (massless) carry no geometry and sit
        # at joint anchors — exclude them from the height check too
        height_mask = mask.copy()
        for i, name in enumerate(self.model.body_names):
            if "__" in name:
                height_mask[i] = 0.0
        self._noncontact_mask = jnp.asarray(mask)
        self._height_mask = jnp.asarray(height_mask)

        # imitation-quality reference bank: <= 128 demo poses subsampled
        # across all clips, for the per-step pose_error metric (min over
        # the bank of mean abs joint-angle deviation). "AMP works" should
        # mean "the poses match the demos", not "the discriminator
        # separates" (r4 review weak #7).
        nf = np.asarray(self.motion_lib.num_frames)
        rows = np.concatenate([
            np.asarray(self.motion_lib.dof_pos[i, :int(nf[i])])
            for i in range(len(nf))])
        stride = max(1, len(rows) // 128)
        self._demo_dof_bank = jnp.asarray(rows[::stride][:128])  # (Fb, D)

    # ------------------------------------------------------------------
    def _key_body_pos(self, frames):
        """(K, 3) world key-body positions from FK frames (single env)."""
        out = []
        for site, body in zip(self.key_sites, self.key_bodies):
            if site is not None:
                b, pos, quat = site
                out.append(frames.pos[b] + Q.rotate(frames.quat[b],
                                                    jnp.asarray(pos)))
            else:
                out.append(frames.pos[body])
        return jnp.stack(out)

    def _amp_obs_from_state(self, q, qd):
        """Single-env (105-dim feature, per-body heights) from physics
        state. One FK serves both the obs and the fall-height check."""
        frames = forward_kinematics(self.model, q, qd)
        key_pos = self._key_body_pos(frames)
        root_rot = q[3:7]
        dof_amp = q[7:][self.perm]
        dofv_amp = qd[6:][self.perm]
        obs = build_amp_observations(
            q[0:3], root_rot, qd[3:6], Q.rotate(root_rot, qd[0:3]),
            dof_amp, dofv_amp, key_pos, self.local_root_obs)
        return obs, frames.pos[:, 2]

    def _motion_state_to_qqd(self, ms):
        """MotionLib state tuple -> (q, qd) single env."""
        root_pos, root_rot, dof_pos, root_vel, root_ang_vel, dof_vel, _ = ms
        jq = jnp.zeros(self.model.nj).at[self.perm].set(dof_pos)
        jqd = jnp.zeros(self.model.nj).at[self.perm].set(dof_vel)
        q = jnp.concatenate([root_pos, root_rot, jq])
        omega_b = Q.rotate_inv(root_rot, root_ang_vel)
        qd = jnp.concatenate([omega_b, root_vel, jqd])
        return q, qd

    def _amp_obs_from_motion(self, motion_id, t):
        """105-dim feature straight from motion data (no FK — key_pos is
        stored), used for history init and demo fetch."""
        ms = self.motion_lib.get_motion_state(motion_id, t)
        root_pos, root_rot, dof_pos, root_vel, root_ang_vel, dof_vel, kp = ms
        return build_amp_observations(root_pos, root_rot, root_vel,
                                      root_ang_vel, dof_pos, dof_vel, kp,
                                      self.local_root_obs)

    # ------------------------------------------------------------------
    def default_task_state(self, key):
        B = self.num_envs
        return AMPTaskState(jnp.zeros((B, self.num_amp_obs_steps,
                                       NUM_AMP_OBS_PER_STEP)))

    def reset_fn(self, key, params, task):
        k_mode, k_m, k_t = jax.random.split(key, 3)
        S = self.num_amp_obs_steps
        ml = self.motion_lib

        # --- reference-state init (humanoid_amp.py:184-210) ---
        mid = ml.sample_motions(k_m, 1)[0]
        t_rand = ml.sample_time(k_t, mid[None])[0]
        t0 = jnp.where(self.state_init == 1, 0.0, t_rand)   # Start -> t=0
        ms = ml.get_motion_state(mid, t0)
        q_ref, qd_ref = self._motion_state_to_qqd(ms)
        # history window: frames at t0 - k*dt (humanoid_amp.py:243-258)
        ks = jnp.arange(S, dtype=jnp.float32)
        amp_ref = self._amp_obs_from_motion(
            jnp.broadcast_to(mid, (S,)), jnp.maximum(t0 - ks * self.dt, 0.0))

        # --- default init (humanoid_amp.py:170-182) ---
        q_def = jnp.concatenate([
            jnp.array([0.0, 0.0, AH.PELVIS_HEIGHT]),
            jnp.array([1.0, 0.0, 0.0, 0.0]), self._init_jq])
        qd_def = jnp.zeros(self.model.nv)
        amp_def = jnp.broadcast_to(
            self._amp_obs_from_state(q_def, qd_def)[0],
            (S, NUM_AMP_OBS_PER_STEP))

        if self.state_init == 0:
            q, qd, amp = q_def, qd_def, amp_def
        elif self.state_init in (1, 2):
            q, qd, amp = q_ref, qd_ref, amp_ref
        else:  # Hybrid (humanoid_amp.py:212-225)
            use_ref = jax.random.bernoulli(k_mode, self.hybrid_init_prob)
            q = jnp.where(use_ref, q_ref, q_def)
            qd = jnp.where(use_ref, qd_ref, qd_def)
            amp = jnp.where(use_ref, amp_ref, amp_def)
        return q, qd, params, AMPTaskState(amp)

    def pre_physics(self, state, actions):
        B = actions.shape[0]
        target = self.pd_offset[None] + self.pd_scale[None] * actions
        ctrl = Controls(target, jnp.zeros((B, self.model.nj)),
                        jnp.zeros((B, self.model.nj)))
        wrench = jnp.zeros((B, self.model.nb, 6))
        return ctrl, wrench, state.task

    def post_physics(self, state, prev_task):
        B = state.q.shape[0]
        cur, body_h = jax.vmap(self._amp_obs_from_state)(state.q, state.qd)
        # roll the window: hist <- previous window head (humanoid_amp.py:276-281)
        amp = jnp.concatenate(
            [cur[:, None], prev_task.amp_obs[:, :-1]], axis=1)
        obs = cur

        # contact-based early termination (humanoid_amp_base.py:537-561)
        contact_mag = jnp.linalg.norm(state.net_contact, axis=-1)  # (B, nb)
        fall_contact = jnp.any(
            (contact_mag > 0.1) * self._noncontact_mask[None], axis=-1)
        fall_height = jnp.any(
            (body_h < self.termination_height) * self._height_mask[None],
            axis=-1)
        has_fallen = fall_contact & fall_height & (state.progress > 1)
        if not self.enable_early_termination:
            has_fallen = jnp.zeros_like(has_fallen)

        reward = jnp.ones(B)               # compute_humanoid_reward:531-534
        metrics = dict(state.metrics)
        metrics["terminate"] = has_fallen.astype(jnp.float32)
        # imitation quality: nearest-demo-pose joint-angle error (rad)
        dof_amp = state.q[:, 7:][:, self.perm]
        d = dof_amp[:, None, :] - self._demo_dof_bank[None]
        d = (d + jnp.pi) % (2.0 * jnp.pi) - jnp.pi
        metrics["pose_error"] = jnp.min(jnp.mean(jnp.abs(d), axis=-1),
                                        axis=-1)
        return obs, reward, has_fallen.astype(jnp.float32), \
            AMPTaskState(amp), metrics

    # ------------------------------------------------------------------
    def fetch_amp_obs_demo(self, key, num_samples: int) -> jnp.ndarray:
        """(num_samples, num_amp_obs) demo windows from the motion library
        (fetch_amp_obs_demo, humanoid_amp.py:109-134). Jittable."""
        k_m, k_t = jax.random.split(key)
        S = self.num_amp_obs_steps
        ids = self.motion_lib.sample_motions(k_m, num_samples)
        t0 = self.motion_lib.sample_time(k_t, ids)
        ks = jnp.arange(S, dtype=jnp.float32)
        times = jnp.maximum(t0[:, None] - ks[None, :] * self.dt, 0.0)
        obs = self._amp_obs_from_motion(
            jnp.broadcast_to(ids[:, None], times.shape), times)
        return obs.reshape(num_samples, self.num_amp_obs)
