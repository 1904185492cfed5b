"""ShadowHand cube-reorientation task.

Parity with `/root/reference/isaacgymenvs/tasks/shadow_hand.py` +
`cfg/task/ShadowHand.yaml`. A 24-DOF Shadow Hand (20 actuated, four
tendon-coupled distal joints) holds a free cube palm-up and must spin it to
a resampled goal orientation.

Spec mapping (reference file:line):
- hand: fixed base at (0,0,0.5), gravity off (:238-241,306); object block
  spawns at hand + (0,-0.39,+0.10) (:308-312); goal pose = object init
  - 0.04 z (:402-404), goal actor is visualization-only -> virtual here
- actions (20): absolute position targets scale()d to actuated DOF limits
  with moving average `actionsMovingAverage`, or relative mode
  dofSpeedScale*dt deltas (:666-682)
- obs modes openai/full_no_vel/full/full_state = 42/77/157/211 (:110-130,
  :479-585); fingertip force-torque and DOF-force channels are the
  force_torque_obs_scale=10, vel_obs_scale=0.2 scaled views (:62-63)
- reward (compute_hand_reward :745-800): dist*-10 + 1/(|rot_dist|+0.1),
  action^2 * -0.0002, +250 on success (rot_dist <= 0.1), fall at
  goal_dist >= 0.24; goal resamples WITHOUT env reset (reset_target_pose
  :587-610); successes / consecutive_successes EMA with av_factor 0.1
- reset (:612-660): object xy/z noise 0.01, random rot (pi*rand about x
  then y), hand DOF pos noise 0.2 toward limits
- random object forces: forceScale/forceProbRange/forceDecay (:69-72,
  :698-707) through the body-wrench path
- DR block (`cfg/task/ShadowHand.yaml:65-190`): gravity + hand/object mass
  scaling via the declarative dr_config

The hand model itself is re-derived (asset absent): models/shadow_hand.py.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from thormang_isaacgym_tpu.core import quat as Q
from thormang_isaacgym_tpu.engine.env import Task
from thormang_isaacgym_tpu.models import load_urdf
from thormang_isaacgym_tpu.models.scene import compose
from thormang_isaacgym_tpu.models.shadow_hand import (
    ACTUATED_DOF_NAMES, FINGERTIP_BODIES, load_shadow_hand, make_block_urdf,
)
from thormang_isaacgym_tpu.ops.kinematics import forward_kinematics
from thormang_isaacgym_tpu.ops.sim import Controls, SimParams

HAND_POS = (0.0, 0.0, 0.5)
# object spawn: reference hand+(0,-0.39,+0.10) (:308-312). Our re-derived
# palm top sits at z=0.565, and the reset randomizes the full block
# orientation — the spawn must clear the block's HALF-DIAGONAL (56 mm for
# the 65 mm cube), not its half-width, or rotated spawns start corner-deep
# in the palm and the depenetration push ejects them (multi-second
# launches observed at z=0.60). 0.625 clears every orientation by 4 mm.
OBJECT_START = (0.0, -0.39, 0.625)
GOAL_POS = (0.0, -0.39, 0.56)
# (ShadowHand values; hand-model subclasses override the class attrs
# object_start / goal_pos — the spawn must sit over THAT hand's palm)

NUM_OBS = {"openai": 42, "full_no_vel": 77, "full": 157, "full_state": 211}


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HandTaskState:
    goal_rot: jnp.ndarray        # (B, 4) wxyz
    successes: jnp.ndarray       # (B,)
    cons_successes: jnp.ndarray  # (B,) replicated EMA scalar
    prev_targets: jnp.ndarray    # (B, nj)
    actions: jnp.ndarray         # (B, 20)
    rb_force: jnp.ndarray        # (B, 3) decaying random object force
    force_prob: jnp.ndarray      # (B,)
    goal_cap: jnp.ndarray        # (B,) replicated curriculum goal-distance cap


def _rand_rot(k0, k1):
    """randomize_rotation (:802-806): pi*rand about x then pi*rand about y."""
    r0 = jax.random.uniform(k0, (), minval=-1.0, maxval=1.0)
    r1 = jax.random.uniform(k1, (), minval=-1.0, maxval=1.0)
    qx = Q.from_axis_angle(jnp.array([1.0, 0, 0]), r0 * jnp.pi)
    qy = Q.from_axis_angle(jnp.array([0.0, 1.0, 0]), r1 * jnp.pi)
    return Q.mul(qx, qy)


def _curriculum_goal(key, obj_rot, cap, min_angle):
    """Goal-distance-curriculum sampler (single env).

    Samples a goal orientation whose rotation distance from the CURRENT
    object orientation is uniform in [min_angle, cap] about a uniformly
    random axis, so rot_dist(obj, goal) == the sampled angle exactly
    (quat_diff = obj * conj(goal) = the sampled delta). Once the cap
    anneals to pi the task switches to the reference's own sampler
    (_rand_rot, reset_target_pose :587-610) — full uniform re-orientation,
    i.e. exactly the reference task. Rationale: the r4 isolating
    experiment (TRAIN_ShadowHand_r04.json) showed PPO learns goal-directed
    reorientation when goals are 0.3-0.8 rad away but never escapes the
    static-hold basin under full-distance goals from scratch."""
    k0, k1, k2, k3 = jax.random.split(key, 4)
    full = _rand_rot(k0, k1)
    axis = jax.random.normal(k2, (3,))
    axis = axis / (jnp.linalg.norm(axis) + 1e-9)
    ang = jax.random.uniform(k3, (), minval=min_angle, maxval=cap)
    delta = Q.from_axis_angle(axis, ang)
    near = Q.mul(Q.conj(delta), obj_rot)
    return jnp.where(cap >= jnp.pi - 0.05, full, near)


def _unscale(x, lo, hi):
    return (2.0 * x - (hi + lo)) / (hi - lo)


def _scale(x, lo, hi):
    return 0.5 * (x + 1.0) * (hi - lo) + lo


class ShadowHand(Task):
    """Cube reorientation (`isaacgym_task_map["ShadowHand"]`)."""

    uses_net_torque = True   # 6-DOF force sensors read net_torque
    num_actions = 20
    max_episode_length = 600
    clip_obs = 5.0

    # reward / task constants (ShadowHand.yaml:39-52)
    dist_reward_scale = -10.0
    rot_reward_scale = 1.0
    rot_eps = 0.1
    action_penalty_scale = -0.0002
    success_tolerance = 0.1
    reach_goal_bonus = 250.0
    fall_dist = 0.24
    fall_penalty = 0.0
    max_consecutive_successes = 0
    av_factor = 0.1
    vel_obs_scale = 0.2
    ft_obs_scale = 10.0
    reset_position_noise = 0.01
    reset_dof_pos_noise = 0.2
    reset_dof_vel_noise = 0.0
    use_relative_control = False
    dof_speed_scale = 20.0
    act_moving_average = 1.0
    object_start = OBJECT_START   # cube spawn, world (over the palm)
    goal_pos = GOAL_POS           # virtual goal-pose anchor
    # goal-distance curriculum (no reference analog; see _curriculum_goal).
    # Rate-limited success-gated anneal: while the consecutive-success EMA
    # at the CURRENT cap exceeds curriculum_promote, the cap grows by
    # curriculum_rate per step toward pi, where sampling becomes the
    # reference's full-random reset_target_pose exactly. The gate closes
    # whenever competence at the wider cap dips below the threshold, so
    # the cap tracks demonstrated skill. (An earlier competence-
    # proportional ratchet cap = max(cap, start + 1.5*cons) overshot:
    # one transient EMA spike measured at an easy cap jumped the cap from
    # 0.8 to 2.05 rad, skipping the difficulty range where learning was
    # progressing — runs/sh_cur_r5b.)
    # Disable (reference behavior from step 0) with goal_curriculum=False.
    curriculum_start = 0.8       # rad — the r4 experiment's proven regime
    curriculum_min_angle = 0.2   # min sampled distance (> success_tolerance)
    curriculum_promote = 0.6     # cons EMA gate
    curriculum_rate = 2.5e-4     # rad per env step while gated

    def __init__(self, num_envs: int = 16384, seed: int = 42,
                 obs_type: str = "full_state", asymmetric_obs: bool = False,
                 randomize: bool = False, force_scale: float = 0.0,
                 goal_curriculum: bool = True,
                 hand_model=None, object_urdf: str | None = None, **_):
        super().__init__(num_envs, seed)
        self.goal_curriculum = goal_curriculum
        assert obs_type in NUM_OBS, obs_type
        self.obs_type = obs_type
        self.num_obs = NUM_OBS[obs_type]
        self.num_states = 211 if asymmetric_obs else 0
        self.force_scale = force_scale
        self.force_prob_range = (0.001, 0.1)
        self.force_decay = 0.99
        self.force_decay_interval = 0.08

        hand = hand_model or load_shadow_hand()
        block = load_urdf(object_urdf or make_block_urdf())
        scene = compose([
            (hand, HAND_POS + (1.0, 0.0, 0.0, 0.0), ""),
            (block, tuple(self.object_start) + (1.0, 0.0, 0.0, 0.0), "obj/"),
        ], name="shadow_hand_scene")
        self.model = scene
        self.nj = scene.nj
        if set(ACTUATED_DOF_NAMES) <= set(scene.joint_names):
            self.act_ids = np.array(
                [scene.dof_id(n) for n in ACTUATED_DOF_NAMES])
            self.fingertip_ids = np.array(
                [scene.body_id(b) for b in FINGERTIP_BODIES])
            # 6-DOF sensors live on the fingertips only: restrict kernel
            # torque accumulation to them (AllegroHand re-declares after
            # overriding fingertip_ids)
            self.net_torque_bodies = tuple(
                int(b) for b in self.fingertip_ids)
        else:
            # non-Shadow hand model (AllegroHand subclass): placeholder
            # maps, overridden right after super().__init__
            self.act_ids = np.arange(self.num_actions)
            self.fingertip_ids = np.zeros(0, np.int64)
        self.object_body = scene.body_id("obj/object")
        d = scene._defaults
        self.dof_lower = jnp.asarray(np.array(d["dof_lower"]))
        self.dof_upper = jnp.asarray(np.array(d["dof_upper"]))
        self.act_lower = self.dof_lower[self.act_ids]
        self.act_upper = self.dof_upper[self.act_ids]
        self.kp = jnp.asarray(np.array(d["drive_stiffness"]))
        self.kd = jnp.asarray(np.array(d["drive_damping"]))
        self.effort_lim = jnp.asarray(np.array(d["drive_effort_limit"]))
        self.object_mass = float(np.asarray(d["body_mass"])[self.object_body])

        # sim params (ShadowHand.yaml sim block: dt 0.01667, substeps 2)
        self.sim_params = SimParams(
            dt=1.0 / 60.0, substeps=2, gravity=(0.0, 0.0, -9.81),
            contact_stiffness=5.0e4, contact_damping=200.0,
            friction_vel=0.01, plane_friction=1.0,
            max_depenetration_velocity=1.0)
        self.dt = self.sim_params.dt

        if randomize:
            # the FULL transcribed reference DR tree (ShadowHand.yaml:65-190:
            # obs/action correlated noise, gravity, tendon/dof/body/shape
            # blocks, friction buckets, setup_only mass, object scale) drives
            # the engine end-to-end (engine/dr.py parses every block)
            import os
            import yaml
            cfg_path = os.path.join(os.path.dirname(__file__), "..", "..",
                                    "cfg", "task", "ShadowHand.yaml")
            with open(cfg_path) as f:
                self.dr_config = yaml.safe_load(f)["task"]["randomization_params"]

        # object q block: hand is fixed -> object is the only floating root
        self.qO = 0

    # ------------------------------------------------------------------
    def default_task_state(self, key):
        B = self.num_envs
        return HandTaskState(
            goal_rot=jnp.tile(Q.identity()[None], (B, 1)),
            successes=jnp.zeros(B),
            cons_successes=jnp.zeros(B),
            prev_targets=jnp.zeros((B, self.nj)),
            actions=jnp.zeros((B, self.num_actions)),
            rb_force=jnp.zeros((B, 3)),
            force_prob=jnp.full((B,), 0.01),
            goal_cap=jnp.full((B,), self.curriculum_start
                              if self.goal_curriculum else float(jnp.pi)),
        )

    # ------------------------------------------------------------------
    def reset_fn(self, key, params, task):
        ks = jax.random.split(key, 9)
        # object pose: init + noise, random rotation (:618-637)
        pos = jnp.asarray(self.object_start) + self.reset_position_noise \
            * jax.random.uniform(ks[0], (3,), minval=-1.0, maxval=1.0)
        obj_rot = _rand_rot(ks[1], ks[2])
        # curriculum: the fresh goal stays within goal_cap of the spawn
        # orientation (== reference _rand_rot once the cap reaches pi)
        goal_rot = _curriculum_goal(ks[3], obj_rot, task.goal_cap,
                                    self.curriculum_min_angle)

        # hand DOFs: 0 + noise*rand_delta toward limits (:648-652)
        rand = jax.random.uniform(ks[5], (self.nj,), minval=-1.0, maxval=1.0)
        delta_max = self.dof_upper
        delta_min = self.dof_lower
        rand_delta = delta_min + (delta_max - delta_min) * 0.5 * (rand + 1.0)
        jq = jnp.clip(self.reset_dof_pos_noise * rand_delta,
                      self.dof_lower, self.dof_upper)
        jqd = self.reset_dof_vel_noise * jax.random.uniform(
            ks[6], (self.nj,), minval=-1.0, maxval=1.0)

        q = jnp.concatenate([pos, obj_rot, jq])
        qd = jnp.concatenate([jnp.zeros(6), jqd])

        # per-env random-force probability (loguniform, :693-696)
        lo, hi = self.force_prob_range
        u = jax.random.uniform(ks[7], ())
        force_prob = jnp.exp((jnp.log(lo) - jnp.log(hi)) * u + jnp.log(hi))

        task = HandTaskState(
            goal_rot=goal_rot,
            successes=jnp.zeros(()),
            cons_successes=task.cons_successes,
            prev_targets=jq,
            actions=jnp.zeros(self.num_actions),
            rb_force=jnp.zeros(3),
            force_prob=force_prob,
            goal_cap=task.goal_cap,
        )
        return q, qd, params, task

    # ------------------------------------------------------------------
    def pre_physics(self, state, actions):
        """Targets + random object forces (pre_physics_step :662-707)."""
        B = actions.shape[0]
        t = state.task
        act = jnp.asarray(self.act_ids)
        prev = t.prev_targets
        if self.use_relative_control:
            tgt_act = prev[:, act] + self.dof_speed_scale * self.dt * actions
        else:
            tgt_act = _scale(actions, self.act_lower, self.act_upper)
            tgt_act = self.act_moving_average * tgt_act \
                + (1.0 - self.act_moving_average) * prev[:, act]
        tgt_act = jnp.clip(tgt_act, self.act_lower, self.act_upper)
        targets = prev.at[:, act].set(tgt_act)

        wrench = jnp.zeros((B, self.model.nb, 6))
        rb_force = t.rb_force
        if self.force_scale > 0.0:
            k1, k2 = jax.random.split(jax.random.fold_in(state.key, 77))
            decay = self.force_decay ** (self.dt / self.force_decay_interval)
            rb_force = rb_force * decay
            kick = (jax.random.uniform(k1, (B,)) < t.force_prob)
            new_f = jax.random.normal(k2, (B, 3)) \
                * self.object_mass * self.force_scale
            rb_force = jnp.where(kick[:, None], new_f, rb_force)
            wrench = wrench.at[:, self.object_body, 3:6].set(rb_force)

        ctrl = Controls(targets, jnp.zeros((B, self.nj)),
                        jnp.zeros((B, self.nj)))
        return ctrl, wrench, dataclasses.replace(
            t, prev_targets=targets, actions=actions, rb_force=rb_force)

    # ------------------------------------------------------------------
    def _object_state(self, state):
        pos = state.q[:, 0:3]
        rot = state.q[:, 3:7]
        angvel = state.qd[:, 0:3]           # body frame
        angvel = jax.vmap(Q.rotate)(rot, angvel)
        linvel = state.qd[:, 3:6]
        return pos, rot, linvel, angvel

    def _fingertip_state(self, state):
        frames = jax.vmap(lambda q, qd: forward_kinematics(self.model, q, qd))(
            state.q, state.qd)
        ft = jnp.asarray(self.fingertip_ids)
        return (frames.pos[:, ft], frames.quat[:, ft],
                frames.vel[:, ft], frames.omega[:, ft])

    def _dof_force_estimate(self, state, task):
        """DOF force sensor view: drive torque + tendon limit-spring torque
        at the current state (enable_actor_dof_force_sensors equivalent,
        :196; tendon coupling per set_asset_tendon_properties,
        :252-260)."""
        nf7 = 7 * self.model.n_floating
        nf6 = 6 * self.model.n_floating
        jq = state.q[:, nf7:]
        jqd = state.qd[:, nf6:]
        tau = self.kp * (task.prev_targets - jq) - self.kd * jqd
        tau = jnp.clip(tau, -self.effort_lim, self.effort_lim)
        tendons = self.model.tendons
        if tendons:
            coefs = jnp.asarray(np.array([t[0] for t in tendons],
                                         np.float32))        # (nt, nj)
            lo = jnp.asarray(np.array([t[1] for t in tendons], np.float32))
            hi = jnp.asarray(np.array([t[2] for t in tendons], np.float32))
            L = jq @ coefs.T                                  # (B, nt)
            Ld = jqd @ coefs.T
            viol = L - jnp.clip(L, lo[None], hi[None])
            k = state.params.tendon_stiffness
            c = state.params.tendon_damping
            f = -(k * viol + c * Ld * (jnp.abs(viol) > 0))    # (B, nt)
            tau = tau + f @ coefs
        return tau

    def _full_state(self, state, task):
        """211-dim full_state layout (:531-585)."""
        B = state.q.shape[0]
        nf7 = 7 * self.model.n_floating
        nf6 = 6 * self.model.n_floating
        jq = state.q[:, nf7:]
        jqd = state.qd[:, nf6:]
        obj_pos, obj_rot, obj_lin, obj_ang = self._object_state(state)
        fpos, fquat, fvel, fomega = self._fingertip_state(state)
        ft_state = jnp.concatenate([
            fpos, fquat, fvel, self.vel_obs_scale * fomega], axis=-1) \
            .reshape(B, 65)
        ft = jnp.asarray(self.fingertip_ids)
        # 6-D fingertip force sensors (force_sensor tensor,
        # shadow_hand.py:592-596): true net contact force AND torque per
        # tip body, in the sensor (tip) frame
        ft_force = Q.rotate_inv(fquat, state.net_contact[:, ft])
        ft_torque = Q.rotate_inv(fquat, state.net_torque[:, ft])
        ft_ft = jnp.concatenate(
            [ft_force, ft_torque], axis=-1).reshape(B, 30)
        return jnp.concatenate([
            _unscale(jq, self.dof_lower, self.dof_upper),
            self.vel_obs_scale * jqd,
            self.ft_obs_scale * self._dof_force_estimate(state, task),
            obj_pos, obj_rot, obj_lin, self.vel_obs_scale * obj_ang,
            jnp.asarray(self.goal_pos) * jnp.ones((B, 3)), task.goal_rot,
            jax.vmap(Q.mul)(obj_rot, jax.vmap(Q.conj)(task.goal_rot)),
            ft_state, self.ft_obs_scale * ft_ft,
            task.actions,
        ], axis=-1)

    def compute_states(self, state, task_state):
        return self._full_state(state, task_state)

    def _observations(self, state, t, obj_pos, obj_rot, obj_lin, obj_ang,
                      quat_diff):
        B = state.q.shape[0]
        nf7 = 7 * self.model.n_floating
        nf6 = 6 * self.model.n_floating
        jq = state.q[:, nf7:]
        jqd = state.qd[:, nf6:]
        goal_pos = jnp.asarray(self.goal_pos)
        if self.obs_type == "openai":
            fpos, _, _, _ = self._fingertip_state(state)
            return jnp.concatenate([
                fpos.reshape(B, 15), obj_pos, quat_diff, t.actions], axis=-1)
        if self.obs_type == "full_no_vel":
            fpos, _, _, _ = self._fingertip_state(state)
            return jnp.concatenate([
                _unscale(jq, self.dof_lower, self.dof_upper),
                obj_pos, obj_rot,
                goal_pos * jnp.ones((B, 3)), t.goal_rot, quat_diff,
                fpos.reshape(B, 15), t.actions], axis=-1)
        if self.obs_type == "full":
            fpos, fquat, fvel, fomega = self._fingertip_state(state)
            ft_state = jnp.concatenate([
                fpos, fquat, fvel, self.vel_obs_scale * fomega],
                axis=-1).reshape(B, -1)
            return jnp.concatenate([
                _unscale(jq, self.dof_lower, self.dof_upper),
                self.vel_obs_scale * jqd,
                obj_pos, obj_rot, obj_lin, self.vel_obs_scale * obj_ang,
                goal_pos * jnp.ones((B, 3)), t.goal_rot, quat_diff,
                ft_state, t.actions], axis=-1)
        return self._full_state(state, t)

    # ------------------------------------------------------------------
    def post_physics(self, state, prev_task):
        t = prev_task
        B = state.q.shape[0]
        obj_pos, obj_rot, obj_lin, obj_ang = self._object_state(state)
        goal_pos = jnp.asarray(self.goal_pos)
        quat_diff = jax.vmap(Q.mul)(obj_rot, jax.vmap(Q.conj)(t.goal_rot))

        obs = self._observations(state, t, obj_pos, obj_rot, obj_lin,
                                 obj_ang, quat_diff)

        # ---- reward (compute_hand_reward :745-800) ----
        goal_dist = jnp.linalg.norm(obj_pos - goal_pos, axis=-1)
        rot_dist = 2.0 * jnp.arcsin(jnp.clip(
            jnp.linalg.norm(quat_diff[:, 1:4], axis=-1), 0.0, 1.0))
        dist_rew = goal_dist * self.dist_reward_scale
        rot_rew = 1.0 / (jnp.abs(rot_dist) + self.rot_eps) * self.rot_reward_scale
        action_penalty = jnp.sum(t.actions ** 2, axis=-1)
        reward = dist_rew + rot_rew + action_penalty * self.action_penalty_scale

        goal_reached = jnp.abs(rot_dist) <= self.success_tolerance
        successes = t.successes + goal_reached
        reward = jnp.where(goal_reached, reward + self.reach_goal_bonus, reward)

        fell = goal_dist >= self.fall_dist
        reward = jnp.where(fell, reward + self.fall_penalty, reward)
        done = fell
        if self.max_consecutive_successes > 0:
            done = done | (successes >= self.max_consecutive_successes)
            reward = jnp.where(state.progress >= self.max_episode_length - 1,
                               reward + 0.5 * self.fall_penalty, reward)
        done = done.astype(jnp.float32)

        # goal resample on success WITHOUT env reset (reset_target_pose);
        # curriculum-capped distance from the just-reached orientation
        key = jax.random.fold_in(state.key, 303)
        ks = jax.random.split(key, B)
        new_goals = jax.vmap(_curriculum_goal, in_axes=(0, 0, 0, None))(
            ks, obj_rot, t.goal_cap, self.curriculum_min_angle)
        goal_rot = jnp.where(goal_reached[:, None], new_goals, t.goal_rot)

        # consecutive-success EMA across this step's resets (:788-797)
        resets_all = jnp.maximum(
            done, (state.progress >= self.max_episode_length - 1).astype(jnp.float32))
        num_resets = jnp.sum(resets_all)
        finished = jnp.sum(successes * resets_all)
        cons = jnp.where(
            num_resets > 0,
            self.av_factor * finished / jnp.maximum(num_resets, 1.0)
            + (1.0 - self.av_factor) * t.cons_successes,
            t.cons_successes)

        # rate-limited success-gated curriculum anneal (see class attrs)
        goal_cap = t.goal_cap
        if self.goal_curriculum:
            gate = (cons >= self.curriculum_promote).astype(jnp.float32)
            goal_cap = jnp.minimum(goal_cap + gate * self.curriculum_rate,
                                   jnp.pi)

        task = dataclasses.replace(
            t, goal_rot=goal_rot, successes=successes, cons_successes=cons,
            goal_cap=goal_cap)

        metrics = dict(state.metrics)
        metrics["consecutive_successes"] = cons
        metrics["successes"] = successes
        metrics["rot_dist"] = rot_dist
        metrics["goal_dist"] = goal_dist
        metrics["goal_cap"] = goal_cap
        return obs, reward, done, task, metrics
