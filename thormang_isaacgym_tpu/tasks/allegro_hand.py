"""AllegroHand cube reorientation.

Parity with `/root/reference/isaacgymenvs/tasks/allegro_hand.py` +
`cfg/task/AllegroHand.yaml`: the ShadowHand machinery (goal resampling,
success counting, reward :compute_hand_reward) with a 16-DOF Allegro hand,
obs dims 50/72/88 (allegro_hand.py:107-111 — full_state has no fingertip
force-torque tail, :517-535) and all DOFs actuated.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from thormang_isaacgym_tpu.core import quat as Q
from thormang_isaacgym_tpu.models import load_urdf
from thormang_isaacgym_tpu.models.allegro_hand import (
    ALLEGRO_DOF_NAMES, load_allegro_hand,
)
from thormang_isaacgym_tpu.models.scene import compose
from thormang_isaacgym_tpu.models.shadow_hand import make_block_urdf
from thormang_isaacgym_tpu.ops.sim import SimParams
from thormang_isaacgym_tpu.tasks.shadow_hand import (
    GOAL_POS, HAND_POS, OBJECT_START, ShadowHand, _unscale,
)

ALLEGRO_NUM_OBS = {"full_no_vel": 50, "full": 72, "full_state": 88}


class AllegroHand(ShadowHand):
    num_actions = 16
    max_episode_length = 600
    # spawn over the ALLEGRO palm: fingers extend toward -y from the base
    # at (0, 0, 0.5), palm plate top ~z 0.55 (reference allegro_hand.py
    # :286-292 spawns at hand + (0, -0.2, +0.06) for ITS flipped hand
    # orientation; ours is palm-up identity, palm center y ~ -0.08)
    object_start = (0.0, -0.08, 0.60)
    goal_pos = (0.0, -0.08, 0.54)

    def __init__(self, num_envs: int = 16384, seed: int = 42,
                 obs_type: str = "full", asymmetric_obs: bool = False,
                 randomize: bool = False, **kw):
        assert obs_type in ALLEGRO_NUM_OBS, obs_type
        hand = load_allegro_hand()
        super().__init__(num_envs=num_envs, seed=seed, obs_type="full",
                         asymmetric_obs=False, randomize=randomize,
                         hand_model=hand, **kw)
        # override the shadow-specific dims/maps
        self.obs_type = obs_type
        self.num_obs = ALLEGRO_NUM_OBS[obs_type]
        self.num_states = 88 if asymmetric_obs else 0
        self.act_ids = np.array(
            [self.model.dof_id(n) for n in ALLEGRO_DOF_NAMES])
        self.act_lower = self.dof_lower[self.act_ids]
        self.act_upper = self.dof_upper[self.act_ids]
        self.fingertip_ids = np.array([
            self.model.body_id(b) for b in
            ("index_link_3", "middle_link_3", "ring_link_3", "thumb_link_3")])
        self.net_torque_bodies = tuple(int(b) for b in self.fingertip_ids)

    def _full_state(self, state, task):
        """88-dim: dof pos/vel/force + object + goal (+16 actions);
        no fingertip tail (allegro_hand.py:513-535)."""
        B = state.q.shape[0]
        nf7 = 7 * self.model.n_floating
        nf6 = 6 * self.model.n_floating
        jq = state.q[:, nf7:]
        jqd = state.qd[:, nf6:]
        obj_pos, obj_rot, obj_lin, obj_ang = self._object_state(state)
        return jnp.concatenate([
            _unscale(jq, self.dof_lower, self.dof_upper),
            self.vel_obs_scale * jqd,
            self.ft_obs_scale * self._dof_force_estimate(state, task),
            obj_pos, obj_rot, obj_lin, self.vel_obs_scale * obj_ang,
            jnp.asarray(self.goal_pos) * jnp.ones((B, 3)), task.goal_rot,
            jax.vmap(Q.mul)(obj_rot, jax.vmap(Q.conj)(task.goal_rot)),
            task.actions,
        ], axis=-1)

    def _observations(self, state, t, obj_pos, obj_rot, obj_lin, obj_ang,
                      quat_diff):
        B = state.q.shape[0]
        nf7 = 7 * self.model.n_floating
        nf6 = 6 * self.model.n_floating
        jq = state.q[:, nf7:]
        jqd = state.qd[:, nf6:]
        goal_pos = jnp.asarray(self.goal_pos)
        if self.obs_type == "full_no_vel":   # 50 (:451-463)
            return jnp.concatenate([
                _unscale(jq, self.dof_lower, self.dof_upper),
                obj_pos, obj_rot, goal_pos * jnp.ones((B, 3)), t.goal_rot,
                quat_diff, t.actions], axis=-1)
        if self.obs_type == "full":          # 72 (:465-480)
            return jnp.concatenate([
                _unscale(jq, self.dof_lower, self.dof_upper),
                self.vel_obs_scale * jqd,
                obj_pos, obj_rot, obj_lin, self.vel_obs_scale * obj_ang,
                goal_pos * jnp.ones((B, 3)), t.goal_rot, quat_diff,
                t.actions], axis=-1)
        return self._full_state(state, t)    # 88
