"""Cartpole task — parity with `/root/reference/isaacgymenvs/tasks/cartpole.py`.

Spec mapping:
- obs = [cart_pos, cart_vel, pole_angle, pole_vel]   (cartpole.py:141-151 impl.)
- action: 1 effort on the slider scaled by maxEffort (cartpole.py:169-173)
- reward = 1 - pole_angle^2 - 0.01|cart_vel| - 0.005|pole_vel|; -2 on reset
  conditions (cartpole.py:194-210)
- reset when |cart_pos| > resetDist or |pole_angle| > pi/2 or timeout 500
- reset state: dof pos ~ U(-0.1, 0.1), dof vel ~ U(-0.25, 0.25)
  (cartpole.py:153-158)
"""
from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp

from thormang_isaacgym_tpu.engine.env import Task
from thormang_isaacgym_tpu.models import load_urdf
from thormang_isaacgym_tpu.ops.sim import Controls, SimParams

_ASSET = os.path.join(os.path.dirname(__file__), "..", "..", "assets", "cartpole.urdf")


class Cartpole(Task):
    num_obs = 4
    num_actions = 1
    max_episode_length = 500

    def __init__(self, num_envs: int = 512, seed: int = 42,
                 reset_dist: float = 3.0, max_effort: float = 400.0, **_):
        super().__init__(num_envs, seed)
        self.reset_dist = reset_dist
        self.max_effort = max_effort
        model = load_urdf(_ASSET, fix_base_link=True)
        # effort drive on slider, free pole (cartpole.py:115-119)
        import numpy as np
        d = model._defaults
        d["drive_mode"] = np.array([3, 0], dtype=np.int32)
        self.model = model
        self.slider = model.dof_id("slider_to_cart")
        self.pole = model.dof_id("cart_to_pole")
        self.sim_params = SimParams(dt=1.0 / 60.0, substeps=2, gravity=(0.0, 0.0, -9.81))

    def default_task_state(self, key):
        return ()

    def reset_fn(self, key, params, task):
        k1, k2 = jax.random.split(key)
        q = 0.2 * (jax.random.uniform(k1, (self.model.nq,)) - 0.5)
        qd = 0.5 * (jax.random.uniform(k2, (self.model.nv,)) - 0.5)
        return q, qd, params, task

    def pre_physics(self, state, actions):
        B = actions.shape[0]
        effort = jnp.zeros((B, self.model.nj)).at[:, self.slider].set(
            actions[:, 0] * self.max_effort)
        ctrl = Controls(jnp.zeros((B, self.model.nj)), jnp.zeros((B, self.model.nj)), effort)
        wrench = jnp.zeros((B, self.model.nb, 6))
        return ctrl, wrench, state.task

    def post_physics(self, state, prev_task):
        cart_pos = state.q[:, self.slider]
        cart_vel = state.qd[:, self.slider]
        pole_angle = state.q[:, self.pole]
        pole_vel = state.qd[:, self.pole]
        obs = jnp.stack([cart_pos, cart_vel, pole_angle, pole_vel], axis=-1)
        reward = 1.0 - pole_angle**2 - 0.01 * jnp.abs(cart_vel) - 0.005 * jnp.abs(pole_vel)
        out = (jnp.abs(cart_pos) > self.reset_dist) | (jnp.abs(pole_angle) > jnp.pi / 2)
        reward = jnp.where(out, -2.0, reward)
        return obs, reward, out.astype(jnp.float32), prev_task, dict(state.metrics)
