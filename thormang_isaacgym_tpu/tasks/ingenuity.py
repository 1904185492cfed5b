"""Ingenuity — Mars helicopter hovering to a moving target.

Parity with `/root/reference/isaacgymenvs/tasks/ingenuity.py` +
`cfg/task/Ingenuity.yaml`. The reference builds its copter procedurally
(chassis box half-size 0.06 density 50, two coaxial rotor disks r=0.15
t=0.01 density 1000 separated 0.025, rotors on LOCKED hinges — physically
rigid, :125-260); same recipe here, with the rotor attachment points kept as
thrust sites on the merged body.

Spec mapping:
- Mars gravity -3.721 (:115), dt 0.01, episode 2000
- obs (13): [target - pos (3), root quat (4), linvel/2 (3), angvel (3)]
  (:391-396)
- actions (6): per-rotor force vectors: vertical = clamp(a*2000) * dt,
  lateral = vertical * clamp(a_xy, +/-0.2), applied in the BODY frame at
  the rotor sites (apply_rigid_body_force_tensors LOCAL_SPACE, :340-362)
- reward: pos 1/(1+d^2) * (1 + up 5/(1+tilt^2) + spin 1/(1+w_z^2))
  (:414-443); die at dist>8 or z<0.5
- reset: spawn (±1.5, ±1.5, 1 + U(-0.2,1.5)) (:300-315); target resampled
  every 500 steps to xy ±5, z in (1,2) (:288-294, :327)
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from thormang_isaacgym_tpu.core import quat as Q
from thormang_isaacgym_tpu.engine.env import Task
from thormang_isaacgym_tpu.models import load_urdf
from thormang_isaacgym_tpu.ops.kinematics import split_q
from thormang_isaacgym_tpu.ops.sim import Controls, SimParams

ROTOR_SEP = 0.025      # :189
THRUST_LIMIT = 2000.0  # :91
LATERAL_FRAC = 0.2     # :92


def make_ingenuity_urdf() -> str:
    cs = 0.06
    m_ch = 50.0 * (2 * cs) ** 3
    i_ch = m_ch * (2 * cs) ** 2 / 6
    rr, rt = 0.15, 0.01
    m_r = 1000.0 * np.pi * rr * rr * rt
    i_rz = 0.5 * m_r * rr * rr
    i_rx = m_r * (3 * rr * rr + rt * rt) / 12
    rotors = "".join(f"""
  <joint name="rotor_joint_{i}" type="fixed">
    <parent link="chassis"/><child link="rotor_{i}"/>
    <origin xyz="0 0 {i * ROTOR_SEP}"/>
  </joint>
  <link name="rotor_{i}">
    <inertial><mass value="{m_r:.4f}"/>
      <inertia ixx="{i_rx:.5f}" iyy="{i_rx:.5f}" izz="{i_rz:.5f}" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision><geometry><cylinder radius="{rr}" length="{rt}"/></geometry></collision>
  </link>""" for i in range(2))
    return f"""
<robot name="ingenuity">
  <link name="chassis">
    <inertial><mass value="{m_ch:.4f}"/>
      <inertia ixx="{i_ch:.5f}" iyy="{i_ch:.5f}" izz="{i_ch:.5f}" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision><geometry><box size="{2*cs} {2*cs} {2*cs}"/></geometry></collision>
  </link>{rotors}
</robot>"""


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class IngenuityTaskState:
    target: jnp.ndarray    # (B, 3) hover target


class Ingenuity(Task):
    num_obs = 13
    num_actions = 6
    max_episode_length = 2000

    def __init__(self, num_envs: int = 4096, seed: int = 42, **_):
        super().__init__(num_envs, seed)
        self.model = load_urdf(make_ingenuity_urdf())
        self.rotor_sites = [self.model.sites[f"rotor_{i}"] for i in range(2)]
        self.sim_params = SimParams(
            dt=0.01, substeps=2, gravity=(0.0, 0.0, -3.721),
            contact_stiffness=1.0e4, contact_damping=300.0)
        self.dt = self.sim_params.dt

    def _sample_target(self, key):
        kx, kz = jax.random.split(key)
        xy = jax.random.uniform(kx, (2,), minval=-5.0, maxval=5.0)
        z = jax.random.uniform(kz, (), minval=1.0, maxval=2.0)
        return jnp.concatenate([xy, z[None]])

    def default_task_state(self, key):
        t = jax.vmap(self._sample_target)(jax.random.split(key, self.num_envs))
        return IngenuityTaskState(t)

    def reset_fn(self, key, params, task):
        k1, k2 = jax.random.split(key)
        dx = jax.random.uniform(k1, (3,),
                                minval=jnp.asarray([-1.5, -1.5, -0.2]),
                                maxval=jnp.asarray([1.5, 1.5, 1.5]))
        pos = jnp.asarray([0.0, 0.0, 1.0]) + dx
        q = jnp.concatenate([pos, jnp.asarray([1.0, 0, 0, 0])])
        qd = jnp.zeros(self.model.nv)
        return q, qd, params, IngenuityTaskState(self._sample_target(k2))

    def pre_physics(self, state, actions):
        B = actions.shape[0]
        model = self.model
        # per-rotor thrust vectors in the body frame (:343-352)
        def rotor_thrust(a3):
            vert = jnp.clip(a3[..., 2] * THRUST_LIMIT, -THRUST_LIMIT, THRUST_LIMIT)
            tz = self.dt * vert
            lat = tz[..., None] * jnp.clip(a3[..., 0:2], -LATERAL_FRAC, LATERAL_FRAC)
            return jnp.concatenate([lat, tz[..., None]], axis=-1)

        t0 = rotor_thrust(actions[:, 0:3])
        t1 = rotor_thrust(actions[:, 3:6])
        root_quat = state.q[:, 3:7]
        wrench = jnp.zeros((B, model.nb, 6))
        for (body, site_p, _), t in zip(self.rotor_sites, (t0, t1)):
            f_w = Q.rotate(root_quat, t)
            r_w = Q.rotate(root_quat, jnp.asarray(site_p, jnp.float32))
            tau_w = jnp.cross(r_w, f_w)
            wrench = wrench.at[:, body, 0:3].add(tau_w)
            wrench = wrench.at[:, body, 3:6].add(f_w)
        ctrl = Controls(jnp.zeros((B, model.nj)), jnp.zeros((B, model.nj)),
                        jnp.zeros((B, model.nj)))
        return ctrl, wrench, state.task

    def post_physics(self, state, prev_task):
        pos = state.q[:, 0:3]
        quat = state.q[:, 3:7]
        omega_w = Q.rotate(quat, state.qd[:, 0:3])
        linvel = state.qd[:, 3:6]
        # target resample every 500 steps (:327-330)
        due = (state.progress % 500) == 0
        keys = jax.vmap(lambda e, p: jax.random.fold_in(
            jax.random.fold_in(state.key, e), p))(
            state.episode.astype(jnp.uint32), state.progress.astype(jnp.uint32))
        new_t = jax.vmap(self._sample_target)(keys)
        target = jnp.where(due[:, None] & (state.progress > 0)[:, None],
                           new_t, prev_task.target)

        obs = jnp.concatenate([
            target - pos, quat, linvel / 2.0, omega_w], axis=-1)

        d = jnp.linalg.norm(target - pos, axis=-1)
        pos_reward = 1.0 / (1.0 + d * d)
        up = Q.rotate(quat, jnp.asarray([0.0, 0, 1.0]))
        tilt = jnp.abs(1.0 - up[:, 2])
        up_reward = 5.0 / (1.0 + tilt * tilt)
        spin = jnp.abs(omega_w[:, 2])
        spin_reward = 1.0 / (1.0 + spin * spin)
        reward = pos_reward + pos_reward * (up_reward + spin_reward)

        die = (d > 8.0) | (pos[:, 2] < 0.5)
        metrics = dict(state.metrics)
        metrics["target_dist"] = d
        return obs, reward, die.astype(jnp.float32), \
            IngenuityTaskState(target), metrics
