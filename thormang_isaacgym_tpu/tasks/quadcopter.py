"""Quadcopter — four tilt-rotor arms hovering to (0, 0, 1).

Parity with `/root/reference/isaacgymenvs/tasks/quadcopter.py` +
`cfg/task/Quadcopter.yaml`. The copter is built procedurally (:122-205):
chassis cylinder r=0.1 t=0.03 density 50; four arms at 45/135/225/315 deg,
each a pitch hinge (axis y, ±30 deg) -> arm sphere r=0.01 -> roll hinge
(axis x, ±30 deg) -> rotor disk r=0.04 t=0.01 density 1000. 8 DOFs, thrust
applied along each rotor's local z.

Spec mapping:
- dt 0.01, episode 500
- obs (24): [(target - pos)/3 (3), quat (4), linvel/2 (3), angvel (3),
  dof_pos (8)] (:377-386; the last root-position slot trio is part of the
  24 but written from root_positions — kept)
- actions (12): dof target rates (8): targets += dt * 8pi * a, clamped to
  ±30 deg; thrust rates (4): thrusts += dt * 200 * a, clamped [0, 2],
  applied along rotor local z (:303-332)
- reward: pos 1/(1+d^2) * (1 + up + spin) with d to (0,0,1) (:388-418);
  die at d>3 or z<0.3
- reset: root (±1.5, ±1.5, 1+U(-0.2,1.5)); dof pos U(-0.2, 0.2) (:280-300)
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from thormang_isaacgym_tpu.core import quat as Q
from thormang_isaacgym_tpu.engine.env import Task
from thormang_isaacgym_tpu.models import load_urdf
from thormang_isaacgym_tpu.models.robot import DRIVE_POS
from thormang_isaacgym_tpu.ops.kinematics import forward_kinematics
from thormang_isaacgym_tpu.ops.sim import Controls, SimParams

ROTOR_ANGLES = [0.25 * math.pi, 0.75 * math.pi, 1.25 * math.pi, 1.75 * math.pi]
DOF_LIMIT = math.radians(30.0)


def make_quadcopter_urdf() -> str:
    ch_r, ch_t = 0.1, 0.03
    m_ch = 50.0 * np.pi * ch_r ** 2 * ch_t
    i_ch = 0.25 * m_ch * ch_r ** 2
    arm_r = 0.01
    m_arm = 200.0 * 4 / 3 * np.pi * arm_r ** 3
    rot_r, rot_t = 0.04, 0.01
    m_rot = 1000.0 * np.pi * rot_r ** 2 * rot_t
    i_rz = 0.5 * m_rot * rot_r ** 2
    i_rx = m_rot * (3 * rot_r ** 2 + rot_t ** 2) / 12
    arm_off = ch_r + 0.25 * arm_r
    rot_off = rot_r + 0.25 * arm_r
    parts = [f"""
  <link name="chassis">
    <inertial><mass value="{m_ch:.4f}"/>
      <inertia ixx="{i_ch:.5f}" iyy="{i_ch:.5f}" izz="{2*i_ch:.5f}" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision><geometry><cylinder radius="{ch_r}" length="{ch_t}"/></geometry></collision>
  </link>"""]
    for i, ang in enumerate(ROTOR_ANGLES):
        c, s = math.cos(ang), math.sin(ang)
        parts.append(f"""
  <joint name="rotor_pitch{i}" type="revolute">
    <parent link="chassis"/><child link="rotor_arm{i}"/>
    <origin xyz="{arm_off*c:.5f} {arm_off*s:.5f} 0" rpy="0 0 {ang:.6f}"/>
    <axis xyz="0 1 0"/>
    <limit lower="{-DOF_LIMIT:.5f}" upper="{DOF_LIMIT:.5f}" effort="50" velocity="50"/>
  </joint>
  <link name="rotor_arm{i}">
    <inertial><mass value="{m_arm:.6f}"/>
      <inertia ixx="1e-6" iyy="1e-6" izz="1e-6" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision><geometry><sphere radius="{arm_r}"/></geometry></collision>
  </link>
  <joint name="rotor_roll{i}" type="revolute">
    <parent link="rotor_arm{i}"/><child link="rotor{i}"/>
    <origin xyz="{rot_off:.5f} 0 0"/>
    <axis xyz="1 0 0"/>
    <limit lower="{-DOF_LIMIT:.5f}" upper="{DOF_LIMIT:.5f}" effort="50" velocity="50"/>
  </joint>
  <link name="rotor{i}">
    <inertial><mass value="{m_rot:.5f}"/>
      <inertia ixx="{i_rx:.7f}" iyy="{i_rx:.7f}" izz="{i_rz:.7f}" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision><geometry><cylinder radius="{rot_r}" length="{rot_t}"/></geometry></collision>
  </link>""")
    return "<robot name=\"quadcopter\">" + "".join(parts) + "\n</robot>"


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class QuadTaskState:
    dof_targets: jnp.ndarray   # (B, 8)
    thrusts: jnp.ndarray       # (B, 4)


class Quadcopter(Task):
    num_obs = 24
    num_actions = 12
    max_episode_length = 500

    def __init__(self, num_envs: int = 4096, seed: int = 42, **_):
        super().__init__(num_envs, seed)
        m = load_urdf(make_quadcopter_urdf())
        d = m._defaults
        d["drive_mode"] = np.full(m.nj, DRIVE_POS, np.int32)
        d["drive_stiffness"] = np.full(m.nj, 1000.0, np.float32)
        d["drive_damping"] = np.full(m.nj, 20.0, np.float32)
        self.model = m
        # dof order: pitch0..3 (depth 1) then roll0..3 (depth 2) after BFS;
        # map reference interleaved order [p0, r0, p1, r1, ...]
        self.dof_order = np.array(
            [m.dof_id(f"rotor_pitch{i}") for i in range(4)]
            + [m.dof_id(f"rotor_roll{i}") for i in range(4)])
        ref_order = []
        for i in range(4):
            ref_order += [m.dof_id(f"rotor_pitch{i}"), m.dof_id(f"rotor_roll{i}")]
        self.ref_dof_order = np.array(ref_order)
        self.rotor_bodies = np.array([m.body_id(f"rotor{i}") for i in range(4)])
        self.sim_params = SimParams(
            dt=0.01, substeps=2, gravity=(0.0, 0.0, -9.81),
            contact_stiffness=1.0e4, contact_damping=300.0)
        self.dt = self.sim_params.dt

    def default_task_state(self, key):
        B = self.num_envs
        return QuadTaskState(jnp.zeros((B, 8)), jnp.zeros((B, 4)))

    def reset_fn(self, key, params, task):
        k1, k2 = jax.random.split(key)
        dx = jax.random.uniform(k1, (3,),
                                minval=jnp.asarray([-1.5, -1.5, -0.2]),
                                maxval=jnp.asarray([1.5, 1.5, 1.5]))
        pos = jnp.asarray([0.0, 0.0, 1.0]) + dx
        jq = jax.random.uniform(k2, (self.model.nj,), minval=-0.2, maxval=0.2)
        q = jnp.concatenate([pos, jnp.asarray([1.0, 0, 0, 0]), jq])
        qd = jnp.zeros(self.model.nv)
        return q, qd, params, QuadTaskState(jq[jnp.asarray(self.ref_dof_order)],
                                            jnp.zeros(4))

    def pre_physics(self, state, actions):
        B = actions.shape[0]
        model = self.model
        t = state.task
        targets = t.dof_targets + self.dt * 8 * jnp.pi * actions[:, 0:8]
        targets = jnp.clip(targets, -DOF_LIMIT, DOF_LIMIT)
        thrusts = t.thrusts + self.dt * 200.0 * actions[:, 8:12]
        thrusts = jnp.clip(thrusts, 0.0, 2.0)

        tpos = jnp.zeros((B, model.nj))
        tpos = tpos.at[:, jnp.asarray(self.ref_dof_order)].set(targets)
        ctrl = Controls(tpos, jnp.zeros((B, model.nj)), jnp.zeros((B, model.nj)))

        # thrust along each rotor's local z (LOCAL_SPACE forces, :330-332)
        frames = jax.vmap(lambda q, qd: forward_kinematics(model, q, qd))(
            state.q, state.qd)
        wrench = jnp.zeros((B, model.nb, 6))
        for k, body in enumerate(self.rotor_bodies):
            zdir = Q.rotate(frames.quat[:, body], jnp.asarray([0.0, 0, 1.0]))
            f_w = thrusts[:, k:k + 1] * zdir
            wrench = wrench.at[:, body, 3:6].add(f_w)
        return ctrl, wrench, QuadTaskState(targets, thrusts)

    def post_physics(self, state, prev_task):
        nf = 7
        pos = state.q[:, 0:3]
        quat = state.q[:, 3:7]
        omega_w = Q.rotate(quat, state.qd[:, 0:3])
        linvel = state.qd[:, 3:6]
        jq = state.q[:, nf:][:, jnp.asarray(self.ref_dof_order)]
        target = jnp.asarray([0.0, 0.0, 1.0])
        obs = jnp.concatenate([
            (target - pos) / 3.0, quat, linvel / 2.0, omega_w, jq,
            pos], axis=-1)[:, :self.num_obs]

        d = jnp.linalg.norm(target - pos, axis=-1)
        pos_reward = 1.0 / (1.0 + d * d)
        up = Q.rotate(quat, jnp.asarray([0.0, 0, 1.0]))
        tilt = jnp.abs(1.0 - up[:, 2])
        up_reward = 1.0 / (1.0 + tilt * tilt)
        spin = jnp.abs(omega_w[:, 2])
        spin_reward = 1.0 / (1.0 + spin * spin)
        reward = pos_reward + pos_reward * (up_reward + spin_reward)

        die = (d > 3.0) | (pos[:, 2] < 0.3)
        metrics = dict(state.metrics)
        metrics["target_dist"] = d
        return obs, reward, die.astype(jnp.float32), prev_task, metrics
