"""MA_OP3 — two OP3 humanoids carrying a table (multi-agent).

Parity with `/root/reference/isaacgymenvs/tasks/MA_OP3.py` + the MA buffer
shapes of `tasks/base/multi_vec_task.py:102-125`: obs (B, 2, 88), rewards
(B, 2), shared per-env reset. Scene: two PD-driven OP3s facing each other
across a free-standing table (`MA_OP3.py:217-230` poses).

The reference task is WIP: `pre_physics_step` is `pass` (`:309-310`),
`post_physics_step` zeroes the buffers without calling the reward/obs
kernels (`:313-317`), `prev_torques` is never initialized (`:373`), and the
registered obs/action dims are placeholders (`:63-64`). Completed here per
the config's intent:

- actions -> PD position targets around defaultJointAngles
  (`cfg/task/MA_OP3.yaml:46-68`: "target angles when action = 0.0",
  stiffness 1000 / damping 200 `:38-41`)
- per-agent reward `compute_op3_reward` (`MA_OP3.py:543-661`): progress
  toward goal_pos + alive + torque-rate + up + feet air-time + ang-vel-z +
  no-fly + action-rate + hip-sync + table-proximity + gripper-hold (the
  reference computes but EXCLUDES heading_reward and rew_gripper from the
  sum — reproduced); shared objective reward `compute_objective_reward`
  (`:496-547`): table progress/up/height, reset on table tip or drop
- the table-potential bookkeeping (`:411-418` assigns prev <- current and
  never refreshes current — broken) is fixed to the standard
  potential-difference form the agent potentials already use (`:681-685`)
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from thormang_isaacgym_tpu.core import quat as Q
from thormang_isaacgym_tpu.engine.env import Task
from thormang_isaacgym_tpu.models.op3 import (
    BASE_Z, OP3_DOF_NAMES, TABLE_Z, load_op3, load_table, op3_default_dof,
)
from thormang_isaacgym_tpu.models.scene import compose
from thormang_isaacgym_tpu.ops.sim import Controls, SimParams

# reward scales (cfg/task/MA_OP3.yaml learn block; x dt at init,
# MA_OP3.py:80-81)
REW_SCALES = {
    "torque": -0.000025, "up_scale": 0.1, "air_time": 0.5, "no_fly": 0.5,
    "stand_scale": 0.0, "action_rate": -0.01, "syns_hip": -0.00025,
    "heading_scale": 1.0,
}
# leg/gripper DOF subset of the hip-sync penalty (MA_OP3.py:622-624)
_SYNS_IDX = np.array([2, 3, 4, 5, 6, 7, 11, 12, 13, 14, 15, 16, 17, 21])


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MAOP3TaskState:
    actions: jnp.ndarray            # (B, 2, 22)
    last_actions: jnp.ndarray       # (B, 2, 22)
    prev_torques: jnp.ndarray       # (B, 2, 22)
    feet_air_time: jnp.ndarray      # (B, 2, 2)
    last_contacts: jnp.ndarray      # (B, 2, 2) bool-as-float
    potentials: jnp.ndarray         # (B, 2)
    prev_potentials: jnp.ndarray    # (B, 2)
    table_potentials: jnp.ndarray       # (B,)
    prev_table_potentials: jnp.ndarray  # (B,)
    commands: jnp.ndarray           # (B, 3) x/y/yaw command


class MA_OP3(Task):
    num_agents = 2
    max_episode_length = 3012          # episodeLength_s 50 / dt 0.0166
    clip_obs = 5.0
    action_scale = 1.0
    lin_vel_scale = 3.0
    ang_vel_scale = 0.25
    dof_pos_scale = 1.0
    dof_vel_scale = 0.01
    command_y_range = (0.0, 10.0)      # randomCommandVelocityRanges
    kp, kd = 1000.0, 200.0
    effort_limit = 4.1

    def __init__(self, num_envs: int = 8, seed: int = 42,
                 randomize: bool = False, **_):
        super().__init__(num_envs, seed)
        op3 = load_op3(self.kp, self.kd)
        table = load_table()
        # agent poses: facing each other across the table (MA_OP3.py:217-230)
        yaw_pi = (0.0, 0.0, 0.0, 1.0)  # wxyz for yaw=pi
        scene = compose([
            (op3, (-0.31, 0.0, BASE_Z, 1.0, 0.0, 0.0, 0.0), "a0/"),
            (op3, (0.30, 0.0, BASE_Z) + yaw_pi, "a1/"),
            (table, (0.0, 0.0, TABLE_Z, 1.0, 0.0, 0.0, 0.0), "table/"),
        ], name="ma_op3")
        self.model = scene
        self.num_obs = 88
        self.num_actions = len(OP3_DOF_NAMES)
        nd = self.num_actions

        # per-agent DOF / body index maps
        self.agent_dofs = jnp.asarray(np.array(
            [[scene.dof_id(f"a{a}/{n}") for n in OP3_DOF_NAMES]
             for a in range(2)], np.int32))
        self.default_dof = jnp.asarray(np.stack(
            [op3_default_dof(scene, f"a{a}/")[np.asarray(self.agent_dofs[a])]
             for a in range(2)]))  # (2, 22) in agent layout
        self.feet = np.array(
            [[scene.body_id(f"a{a}/{s}_ank_link") for s in ("l", "r")]
             for a in range(2)], np.int32)
        self.grippers = np.array(
            [[scene.body_id(f"a{a}/{s}_gr_link") for s in ("l", "r")]
             for a in range(2)], np.int32)
        # floating-root q offsets: actor order (a0, a1, table)
        self.q_root = [0, 7, 14]
        self.qd_root = [0, 6, 12]

        self.start_quat = jnp.asarray(
            np.array([[1.0, 0, 0, 0], [0.0, 0, 0, 1.0]], np.float32))
        self.inv_start = Q.conj(self.start_quat)
        self.goal_pos = jnp.array([0.0, -10.0, 0.0])   # MA_OP3.py:102
        self.targets = jnp.array([0.0, 10.0, 0.0])     # MA_OP3.py:144
        self.gravity_vec = jnp.array([0.0, 0.0, -1.0])
        self.vec0 = jnp.array([1.0, 0.0, 0.0])
        self.vec1 = jnp.array([0.0, 0.0, 1.0])

        self.sim_params = SimParams(
            dt=0.0166, substeps=3, gravity=(0.0, 0.0, -9.81),
            contact_stiffness=2.0e4, contact_damping=8.0e2,
            friction_vel=0.05, plane_friction=1.0)
        self.dt = self.sim_params.dt
        self.rew = {k: v * self.dt for k, v in REW_SCALES.items()}

    # ------------------------------------------------------------------
    def _roots(self, q, qd):
        """Per-root (pos, quat, v_world, omega_world) stacked (3, ...)."""
        pos = jnp.stack([q[..., o:o + 3] for o in self.q_root], -2)
        quat = jnp.stack([q[..., o + 3:o + 7] for o in self.q_root], -2)
        omega_b = jnp.stack([qd[..., o:o + 3] for o in self.qd_root], -2)
        vel = jnp.stack([qd[..., o + 3:o + 6] for o in self.qd_root], -2)
        omega = Q.rotate(quat, omega_b)
        return pos, quat, vel, omega

    def default_task_state(self, key):
        B = self.num_envs
        z2 = jnp.zeros((B, 2, self.num_actions))
        p = jnp.full((B, 2), -1000.0 / self.dt)
        return MAOP3TaskState(
            actions=z2, last_actions=z2, prev_torques=z2,
            feet_air_time=jnp.zeros((B, 2, 2)),
            last_contacts=jnp.zeros((B, 2, 2)),
            potentials=p, prev_potentials=p,
            table_potentials=jnp.full(B, -1000.0 / self.dt),
            prev_table_potentials=jnp.full(B, -1000.0 / self.dt),
            commands=jnp.zeros((B, 3)))

    def reset_fn(self, key, params, task):
        nd = self.num_actions
        jq = jnp.zeros(self.model.nj)
        for a in range(2):
            jq = jq.at[self.agent_dofs[a]].set(self.default_dof[a])
        roots = []
        for a, (x, quat) in enumerate([(-0.31, (1.0, 0, 0, 0)),
                                       (0.30, (0.0, 0, 0, 1.0))]):
            roots.append(jnp.concatenate(
                [jnp.array([x, 0.0, BASE_Z]), jnp.array(quat)]))
        roots.append(jnp.concatenate(
            [jnp.array([0.0, 0.0, TABLE_Z]), jnp.array([1.0, 0, 0, 0])]))
        q = jnp.concatenate(roots + [jq])
        qd = jnp.zeros(self.model.nv)

        # command resample (MA_OP3.py:472-474; x/yaw ranges are [0,0])
        cy = jax.random.uniform(key, (), minval=self.command_y_range[0],
                                maxval=self.command_y_range[1])
        commands = jnp.array([0.0, 1.0, 0.0]) * cy

        base_xy = jnp.array([[-0.31, 0.0, BASE_Z], [0.30, 0.0, BASE_Z]])
        to_goal = (self.goal_pos[None] - base_xy).at[:, 2].set(0.0)
        pots = -jnp.linalg.norm(to_goal, axis=-1) / self.dt
        to_tgt = (self.targets - jnp.array([0.0, 0.0, TABLE_Z])).at[2].set(0.0)
        tpot = -jnp.linalg.norm(to_tgt) / self.dt

        z2 = jnp.zeros((2, nd))
        return q, qd, params, MAOP3TaskState(
            actions=z2, last_actions=z2, prev_torques=z2,
            feet_air_time=jnp.zeros((2, 2)), last_contacts=jnp.zeros((2, 2)),
            potentials=pots, prev_potentials=pots,
            table_potentials=tpot, prev_table_potentials=tpot,
            commands=commands)

    # ------------------------------------------------------------------
    def pre_physics(self, state, actions):
        B = actions.shape[0]
        nd = self.num_actions
        targets = self.default_dof[None] + self.action_scale * actions
        full = jnp.zeros((B, self.model.nj))
        for a in range(2):
            full = full.at[:, self.agent_dofs[a]].set(targets[:, a])
        ctrl = Controls(full, jnp.zeros_like(full), jnp.zeros_like(full))
        wrench = jnp.zeros((B, self.model.nb, 6))
        task = dataclasses.replace(
            state.task, last_actions=state.task.actions, actions=actions)
        return ctrl, wrench, task

    def post_physics(self, state, prev_task):
        t = prev_task
        B = state.q.shape[0]
        nd = self.num_actions
        pos, quat, vel, omega = self._roots(state.q, state.qd)  # (B,3,...)
        a_pos, a_quat = pos[:, :2], quat[:, :2]
        a_vel, a_omega = vel[:, :2], omega[:, :2]
        table_pos, table_quat = pos[:, 2], quat[:, 2]
        table_vel = vel[:, 2]

        jq = state.q[:, self.model.root_nq:]
        jqd = state.qd[:, self.model.root_nv:]
        dof_pos = jnp.stack([jq[:, self.agent_dofs[a]] for a in range(2)], 1)
        dof_vel = jnp.stack([jqd[:, self.agent_dofs[a]] for a in range(2)], 1)

        # ---- per-agent observations (compute_op3_observations:663-708) ----
        lin_loc = Q.rotate_inv(a_quat, a_vel) * self.lin_vel_scale
        ang_loc = Q.rotate_inv(a_quat, a_omega) * self.ang_vel_scale
        # the reference projects gravity with quat_rotate (not inverse) —
        # reproduced verbatim (MA_OP3.py:697)
        proj_g = Q.rotate(a_quat, jnp.broadcast_to(self.gravity_vec,
                                                   a_quat.shape[:-1] + (3,)))
        dof_scaled = (dof_pos - self.default_dof[None]) * self.dof_pos_scale
        table_pose = jnp.concatenate([table_pos, table_quat], -1)  # (B,7)
        obs = jnp.concatenate([
            lin_loc, ang_loc, proj_g, dof_scaled,
            dof_vel * self.dof_vel_scale, t.actions,
            jnp.broadcast_to(table_pose[:, None], (B, 2, 7)),
            jnp.broadcast_to(table_vel[:, None], (B, 2, 3)),
            jnp.broadcast_to(self.targets, (B, 2, 3)),
        ], axis=-1)

        # ---- potentials ----
        to_goal = (self.goal_pos[None, None] - a_pos).at[..., 2].set(0.0)
        potentials = -jnp.linalg.norm(to_goal, axis=-1) / self.dt
        prev_potentials = t.potentials
        to_tgt = (self.targets[None] - table_pos).at[:, 2].set(0.0)
        table_pot = -jnp.linalg.norm(to_tgt, axis=-1) / self.dt
        prev_table_pot = t.table_potentials

        # ---- contacts ----
        feet_f = state.net_contact[:, self.feet.reshape(-1)].reshape(B, 2, 2, 3)
        grip_f = state.net_contact[:, self.grippers.reshape(-1)].reshape(B, 2, 2, 3)

        # feet air time (MA_OP3.py:319-328)
        contact = (feet_f[..., 2] > 1.1).astype(jnp.float32)
        contact_filt = jnp.maximum(contact, t.last_contacts)
        first_contact = (t.feet_air_time > 0.0) * contact_filt
        air = t.feet_air_time + self.dt
        cmd_on = (jnp.linalg.norm(t.commands[:, :2], axis=-1) > 0.1)
        rew_air = ((air - 0.5) * first_contact).sum(-1) * \
            cmd_on[:, None] * self.rew["air_time"]
        air = air * (1.0 - contact_filt)

        # step / no-fly / gripper (MA_OP3.py:330-358)
        rew_step = jnp.clip(
            jnp.linalg.norm(feet_f, axis=-1) - 450.0, 0.0, None).sum(-1)
        single = ((feet_f[..., 2] > 0.1).sum(-1) == 1)
        rew_no_fly = single.astype(jnp.float32) * self.rew["no_fly"]
        grip_hold = ((grip_f[..., 0, 0] > 0.1) & (grip_f[..., 1, 0] > 0.1))
        rew_grip_hold = grip_hold.astype(jnp.float32)

        # ---- per-agent reward (compute_op3_reward:543-661) ----
        torso_quat = Q.mul(a_quat, self.inv_start[None])
        heading_vec = Q.rotate(torso_quat, jnp.broadcast_to(
            self.vec0, torso_quat.shape[:-1] + (3,)))
        up_vec = Q.rotate(torso_quat, jnp.broadcast_to(
            self.vec1, torso_quat.shape[:-1] + (3,)))
        up_proj = up_vec[..., 2]
        rew_up = jnp.where(up_proj > 0.95, self.rew["up_scale"], 0.0)
        alive = 2.0
        progress = (potentials - prev_potentials) * 5.0
        tq = jnp.clip(self.kp * ((self.default_dof[None]
                                  + self.action_scale * t.actions) - dof_pos)
                      - self.kd * dof_vel,
                      -self.effort_limit, self.effort_limit)
        rew_torque = jnp.abs(t.prev_torques - tq).sum(-1) * self.rew["torque"]
        syns = jnp.abs(dof_pos[..., _SYNS_IDX]
                       - self.default_dof[None][..., _SYNS_IDX]).sum(-1)
        rew_syns = syns * self.rew["syns_hip"]
        rew_action_rate = jnp.square(
            t.last_actions - t.actions).sum(-1) * self.rew["action_rate"]
        rew_stand = jnp.abs(dof_pos - self.default_dof[None]).sum(-1) * \
            (~cmd_on)[:, None] * self.rew["stand_scale"]
        ang_loc_raw = Q.rotate_inv(a_quat, a_omega)
        rew_ang_z = jnp.exp(-jnp.square(self.targets[2]
                                        - ang_loc_raw[..., 2]) / 0.1) * 0.1
        dist_table = jnp.linalg.norm(a_pos - table_pos[:, None], axis=-1)
        rew_dist = jnp.exp(-dist_table / 0.32) * 0.5

        agent_rew = (progress + alive + rew_torque + rew_up + rew_air
                     + rew_ang_z + rew_step + rew_no_fly + rew_stand
                     + rew_action_rate + rew_syns + rew_dist + rew_grip_hold)

        # ---- shared objective (compute_objective_reward:496-547) ----
        t_up = Q.rotate(table_quat, jnp.broadcast_to(
            self.vec1, table_quat.shape[:-1] + (3,)))[..., 2]
        obj_up = jnp.where(t_up > 0.98, 0.1, 0.0)
        obj_height = jnp.square(table_pos[:, 2] - 0.29) * -0.001
        obj_dist = (table_pot - prev_table_pot) * 5.0
        reward = agent_rew + (obj_up + obj_height + obj_dist)[:, None]
        reward = jnp.clip(reward, 0.0, None)

        # ---- resets ----
        fallen = jnp.any(up_proj < 0.90, axis=-1)
        too_far = jnp.any(dist_table > 0.40, axis=-1)
        table_tipped = t_up < 0.90
        table_dropped = table_pos[:, 2] < 0.25
        done = (fallen | too_far | table_tipped | table_dropped) \
            & (state.progress > 1)

        task = dataclasses.replace(
            t, prev_torques=tq, feet_air_time=air,
            last_contacts=contact,
            potentials=potentials, prev_potentials=potentials,
            table_potentials=table_pot, prev_table_potentials=table_pot)
        metrics = dict(state.metrics)
        metrics["table_height"] = table_pos[:, 2]
        metrics["grip_hold"] = rew_grip_hold.mean(-1)
        return obs, reward, done.astype(jnp.float32), task, metrics
