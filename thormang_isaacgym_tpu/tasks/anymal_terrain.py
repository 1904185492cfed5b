"""AnymalTerrain — rough-terrain locomotion with curriculum (the
legged-locomotion template).

Parity with `/root/reference/isaacgymenvs/tasks/anymal_terrain.py` +
`cfg/task/AnymalTerrain.yaml` (same authored ANYmal-C-like morphology as
tasks/anymal.py; the anymal_minimal.urdf asset is absent from the snapshot).

Spec mapping (reference file:line):
- terrain: 10 levels x 20 types procedural grid, 8x8 m tiles, curriculum
  rows = difficulty (Terrain class :541-671 -> engine/terrain.TerrainGrid);
  heightfield contact instead of trimesh
- obs (188): [lin_vel*2, ang_vel*0.25, projected_gravity,
  commands*(2,2,0.25), dof_pos_scaled, dof_vel*0.05, height scan (140,
  clip(base_z - 0.5 - h, -1, 1)*5), actions]   (:296-308)
- height scan: 14x10 grid x in +-0.8, y in +-0.5 (no center line),
  yaw-rotated (init_height_points :501-511, get_heights :513-536)
- control: PD torque Kp 80 Kd 2 at decimation 4, action_scale 0.5
  (:439-449); torque clip +-80
- 13-term reward (:313-380) with yaml scales (*dt); clip >= 0 before the
  termination term
- curriculum promotion/demotion on reset (update_terrain_level :425-433)
- random pushes every pushInterval_s: root xy velocity set to U(-1,1)
  (push_robots :435-437)
- termination: base contact, or knee contact when not allowed, or timeout
  (check_termination :293-299); commands zeroed when |cmd_xy| < 0.25
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from thormang_isaacgym_tpu.core import quat as Q
from thormang_isaacgym_tpu.engine.terrain import TerrainGrid
from thormang_isaacgym_tpu.tasks.anymal import Anymal, AnymalTaskState, _LEGS


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AnymalTerrainTaskState:
    commands: jnp.ndarray       # (B, 3)
    actions: jnp.ndarray        # (B, 12)
    last_actions: jnp.ndarray   # (B, 12)
    last_dof_vel: jnp.ndarray   # (B, 12)
    feet_air_time: jnp.ndarray  # (B, 4)
    terrain_level: jnp.ndarray  # (B,) int32
    terrain_type: jnp.ndarray   # (B,) int32
    origin: jnp.ndarray         # (B, 3) spawn origin on the grid


class AnymalTerrain(Anymal):
    num_obs = 188
    clip_obs = 5.0   # AnymalTerrain.yaml clipObservations

    # control (AnymalTerrain.yaml:43-49)
    Kp = 80.0
    Kd = 2.0
    action_scale = 0.5
    # reward scales (AnymalTerrain.yaml:79-94)
    rew_scales = dict(
        termination=0.0, lin_vel_xy=1.0, lin_vel_z=-4.0, ang_vel_xy=-0.05,
        ang_vel_z=0.5, orient=-0.0, torque=-0.00002, joint_acc=-0.0005,
        base_height=-0.0, air_time=1.0, collision=-0.25, stumble=-0.0,
        action_rate=-0.01, hip=-0.0,
    )
    # normalization (AnymalTerrain.yaml:96-101)
    lin_vel_scale = 2.0
    ang_vel_scale = 0.25
    dof_pos_scale = 1.0
    dof_vel_scale = 0.05
    height_meas_scale = 5.0
    command_x_range = (-1.0, 1.0)
    command_y_range = (-1.0, 1.0)
    command_yaw_range = (-3.14, 3.14)
    push_interval_s = 15.0
    allow_knee_contacts = True
    max_init_level = 0

    def __init__(self, num_envs: int = 4096, seed: int = 42,
                 curriculum: bool = True, num_levels: int = 10,
                 num_types: int = 20, **kw):
        super().__init__(num_envs, seed, **kw)
        self.curriculum = curriculum
        # control period: decimation 4 x sim dt 0.005 (AnymalTerrain.yaml)
        self.sim_params = dataclasses.replace(
            self.sim_params, dt=0.02, substeps=4)
        self.dt = self.sim_params.dt
        self.max_episode_length_s = 20.0
        self.max_episode_length = int(self.max_episode_length_s / self.dt + 0.5)
        self.push_interval = int(self.push_interval_s / self.dt + 0.5)

        self.grid = TerrainGrid(num_levels=num_levels, num_types=num_types,
                                cells=80, horizontal_scale=0.1,
                                vertical_scale=1.0, seed=seed)
        self.num_levels = num_levels
        self.num_types = num_types
        self.env_origins = jnp.asarray(self.grid.env_origins)  # (L, T, 3)
        self.tile_length = 8.0

        # height-scan grid (init_height_points, :501-511)
        ys = 0.1 * np.array([-5, -4, -3, -2, -1, 1, 2, 3, 4, 5], np.float32)
        xs = 0.1 * np.array([-8, -7, -6, -5, -4, -3, -2, 2, 3, 4, 5, 6, 7, 8], np.float32)
        gx, gy = np.meshgrid(xs, ys, indexing="ij")
        self.height_points = jnp.asarray(
            np.stack([gx.ravel(), gy.ravel(), np.zeros(gx.size)], axis=-1))  # (140, 3)
        self.num_height_points = int(gx.size)

        self.feet = [self.model.body_id(f"{n}_SHANK") for n, _, _ in _LEGS]
        self.hips_dofs = [self.model.dof_id(f"{n}_HAA") for n, _, _ in _LEGS]
        # clustered (patch + matmul) sampler: the scan's 140 points span
        # 1.6 m = 16 cells << 32, and a plain gather inside the training
        # loop is ~16x slower on TPU (see Heightfield.clustered_fn)
        self._height_fn = self.grid.field.clustered_fn(patch_cells=32)

    # engine hook: heightfield ground — the Heightfield object itself, so
    # the fused kernel can take it (per-candidate local-plane terrain
    # contact, ops/fused.py); the XLA path derives bilinear height + sloped
    # normals from the same object
    def ground_height_fn(self):
        return self.grid.field

    # ------------------------------------------------------------------
    def default_task_state(self, key):
        B = self.num_envs
        z12 = jnp.zeros((B, 12))
        return AnymalTerrainTaskState(
            commands=jnp.zeros((B, 3)), actions=z12, last_actions=z12,
            last_dof_vel=z12, feet_air_time=jnp.zeros((B, 4)),
            # start at maxInitMapLevel (=0); terrain types round-robin
            terrain_level=jnp.zeros(B, jnp.int32),
            terrain_type=jnp.arange(B, dtype=jnp.int32) % self.num_types,
            origin=jnp.zeros((B, 3)),
        )

    def reset_fn(self, key, params, task):
        ks = jax.random.split(key, 6)
        nj = self.model.nj
        jq = self.default_dof_pos * jax.random.uniform(ks[0], (nj,), minval=0.5, maxval=1.5)
        jqd = jax.random.uniform(ks[1], (nj,), minval=-0.1, maxval=0.1)

        # curriculum terrain level assignment (update_terrain_level :425-433)
        # promotion/demotion is handled in post_physics by flagging desired
        # level into task.terrain_level before reset; here we just place the
        # env at its (level, type) origin with a random offset.
        level = task.terrain_level
        ttype = task.terrain_type
        origin = self.env_origins[level, ttype]
        xy_off = jax.random.uniform(ks[2], (2,), minval=-0.5, maxval=0.5)
        pos = jnp.array([origin[0], origin[1], origin[2] + self.base_init_z]) \
            + jnp.concatenate([xy_off, jnp.zeros(1)])

        q = jnp.concatenate([pos, jnp.array([1.0, 0, 0, 0]), jq])
        qd = jnp.concatenate([jnp.zeros(6), jqd])

        cmd = self._sample_terrain_commands(ks[3])
        task = dataclasses.replace(
            task, commands=cmd, actions=jnp.zeros(12), last_actions=jnp.zeros(12),
            last_dof_vel=jnp.zeros(12), feet_air_time=jnp.zeros(4), origin=pos)
        return q, qd, params, task

    def _sample_terrain_commands(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        cx = jax.random.uniform(k1, (), minval=self.command_x_range[0], maxval=self.command_x_range[1])
        cy = jax.random.uniform(k2, (), minval=self.command_y_range[0], maxval=self.command_y_range[1])
        cw = jax.random.uniform(k3, (), minval=self.command_yaw_range[0], maxval=self.command_yaw_range[1])
        cmd = jnp.stack([cx, cy, cw])
        # zero-out small commands (:314 in reset_idx)
        return cmd * (jnp.linalg.norm(cmd[:2]) > 0.25)

    # ------------------------------------------------------------------
    def pre_physics(self, state, actions):
        ctrl, wrench, task = super().pre_physics(state, actions)
        t = state.task
        B = actions.shape[0]
        # random pushes every push_interval (push_robots :435-437). The
        # reference writes root velocity directly; an equivalent impulse is
        # applied as a one-control-step wrench F = m dv / dt on the base.
        push_now = (state.progress % self.push_interval) == (self.push_interval - 1)
        key = jax.random.fold_in(state.key, 311)
        dv = jax.random.uniform(key, (B, 2), minval=-1.0, maxval=1.0)
        base_mass = state.params.body_mass[:, 0]
        F = base_mass[:, None] * dv / self.dt * push_now[:, None]
        wrench = wrench.at[:, 0, 3:5].add(F)
        task = dataclasses.replace(
            task, last_actions=t.actions, last_dof_vel=state.qd[:, 6:],
            commands=t.commands, feet_air_time=t.feet_air_time,
            terrain_level=t.terrain_level, terrain_type=t.terrain_type,
            origin=t.origin)
        return ctrl, wrench, task

    def _height_scan(self, state):
        """Yaw-rotated 140-point height lookup (get_heights :513-536).

        TPU layout note: the whole scan runs as (B, 140) 2-D elementwise
        math + one bilinear gather set. The obvious formulation — quat
        rotation of a (B, 140, 3) point cloud — puts 3 in the lane
        dimension (42/128 of every vreg wasted) and costs ~24 ms at 4096
        envs on a v5e; this one is ~1.5 ms for identical results. The
        yaw-only rotation (quat_apply_yaw, gogoro_new.py:798-803) of the
        quat (w, 0, 0, z) is the plane rotation by alpha with
        cos(alpha) = (w^2 - z^2) / (w^2 + z^2), sin = 2wz / (w^2 + z^2)."""
        quat = state.q[:, 3:7]
        w, z = quat[:, 0], quat[:, 3]
        n2 = w * w + z * z + 1e-9
        c = ((w * w - z * z) / n2)[:, None]
        s = (2.0 * w * z / n2)[:, None]
        px = self.height_points[None, :, 0]          # (1, 140)
        py = self.height_points[None, :, 1]
        x = state.q[:, 0:1] + c * px - s * py
        y = state.q[:, 1:2] + s * px + c * py
        return self._height_fn(x, y)                 # (B, 140)

    def post_physics(self, state, prev_task):
        t = prev_task
        B = state.q.shape[0]
        quat = state.q[:, 3:7]
        base_lin_vel = Q.rotate_inv(quat, state.qd[:, 3:6])  # world -> base frame
        base_ang_vel = state.qd[:, 0:3]
        jq = state.q[:, 7:]
        jqd = state.qd[:, 6:]
        projected_gravity = Q.rotate_inv(quat, jnp.array([0.0, 0.0, -1.0]))
        torques = self._torques(state, t)
        rs = {k: v * self.dt for k, v in self.rew_scales.items()}

        heights = self._height_scan(state)
        rel_heights = jnp.clip(state.q[:, 2:3] - 0.5 - heights, -1.0, 1.0) * self.height_meas_scale
        cmd_scale = jnp.array([self.lin_vel_scale, self.lin_vel_scale, self.ang_vel_scale])

        obs = jnp.concatenate([
            base_lin_vel * self.lin_vel_scale,
            base_ang_vel * self.ang_vel_scale,
            projected_gravity,
            t.commands * cmd_scale[None],
            (jq - self.default_dof_pos[None]) * self.dof_pos_scale,
            jqd * self.dof_vel_scale,
            rel_heights,
            t.actions,
        ], axis=-1)

        # ---- 13-term reward (:313-380) ----
        lin_vel_err = jnp.sum((t.commands[:, :2] - base_lin_vel[:, :2]) ** 2, axis=1)
        ang_vel_err = (t.commands[:, 2] - base_ang_vel[:, 2]) ** 2
        r = {}
        r["lin_vel_xy"] = jnp.exp(-lin_vel_err / 0.25) * rs["lin_vel_xy"]
        r["ang_vel_z"] = jnp.exp(-ang_vel_err / 0.25) * rs["ang_vel_z"]
        r["lin_vel_z"] = base_lin_vel[:, 2] ** 2 * rs["lin_vel_z"]
        r["ang_vel_xy"] = jnp.sum(base_ang_vel[:, :2] ** 2, axis=1) * rs["ang_vel_xy"]
        r["orient"] = jnp.sum(projected_gravity[:, :2] ** 2, axis=1) * rs["orient"]
        r["base_height"] = (state.q[:, 2] - 0.52) ** 2 * rs["base_height"]
        r["torque"] = jnp.sum(torques**2, axis=1) * rs["torque"]
        r["joint_acc"] = jnp.sum((t.last_dof_vel - jqd) ** 2, axis=1) * rs["joint_acc"]
        knee_contact = jnp.linalg.norm(state.net_contact[:, self.knees], axis=-1) > 1.0
        r["collision"] = jnp.sum(knee_contact, axis=1) * rs["collision"]
        feet_f = state.net_contact[:, self.feet]
        stumble = (jnp.linalg.norm(feet_f[..., :2], axis=-1) > 5.0) & (jnp.abs(feet_f[..., 2]) < 1.0)
        r["stumble"] = jnp.sum(stumble, axis=1) * rs["stumble"]
        r["action_rate"] = jnp.sum((t.last_actions - t.actions) ** 2, axis=1) * rs["action_rate"]

        contact = feet_f[..., 2] > 1.0
        air = t.feet_air_time
        first_contact = (air > 0.0) & contact
        air = air + self.dt
        r_air = jnp.sum((air - 0.5) * first_contact, axis=1) * rs["air_time"]
        r_air = r_air * (jnp.linalg.norm(t.commands[:, :2], axis=1) > 0.1)
        r["air_time"] = r_air
        air = air * (~contact)

        hip_ids = jnp.array(self.hips_dofs)
        r["hip"] = jnp.sum(jnp.abs(jq[:, hip_ids] - self.default_dof_pos[hip_ids][None]), axis=1) * rs["hip"]

        reward = jnp.clip(sum(r.values()), 0.0, None)

        base_hit = jnp.linalg.norm(state.net_contact[:, self.base_index], axis=-1) > 1.0
        done = base_hit
        if not self.allow_knee_contacts:
            done = done | jnp.any(knee_contact, axis=1)
        reward = reward + rs["termination"] * done

        # ---- curriculum promotion/demotion, evaluated where done ----
        dist = jnp.linalg.norm(state.q[:, :2] - t.origin[:, :2], axis=1)
        timeout = state.progress >= self.max_episode_length - 1
        finishing = (done | timeout)
        demote = dist < jnp.linalg.norm(t.commands[:, :2], axis=1) * self.max_episode_length_s * 0.25
        promote = dist > self.tile_length / 2
        delta = promote.astype(jnp.int32) - demote.astype(jnp.int32)
        new_level = jnp.clip(t.terrain_level + jnp.where(finishing, delta, 0), 0, self.num_levels - 1) \
            if self.curriculum else t.terrain_level

        task = dataclasses.replace(
            t, feet_air_time=air, terrain_level=new_level)

        metrics = dict(state.metrics)
        for k in ("lin_vel_xy", "ang_vel_z", "air_time", "collision"):
            metrics["rew_" + k] = r[k]
        metrics["terrain_level"] = t.terrain_level.astype(jnp.float32)
        return obs, reward, done.astype(jnp.float32), task, metrics
