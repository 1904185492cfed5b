"""Combined THORMANG3-on-Gogoro task: ARTICULATED rider, freewheel assists,
wheel spin-up ramp, and damped-least-squares IK keeping both hands on the
handlebars.

Parity with `/root/reference/isaacgymenvs/tasks/gogoro/gogoro.py` (the
reference's hardest Gogoro variant — unregistered dev head, but fully
functional there):

- asset `gogoro_and_thormang3_Light_freewheels.urdf` (:198-199): full
  articulated THORMANG3 on the scooter, two training freewheels
  (`dummy_TO_l/r_free_wheel`, 0.1 m cylinders) and l/r handle prismatic
  joints. 45 movable DOFs here (fixed joints merged; the reference keeps
  them with collapse_fixed_joints=False, :205).
- drives (:221-276): EVERY joint defaults to DOF_MODE_POS Kp 10000 / Kd 300
  — the rider is actively POSED at the riding pose, not frozen; rear wheel
  DOF_MODE_VEL damping 3; front wheel free; the four freewheel DOFs free
  with friction 1e-4 (:236-252 "training freewheels zeroed"); steering POS
  Kp 1000 / Kd 100 (:267-270); base_x/y/z prismatics POS Kp 1e7 / Kd 10
  (:279-289, DEBUGUSEPRISMATIC=True).
- wheel spin-up ramp (:355-362): vel target ramps over the first 70 steps
  (wheel_spin_delay 20 + time_to_idl 50), then speed_scaled = s*30 + 20.
- prismatic rider-offset DR (:163,435-440): 5 values per env
  (r/l handle prismatic, base_x/y/z) ~ U(-0.06, 0.06), resampled at reset,
  applied as position targets.
- hands-on-handlebars IK (:396-427 under DEBUG_USE_IK, control_ik
  :597-602): per side, damped-least-squares (damping 0.3) from the 6-dim
  pose error of hand -> handle-end using the 6x7 jacobian of the 7 arm
  DOFs; orientation goal = current hand orientation (so the orientation
  rows of dpose are zero, :409-412). delta joint targets add onto the
  riding pose. The reference ships with DEBUG_USE_IK=False; here IK is ON
  by default (`use_ik=True`) since it is the variant's point — pass
  use_ik=False for the shipped-flag behavior. Jacobians come from
  `ops/inertia.point_jacobian` (the `acquire_jacobian_tensor` equivalent).
- obs (8, :652-676): roll, pitch, yaw (wrapped), delta_yaw, speed_kmh/100,
  base angular velocity (3, body frame).
- reward/reset (:612-628): reward = -(roll^2)*100; reset at progress>500,
  |roll|>1, |pitch|>0.1.
- commands (:737-744 + :158-160): target_yaw = 0 (DEBUGNOYAW=True), wheel
  speed ~ U(0.6, 1.0) drawn at reset only.
- spawn (:307-310): z = 0.1, roll = -0.3 (Quat.from_euler_zyx(-0.3,0,0))
  — the policy must first recover from the lean.
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
from thormang_isaacgym_tpu.ops.inertia import point_jacobian
from thormang_isaacgym_tpu.ops.kinematics import forward_kinematics
from thormang_isaacgym_tpu.ops.sim import Controls, SimParams
from thormang_isaacgym_tpu.tasks.gogoro import JOINTS_POS, _normal, _uniform

REF_COMBINED = ("/root/reference/assets/urdf/gogoro/urdf/"
                "gogoro_and_thormang3_Light_freewheels.urdf")

# wheel mesh (front_wheel.obj, r=0.2 disk, 0.1 wide, centered at
# (0.732, 0, 0.202) in mesh frame) -> cylinder; the URDF collision origin is
# xyz=(-0.731969, 0, -0.201999) rpy 0, so the override pos cancels it and
# the quat maps the cylinder z axis onto the link's y spin axis
_WHEEL_OVERRIDE = {
    "type": "cylinder", "size": (0.2, 0.05),
    "pos": (0.731969, 0.0, 0.201999),
    "quat": (0.70710678, 0.70710678, 0.0, 0.0),
}

# 7 IK-controlled arm DOFs per side (reference dof indices 18-24 / 27-33,
# gogoro/gogoro.py:132-133 — grip joints excluded)
_ARM_JOINTS = {
    "l": ("l_arm_sh_p1", "l_arm_sh_r", "l_arm_sh_p2", "l_arm_el_y",
          "l_arm_wr_r", "l_arm_wr_y", "l_arm_wr_p"),
    "r": ("r_arm_sh_p1", "r_arm_sh_r", "r_arm_sh_p2", "r_arm_el_y",
          "r_arm_wr_r", "r_arm_wr_y", "r_arm_wr_p"),
}
_PRISMATIC_DOFS = ("r_handle_prismatic_joint", "l_handle_prismatic_joint",
                   "base_x", "base_y", "base_z")


def _build_model(asset_path: str | None = None):
    path = asset_path or REF_COMBINED
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"combined gogoro asset not found at {path}; pass asset_path=")
    model = load_urdf(
        path,
        mesh_overrides={"front": _WHEEL_OVERRIDE, "back": _WHEEL_OVERRIDE},
    )
    d = model._defaults
    nj = model.nj

    # drives (gogoro/gogoro.py:221-289)
    mode = np.full(nj, DRIVE_POS, np.int32)
    kp = np.full(nj, 10000.0, np.float32)
    kd = np.full(nj, 300.0, np.float32)
    sid = model.dof_id("steering_joint")
    rid = model.dof_id("rear_wheel_joint")
    fid = model.dof_id("front_wheel_joint")
    mode[rid] = DRIVE_VEL
    kp[rid] = 0.0
    kd[rid] = 3.0
    mode[fid] = 0          # DOF_MODE_NONE: runs freely
    kp[fid] = 0.0
    kd[fid] = 0.0
    free_dofs = ["l_metal_freewheel_holder_TO_l_dummy",
                 "dummy_TO_l_free_wheel",
                 "r_metal_freewheel_holder_TO_r_dummy",
                 "dummy_TO_r_free_wheel"]
    fric = np.array(d.get("dof_friction", np.zeros(nj)), np.float32)
    for jn in free_dofs:
        i = model.dof_id(jn)
        mode[i] = 0
        kp[i] = 0.0
        kd[i] = 0.0
        fric[i] = 1e-4
    mode[sid] = DRIVE_POS
    kp[sid] = 1000.0
    kd[sid] = 100.0
    for jn in ("base_x", "base_y", "base_z"):
        i = model.dof_id(jn)
        kp[i] = 1.0e7
        kd[i] = 10.0
    d["drive_mode"] = mode
    d["drive_stiffness"] = kp
    d["drive_damping"] = kd
    d["dof_friction"] = fric

    # wheel/ground friction like the registered Gogoro (plane 0.99)
    gf = np.ones(model.ng, np.float32)
    for gi, g in enumerate(model.geoms):
        if g.body == model.body_id("back"):
            gf[gi] = 0.98
        elif g.body == model.body_id("front"):
            gf[gi] = 0.9
    d["geom_friction"] = gf

    # The URDF carries a 0.1 kg placeholder wheel mass with the physical
    # values commented out in the same file ("<mass value=2.753e+00>",
    # inertia iyy 7.728e-3 — gogoro_and_thormang3_Light_freewheels.urdf,
    # link back/front). PhysX's impulse solver shrugs off the placeholder;
    # a penalty contact clamped by the contact body's effective mass
    # cannot transmit the 134 kg load through 0.1 kg wheels — restore the
    # documented physical values.
    bm = np.array(d["body_mass"], np.float32)
    bi = np.array(d["body_inertia"], np.float32)
    for wname in ("back", "front"):
        b = model.body_id(wname)
        if bm[b] < 0.5:
            bm[b] = 2.753
            bi[b] = np.diag([0.8712e-3, 7.728e-3, 0.8712e-3])
    # freewheels: mass 0.2 with IDENTITY inertia (1 kg m^2 on a 0.1 m
    # wheel — 4 orders of magnitude high) is equally placeholder; use a
    # solid steel-ish 2.7 kg cylinder (r=0.1, h=0.05) so the training
    # assists can actually carry the lean load under penalty contact.
    for wname in ("l_free_wheel", "r_free_wheel"):
        b = model.body_id(wname)
        if bm[b] < 0.5:
            bm[b] = 2.7
            bi[b] = np.diag([7.3e-3, 7.3e-3, 13.5e-3])
    d["body_mass"] = bm
    d["body_inertia"] = bi
    return model


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GogoroCombinedTaskState:
    speed_cmd: jnp.ndarray       # (B,) normalized wheel speed in [0.6, 1)
    yaw_cmd: jnp.ndarray         # (B,) target heading (0 under DEBUGNOYAW)
    prismatic: jnp.ndarray       # (B, 5) rider-offset targets
    last_action: jnp.ndarray     # (B,)


class GogoroCombined(Task):
    """Articulated THORMANG3 riding the scooter; balance via steering."""

    num_obs = 8
    num_actions = 1
    max_episode_length = 500    # reference resets at progress>500 (:619)
    action0_scale = 0.5
    ik_damping = 0.3            # control_ik damping (:597-602)

    def __init__(self, num_envs: int = 4096, seed: int = 42,
                 asset_path: str | None = None, use_ik: bool = True, **_):
        super().__init__(num_envs, seed)
        self.model = _build_model(asset_path)
        self.use_ik = use_ik
        # substeps 10 (3 ms): the 134 kg machine rests on r<=0.2 wheels, so
        # the per-contact stability clamp (0.25 m_eff/h^2) needs a small h
        # to let the wheels carry the full load at the configured stiffness
        self.sim_params = SimParams(
            dt=0.03, substeps=10,
            gravity=(0.0, 0.0, -9.81),
            contact_stiffness=6.0e4, contact_damping=2.0e3,
            friction_vel=0.1, plane_friction=0.99,
            max_velocity=200.0,
        )
        m = self.model
        self.sid = m.dof_id("steering_joint")
        self.rid = m.dof_id("rear_wheel_joint")
        self.pris_ids = tuple(m.dof_id(j) for j in _PRISMATIC_DOFS)
        self.arm_ids = {s: tuple(m.dof_id(j) for j in js)
                        for s, js in _ARM_JOINTS.items()}
        # hand sites (fixed l/r_arm_end links merged into the wrist bodies)
        self.hand_site = {s: m.sites[f"{s}_arm_end_link"] for s in "lr"}
        self.handle_body = {s: m.body_id(f"{s}_steering_handle_end")
                            for s in "lr"}
        # jacobian column offset: floating root contributes 6 columns
        self._col0 = 6 * m.n_floating
        # riding pose as the default position target (only joints present
        # in this asset; the pose table is shared with tasks/gogoro.py)
        pose = np.zeros(m.nj, np.float32)
        names = set(m.joint_names)
        for jn, v in JOINTS_POS.items():
            if jn in names:
                pose[m.dof_id(jn)] = v
        self._pose = pose

    # ------------------------------------------------------------------
    def default_task_state(self, key):
        B = self.num_envs
        z = jnp.zeros(B)
        return GogoroCombinedTaskState(z + 0.8, z, jnp.zeros((B, 5)), z)

    # ------------------------------------------------------------------
    def reset_fn(self, key, params, task):
        """reset_idx (gogoro/gogoro.py:563-590): pose reset, zero
        velocities, new prismatic offsets, new wheel speed."""
        ks = jax.random.split(key, 3)
        speed_cmd = _uniform(ks[0], (), 0.6, 1.0)        # :756-760
        pris = _uniform(ks[1], (5,), -0.06, 0.06)        # :163,580

        # spawn: z=0.1, roll=-0.3 (:307-309)
        root_pos = jnp.array([0.0, 0.0, 0.1])
        root_quat = Q.from_euler_xyz(jnp.asarray(-0.3), jnp.zeros(()),
                                     jnp.zeros(()))
        joint_q = jnp.asarray(self._pose)
        for k, dof in enumerate(self.pris_ids):
            joint_q = joint_q.at[dof].set(pris[k])
        q = jnp.concatenate([root_pos, root_quat, joint_q])
        qd = jnp.zeros(self.model.nv)
        task = GogoroCombinedTaskState(
            speed_cmd=speed_cmd, yaw_cmd=jnp.zeros(()),
            prismatic=pris, last_action=jnp.zeros(()))
        return q, qd, params, task

    # ------------------------------------------------------------------
    def _ik_deltas(self, q, qd):
        """Per-env DLS IK deltas for both arms (control_ik :597-602).

        Returns (u_l, u_r): (7,) joint-position deltas moving each hand
        toward its handle end. Orientation rows of dpose are zero (the
        reference takes the goal orientation = current orientation)."""
        frames = forward_kinematics(self.model, q, qd)
        out = {}
        for s in "lr":
            hb, hp, hq = self.hand_site[s]
            hand_pos = frames.pos[hb] + Q.rotate(frames.quat[hb],
                                                 jnp.asarray(hp))
            handle_pos = frames.pos[self.handle_body[s]]
            dpose = jnp.concatenate([handle_pos - hand_pos, jnp.zeros(3)])
            # NOTE row order: reference dpose is [pos_err; orn_err] against
            # a [Jlin; Jang] jacobian; ours is [Jang; Jlin] so swap rows
            dpose = jnp.concatenate([dpose[3:], dpose[:3]])
            J = point_jacobian(self.model, q, hb, hp, frames=frames)
            cols = jnp.asarray([self._col0 + i for i in self.arm_ids[s]])
            Jarm = J[:, cols]                      # (6, 7)
            lam = self.ik_damping ** 2
            JJt = Jarm @ Jarm.T + lam * jnp.eye(6)
            out[s] = Jarm.T @ jnp.linalg.solve(JJt, dpose)
        return out["l"], out["r"]

    # ------------------------------------------------------------------
    def pre_physics(self, state, actions):
        """pre_physics_step (gogoro/gogoro.py:350-443)."""
        B = actions.shape[0]
        t = state.task
        m = self.model
        a = actions[:, 0]

        # wheel spin-up ramp (:355-368)
        prog = state.progress.astype(jnp.float32)
        ramp = jnp.where(prog < 70.0, t.speed_cmd * ((prog - 20.0) / 70.0),
                         t.speed_cmd)
        speed_scaled = ramp * 30.0 + 20.0
        target_vel = jnp.zeros((B, m.nj)).at[:, self.rid].set(speed_scaled)

        # position targets: riding pose + steer + prismatics (+ IK)
        tgt = jnp.tile(jnp.asarray(self._pose)[None], (B, 1))
        tgt = tgt.at[:, self.sid].set(a * self.action0_scale)
        for k, dof in enumerate(self.pris_ids):
            tgt = tgt.at[:, dof].set(t.prismatic[:, k])
        if self.use_ik:
            u_l, u_r = jax.vmap(self._ik_deltas)(state.q, state.qd)
            jq = state.q[:, 7:]
            for s, u in (("l", u_l), ("r", u_r)):
                ids = jnp.asarray(self.arm_ids[s])
                tgt = tgt.at[:, ids].set(jq[:, ids] + u)

        ctrl = Controls(tgt, target_vel, jnp.zeros((B, m.nj)))
        wrench = jnp.zeros((B, m.nb, 6))
        return ctrl, wrench, dataclasses.replace(t, last_action=a)

    # ------------------------------------------------------------------
    def post_physics(self, state, prev_task):
        """compute_observations / compute_gogoro_reward
        (gogoro/gogoro.py:612-676)."""
        t = prev_task
        root_quat = state.q[:, 3:7]
        roll, pitch, yaw = Q.to_euler_xyz(root_quat)
        roll = Q.wrap_to_pi(roll)
        pitch = Q.wrap_to_pi(pitch)
        yaw = Q.wrap_to_pi(yaw)
        omega_b = state.qd[:, 0:3]          # body frame (= base_ang_vel)
        v_w = state.qd[:, 3:6]
        # speed = (|vx|+|vy|) * 3.6 km/h, scaled by /100 in obs (:667)
        speed = (jnp.abs(v_w[:, 0]) + jnp.abs(v_w[:, 1])) * 3.6
        delta_yaw = yaw - t.yaw_cmd

        obs = jnp.concatenate([
            roll[:, None], pitch[:, None], yaw[:, None], delta_yaw[:, None],
            speed[:, None] / 100.0, omega_b], axis=-1)

        reward = -(roll ** 2) * 100.0        # :626
        fallen = (jnp.abs(roll) > 1.0) | (jnp.abs(pitch) > 0.1)  # :621-623

        metrics = dict(state.metrics)
        metrics["roll_abs"] = jnp.abs(roll)
        metrics["pitch_abs"] = jnp.abs(pitch)
        metrics["speed_kmh"] = speed
        if self.use_ik:
            metrics["hand_err"] = self._hand_err(state.q, state.qd)
        return obs, reward, fallen.astype(jnp.float32), t, metrics

    def _hand_err(self, q, qd):
        def one(q1, qd1):
            frames = forward_kinematics(self.model, q1, qd1)
            errs = []
            for s in "lr":
                hb, hp, _ = self.hand_site[s]
                hand = frames.pos[hb] + Q.rotate(frames.quat[hb],
                                                 jnp.asarray(hp))
                errs.append(jnp.linalg.norm(
                    hand - frames.pos[self.handle_body[s]]))
            return (errs[0] + errs[1]) / 2
        return jax.vmap(one)(q, qd)
