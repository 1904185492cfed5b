"""Factory contact-rich manipulation suite: nut-bolt Pick / Place / Screw.

Parity with `/root/reference/isaacgymenvs/tasks/factory/`:
- `factory_base.py` — Franka + table scene (:107-161), controller spec
  (:273-417 via ops/control.parse_controller_spec), action->target mapping
  (`_apply_actions_as_ctrl_targets`, factory_task_nut_bolt_pick.py:221-266)
- `factory_env_nut_bolt.py` — nut + bolt scene; the reference's SDF mesh
  pairs become primitive manifolds: the nut is a 4-wall square annulus of
  boxes, the bolt a square shaft + head, so pad-nut grasping and
  nut-on-shaft insertion resolve through the box-box SAT narrowphase
  (face manifold + edge-edge term, ops/collide.py)
- `factory_task_nut_bolt_pick.py` — obs 20 (:157-168), keypoint reward
  (:186-204, `_get_keypoint_offsets` :334), success = nut lifted
- `factory_task_nut_bolt_place.py` — obs 27, keypoint reward toward the
  bolt-top frame
- `factory_task_nut_bolt_screw.py` — obs 32 (+finger forces); the THREAD
  is TPU-native: instead of SDF thread-mesh contact, the nut rides a
  revolute(z) + prismatic(z) chain on the bolt with a fixed tendon
  enforcing z = -pitch/(2*pi) * theta — a thread IS that constraint — and
  thread friction is the revolute DOF's dry friction.

Known simplifications (documented, spec-cited):
- bolt base pose is static per scene (the reference randomizes bolt xy per
  env through per-env actor placement, FactoryTaskNutBoltPick.yaml:34);
  nut spawn noise is kept.
- the scripted close_and_lift evaluation phase at episode end
  (factory_task_nut_bolt_pick.py:145-152) runs in tests, not inside the
  jitted step; the learning signal (keypoint reward, success_bonus 0.0 by
  default) is unchanged.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from thormang_isaacgym_tpu.core import quat as Q
from thormang_isaacgym_tpu.engine.env import Task
from thormang_isaacgym_tpu.models import load_urdf
from thormang_isaacgym_tpu.models.franka import franka_dof_ids, load_franka
from thormang_isaacgym_tpu.models.robot import DRIVE_EFFORT
from thormang_isaacgym_tpu.models.scene import compose
from thormang_isaacgym_tpu.ops import control as C
from thormang_isaacgym_tpu.ops import inertia as di
from thormang_isaacgym_tpu.ops.kinematics import forward_kinematics
from thormang_isaacgym_tpu.ops.sim import Controls, SimParams

TABLE_Z = 0.4                  # FactoryBase.yaml table_height
# franka mounting = the reference's (factory_env_nut_bolt.py:145-149):
# base on the FLOOR at x=franka_depth (FactoryBase.yaml:40), yaw 180 so it
# faces the work area at the env origin. With the reference initial arm
# dofs this puts the fingertip midpoint ~0.2 m above the tabletop
# (fingertip_midpoint_pos_initial, FactoryTaskNutBoltPick.yaml:26). The
# tabletop is modeled as a constant-height ground surface; franka links
# (except the fingers) opt out of it (Geom.ground=False) exactly because
# the real table is a box the arm reaches OVER, not an infinite plane.
FRANKA_POS = (0.5, 0.0, 0.0)
FRANKA_QUAT = (0.0, 0.0, 0.0, 1.0)     # w,x,y,z: 180 deg about z

# nut-bolt dims (asset_info_nut_bolt M16-class; the YAML with exact dims is
# absent from the snapshot — public M16: 24 mm across flats, 13 mm height,
# 16 mm bore, 2 mm pitch)
NUT_OUTER = 0.012              # half-width across flats
NUT_HOLE = 0.0085              # half-width of the square bore
NUT_H = 0.0065                 # half-height
BOLT_SHAFT = 0.008             # half-width of the square shaft
BOLT_LEN = 0.050               # shaft length
BOLT_HEAD_H = 0.005            # head half-height
THREAD_PITCH = 0.002           # m per revolution

_CTRL_YAML = {
    "ctrl_type": "joint_space_id",
    "all": {"jacobian_type": "geometric",
            "gripper_prop_gains": [50, 50], "gripper_deriv_gains": [2, 2]},
    "joint_space_id": {"ik_method": "dls",
                       "joint_prop_gains": [40] * 7,
                       "joint_deriv_gains": [8] * 7},
    "task_space_impedance": {"motion_ctrl_axes": [1] * 6,
                             "task_prop_gains": [40] * 6,
                             "task_deriv_gains": [8] * 6},
}

FRANKA_FACTORY_DOF = np.array(
    [0.3413, -0.8011, -0.0670, -1.8299, 0.0266, 1.0185, 1.0927, 0.04, 0.04],
    np.float32)   # FactoryTaskNutBoltPick.yaml:26 + open gripper


def _nut_urdf(free: bool = True):
    """4-wall square annulus (graspable, insertable over the shaft)."""
    t = NUT_OUTER - NUT_HOLE
    walls = []
    for (cx, cy, hx, hy) in (
            (0.0, NUT_HOLE + t / 2, NUT_OUTER, t / 2),
            (0.0, -(NUT_HOLE + t / 2), NUT_OUTER, t / 2),
            (NUT_HOLE + t / 2, 0.0, t / 2, NUT_HOLE),
            (-(NUT_HOLE + t / 2), 0.0, t / 2, NUT_HOLE)):
        walls.append(
            f'<collision name="nut_wall{len(walls)}">'
            f'<origin xyz="{cx} {cy} 0"/>'
            f'<geometry><box size="{2*hx} {2*hy} {2*NUT_H}"/></geometry>'
            f'</collision>')
    m, i = 0.03, 0.03 * (0.02 ** 2) / 6
    return f"""
<robot name="nut">
  <link name="nut">
    <inertial><mass value="{m}"/>
      <inertia ixx="{i:.2e}" iyy="{i:.2e}" izz="{i:.2e}" ixy="0" ixz="0" iyz="0"/></inertial>
    {''.join(walls)}
  </link>
</robot>"""


def _bolt_urdf():
    """Fixed bolt: head box + square shaft."""
    return f"""
<robot name="bolt">
  <link name="bolt">
    <inertial><mass value="0.1"/>
      <inertia ixx="1e-5" iyy="1e-5" izz="1e-5" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision name="bolt_head"><origin xyz="0 0 {BOLT_HEAD_H}"/>
      <geometry><box size="{4*BOLT_SHAFT} {4*BOLT_SHAFT} {2*BOLT_HEAD_H}"/></geometry></collision>
    <collision name="bolt_shaft"><origin xyz="0 0 {2*BOLT_HEAD_H + BOLT_LEN/2}"/>
      <geometry><box size="{2*BOLT_SHAFT} {2*BOLT_SHAFT} {BOLT_LEN}"/></geometry></collision>
  </link>
</robot>"""


def _bolt_nut_urdf():
    """Screw-task articulation: nut rides the bolt through revolute(z) +
    prismatic(z); the thread tendon constrains z = -pitch/(2 pi) * theta."""
    t = NUT_OUTER - NUT_HOLE
    walls = []
    for (cx, cy, hx, hy) in (
            (0.0, NUT_HOLE + t / 2, NUT_OUTER, t / 2),
            (0.0, -(NUT_HOLE + t / 2), NUT_OUTER, t / 2),
            (NUT_HOLE + t / 2, 0.0, t / 2, NUT_HOLE),
            (-(NUT_HOLE + t / 2), 0.0, t / 2, NUT_HOLE)):
        walls.append(
            f'<collision name="nut_wall{len(walls)}">'
            f'<origin xyz="{cx} {cy} 0"/>'
            f'<geometry><box size="{2*hx} {2*hy} {2*NUT_H}"/></geometry>'
            f'</collision>')
    top = 2 * BOLT_HEAD_H + BOLT_LEN
    return f"""
<robot name="bolt_nut">
  <link name="bolt">
    <inertial><mass value="0.1"/>
      <inertia ixx="1e-5" iyy="1e-5" izz="1e-5" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision name="bolt_head"><origin xyz="0 0 {BOLT_HEAD_H}"/>
      <geometry><box size="{4*BOLT_SHAFT} {4*BOLT_SHAFT} {2*BOLT_HEAD_H}"/></geometry></collision>
  </link>
  <joint name="nut_spin" type="continuous">
    <parent link="bolt"/><child link="nut_carrier"/>
    <origin xyz="0 0 {top}"/><axis xyz="0 0 1"/>
    <dynamics damping="0.01" friction="0.06"/>
  </joint>
  <link name="nut_carrier">
    <inertial><mass value="0.005"/>
      <inertia ixx="1e-7" iyy="1e-7" izz="1e-7" ixy="0" ixz="0" iyz="0"/></inertial>
  </link>
  <joint name="nut_travel" type="prismatic">
    <parent link="nut_carrier"/><child link="nut"/>
    <origin xyz="0 0 0"/><axis xyz="0 0 1"/>
    <limit lower="{-BOLT_LEN}" upper="0.0" effort="1000" velocity="1.0"/>
    <dynamics damping="0.01"/>
  </joint>
  <link name="nut">
    <inertial><mass value="0.03"/>
      <inertia ixx="2e-6" iyy="2e-6" izz="2e-6" ixy="0" ixz="0" iyz="0"/></inertial>
    {''.join(walls)}
  </link>
</robot>"""


def _annulus_urdf(name, hole, outer, half_h, mass, fixed_note=""):
    """Square annulus link (nut / socket / gear): 4 box walls around a
    square bore."""
    t = outer - hole
    walls = []
    for (cx, cy, hx, hy) in (
            (0.0, hole + t / 2, outer, t / 2),
            (0.0, -(hole + t / 2), outer, t / 2),
            (hole + t / 2, 0.0, t / 2, hole),
            (-(hole + t / 2), 0.0, t / 2, hole)):
        walls.append(
            f'<collision name="{name}_wall{len(walls)}">'
            f'<origin xyz="{cx} {cy} 0"/>'
            f'<geometry><box size="{2 * hx} {2 * hy} {2 * half_h}"/></geometry>'
            f'</collision>')
    i = max(mass * outer * outer / 3, 1e-7)
    return (f'<robot name="{name}"><link name="{name}">'
            f'<inertial><mass value="{mass}"/>'
            f'<inertia ixx="{i:.2e}" iyy="{i:.2e}" izz="{i:.2e}" '
            f'ixy="0" ixz="0" iyz="0"/></inertial>{"".join(walls)}'
            f'</link></robot>')


# insertion dims (assets absent — public round_peg_hole_16mm re-derived as
# square sections; see module docstring)
PLUG_HALF = 0.008               # plug half-width
PLUG_LEN = 0.050                # plug length
SOCKET_HOLE = 0.0095            # socket bore half-width (1.5 mm clearance)
SOCKET_OUTER = 0.018
SOCKET_H = 0.0125               # socket half-height

# gears dims (factory_asset_info_gears absent; public NIST gears plate)
GEAR_HOLE = 0.0065
GEAR_OUTER = 0.025
GEAR_H = 0.009
SHAFT_HALF = 0.005
SHAFT_LEN = 0.035


def _plug_urdf():
    i = 0.04 * PLUG_HALF * PLUG_HALF
    return (f'<robot name="plug"><link name="plug">'
            f'<inertial><origin xyz="0 0 {PLUG_LEN / 2}"/>'
            f'<mass value="0.04"/>'
            f'<inertia ixx="{i:.2e}" iyy="{i:.2e}" izz="{i:.2e}" '
            f'ixy="0" ixz="0" iyz="0"/></inertial>'
            f'<collision name="plug_shaft"><origin xyz="0 0 {PLUG_LEN / 2}"/>'
            f'<geometry><box size="{2 * PLUG_HALF} {2 * PLUG_HALF} '
            f'{PLUG_LEN}"/></geometry></collision>'
            # grip collar so the fingers have a flat face to pinch
            f'<collision name="plug_collar"><origin xyz="0 0 {PLUG_LEN - 0.008}"/>'
            f'<geometry><box size="{2 * PLUG_HALF + 0.008} '
            f'{2 * PLUG_HALF + 0.008} 0.016"/></geometry></collision>'
            f'</link></robot>')


def _gear_base_urdf():
    """Fixed gear-base plate with the central shaft (the medium gear's)."""
    return (f'<robot name="gear_base"><link name="gear_base">'
            f'<inertial><mass value="0.5"/>'
            f'<inertia ixx="1e-4" iyy="1e-4" izz="1e-4" '
            f'ixy="0" ixz="0" iyz="0"/></inertial>'
            f'<collision name="plate"><origin xyz="0 0 0.005"/>'
            f'<geometry><box size="0.12 0.06 0.01"/></geometry></collision>'
            f'<collision name="shaft_mid"><origin xyz="0 0 '
            f'{0.01 + SHAFT_LEN / 2}"/>'
            f'<geometry><box size="{2 * SHAFT_HALF} {2 * SHAFT_HALF} '
            f'{SHAFT_LEN}"/></geometry></collision>'
            f'</link></robot>')


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FactoryTaskState:
    actions: jnp.ndarray


class FactoryBase(Task):
    """Shared Franka+table plumbing for the factory family."""
    max_episode_length = 100
    clip_obs = 5.0
    num_actions = 12
    pos_action_scale = 0.1
    rot_action_scale = 0.1
    force_action_scale = 1.0
    torque_action_scale = 1.0
    clamp_rot_thresh = 1.0e-6
    keypoint_reward_scale = 1.0
    action_penalty_scale = 0.0
    num_keypoints = 4
    keypoint_scale = 0.5
    success_bonus = 0.0

    def __init__(self, num_envs: int = 128, seed: int = 42,
                 ctrl_cfg: dict | None = None, **_):
        super().__init__(num_envs, seed)
        self.cfg_ctrl = C.parse_controller_spec(ctrl_cfg or _CTRL_YAML)
        self.sim_params = SimParams(
            dt=1.0 / 60.0, substeps=4, gravity=(0.0, 0.0, -9.81),
            contact_stiffness=1.0e5, contact_damping=1.0e3,
            friction_vel=0.004, plane_friction=0.3,   # table_friction 0.3
            max_depenetration_velocity=0.5)
        self.dt = self.sim_params.dt

    def _finish_scene(self, scene):
        # franka links opt out of the tabletop ground plane (the real
        # table is a box the floor-mounted arm reaches OVER; see
        # FRANKA_POS); only the fingers may press the tabletop
        fingers = {scene.body_id("franka/panda_leftfinger"),
                   scene.body_id("franka/panda_rightfinger")}
        geoms = tuple(
            dataclasses.replace(g, ground=False)
            if (scene.body_names[g.body].startswith("franka/")
                and g.body not in fingers) else g
            for g in scene.geoms)
        scene = dataclasses.replace(scene, geoms=geoms)
        self.model = scene
        self.fr_ids = np.array(franka_dof_ids(scene, "franka/"))
        d = scene._defaults
        mode = np.array(d["drive_mode"])
        for k in self.fr_ids:           # manual mode: all 9 effort-driven
            mode[k] = DRIVE_EFFORT
        d["drive_mode"] = mode
        self.effort_limit = jnp.asarray(
            np.array(d["drive_effort_limit"])[self.fr_ids])
        gb, gp, gq = scene.sites["franka/panda_grasp"]
        self.grasp_body, self.grasp_pos_l, self.grasp_quat_l = gb, gp, gq
        self.lfinger_body = scene.body_id("franka/panda_leftfinger")
        self.rfinger_body = scene.body_id("franka/panda_rightfinger")
        # keypoint offsets along the local z: linspace(0,1)-0.5, scaled
        # (factory_task_nut_bolt_pick.py:334-340)
        ko = np.zeros((self.num_keypoints, 3), np.float32)
        ko[:, 2] = (np.linspace(0.0, 1.0, self.num_keypoints) - 0.5) \
            * self.keypoint_scale
        self.keypoint_offsets = jnp.asarray(ko)

    def ground_height_fn(self):
        # constant tabletop height: returned as a float so the fused
        # kernel's plane path takes it (ops/sim.build_step_fn ground spec)
        return TABLE_Z

    # ---- fingertip midpoint frame (factory_base acquire/refresh) ----
    def _eef(self, q, qd):
        frames = forward_kinematics(self.model, q, qd)
        bq = frames.quat[self.grasp_body]
        gq = Q.mul(bq, jnp.asarray(self.grasp_quat_l))
        r = Q.rotate(bq, jnp.asarray(self.grasp_pos_l))
        gp = frames.pos[self.grasp_body] + r
        w = frames.omega[self.grasp_body]
        v = frames.vel[self.grasp_body] + jnp.cross(w, r)
        return gp, gq, v, w

    def default_task_state(self, key):
        return FactoryTaskState(jnp.zeros((self.num_envs, self.num_actions)))

    # ---- actions -> controller targets -> torques ----
    def _torques(self, q, qd, actions, params, finger_force):
        """Single env: action (12,) -> 9 franka DOF torques through the
        configured controller (joint_space_id default)."""
        model = self.model
        fr = jnp.asarray(self.fr_ids)
        nf6 = 6 * model.n_floating
        nf7 = 7 * model.n_floating
        jq = q[nf7:]
        jqd = qd[nf6:]
        gp, gq, v, w = self._eef(q, qd)

        pos_a = actions[0:3] * self.pos_action_scale
        rot_a = actions[3:6] * self.rot_action_scale
        angle = jnp.linalg.norm(rot_a) + 1e-12
        axis = rot_a / angle
        dq = Q.from_axis_angle(axis, angle)
        dq = jnp.where(angle > self.clamp_rot_thresh, dq,
                       jnp.asarray([1.0, 0, 0, 0]))
        target_pos = gp + pos_a
        target_quat = Q.mul(dq, gq)
        target_wrench = jnp.concatenate([
            actions[6:9] * self.force_action_scale,
            actions[9:12] * self.torque_action_scale]) \
            if self.cfg_ctrl["do_force_ctrl"] else jnp.zeros(6)

        frames = forward_kinematics(model, q, jnp.zeros(model.nv))
        H = di.mass_matrix(model, params, q, frames)
        cols = nf6 + fr[:7]
        mm = H[jnp.ix_(cols, cols)]
        J6 = di.point_jacobian(model, q, self.grasp_body,
                               self.grasp_pos_l, frames)
        j_eef = jnp.concatenate([J6[3:], J6[:3]], axis=0)[:, cols]

        dof_pos = jq[fr]
        dof_vel = jqd[fr]
        tau = C.compute_dof_torque(
            self.cfg_ctrl, dof_pos, dof_vel, gp, gq, v, w, finger_force,
            j_eef, mm, self._gripper_target, target_pos, target_quat,
            target_wrench)
        return jnp.clip(tau, -self.effort_limit, self.effort_limit)

    _gripper_target = 0.04     # open (franka_gripper_width_max / 2)

    def pre_physics(self, state, actions):
        B = actions.shape[0]
        model = self.model
        # measured fingertip wrench for closed-loop force modes: the net
        # contact force on the fingers (the same signal the reference wires
        # through force sensors, factory_base.py acquire_base_tensors)
        ff = state.net_contact[:, self.lfinger_body] \
            + state.net_contact[:, self.rfinger_body]
        tau = jax.vmap(self._torques)(
            state.q, state.qd, actions, state.params, ff)
        fr = jnp.asarray(self.fr_ids)
        effort = jnp.zeros((B, model.nj)).at[:, fr].set(tau)
        ctrl = Controls(jnp.zeros((B, model.nj)), jnp.zeros((B, model.nj)),
                        effort)
        wrench = jnp.zeros((B, model.nb, 6))
        return ctrl, wrench, FactoryTaskState(actions)

    def _keypoints(self, pos, quat):
        """World keypoints of a frame: pos + R @ offsets."""
        return pos[None, :] + jax.vmap(lambda o: Q.rotate(quat, o))(
            self.keypoint_offsets)


class FactoryTaskNutBoltPick(FactoryBase):
    """Pick: reach the nut's grasp frame (keypoint reward), then a scripted
    close+lift must carry it (exercised in tests). Obs 20
    (factory_task_nut_bolt_pick.py:157-168)."""
    num_obs = 20

    def __init__(self, num_envs: int = 128, seed: int = 42, **kw):
        super().__init__(num_envs, seed, **kw)
        franka = load_franka()
        nut = load_urdf(_nut_urdf())
        bolt = load_urdf(_bolt_urdf(), fix_base_link=True)
        scene = compose([
            (franka, FRANKA_POS + FRANKA_QUAT, "franka/"),
            (nut, (0.0, -0.1, TABLE_Z + NUT_H, 1.0, 0.0, 0.0, 0.0), "nut/"),
            (bolt, (0.15, 0.1, TABLE_Z, 1.0, 0.0, 0.0, 0.0), "bolt/"),
        ], name="factory_nut_bolt_pick")
        self._finish_scene(scene)
        self.nut_body = scene.body_id("nut/nut")
        self.qN = 0            # nut root q block

    def reset_fn(self, key, params, task):
        ks = jax.random.split(key, 3)
        pos = jnp.asarray(FRANKA_FACTORY_DOF) \
            + 0.1 * (jax.random.uniform(ks[0], (9,)) * 2 - 1) \
            * jnp.asarray([1.0] * 7 + [0.0, 0.0])
        pos = pos.at[7:].set(0.04)
        jq = jnp.zeros(self.model.nj).at[jnp.asarray(self.fr_ids)].set(pos)
        nxy = jnp.asarray([0.0, -0.1]) + 0.1 * (
            jax.random.uniform(ks[1], (2,)) * 2 - 1)
        yaw = jax.random.uniform(ks[2], (), minval=-np.pi, maxval=np.pi)
        qn = jnp.concatenate([
            nxy, jnp.asarray([TABLE_Z + NUT_H]),
            Q.from_axis_angle(jnp.asarray([0.0, 0, 1.0]), yaw)])
        q = jnp.concatenate([qn, jq])
        return q, jnp.zeros(self.model.nv), params, \
            FactoryTaskState(jnp.zeros(self.num_actions))

    def post_physics(self, state, prev_task):
        gp, gq, v, w = jax.vmap(self._eef)(state.q, state.qd)
        nut_pos = state.q[:, self.qN:self.qN + 3]
        nut_quat = state.q[:, self.qN + 3:self.qN + 7]
        # grasp frame: top center of the nut, z FLIPPED to face the
        # downward gripper (nut_grasp_quat_local = 180 deg about x,
        # factory_task_nut_bolt_pick.py:89-90) — without the flip the
        # keypoint lines are anti-parallel and the keypoint distance has
        # a large orientation floor the policy cannot remove
        x180 = jnp.asarray([0.0, 1.0, 0.0, 0.0])
        grasp_pos = nut_pos + jax.vmap(
            lambda qq: Q.rotate(qq, jnp.asarray([0.0, 0, NUT_H])))(nut_quat)
        grasp_quat = jax.vmap(lambda qq: Q.mul(qq, x180))(nut_quat)
        obs = jnp.concatenate([gp, gq, v, w, grasp_pos, grasp_quat], axis=-1)

        kp_g = jax.vmap(self._keypoints)(gp, gq)
        kp_n = jax.vmap(self._keypoints)(grasp_pos, grasp_quat)
        kd = jnp.linalg.norm(kp_g - kp_n, axis=-1).sum(-1)
        a_pen = jnp.linalg.norm(state.task.actions, axis=-1)
        reward = -kd * self.keypoint_reward_scale \
            - a_pen * self.action_penalty_scale
        lifted = (nut_pos[:, 2] - TABLE_Z) > 3.0 * 2 * NUT_H
        done = jnp.zeros_like(reward)
        metrics = dict(state.metrics)
        metrics["keypoint_dist"] = kd
        metrics["success"] = lifted.astype(jnp.float32)
        return obs, reward, done, prev_task, metrics


class FactoryTaskNutBoltPlace(FactoryBase):
    """Place: nut starts in the closed gripper above the bolt; move it onto
    the bolt top (keypoint reward toward the bolt-tip frame). Obs 27."""
    num_obs = 27

    def __init__(self, num_envs: int = 128, seed: int = 42, **kw):
        super().__init__(num_envs, seed, **kw)
        franka = load_franka()
        nut = load_urdf(_nut_urdf())
        bolt = load_urdf(_bolt_urdf(), fix_base_link=True)
        self.bolt_pos = np.array([0.1, 0.0, TABLE_Z], np.float32)
        scene = compose([
            (franka, FRANKA_POS + FRANKA_QUAT, "franka/"),
            (nut, (0.0, 0.0, TABLE_Z + 0.3, 1.0, 0.0, 0.0, 0.0), "nut/"),
            (bolt, tuple(self.bolt_pos) + (1.0, 0.0, 0.0, 0.0), "bolt/"),
        ], name="factory_nut_bolt_place")
        self._finish_scene(scene)
        self.nut_body = scene.body_id("nut/nut")
        self.qN = 0
        self._gripper_target = 0.011   # hold the nut (half-width 12 mm)

    def reset_fn(self, key, params, task):
        ks = jax.random.split(key, 2)
        pos = jnp.asarray(FRANKA_FACTORY_DOF) \
            + 0.05 * (jax.random.uniform(ks[0], (9,)) * 2 - 1) \
            * jnp.asarray([1.0] * 7 + [0.0, 0.0])
        pos = pos.at[7:].set(0.013)    # fingers on the nut
        jq = jnp.zeros(self.model.nj).at[jnp.asarray(self.fr_ids)].set(pos)
        # nut placed at the gripper: compute fk to find the grasp point
        qtmp = jnp.concatenate([jnp.zeros(7).at[3].set(1.0), jq])
        gp, gq, _, _ = self._eef(qtmp, jnp.zeros(self.model.nv))
        yaw_g = jnp.arctan2(2 * (gq[0] * gq[3] + gq[1] * gq[2]),
                            1 - 2 * (gq[2] ** 2 + gq[3] ** 2))
        qn = jnp.concatenate([
            gp + jnp.asarray([0.0, 0, -0.005]),
            Q.from_axis_angle(jnp.asarray([0.0, 0, 1.0]), yaw_g)])
        q = jnp.concatenate([qn, jq])
        return q, jnp.zeros(self.model.nv), params, \
            FactoryTaskState(jnp.zeros(self.num_actions))

    def post_physics(self, state, prev_task):
        gp, gq, v, w = jax.vmap(self._eef)(state.q, state.qd)
        nut_pos = state.q[:, self.qN:self.qN + 3]
        nut_quat = state.q[:, self.qN + 3:self.qN + 7]
        bolt_pos = jnp.broadcast_to(jnp.asarray(self.bolt_pos),
                                    nut_pos.shape)
        bolt_quat = jnp.broadcast_to(jnp.asarray([1.0, 0, 0, 0]),
                                     nut_quat.shape)
        obs = jnp.concatenate([gp, gq, v, w, nut_pos, nut_quat,
                               bolt_pos, bolt_quat], axis=-1)
        # target: nut seated over the shaft tip
        tip = jnp.asarray(self.bolt_pos) + jnp.asarray(
            [0.0, 0, 2 * BOLT_HEAD_H + BOLT_LEN + NUT_H])
        kp_n = jax.vmap(self._keypoints)(nut_pos, nut_quat)
        kp_t = jax.vmap(self._keypoints)(
            jnp.broadcast_to(tip, nut_pos.shape), bolt_quat)
        kd = jnp.linalg.norm(kp_n - kp_t, axis=-1).sum(-1)
        a_pen = jnp.linalg.norm(state.task.actions, axis=-1)
        reward = -kd * self.keypoint_reward_scale \
            - a_pen * self.action_penalty_scale
        seated = jnp.linalg.norm(nut_pos - tip, axis=-1) < 0.01
        metrics = dict(state.metrics)
        metrics["keypoint_dist"] = kd
        metrics["success"] = seated.astype(jnp.float32)
        return obs, reward, jnp.zeros_like(reward), prev_task, metrics


class FactoryTaskNutBoltScrew(FactoryBase):
    """Screw: the nut starts threaded at the bolt top; screwing it down is
    rotation about the shaft with the thread constraint converting spin to
    travel. Obs 32 (+ finger forces, factory_task_nut_bolt_screw.py)."""
    num_obs = 32
    max_episode_length = 200

    def __init__(self, num_envs: int = 128, seed: int = 42, **kw):
        super().__init__(num_envs, seed, **kw)
        franka = load_franka()
        boltnut = load_urdf(_bolt_nut_urdf(), fix_base_link=True)
        self.bolt_pos = np.array([0.1, 0.0, TABLE_Z], np.float32)
        scene = compose([
            (franka, FRANKA_POS + FRANKA_QUAT, "franka/"),
            (boltnut, tuple(self.bolt_pos) + (1.0, 0.0, 0.0, 0.0), "bn/"),
        ], name="factory_nut_bolt_screw")
        # the thread: L = travel + pitch/(2 pi) * spin pinned to 0
        spin = scene.dof_id("bn/nut_spin")
        travel = scene.dof_id("bn/nut_travel")
        coef = np.zeros(scene.nj, np.float32)
        coef[travel] = 1.0
        coef[spin] = THREAD_PITCH / (2 * np.pi)
        scene = dataclasses.replace(
            scene, tendons=scene.tendons + ((tuple(coef), 0.0, 0.0, "bn/thread"),))
        d = scene._defaults
        d["tendon_stiffness"] = np.concatenate(
            [d["tendon_stiffness"], [2.0e4]]).astype(np.float32)
        d["tendon_damping"] = np.concatenate(
            [d["tendon_damping"], [50.0]]).astype(np.float32)
        self._finish_scene(scene)
        self.nut_body = scene.body_id("bn/nut")
        self.spin_dof = spin
        self.travel_dof = travel
        self._gripper_target = 0.011

    def reset_fn(self, key, params, task):
        pos = jnp.asarray(FRANKA_FACTORY_DOF) \
            + 0.05 * (jax.random.uniform(key, (9,)) * 2 - 1) \
            * jnp.asarray([1.0] * 7 + [0.0, 0.0])
        pos = pos.at[7:].set(0.013)
        jq = jnp.zeros(self.model.nj).at[jnp.asarray(self.fr_ids)].set(pos)
        # nut at the top of the thread
        jq = jq.at[self.travel_dof].set(0.0)
        jq = jq.at[self.spin_dof].set(0.0)
        return jq, jnp.zeros(self.model.nv), params, \
            FactoryTaskState(jnp.zeros(self.num_actions))

    def post_physics(self, state, prev_task):
        model = self.model
        gp, gq, v, w = jax.vmap(self._eef)(state.q, state.qd)
        frames = jax.vmap(lambda q, qd: forward_kinematics(model, q, qd))(
            state.q, state.qd)
        nut_pos = frames.pos[:, self.nut_body]
        nut_quat = frames.quat[:, self.nut_body]
        nut_v = frames.vel[:, self.nut_body]
        nut_w = frames.omega[:, self.nut_body]
        ff = state.net_contact[:, self.lfinger_body] \
            + state.net_contact[:, self.rfinger_body]
        obs = jnp.concatenate([gp, gq, v, w, nut_pos, nut_quat,
                               nut_v, nut_w, ff, jnp.zeros_like(ff)], axis=-1)
        nf7 = 7 * model.n_floating
        travel = state.q[:, nf7 + self.travel_dof]
        # reward: screw the nut down the full thread
        reward = -(travel + BOLT_LEN) / BOLT_LEN
        screwed = travel < -0.9 * BOLT_LEN
        metrics = dict(state.metrics)
        metrics["travel"] = travel
        metrics["success"] = screwed.astype(jnp.float32)
        return obs, reward, jnp.zeros_like(reward), prev_task, metrics


class FactoryTaskInsertion(FactoryBase):
    """Insertion: insert a free peg into a fixed table socket.

    The reference task class is a REGISTERED PLACEHOLDER: its
    `_update_rew_buf`/`_update_reset_buf` are `pass`
    (`factory_task_insertion.py:119-125`); the env half (scene + resets,
    `factory_env_insertion.py`) and config (obs 32 / act 12 / episode 1024,
    plug_bias_y -0.1, plug_noise_xy 0.05, `FactoryTaskInsertion.yaml`) are
    real and reproduced. Completed here with the family's keypoint reward
    toward the socket-seated pose."""
    num_obs = 32
    max_episode_length = 1024
    plug_bias_y = -0.1
    plug_noise_xy = 0.05

    def __init__(self, num_envs: int = 128, seed: int = 42, **kw):
        super().__init__(num_envs, seed, **kw)
        franka = load_franka()
        plug = load_urdf(_plug_urdf())
        socket = load_urdf(
            _annulus_urdf("socket", SOCKET_HOLE, SOCKET_OUTER, SOCKET_H, 0.2),
            fix_base_link=True)
        self.socket_pos = np.array([0.1, 0.0, TABLE_Z + SOCKET_H], np.float32)
        scene = compose([
            (franka, FRANKA_POS + FRANKA_QUAT, "franka/"),
            (plug, (0.0, self.plug_bias_y, TABLE_Z, 1.0, 0.0, 0.0, 0.0),
             "plug/"),
            (socket, tuple(self.socket_pos) + (1.0, 0.0, 0.0, 0.0),
             "socket/"),
        ], name="factory_insertion")
        self._finish_scene(scene)
        self.plug_body = scene.body_id("plug/plug")
        self.qP = 0

    def reset_fn(self, key, params, task):
        ks = jax.random.split(key, 2)
        pos = jnp.asarray(FRANKA_FACTORY_DOF) \
            + 0.05 * (jax.random.uniform(ks[0], (9,)) * 2 - 1) \
            * jnp.asarray([1.0] * 7 + [0.0, 0.0])
        pos = pos.at[7:].set(0.04)
        jq = jnp.zeros(self.model.nj).at[jnp.asarray(self.fr_ids)].set(pos)
        # plug spawn (factory_task_insertion.py:163-179)
        nxy = jnp.asarray([0.0, self.plug_bias_y]) + self.plug_noise_xy * (
            jax.random.uniform(ks[1], (2,)) * 2 - 1)
        qp = jnp.concatenate([
            nxy, jnp.asarray([TABLE_Z]), jnp.asarray([1.0, 0.0, 0.0, 0.0])])
        q = jnp.concatenate([qp, jq])
        return q, jnp.zeros(self.model.nv), params, \
            FactoryTaskState(jnp.zeros(self.num_actions))

    def post_physics(self, state, prev_task):
        gp, gq, v, w = jax.vmap(self._eef)(state.q, state.qd)
        plug_pos = state.q[:, self.qP:self.qP + 3]
        plug_quat = state.q[:, self.qP + 3:self.qP + 7]
        plug_v = state.qd[:, 3:6]
        plug_w = jax.vmap(Q.rotate)(plug_quat, state.qd[:, 0:3])
        # seated pose: plug base at the socket bore center on the table
        seat = jnp.asarray([self.socket_pos[0], self.socket_pos[1], TABLE_Z])
        delta = seat[None] - plug_pos
        obs = jnp.concatenate([
            gp, gq, v, w, plug_pos, plug_quat, plug_v, plug_w,
            jnp.broadcast_to(seat, plug_pos.shape) - plug_pos,
            plug_pos - gp], axis=-1)          # 13+13+3+3 = 32
        kp_p = jax.vmap(self._keypoints)(plug_pos, plug_quat)
        kp_s = jax.vmap(self._keypoints)(
            jnp.broadcast_to(seat, plug_pos.shape),
            jnp.broadcast_to(jnp.asarray([1.0, 0, 0, 0]), plug_quat.shape))
        kd = jnp.linalg.norm(kp_p - kp_s, axis=-1).sum(-1)
        a_pen = jnp.linalg.norm(state.task.actions, axis=-1)
        reward = -kd * self.keypoint_reward_scale \
            - a_pen * self.action_penalty_scale
        inserted = (jnp.linalg.norm(delta[:, :2], axis=-1) < 0.003) \
            & (plug_pos[:, 2] < TABLE_Z + 0.005)
        metrics = dict(state.metrics)
        metrics["keypoint_dist"] = kd
        metrics["success"] = inserted.astype(jnp.float32)
        return obs, reward, jnp.zeros_like(reward), prev_task, metrics


class FactoryTaskGears(FactoryBase):
    """Gears: place the medium gear onto the base-plate shaft.

    Like Insertion, the reference task class is a registered placeholder
    (`factory_task_gears.py:119-125` empty reward/reset); the env half
    (`factory_env_gears.py`: base plate + three gears, gears_bias_y -0.1,
    gears_noise_xy 0.05) and config (obs 32 / act 12 / episode 1024,
    `FactoryTaskGears.yaml`) are reproduced, with the medium gear as the
    manipulated object and the family keypoint reward onto the shaft."""
    num_obs = 32
    max_episode_length = 1024
    gears_bias_y = -0.1
    gears_noise_xy = 0.05

    def __init__(self, num_envs: int = 128, seed: int = 42, **kw):
        super().__init__(num_envs, seed, **kw)
        franka = load_franka()
        gear = load_urdf(
            _annulus_urdf("gear_medium", GEAR_HOLE, GEAR_OUTER, GEAR_H, 0.05))
        base = load_urdf(_gear_base_urdf(), fix_base_link=True)
        self.base_pos = np.array([0.1, 0.0, TABLE_Z], np.float32)
        scene = compose([
            (franka, FRANKA_POS + FRANKA_QUAT, "franka/"),
            (gear, (0.0, self.gears_bias_y, TABLE_Z + GEAR_H,
                    1.0, 0.0, 0.0, 0.0), "gear/"),
            (base, tuple(self.base_pos) + (1.0, 0.0, 0.0, 0.0), "base/"),
        ], name="factory_gears")
        self._finish_scene(scene)
        self.gear_body = scene.body_id("gear/gear_medium")
        self.qG = 0
        # shaft top center (seated gear target)
        self.shaft_seat = self.base_pos + np.array(
            [0.0, 0.0, 0.01 + GEAR_H], np.float32)

    def reset_fn(self, key, params, task):
        ks = jax.random.split(key, 3)
        pos = jnp.asarray(FRANKA_FACTORY_DOF) \
            + 0.05 * (jax.random.uniform(ks[0], (9,)) * 2 - 1) \
            * jnp.asarray([1.0] * 7 + [0.0, 0.0])
        pos = pos.at[7:].set(0.04)
        jq = jnp.zeros(self.model.nj).at[jnp.asarray(self.fr_ids)].set(pos)
        nxy = jnp.asarray([0.0, self.gears_bias_y]) + self.gears_noise_xy * (
            jax.random.uniform(ks[1], (2,)) * 2 - 1)
        yaw = jax.random.uniform(ks[2], (), minval=-np.pi, maxval=np.pi)
        qg = jnp.concatenate([
            nxy, jnp.asarray([TABLE_Z + GEAR_H]),
            Q.from_axis_angle(jnp.asarray([0.0, 0, 1.0]), yaw)])
        q = jnp.concatenate([qg, jq])
        return q, jnp.zeros(self.model.nv), params, \
            FactoryTaskState(jnp.zeros(self.num_actions))

    def post_physics(self, state, prev_task):
        gp, gq, v, w = jax.vmap(self._eef)(state.q, state.qd)
        gear_pos = state.q[:, self.qG:self.qG + 3]
        gear_quat = state.q[:, self.qG + 3:self.qG + 7]
        gear_v = state.qd[:, 3:6]
        gear_w = jax.vmap(Q.rotate)(gear_quat, state.qd[:, 0:3])
        seat = jnp.asarray(self.shaft_seat)
        obs = jnp.concatenate([
            gp, gq, v, w, gear_pos, gear_quat, gear_v, gear_w,
            jnp.broadcast_to(seat, gear_pos.shape) - gear_pos,
            gear_pos - gp], axis=-1)          # 13+13+3+3 = 32
        kp_g = jax.vmap(self._keypoints)(gear_pos, gear_quat)
        kp_s = jax.vmap(self._keypoints)(
            jnp.broadcast_to(seat, gear_pos.shape),
            jnp.broadcast_to(jnp.asarray([1.0, 0, 0, 0]), gear_quat.shape))
        kd = jnp.linalg.norm(kp_g - kp_s, axis=-1).sum(-1)
        a_pen = jnp.linalg.norm(state.task.actions, axis=-1)
        reward = -kd * self.keypoint_reward_scale \
            - a_pen * self.action_penalty_scale
        seated = (jnp.linalg.norm(gear_pos[:, :2] - seat[None, :2], axis=-1)
                  < 0.004) & (jnp.abs(gear_pos[:, 2] - seat[2]) < 0.006)
        metrics = dict(state.metrics)
        metrics["keypoint_dist"] = kd
        metrics["success"] = seated.astype(jnp.float32)
        return obs, reward, jnp.zeros_like(reward), prev_task, metrics
