"""BallBalance — tripod tray balancing a free ball.

Parity with `/root/reference/isaacgymenvs/tasks/ball_balance.py`: the
balance-bot is generated procedurally from the same geometry recipe as the
reference's MJCF generator (`_create_balance_bot_asset`, :136-220: tray
cylinder r=0.5 t=0.02 density 100, three 2-link capsule legs r=0.02 at 120
degree spokes, knee hinges), composed with a free ball (r=0.1, mass 1) into
a multi-actor scene. The feet are pinned by world-point attractors
(create_rigid_body_attractor, :305-318).

Spec mapping:
- obs (24): [knee pos(3), knee vel(3), ball pos(3), ball linvel(3),
  foot force sensors/20 (12, force + torque per 3 legs packed as in
  :336-351)]
- actions (3): knee position-target velocities: target += dt*speed_scale*a
  clamped to limits (:412-420); knee PD Kp 4000 Kd 100 (:290-293)
- reward = 1/(1+|ball - (0,0,0.7)|) * 1/(1+|ball_vel|) (:459-470)
- reset when ball z < 1.5 r or timeout (:472-474); ball respawns at random
  radial position/height with inward velocity (:365-390)
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
from thormang_isaacgym_tpu.models.scene import compose
from thormang_isaacgym_tpu.ops.sim import Controls, SimParams

TRAY_RADIUS = 0.5
TRAY_THICK = 0.02
LEG_R = 0.02
LEG_OUTER = TRAY_RADIUS - 0.1
LEG_LEN = LEG_OUTER - 2 * LEG_R
LEG_INNER = LEG_OUTER - LEG_LEN / math.sqrt(2)
TRAY_H = LEG_LEN * math.sqrt(2) + 2 * LEG_R + 0.5 * TRAY_THICK
BALL_R = 0.1


def _leg_urdf_fragment(i: int, angle: float) -> str:
    """One 2-link leg. Frames follow the reference generator (:170-214),
    converted from MJCF (joint inside child) to URDF (child frame at joint):
    the upper-leg joint sits at the tray rim, axis tangential; the knee
    joint connects upper->lower mid-leg."""
    c, s = math.cos(angle), math.sin(angle)
    # upper-leg joint (at the capsule's outer end): tray-frame position
    jx, jy = LEG_OUTER * c, LEG_OUTER * s
    jz = -LEG_R - 0.5 * TRAY_THICK
    # upper leg capsule axis direction: Rz(angle)*Ry(-135deg)*z
    # in the joint frame (rpy = angle about z then -135 about y), capsule
    # extends from the joint (outer end) to the inner end along +z
    m = 0.57  # capsule mass (density 1000)
    izz = 1e-5
    ixx = m * LEG_LEN**2 / 12.0
    return f"""
  <joint name="upper_leg_joint{i}" type="revolute">
    <parent link="tray"/><child link="upper_leg{i}"/>
    <origin xyz="{jx:.6f} {jy:.6f} {jz:.6f}" rpy="0 {-0.75*math.pi:.8f} {angle:.8f}"/>
    <axis xyz="0 1 0"/>
    <limit lower="-0.7854" upper="0.7854" effort="100" velocity="20"/>
  </joint>
  <link name="upper_leg{i}">
    <inertial><origin xyz="0 0 {LEG_LEN/2:.6f}"/><mass value="{m:.4f}"/>
      <inertia ixx="{ixx:.6f}" iyy="{ixx:.6f}" izz="{izz}" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision><origin xyz="0 0 {LEG_LEN/2:.6f}"/>
      <geometry><capsule radius="{LEG_R}" length="{LEG_LEN:.6f}"/></geometry></collision>
  </link>
  <joint name="lower_leg_joint{i}" type="revolute">
    <parent link="upper_leg{i}"/><child link="lower_leg{i}"/>
    <origin xyz="0 0 {LEG_LEN:.6f}" rpy="0 {-0.5*math.pi:.8f} 0"/>
    <axis xyz="0 1 0"/>
    <limit lower="-1.2217" upper="1.5708" effort="100" velocity="20"/>
  </joint>
  <link name="lower_leg{i}">
    <inertial><origin xyz="0 0 {LEG_LEN/2:.6f}"/><mass value="{m:.4f}"/>
      <inertia ixx="{ixx:.6f}" iyy="{ixx:.6f}" izz="{izz}" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision><origin xyz="0 0 {LEG_LEN/2:.6f}"/>
      <geometry><capsule radius="{LEG_R}" length="{LEG_LEN:.6f}"/></geometry></collision>
  </link>"""


def make_bbot_urdf() -> str:
    tray_m = 100 * math.pi * TRAY_RADIUS**2 * TRAY_THICK  # density 100
    ti = tray_m * TRAY_RADIUS**2 / 4
    legs = "".join(_leg_urdf_fragment(i, a) for i, a in
                   enumerate([0.0, 2 * math.pi / 3, 4 * math.pi / 3]))
    return f"""
<robot name="bbot">
  <link name="tray">
    <inertial><mass value="{tray_m:.4f}"/>
      <inertia ixx="{ti:.5f}" iyy="{ti:.5f}" izz="{2*ti:.5f}" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision><geometry><cylinder radius="{TRAY_RADIUS}" length="{TRAY_THICK}"/></geometry></collision>
  </link>{legs}
</robot>"""


BALL_URDF = f"""
<robot name="bball">
  <link name="ball"><inertial><mass value="1.0"/>
    <inertia ixx="0.004" iyy="0.004" izz="0.004" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision><geometry><sphere radius="{BALL_R}"/></geometry></collision>
  </link>
</robot>"""


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BBotTaskState:
    dof_targets: jnp.ndarray   # (B, 6) position targets (all bbot dofs)


class BallBalance(Task):
    num_obs = 24
    uses_net_torque = True   # 6-DOF force sensors read net_torque
    num_actions = 3
    max_episode_length = 500
    action_speed_scale = 20.0   # cfg/task/BallBalance.yaml actionSpeedScale

    def __init__(self, num_envs: int = 4096, seed: int = 42, **_):
        super().__init__(num_envs, seed)
        bbot = load_urdf(make_bbot_urdf())
        ball = load_urdf(BALL_URDF)
        scene = compose([
            (bbot, (0, 0, TRAY_H, 1, 0, 0, 0), "bbot/"),
            (ball, (0.2, 0, 1.0, 1, 0, 0, 0), "ball/"),
        ], name="ball_balance")
        d = scene._defaults
        # knee (lower-leg) joints position-driven (ball_balance.py:288-297)
        self.knees = [scene.dof_id(f"bbot/lower_leg_joint{i}") for i in range(3)]
        self.uppers = [scene.dof_id(f"bbot/upper_leg_joint{i}") for i in range(3)]
        mode = np.zeros(scene.nj, np.int32)
        kp = np.zeros(scene.nj, np.float32)
        kd = np.zeros(scene.nj, np.float32)
        eff = np.full(scene.nj, 30.0, np.float32)  # bounded knee actuators (soft attractor pins let 100+ Nm legs catapult the tray)
        for k in self.knees:
            mode[k] = DRIVE_POS
            kp[k] = 4000.0
            kd[k] = 100.0
        d["drive_mode"] = mode
        d["drive_stiffness"] = kp
        d["drive_damping"] = kd
        d["drive_effort_limit"] = eff
        # passive damping on all leg joints: the tray-leg-attractor spring
        # chain needs dissipation at explicit substeps (PhysX solves these
        # couplings implicitly)
        d["dof_damping"] = np.full(scene.nj, 2.0, np.float32)
        self.model = scene
        # 6-DOF sensors on the three lower legs only
        self.net_torque_bodies = tuple(
            scene.body_id(f"bbot/lower_leg{i}") for i in range(3))
        self.dof_lower = jnp.asarray(np.array(d["dof_lower"]))
        self.dof_upper = jnp.asarray(np.array(d["dof_upper"]))
        self.sim_params = SimParams(
            dt=1.0 / 60.0, substeps=8, gravity=(0.0, 0.0, -9.81),
            contact_stiffness=2.0e4, contact_damping=300.0,
            friction_vel=0.05, plane_friction=1.0,
            root_linear_damping=0.3, root_angular_damping=0.3)
        self.dt = self.sim_params.dt
        # feet pinned to the ground (attractors, :305-318); tip of each
        # lower leg (local z = LEG_LEN end)
        self.attractors = []
        for i, a in enumerate([0.0, 2 * math.pi / 3, 4 * math.pi / 3]):
            body = scene.body_id(f"bbot/lower_leg{i}")
            target = (LEG_OUTER * math.cos(a), LEG_OUTER * math.sin(a), LEG_R)
            # reference stiffness 5e7 is an implicit-solver value; use the
            # stiffest explicit-stable spring instead (clamped anyway)
            self.attractors.append(
                (body, (0.0, 0.0, LEG_LEN), target, 2.0e4, 100.0))
        self.tray_body = scene.body_id("bbot/tray")
        self.ball_body = scene.body_id("ball/ball")
        # state layout: bbot root (7) + ball root (7) + 6 joints
        self.ball_q0 = 7

    # ------------------------------------------------------------------
    def default_task_state(self, key):
        return BBotTaskState(jnp.zeros((self.num_envs, self.model.nj)))

    def reset_fn(self, key, params, task):
        ks = jax.random.split(key, 4)
        # bbot at rest pose
        bbot_root = jnp.array([0, 0, TRAY_H, 1, 0, 0, 0], jnp.float32)
        # ball: random radial pos, height, inward velocity (:365-390)
        ang = jax.random.uniform(ks[0], (), minval=-jnp.pi, maxval=jnp.pi)
        rad = jax.random.uniform(ks[1], (), minval=0.01, maxval=0.5 * TRAY_RADIUS)
        height = jax.random.uniform(ks[2], (), minval=1.0, maxval=2.0)
        hspeed = jax.random.uniform(ks[3], (), minval=1.0, maxval=2.0)
        px, py = rad * jnp.cos(ang), rad * jnp.sin(ang)
        # velocity toward the tray center, falling
        vdir = -jnp.stack([jnp.cos(ang), jnp.sin(ang)])
        ball_pos = jnp.stack([px, py, height])
        ball_vel = jnp.concatenate([vdir * hspeed * rad / TRAY_RADIUS, jnp.array([-5.0])])
        ball_root = jnp.concatenate([ball_pos, jnp.array([1.0, 0, 0, 0])])
        q = jnp.concatenate([bbot_root, ball_root, jnp.zeros(self.model.nj)])
        # ball root velocity: identity orientation -> body frame == world
        qd = jnp.concatenate([jnp.zeros(6), jnp.zeros(3), ball_vel,
                              jnp.zeros(self.model.nj)])
        task = BBotTaskState(jnp.zeros(self.model.nj))
        return q, qd, params, task

    def pre_physics(self, state, actions):
        B = actions.shape[0]
        t = state.task
        targets = t.dof_targets
        knee_ids = jnp.array(self.knees)
        delta = self.dt * self.action_speed_scale * actions
        targets = targets.at[:, knee_ids].add(delta)
        targets = jnp.clip(targets, self.dof_lower[None], self.dof_upper[None])
        ctrl = Controls(targets, jnp.zeros((B, self.model.nj)), jnp.zeros((B, self.model.nj)))
        wrench = jnp.zeros((B, self.model.nb, 6))
        return ctrl, wrench, BBotTaskState(targets)

    def post_physics(self, state, prev_task):
        B = state.q.shape[0]
        jq = state.q[:, 14:]
        jqd = state.qd[:, 12:]
        knee_ids = jnp.array(self.knees)
        ball_pos = state.q[:, 7:10]
        ball_quat = state.q[:, 10:14]
        ball_vel = state.qd[:, 9:12]        # root linear velocity: world frame

        # 6-DOF leg force sensors (tray-leg create_asset_force_sensor):
        # true contact wrench per lower leg, in the sensor (leg body) frame
        legs = [self.model.body_id(f"bbot/lower_leg{i}") for i in range(3)]
        frames = jax.vmap(
            lambda q1, qd1: forward_kinematics(self.model, q1, qd1))(
            state.q, state.qd)
        lq = frames.quat[:, jnp.asarray(legs)]                 # (B,3,4)
        leg_f = Q.rotate_inv(lq, state.net_contact[:, legs, :])
        leg_t = Q.rotate_inv(lq, state.net_torque[:, legs, :])
        # pack: forces of sensor0 + torques of the three sensors
        # (ball_balance.py:346-350)
        sensors = jnp.concatenate(
            [leg_f[:, 0], leg_t[:, 0], leg_t[:, 1], leg_t[:, 2]], axis=-1)
        obs = jnp.concatenate([
            jq[:, knee_ids], jqd[:, knee_ids],
            ball_pos, ball_vel,
            sensors / 20.0,
        ], axis=-1)

        dist = jnp.sqrt(ball_pos[:, 0] ** 2 + ball_pos[:, 1] ** 2
                        + (ball_pos[:, 2] - 0.7) ** 2)
        speed = jnp.linalg.norm(ball_vel, axis=-1)
        reward = 1.0 / (1.0 + dist) * 1.0 / (1.0 + speed)
        done = ball_pos[:, 2] < BALL_R * 1.5

        metrics = dict(state.metrics)
        metrics["ball_height"] = ball_pos[:, 2]
        metrics["ball_dist"] = dist
        return obs, reward, done.astype(jnp.float32), prev_task, metrics
