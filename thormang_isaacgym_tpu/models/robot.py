"""Batched articulated robot model: the compile-time output of the asset
pipeline.

TPU-native replacement for the reference's C++ asset importer + per-actor
property system (spec: `gym.load_asset` / `get_asset_dof_*` /
`set_actor_dof_properties` usage at
`/root/reference/isaacgymenvs/tasks/gogoro_new.py:213-294`). Instead of an
opaque asset handle plus per-actor C++ property writes, a robot compiles to:

- :class:`RobotModel` — static topology (numpy, hashable, closed over jit):
  parent indices, joint types/axes, frame offsets, names.
- :class:`ModelParams` — every numeric property as a jnp pytree that can carry
  a leading env batch axis. Per-env heterogeneity (the reference's per-env
  `set_actor_dof_properties` loop at `gogoro_new.py:560-578`, friction buckets
  at `anymal_terrain.py:233-237`, the `multi_urdf/generated/*` per-env asset
  hack) is just a batched leaf here — domain randomization samples new leaves.

Joint model (generalized coordinates):
- the root joint is FREE (7 q: pos + wxyz quat, 6 qd: [omega_body, v_body])
  or FIXED (fix_base_link)
- every other movable joint is 1-DOF: REVOLUTE / CONTINUOUS / PRISMATIC
- FIXED child links are merged into their parent at compile time (inertia
  composed, collision geoms re-parented) but remain addressable as named
  frames for observations/sensors.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

# joint type codes (static numpy side)
FREE = 0
REVOLUTE = 1
PRISMATIC = 2
# continuous == revolute with no limits; encoded as REVOLUTE with inf limits

# drive mode codes (match gymapi.DOF_MODE_* semantics, vec into ModelParams)
DRIVE_NONE = 0
DRIVE_POS = 1
DRIVE_VEL = 2
DRIVE_EFFORT = 3


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ModelParams:
    """All numeric robot properties, as a jit-traceable pytree.

    Every leaf may carry a leading batch (env) axis; `vmap`-ing the physics
    step over envs with a batched ModelParams gives free per-env domain
    randomization.
    """
    # per-body (nb,)
    body_mass: jnp.ndarray          # (..., nb)
    body_com: jnp.ndarray           # (..., nb, 3) com offset in link frame
    body_inertia: jnp.ndarray       # (..., nb, 3, 3) about com, link frame
    # per-body gravity multiplier (asset_options.disable_gravity equivalent,
    # franka_cube_stack.py:201 — 0.0 disables gravity on the whole actor)
    body_gravity_scale: jnp.ndarray  # (..., nb)
    # per-dof (nv_1dof = nv minus root dofs)
    dof_armature: jnp.ndarray       # (..., nj)
    dof_damping: jnp.ndarray        # (..., nj) passive joint damping
    dof_friction: jnp.ndarray       # (..., nj) dry friction coefficient
    dof_lower: jnp.ndarray          # (..., nj)
    dof_upper: jnp.ndarray          # (..., nj)
    dof_velocity_limit: jnp.ndarray  # (..., nj)
    # drives (set_actor_dof_properties equivalents)
    drive_mode: jnp.ndarray         # (..., nj) int32 DRIVE_*
    drive_stiffness: jnp.ndarray    # (..., nj)
    drive_damping: jnp.ndarray      # (..., nj)
    drive_effort_limit: jnp.ndarray  # (..., nj)
    # frozen joints: q pinned to locked_pos, qd = 0 (first-class version of
    # the reference's lower==upper limit hack, gogoro_new.py:257-262)
    dof_locked: jnp.ndarray         # (..., nj) bool/float mask
    dof_locked_pos: jnp.ndarray     # (..., nj)
    # per-geom contact params
    geom_friction: jnp.ndarray      # (..., ng)
    geom_restitution: jnp.ndarray   # (..., ng)
    # fixed-tendon limit springs (RobotModel.tendons; (..., nt) — nt may be 0)
    tendon_stiffness: jnp.ndarray   # (..., nt)
    tendon_damping: jnp.ndarray     # (..., nt)
    # per-env gravity vector (DR target: sim_params gravity scaling,
    # vec_task.py:648-660)
    gravity: jnp.ndarray            # (..., 3)

    def batch(self, num_envs: int) -> "ModelParams":
        """Broadcast every leaf to a leading env axis."""
        return jax.tree.map(
            lambda x: jnp.broadcast_to(x, (num_envs,) + x.shape), self
        )


# geom type codes
GEOM_SPHERE = 0
GEOM_CAPSULE = 1
GEOM_BOX = 2
GEOM_CYLINDER = 3   # wheel-style disk: contact at rim circle


@dataclasses.dataclass(frozen=True)
class Geom:
    """A collision primitive attached to a body (static description)."""
    body: int              # body index
    gtype: int             # GEOM_*
    size: tuple            # sphere: (r,), capsule: (r, half_len), box: (hx,hy,hz), cylinder: (r, half_w)
    pos: tuple             # offset in body frame
    quat: tuple            # orientation in body frame (w,x,y,z); axis = local z for capsule/cylinder... cylinder axis = local y (wheel spin axis)
    name: str = ""
    # ground-plane contact opt-out (trace-time): a geom that must ignore
    # the scene's ground surface while keeping actor-pair collision. The
    # IsaacGym analog is a plane whose segmentation excludes an actor —
    # used when the "ground" models a TABLETOP that only part of the scene
    # rests on (factory: the franka stands on the floor BEHIND the table
    # box; its links must not collide with the table's infinite plane)
    ground: bool = True


@dataclasses.dataclass(frozen=True)
class RobotModel:
    """Static articulated-body topology. Hashable; closed over by jit.

    Bodies are stored in topological order (parent index < body index).
    Body 0 is the root link. nj = number of 1-DOF joints; nv = root_nv + nj;
    nq = root_nq + nj.
    """
    name: str
    # topology (tuples so the dataclass stays hashable)
    body_names: tuple            # (nb,)
    parent: tuple                # (nb,) parent body index; -1 for root
    # joint connecting body i to its parent (i >= 1); root joint handled via floating
    joint_names: tuple           # (nb-1,) name of joint of body i (i-1 indexed)
    joint_type: tuple            # (nb-1,) REVOLUTE | PRISMATIC
    joint_axis: tuple            # (nb-1, 3)
    joint_pos: tuple             # (nb-1, 3) joint frame origin in parent frame
    joint_quat: tuple            # (nb-1, 4) joint frame rotation in parent frame (w,x,y,z)
    dof_index: tuple             # (nb-1,) index into the 1-DOF arrays, or -1 if... all movable
    floating: bool               # True: root 0 is a free joint
    geoms: tuple                 # tuple[Geom]
    # ---- multi-actor scene support (models/scene.compose) ----
    # bodies 0..n_roots-1 are tree roots (depth 0, parent -1); a scene of
    # composed actors has one root per actor. Single-actor models keep the
    # defaults below.
    n_roots: int = 1
    root_floating: tuple = None   # per-root floating flags; None -> (floating,)
    root_base_pose: tuple = None  # per-root static pose (pos3+quat4) for FIXED roots
    body_actor: tuple = None      # (nb,) actor index per body; None -> all 0
    # named frames on merged fixed links: name -> (body, pos, quat)
    sites: Any = dataclasses.field(default_factory=dict, hash=False, compare=False)
    # fixed tendons (MJCF <tendon><fixed> equivalent, the reference's
    # get/set_asset_tendon_properties surface, shadow_hand.py:252-268):
    # tuple of (coef (nj,), lo, hi, name) — the tendon length L = coef . q
    # is spring-constrained to [lo, hi] with per-tendon stiffness/damping
    # living in ModelParams (DR target: "tendon_properties" blocks).
    tendons: tuple = ()
    # default numeric params (numpy, converted to ModelParams by default_params)
    _defaults: Any = dataclasses.field(default=None, hash=False, compare=False)

    # ---- derived sizes ----
    @property
    def nb(self) -> int:
        return len(self.body_names)

    @property
    def nj(self) -> int:
        return self.nb - self.n_roots

    @property
    def roots_floating(self) -> tuple:
        return self.root_floating if self.root_floating is not None else (self.floating,)

    @property
    def n_floating(self) -> int:
        return sum(1 for f in self.roots_floating if f)

    @property
    def actors(self) -> tuple:
        return self.body_actor if self.body_actor is not None else (0,) * self.nb

    @property
    def root_nq(self) -> int:
        return 7 * self.n_floating

    @property
    def root_nv(self) -> int:
        return 6 * self.n_floating

    @property
    def nq(self) -> int:
        return self.root_nq + self.nj

    @property
    def nv(self) -> int:
        return self.root_nv + self.nj

    @property
    def ng(self) -> int:
        return len(self.geoms)

    @property
    def dof_names(self) -> tuple:
        """DOF names in order — parity with get_asset_dof_names."""
        return self.joint_names

    def dof_id(self, name: str) -> int:
        """Joint name -> dof index (reference: dof_name_to_id map,
        `gogoro_new.py:219`)."""
        return self.joint_names.index(name)

    def body_id(self, name: str) -> int:
        return self.body_names.index(name)

    def geom_id(self, name: str) -> int:
        for i, g in enumerate(self.geoms):
            if g.name == name:
                return i
        raise KeyError(name)

    def default_params(self) -> ModelParams:
        """Unbatched ModelParams holding the URDF-derived defaults."""
        d = self._defaults
        return ModelParams(**{k: jnp.asarray(v) for k, v in d.items()})

    # convenience static arrays for the dynamics kernels
    def np_topology(self):
        return (
            np.array(self.parent, dtype=np.int32),
            np.array(self.joint_type, dtype=np.int32),
            np.array(self.joint_axis, dtype=np.float32),
            np.array(self.joint_pos, dtype=np.float32),
            np.array(self.joint_quat, dtype=np.float32),
        )


def make_defaults(
    nb: int,
    nj: int,
    ng: int,
    *,
    body_mass,
    body_com,
    body_inertia,
    dof_lower,
    dof_upper,
    dof_velocity_limit,
    dof_damping=None,
    dof_friction=None,
    armature: float = 0.0,
    geom_friction=None,
    gravity=(0.0, 0.0, -9.81),
    gravity_scale: float = 1.0,
    num_tendons: int = 0,
) -> dict:
    """Build the defaults dict for RobotModel._defaults."""
    z = lambda *s: np.zeros(s, dtype=np.float32)
    return dict(
        tendon_stiffness=z(num_tendons),
        tendon_damping=z(num_tendons),
        gravity=np.asarray(gravity, np.float32),
        body_gravity_scale=np.full(nb, gravity_scale, np.float32),
        body_mass=np.asarray(body_mass, np.float32),
        body_com=np.asarray(body_com, np.float32),
        body_inertia=np.asarray(body_inertia, np.float32),
        dof_armature=np.full(nj, armature, np.float32),
        dof_damping=np.asarray(dof_damping, np.float32) if dof_damping is not None else z(nj),
        dof_friction=np.asarray(dof_friction, np.float32) if dof_friction is not None else z(nj),
        dof_lower=np.asarray(dof_lower, np.float32),
        dof_upper=np.asarray(dof_upper, np.float32),
        dof_velocity_limit=np.asarray(dof_velocity_limit, np.float32),
        drive_mode=np.zeros(nj, np.int32),
        drive_stiffness=z(nj),
        drive_damping=z(nj),
        drive_effort_limit=np.full(nj, 1e9, np.float32),
        dof_locked=z(nj),
        dof_locked_pos=z(nj),
        geom_friction=np.asarray(geom_friction, np.float32) if geom_friction is not None else np.full(ng, 1.0, np.float32),
        geom_restitution=z(ng),
    )
