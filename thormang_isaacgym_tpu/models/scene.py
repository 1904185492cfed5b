"""Multi-actor scene composition.

TPU-native replacement for the reference's multi-actor env construction
(`gym.create_env` + repeated `gym.create_actor` with per-actor state slices,
e.g. BallBalance tray+ball `tasks/ball_balance.py`, FrankaCabinet
franka+cabinet+props, MA_OP3 two-robots+table
`tasks/MA_OP3.py:166-307`): N single-actor RobotModels compose into ONE
forest-structured RobotModel whose dynamics sweeps run unchanged — bodies
are renumbered so all actor roots come first (depth 0) and deeper levels
stay contiguous, preserving the banded scatter-free sweep structure.

State layout of the composed model:
  q  = [7 values per FLOATING root (actor order), all joint_q]
  qd = [6 values per floating root, all joint_qd]
Fixed-base actors contribute no root state; their pose is the static
`base_pose` given at composition.
"""
from __future__ import annotations

import numpy as np

from thormang_isaacgym_tpu.models.robot import Geom, RobotModel, ModelParams


def compose(actors, name="scene") -> RobotModel:
    """actors: list of (model, base_pose) or (model, base_pose, prefix).

    base_pose: 7-tuple (pos3, quat4 wxyz) — static pose for fixed-base
    actors, initial/default pose otherwise. Joint/body names get `prefix/`
    (default: actor{i}/ on name collisions only).
    """
    models, poses, prefixes = [], [], []
    for i, a in enumerate(actors):
        m, pose = a[0], a[1]
        prefixes.append(a[2] if len(a) > 2 else None)
        models.append(m)
        poses.append(tuple(pose))

    n_actors = len(models)
    # auto prefixes on collisions
    all_names = [n for m in models for n in m.body_names + m.joint_names]
    need_prefix = len(set(all_names)) != len(all_names)
    for i in range(n_actors):
        if prefixes[i] is None:
            prefixes[i] = f"{models[i].name}{i}/" if need_prefix else ""

    # ---- compute depths per body of each model ----
    def depths(m):
        d = np.zeros(m.nb, np.int32)
        for b in range(m.nb):
            if m.parent[b] >= 0:
                d[b] = d[m.parent[b]] + 1
        return d

    all_depths = [depths(m) for m in models]
    max_depth = max(int(d.max()) for d in all_depths)

    # new body order: depth-major, actor-minor, original-minor
    order = []  # (actor, old_body)
    for dep in range(0, max_depth + 1):
        for ai, m in enumerate(models):
            for b in range(m.nb):
                if all_depths[ai][b] == dep:
                    order.append((ai, b))
    new_index = {(ai, b): i for i, (ai, b) in enumerate(order)}

    body_names, parent, body_actor = [], [], []
    joint = dict(names=[], type=[], axis=[], pos=[], quat=[])
    geoms = []
    sites = {}
    # per-joint defaults reordered; per-body defaults reordered
    dkeys_body = ("body_mass", "body_com", "body_inertia",
                  "body_gravity_scale")
    dkeys_joint = ("dof_armature", "dof_damping", "dof_friction", "dof_lower",
                   "dof_upper", "dof_velocity_limit", "drive_mode",
                   "drive_stiffness", "drive_damping", "drive_effort_limit",
                   "dof_locked", "dof_locked_pos")
    dkeys_geom = ("geom_friction", "geom_restitution")
    dnew = {k: [] for k in dkeys_body + dkeys_joint + dkeys_geom}

    joint_new = {}  # (actor, old joint idx) -> new joint idx
    for i, (ai, b) in enumerate(order):
        m = models[ai]
        pfx = prefixes[ai]
        body_names.append(pfx + m.body_names[b])
        body_actor.append(ai)
        p = m.parent[b]
        parent.append(-1 if p < 0 else new_index[(ai, p)])
        for k in dkeys_body:
            dnew[k].append(np.asarray(m._defaults[k])[b])
        if p >= 0:
            j = b - m.n_roots  # joint index within its model
            joint_new[(ai, j)] = len(joint["names"])
            joint["names"].append(pfx + m.joint_names[j])
            joint["type"].append(m.joint_type[j])
            joint["axis"].append(m.joint_axis[j])
            joint["pos"].append(m.joint_pos[j])
            joint["quat"].append(m.joint_quat[j])
            for k in dkeys_joint:
                dnew[k].append(np.asarray(m._defaults[k])[j])

    for ai, m in enumerate(models):
        pfx = prefixes[ai]
        for g in m.geoms:
            geoms.append(Geom(
                body=new_index[(ai, g.body)], gtype=g.gtype, size=g.size,
                pos=g.pos, quat=g.quat, name=pfx + g.name))
        for k in dkeys_geom:
            dnew[k].extend(np.asarray(m._defaults[k]).tolist())
        for sname, (b, p, qt) in (m.sites or {}).items():
            sites[pfx + sname] = (new_index[(ai, b)], p, qt)

    defaults = {k: np.asarray(v, np.float32) if k != "drive_mode"
                else np.asarray(v, np.int32) for k, v in dnew.items()}
    defaults["gravity"] = np.asarray(models[0]._defaults["gravity"], np.float32)

    # fixed tendons: remap each actor's coefficient vectors into the
    # composed joint numbering; concat per-tendon params
    nj_total = len(joint["names"])
    tendons = []
    t_stiff, t_damp = [], []
    for ai, m in enumerate(models):
        t_stiff.extend(np.asarray(m._defaults.get(
            "tendon_stiffness", np.zeros(len(m.tendons)))).tolist())
        t_damp.extend(np.asarray(m._defaults.get(
            "tendon_damping", np.zeros(len(m.tendons)))).tolist())
        for (coef, lo, hi, tname) in m.tendons:
            new_coef = np.zeros(nj_total, np.float32)
            for j_old, c in enumerate(np.asarray(coef)):
                if c != 0.0:
                    new_coef[joint_new[(ai, j_old)]] = c
            tendons.append((tuple(new_coef.tolist()), lo, hi,
                            prefixes[ai] + tname))
    defaults["tendon_stiffness"] = np.asarray(t_stiff, np.float32)
    defaults["tendon_damping"] = np.asarray(t_damp, np.float32)

    root_floating = tuple(bool(m.roots_floating[0]) for m in models)
    return RobotModel(
        name=name,
        body_names=tuple(body_names),
        parent=tuple(parent),
        joint_names=tuple(joint["names"]),
        joint_type=tuple(joint["type"]),
        joint_axis=tuple(joint["axis"]),
        joint_pos=tuple(joint["pos"]),
        joint_quat=tuple(joint["quat"]),
        dof_index=tuple(range(len(joint["names"]))),
        floating=root_floating[0],
        geoms=tuple(geoms),
        sites=sites,
        tendons=tuple(tendons),
        _defaults=defaults,
        n_roots=n_actors,
        root_floating=root_floating,
        root_base_pose=tuple(poses),
        body_actor=tuple(body_actor),
    )


def scene_q(model: RobotModel, root_states: list, joint_q: np.ndarray):
    """Assemble a q vector: root_states = per-FLOATING-root 7-vectors in
    actor order (fixed actors skipped)."""
    import jax.numpy as jnp

    parts = [jnp.asarray(np.asarray(r, np.float32)) for r in root_states]
    return jnp.concatenate(parts + [jnp.asarray(joint_q)]) if parts else jnp.asarray(joint_q)
