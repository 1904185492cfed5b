"""Domain-randomization engine.

TPU-native replacement for the reference's `apply_randomizations`
(`/root/reference/isaacgymenvs/tasks/base/vec_task.py:496-768`): the same
declarative YAML schema (distribution gaussian/uniform, operation
additive/scaling, schedules, frequency gating, sim_params gravity +
actor rigid_body/rigid_shape/dof properties), but instead of untensorized
per-actor Python loops through C++ property setters (the reference's own
comment at vec_task.py:682 calls this out), every randomization is a masked
update of a batched ModelParams leaf — sampled from per-env PRNG streams,
applied to ALL envs in one op.

Frequency gating (vec_task.py:547-566): an env re-randomizes on the first
reset after `frequency` global steps since its last randomization.

Property name -> ModelParams leaf mapping:
  sim_params.gravity                      -> gravity
  actor_params.*.rigid_body_properties.mass     -> body_mass (per body)
  actor_params.*.rigid_shape_properties.friction -> geom_friction (per geom)
  actor_params.*.dof_properties.damping   -> dof_damping
  actor_params.*.dof_properties.stiffness -> drive_stiffness
  actor_params.*.dof_properties.lower/upper -> dof_lower/dof_upper
  actor_params.*.scale                    -> body_mass etc. (not yet: noted)
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from thormang_isaacgym_tpu.models.robot import ModelParams

_LEAF_MAP = {
    ("rigid_body_properties", "mass"): "body_mass",
    ("rigid_shape_properties", "friction"): "geom_friction",
    ("rigid_shape_properties", "restitution"): "geom_restitution",
    ("dof_properties", "damping"): "dof_damping",
    ("dof_properties", "stiffness"): "drive_stiffness",
    ("dof_properties", "friction"): "dof_friction",
    ("dof_properties", "armature"): "dof_armature",
    ("dof_properties", "lower"): "dof_lower",
    ("dof_properties", "upper"): "dof_upper",
}


def _sample(key, spec: dict, shape):
    dist = spec.get("distribution", "uniform")
    rng = spec["range"]
    if dist == "uniform":
        return rng[0] + jax.random.uniform(key, shape) * (rng[1] - rng[0])
    if dist in ("gaussian", "normal"):
        return rng[0] + jax.random.normal(key, shape) * rng[1]
    if dist == "loguniform":
        lo, hi = jnp.log(rng[0]), jnp.log(rng[1])
        return jnp.exp(lo + jax.random.uniform(key, shape) * (hi - lo))
    raise ValueError(f"unknown distribution {dist}")


def _apply(op: str, base, sample):
    if op == "scaling":
        return base * sample
    if op == "additive":
        return base + sample
    raise ValueError(f"unknown operation {op}")


def make_dr_fn(dr_config: dict):
    """Compile a DR config to fn(key, params, base_params) -> params.

    Single-env: params/base_params leaves have no batch axis; the engine
    vmaps. base_params are the pristine defaults so repeated scaling never
    compounds (the reference similarly samples from captured setup values).
    """
    entries = []  # (leaf_name, spec)
    sim = dr_config.get("sim_params", {})
    if "gravity" in sim:
        entries.append(("gravity", sim["gravity"]))
    for actor, groups in dr_config.get("actor_params", {}).items():
        for group, props in groups.items():
            if group == "color":
                continue
            for prop, spec in props.items():
                if not isinstance(spec, dict) or "range" not in spec:
                    continue
                leaf = _LEAF_MAP.get((group, prop))
                if leaf is None:
                    continue
                entries.append((leaf, spec))

    def dr_fn(key, params: ModelParams, base_params: ModelParams) -> ModelParams:
        updates = {}
        for i, (leaf, spec) in enumerate(entries):
            k = jax.random.fold_in(key, i)
            base = getattr(base_params, leaf)
            # one sample per element (uncorrelated across bodies/geoms/dofs)
            sample = _sample(k, spec, base.shape)
            updates[leaf] = _apply(spec.get("operation", "scaling"), base, sample)
        return dataclasses.replace(params, **updates) if updates else params

    return dr_fn, len(entries) > 0


def make_noise_fn(noise_cfg: dict | None):
    """Observation/action noise lambdas (vec_task.py:576-646): gaussian or
    uniform, additive or scaling. Returns fn(key, x) -> x."""
    if not noise_cfg or "range" not in noise_cfg:
        return lambda key, x: x
    op = noise_cfg.get("operation", "additive")
    spec = noise_cfg

    def fn(key, x):
        sample = _sample(key, spec, x.shape)
        return _apply(op, x, sample)

    return fn
