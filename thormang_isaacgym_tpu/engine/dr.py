"""Domain-randomization engine.

TPU-native replacement for the reference's `apply_randomizations`
(`/root/reference/isaacgymenvs/tasks/base/vec_task.py:496-768`): the same
declarative YAML schema — distributions (gaussian/uniform/loguniform),
operations (additive/scaling), linear/constant schedules, correlated +
uncorrelated obs/action noise, `setup_only`, friction `num_buckets`, actor
`scale`, sim_params gravity, per-actor rigid_body / rigid_shape / dof /
tendon property blocks — but instead of untensorized per-actor Python loops
through C++ property setters (the reference's own comment at vec_task.py:682
calls this out), every randomization is a masked update of a batched
ModelParams leaf, sampled from per-env PRNG streams and applied to ALL envs
in one op.

Differences from the reference, by design:
- Schedules key off the env's `global_step` (a traced scalar inside jit)
  instead of `gym.get_frame_count` — same linear/constant semantics
  (vec_task.py:584-590).
- The correlated noise sample (vec_task.py:612-620 `corr`) is redrawn at
  each env's DR event rather than frozen at first use — strictly more
  randomization, per-env instead of per-run.
- Frequency gating (vec_task.py:547-566) lives in `engine.env.VecEnv.step_fn`
  (an env re-randomizes on the first reset after `frequency` steps).

Property name -> ModelParams leaf mapping is `_LEAF_MAP` below; `scale`
maps to mass*s^3 / inertia*s^5 / com*s (volumetric scaling, the
`set_actor_scale` analog — collision geometry scaling is deferred, noted).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from thormang_isaacgym_tpu.models.robot import ModelParams, RobotModel

# (group, prop) -> (leaf name, mask kind). Mask kinds: body / geom / dof /
# tendon — which model index space the per-actor mask lives in.
_LEAF_MAP = {
    ("rigid_body_properties", "mass"): ("body_mass", "body"),
    ("rigid_shape_properties", "friction"): ("geom_friction", "geom"),
    ("rigid_shape_properties", "restitution"): ("geom_restitution", "geom"),
    ("dof_properties", "damping"): ("dof_damping", "dof"),
    ("dof_properties", "stiffness"): ("drive_stiffness", "dof"),
    ("dof_properties", "friction"): ("dof_friction", "dof"),
    ("dof_properties", "armature"): ("dof_armature", "dof"),
    ("dof_properties", "lower"): ("dof_lower", "dof"),
    ("dof_properties", "upper"): ("dof_upper", "dof"),
    ("dof_properties", "velocity"): ("dof_velocity_limit", "dof"),
    ("tendon_properties", "stiffness"): ("tendon_stiffness", "tendon"),
    ("tendon_properties", "damping"): ("tendon_damping", "tendon"),
}


def _sched_scale(spec: dict, global_step):
    """Schedule scaling factor (vec_task.py:584-590): linear ramps 0->1 over
    schedule_steps; constant switches 0->1 at schedule_steps; default 1."""
    sched = spec.get("schedule")
    if sched is None:
        return 1.0
    steps = float(spec.get("schedule_steps", 1))
    gs = jnp.asarray(global_step, jnp.float32)
    if sched == "linear":
        return jnp.minimum(gs / steps, 1.0)
    if sched == "constant":
        return (gs >= steps).astype(jnp.float32)
    raise ValueError(f"unknown schedule {sched!r}")


def _sched_range(spec: dict, rng, s):
    """Apply schedule scaling to a range the way the reference does
    (vec_task.py:592-605 / 624-637): additive ranges scale toward 0,
    scaling ranges interpolate toward the identity 1.0."""
    lo, hi = float(rng[0]), float(rng[1])
    op = spec.get("operation", "scaling")
    dist = spec.get("distribution", "uniform")
    if op == "additive":
        return lo * s, hi * s
    if dist in ("gaussian", "normal"):
        # (mu, var): mu -> lerp to 1, var -> scale down
        return lo * s + (1.0 - s), hi * s
    if dist == "loguniform":
        return lo ** s if isinstance(s, float) else jnp.exp(jnp.log(lo) * s), \
            hi ** s if isinstance(s, float) else jnp.exp(jnp.log(hi) * s)
    return lo * s + (1.0 - s), hi * s + (1.0 - s)


def _sample(key, spec: dict, shape, lo, hi):
    dist = spec.get("distribution", "uniform")
    if dist == "uniform":
        return lo + jax.random.uniform(key, shape) * (hi - lo)
    if dist in ("gaussian", "normal"):
        return lo + jax.random.normal(key, shape) * hi
    if dist == "loguniform":
        llo, lhi = jnp.log(lo), jnp.log(hi)
        return jnp.exp(llo + jax.random.uniform(key, shape) * (lhi - llo))
    raise ValueError(f"unknown distribution {dist}")


def _bucketize(sample, spec: dict, lo, hi):
    """friction num_buckets (vec_task.py check_buckets; the reference
    quantizes friction samples into at most 64KB of unique PhysX materials,
    anymal_terrain.py:233-237 hand-rolls the same idea)."""
    n = int(spec.get("num_buckets", 0))
    if n <= 0:
        return sample
    edges = jnp.round((sample - lo) / (hi - lo + 1e-12) * (n - 1))
    return lo + edges * (hi - lo) / (n - 1)


def _apply(op: str, base, sample):
    if op == "scaling":
        return base * sample
    if op == "additive":
        return base + sample
    raise ValueError(f"unknown operation {op}")


def _actor_masks(model: RobotModel | None, actor_name: str):
    """Index masks (body/geom/dof/tendon) for one named actor.

    Actor names resolve against scene compose prefixes ("hand/..." body
    names); a single-actor model or an unmatched name applies everywhere
    (the common case: the reference YAMLs name the only actor)."""
    if model is None:
        return {k: None for k in ("body", "geom", "dof", "tendon")}
    nb, ng, nj = model.nb, model.ng, model.nj
    prefix = actor_name.rstrip("/") + "/"
    body_m = np.array([1.0 if bn.startswith(prefix) else 0.0
                       for bn in model.body_names], np.float32)
    if body_m.sum() == 0:       # unmatched or single-actor: apply to all
        return {k: None for k in ("body", "geom", "dof", "tendon")}
    geom_m = np.array([body_m[g.body] for g in model.geoms], np.float32)
    dof_m = np.array([1.0 if jn.startswith(prefix) else 0.0
                      for jn in model.joint_names], np.float32)
    tendon_m = np.array([1.0 if (len(t) > 3 and str(t[3]).startswith(prefix))
                         else 0.0 for t in model.tendons], np.float32) \
        if model.tendons else np.zeros(0, np.float32)
    return {"body": body_m, "geom": geom_m, "dof": dof_m, "tendon": tendon_m}


def _masked(base, new, mask):
    if mask is None:
        return new
    m = jnp.asarray(mask)
    m = m.reshape(m.shape + (1,) * (base.ndim - m.ndim))
    return jnp.where(m > 0, new, base)


def parse_randomization_params(rp: dict, model: RobotModel | None = None):
    """Compile a reference-shaped `randomization_params` YAML block into the
    internal entry list. Returns (entries, obs_spec, act_spec, frequency).

    entries: list of dicts {leaf, spec, mask, setup_only, scale_power}."""
    entries = []
    sim = rp.get("sim_params", {})
    if "gravity" in sim:
        entries.append(dict(leaf="gravity", spec=sim["gravity"], mask=None,
                            setup_only=bool(sim["gravity"].get("setup_only", False))))
    for actor, groups in rp.get("actor_params", {}).items():
        masks = _actor_masks(model, actor)
        for group, props in groups.items():
            if group == "color":
                continue   # visual-only (no renderer on the perf path)
            if group == "scale":
                spec = props if isinstance(props, dict) else {}
                if "range" in spec:
                    entries.append(dict(
                        leaf="__scale__", spec=spec, mask=masks["body"],
                        setup_only=bool(spec.get("setup_only", False))))
                continue
            if not isinstance(props, dict):
                continue
            for prop, spec in props.items():
                if not isinstance(spec, dict) or "range" not in spec:
                    continue
                hit = _LEAF_MAP.get((group, prop))
                if hit is None:
                    continue
                leaf, kind = hit
                entries.append(dict(
                    leaf=leaf, spec=spec, mask=masks[kind],
                    setup_only=bool(spec.get("setup_only", False))))
    return (entries, rp.get("observations"), rp.get("actions"),
            int(rp.get("frequency", 600)))


def _apply_entry(e: dict, key, params, base_params, global_step):
    spec = e["spec"]
    s = _sched_scale(spec, global_step)
    lo, hi = _sched_range(spec, spec["range"], s)
    if e["leaf"] == "__scale__":
        # volumetric actor scale s: mass*s^3, inertia*s^5, com*s
        # (`set_actor_scale` analog; collision geom scale deferred — the
        # contact kernels read static geom sizes)
        sc = _sample(key, spec, base_params.body_mass.shape, lo, hi)
        m = e["mask"]
        return {
            "body_mass": _masked(params.body_mass,
                                 base_params.body_mass * sc ** 3, m),
            "body_inertia": _masked(
                params.body_inertia,
                base_params.body_inertia * (sc ** 5)[..., None, None], m),
            "body_com": _masked(params.body_com,
                                base_params.body_com * sc[..., None], m),
        }
    base = getattr(base_params, e["leaf"])
    sample = _sample(key, spec, base.shape, lo, hi)
    sample = _bucketize(sample, spec, lo, hi)
    new = _apply(spec.get("operation", "scaling"), base, sample)
    return {e["leaf"]: _masked(getattr(params, e["leaf"]), new, e["mask"])}


def make_dr_fn(dr_config: dict, model: RobotModel | None = None):
    """Compile a DR config into
    `fn(key, params, base_params, global_step, setup) -> params` (single-env;
    the engine vmaps; `setup` is a static flag — True at init applies
    setup_only entries too). base_params are the pristine defaults so
    repeated scaling never compounds.

    Accepts either the full reference `randomization_params` block or the
    legacy flat dict with top-level sim_params/actor_params."""
    entries, _, _, _ = parse_randomization_params(dr_config or {}, model)

    def dr_fn(key, params: ModelParams, base_params: ModelParams,
              global_step=0, setup: bool = False) -> ModelParams:
        updates = {}
        for i, e in enumerate(entries):
            if e["setup_only"] and not setup:
                continue
            k = jax.random.fold_in(key, i)
            updates.update(_apply_entry(e, k, params, base_params, global_step))
        return dataclasses.replace(params, **updates) if updates else params

    return dr_fn, len(entries) > 0


def make_noise_fn(noise_cfg: dict | None):
    """Observation/action noise (vec_task.py:576-646): gaussian or uniform,
    additive or scaling, with schedule and correlated component.

    Returns fn(key, x, corr, global_step) -> x' where `corr` is the per-env
    standard sample held fixed between DR events ((..., dim) ~N(0,1) or
    U(0,1)); pass None to skip the correlated part."""
    if not noise_cfg or "range" not in noise_cfg:
        return None
    op = noise_cfg.get("operation", "additive")
    spec = noise_cfg

    def fn(key, x, corr=None, global_step=0):
        s = _sched_scale(spec, global_step)
        lo, hi = _sched_range(spec, spec["range"], s)
        noise = _sample(key, spec, x.shape, lo, hi)
        if corr is not None and "range_correlated" in spec:
            clo, chi = _sched_range(spec, spec["range_correlated"], s)
            dist = spec.get("distribution", "uniform")
            if dist in ("gaussian", "normal"):
                noise = noise + corr * chi + clo
            else:
                noise = noise + corr * (chi - clo) + clo
        return _apply(op, x, noise)

    return fn
