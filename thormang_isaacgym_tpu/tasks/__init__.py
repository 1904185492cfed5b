"""Task registry — parity with
`/root/reference/isaacgymenvs/tasks/__init__.py:54-78` (isaacgym_task_map).

Tasks register lazily (import on first use) so importing the package does not
pay for every task's asset compilation.
"""
from __future__ import annotations

import importlib

# name -> (module, class). Mirrors the reference's isaacgym_task_map; entries
# are added as task families land.
TASK_MAP = {
    "Cartpole": ("thormang_isaacgym_tpu.tasks.cartpole", "Cartpole"),
    "Gogoro": ("thormang_isaacgym_tpu.tasks.gogoro", "Gogoro"),
    "GogoroPaper": ("thormang_isaacgym_tpu.tasks.gogoro_paper",
                    "GogoroPaper"),
    "GogoroCombined": ("thormang_isaacgym_tpu.tasks.gogoro_combined",
                       "GogoroCombined"),
    "Ant": ("thormang_isaacgym_tpu.tasks.ant", "Ant"),
    "Humanoid": ("thormang_isaacgym_tpu.tasks.humanoid", "Humanoid"),
    "HumanoidMJCF": ("thormang_isaacgym_tpu.tasks.humanoid", "HumanoidMJCF"),
    "Anymal": ("thormang_isaacgym_tpu.tasks.anymal", "Anymal"),
    "AnymalTerrain": ("thormang_isaacgym_tpu.tasks.anymal_terrain", "AnymalTerrain"),
    "BallBalance": ("thormang_isaacgym_tpu.tasks.ball_balance", "BallBalance"),
    "FrankaCabinet": ("thormang_isaacgym_tpu.tasks.franka_cabinet", "FrankaCabinet"),
    "FrankaCubeStack": ("thormang_isaacgym_tpu.tasks.franka_cube_stack", "FrankaCubeStack"),
    "Ingenuity": ("thormang_isaacgym_tpu.tasks.ingenuity", "Ingenuity"),
    "Quadcopter": ("thormang_isaacgym_tpu.tasks.quadcopter", "Quadcopter"),
    "ShadowHand": ("thormang_isaacgym_tpu.tasks.shadow_hand", "ShadowHand"),
    "AllegroHand": ("thormang_isaacgym_tpu.tasks.allegro_hand", "AllegroHand"),
    "FactoryTaskNutBoltPick": ("thormang_isaacgym_tpu.tasks.factory",
                               "FactoryTaskNutBoltPick"),
    "FactoryTaskNutBoltPlace": ("thormang_isaacgym_tpu.tasks.factory",
                                "FactoryTaskNutBoltPlace"),
    "FactoryTaskNutBoltScrew": ("thormang_isaacgym_tpu.tasks.factory",
                                "FactoryTaskNutBoltScrew"),
    "FactoryTaskInsertion": ("thormang_isaacgym_tpu.tasks.factory",
                             "FactoryTaskInsertion"),
    "FactoryTaskGears": ("thormang_isaacgym_tpu.tasks.factory",
                         "FactoryTaskGears"),
    "HumanoidAMP": ("thormang_isaacgym_tpu.tasks.humanoid_amp",
                    "HumanoidAMP"),
    "MA_OP3": ("thormang_isaacgym_tpu.tasks.ma_op3", "MA_OP3"),
    "Trifinger": ("thormang_isaacgym_tpu.tasks.trifinger", "Trifinger"),
}


def get_task_class(name: str):
    if name not in TASK_MAP:
        raise KeyError(f"unknown task {name!r}; known: {sorted(TASK_MAP)}")
    module, cls = TASK_MAP[name]
    return getattr(importlib.import_module(module), cls)


# reference env-block keys -> constructor kwargs (when present, these must
# reach __init__ because they shape the model/obs space)
_CTOR_KEYS = {
    "observationType": "obs_type",
    "asymmetric_observations": "asymmetric_obs",
    "controlType": "control_type",
    # AMP (cfg/task/HumanoidAMP.yaml env block)
    "stateInit": "state_init",
    "numAMPObsSteps": "num_amp_obs_steps",
    "motion_file": "motion_file",
}
# reference env-block keys -> Task attribute names that don't follow plain
# camelCase -> snake_case
_ATTR_ALIASES = {
    "episodeLength": "max_episode_length",
    "clipObservations": "clip_obs",
    "clipActions": "clip_actions",
    "controlFrequencyInv": "control_freq_inv",
    # ShadowHand/AllegroHand env-block keys (shadow_hand.py:43-76 reads
    # these under different snake-case names than camel->snake produces)
    "fallDistance": "fall_dist",
    "fallPenalty": "fall_penalty",
    "actionsMovingAverage": "act_moving_average",
    "resetPositionNoise": "reset_position_noise",
    "resetDofPosRandomInterval": "reset_dof_pos_noise",
    "resetDofVelRandomInterval": "reset_dof_vel_noise",
    "dofSpeedScale": "dof_speed_scale",
    "successTolerance": "success_tolerance",
    "reachGoalBonus": "reach_goal_bonus",
    "rotRewardScale": "rot_reward_scale",
    "distRewardScale": "dist_reward_scale",
    "actionPenaltyScale": "action_penalty_scale",
    "rotEps": "rot_eps",
    "maxConsecutiveSuccesses": "max_consecutive_successes",
    "averFactor": "av_factor",
    "useRelativeControl": "use_relative_control",
    "forceScale": "force_scale",
}


def _camel_to_snake(s: str) -> str:
    import re
    return re.sub(r"(?<!^)(?=[A-Z])", "_", s).lower()


# env-block keys legitimately consumed elsewhere (constructor, engine, sim
# construction) — not attribute targets, so no drift warning for them
_CONSUMED_KEYS = {
    "numEnvs", "numObservations", "numStates", "numActions", "envSpacing",
    "observationType", "asymmetric_observations", "controlType",
    "enableDebugVis", "enableCameraSensors", "aggregateMode", "physics_engine",
    "stateInit", "numAMPObsSteps", "motion_file",
}


def apply_cfg_env(task, env_cfg: dict, *, warn_unknown: bool = True):
    """Drive task attributes from a reference-shaped task YAML env block
    (`cfg/task/<X>.yaml: env:`): every key maps to the camelCase->snake_case
    attribute when the task defines it (distRewardScale -> dist_reward_scale,
    ...), plus the alias table above. Keys that match nothing are WARNED
    about (config drift is otherwise invisible — a typo'd YAML key silently
    no-ops)."""
    import warnings
    for k, v in (env_cfg or {}).items():
        if isinstance(v, dict) or k in _CONSUMED_KEYS:
            continue
        attr = _ATTR_ALIASES.get(k, _camel_to_snake(k))
        if hasattr(task, attr) and not callable(getattr(task, attr)):
            setattr(task, attr, v)
        elif warn_unknown:
            warnings.warn(
                f"task config key {k!r} (-> {attr!r}) matches no attribute "
                f"of {type(task).__name__}; ignored", stacklevel=2)
    return task


def make(task_name: str, num_envs: int | None = None, seed: int = 42,
         cfg: dict | None = None, **overrides):
    """Instantiate a task and wrap it in a VecEnv.

    Parity with `isaacgymenvs.make` (`/root/reference/isaacgymenvs/__init__.py:14`).
    `cfg` is a reference-shaped task config dict (cfg/task/<X>.yaml): its
    env block drives task parameters; `task.randomize` switches DR on.
    """
    from thormang_isaacgym_tpu.engine.env import VecEnv

    cls = get_task_class(task_name)
    kwargs = dict(overrides)
    stagger = bool(kwargs.pop("stagger_episodes", False))
    env_cfg = (cfg or {}).get("env", {})
    for ykey, ckey in _CTOR_KEYS.items():
        if ykey in env_cfg and ckey not in kwargs:
            kwargs[ckey] = env_cfg[ykey]
    task_blk = (cfg or {}).get("task", {})
    if isinstance(task_blk, dict) and "randomize" in task_blk \
            and "randomize" not in kwargs:
        kwargs["randomize"] = bool(task_blk["randomize"])
    if num_envs is not None:
        kwargs["num_envs"] = num_envs
    elif "numEnvs" in env_cfg:
        kwargs["num_envs"] = int(env_cfg["numEnvs"])
    task = cls(seed=seed, **kwargs)
    if env_cfg:
        apply_cfg_env(task, env_cfg)
    # YAML randomization_params drive the DR engine end-to-end (the
    # reference schema, vec_task.py:496-768); overrides any hand-rolled
    # task dr_config subset
    if isinstance(task_blk, dict) and task_blk.get("randomize") \
            and isinstance(task_blk.get("randomization_params"), dict):
        task.dr_config = task_blk["randomization_params"]
    # tasks may provide a heightfield ground (AnymalTerrain)
    ground_fn = None
    if hasattr(task, "ground_height_fn"):
        ground_fn = task.ground_height_fn()
    return VecEnv(task, ground_height_fn=ground_fn,
                  stagger_episodes=stagger)
