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
    "Ant": ("thormang_isaacgym_tpu.tasks.ant", "Ant"),
    "Humanoid": ("thormang_isaacgym_tpu.tasks.humanoid", "Humanoid"),
    "Anymal": ("thormang_isaacgym_tpu.tasks.anymal", "Anymal"),
    "AnymalTerrain": ("thormang_isaacgym_tpu.tasks.anymal_terrain", "AnymalTerrain"),
    "BallBalance": ("thormang_isaacgym_tpu.tasks.ball_balance", "BallBalance"),
    "FrankaCabinet": ("thormang_isaacgym_tpu.tasks.franka_cabinet", "FrankaCabinet"),
    "FrankaCubeStack": ("thormang_isaacgym_tpu.tasks.franka_cube_stack", "FrankaCubeStack"),
    "Ingenuity": ("thormang_isaacgym_tpu.tasks.ingenuity", "Ingenuity"),
    "Quadcopter": ("thormang_isaacgym_tpu.tasks.quadcopter", "Quadcopter"),
}


def get_task_class(name: str):
    if name not in TASK_MAP:
        raise KeyError(f"unknown task {name!r}; known: {sorted(TASK_MAP)}")
    module, cls = TASK_MAP[name]
    return getattr(importlib.import_module(module), cls)


def make(task_name: str, num_envs: int | None = None, seed: int = 42, **overrides):
    """Instantiate a task and wrap it in a VecEnv.

    Parity with `isaacgymenvs.make` (`/root/reference/isaacgymenvs/__init__.py:14`).
    """
    from thormang_isaacgym_tpu.engine.env import VecEnv

    cls = get_task_class(task_name)
    kwargs = dict(overrides)
    if num_envs is not None:
        kwargs["num_envs"] = num_envs
    task = cls(seed=seed, **kwargs)
    # tasks may provide a heightfield ground (AnymalTerrain)
    ground_fn = None
    if hasattr(task, "ground_height_fn"):
        ground_fn = task.ground_height_fn()
    return VecEnv(task, ground_height_fn=ground_fn)
