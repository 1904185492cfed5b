from thormang_isaacgym_tpu.engine.env import EnvState, Task, VecEnv  # noqa: F401
