from thormang_isaacgym_tpu.learn.ppo import PPO, PPOConfig, TrainState  # noqa: F401
from thormang_isaacgym_tpu.learn.networks import ActorCritic  # noqa: F401
