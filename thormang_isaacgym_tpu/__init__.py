"""thormang_isaacgym_tpu — a TPU-native vectorized robotics-RL framework.

Brand-new JAX/XLA/Pallas implementation of the capabilities of the
`Yougo-robotics/thormang_isaacgym` IsaacGymEnvs fork: URDF assets compile to a
batched articulated rigid-body model, Featherstone forward dynamics + joint
drives + contact run as one jit/vmapped XLA program across thousands of envs,
task observation/reward/reset logic is fused device-side, and a sharded PPO
actor-learner trains over a `jax.sharding.Mesh`.

Public entry point mirroring the reference's `isaacgymenvs.make()`
(`/root/reference/isaacgymenvs/__init__.py:14-55`):

    import thormang_isaacgym_tpu as tgx
    env = tgx.make("Gogoro", num_envs=4096, seed=42)
"""

__version__ = "0.1.0"


def make(task_name: str, num_envs: int | None = None, seed: int = 42, **overrides):
    """Create a task environment by registry name.

    Parity with `isaacgymenvs.make` (`/root/reference/isaacgymenvs/__init__.py:14`):
    loads the task's YAML config, applies overrides, and instantiates the task.
    """
    from thormang_isaacgym_tpu.tasks import make as _make

    return _make(task_name, num_envs=num_envs, seed=seed, **overrides)
