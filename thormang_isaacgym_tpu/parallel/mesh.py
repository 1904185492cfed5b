"""Device-mesh sharding of the PPO actor-learner.

TPU-native replacement for the reference's multi-GPU path (torchrun, one
process per GPU, per-rank sims, NCCL gradient all-reduce —
`/root/reference/isaacgymenvs/train.py:74-82`, `cfg/config.yaml:39-40`):
single-program multi-device JAX instead. The env axis is sharded over a 1-D
`jax.sharding.Mesh`; rollout is embarrassingly parallel (host-local envs,
zero rollout-time communication — the same property as the reference's
rank-local sims), and the learner's gradients cross chips as one `psum`
riding ICI per minibatch.

Works identically on: 1 real TPU chip (trivial mesh), N chips in a slice,
multi-host slices (jax.distributed + the same code), and N virtual CPU
devices for CI (`--xla_force_host_platform_device_count`).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from thormang_isaacgym_tpu.learn.ppo import PPO, PPOConfig

ENV_AXIS = "env"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (ENV_AXIS,))


def shard_ppo(ppo: PPO, mesh: Mesh | None = None):
    """Wrap an existing PPO's train iteration in shard_map over `mesh`.

    The PPO must have been constructed with `axis_name=ENV_AXIS` and with
    `env.num_envs` divisible by the mesh size; env-state leaves are sharded
    on their leading axis, train state is replicated.

    Returns (train_iter, init_fn):
      train_iter(ts, env_state, key) -> (ts, env_state, metrics)
      init_fn(key) -> (ts, env_state) with proper shardings applied
    """
    mesh = mesh if mesh is not None else make_mesh()
    n_dev = mesh.devices.size
    assert ppo.axis_name == ENV_AXIS, "construct PPO with axis_name=ENV_AXIS"
    assert ppo.env.num_envs % n_dev == 0

    # shard_map body: every array argument arrives as its local shard
    def body(ts, env_state, key):
        # decorrelate per-shard RNG (parity: per-rank seed offset, train.py:81)
        key = jax.random.fold_in(key, jax.lax.axis_index(ENV_AXIS))
        ts, env_state, metrics = ppo.train_iteration(ts, env_state, key)
        return ts, env_state, metrics

    replicated = P()
    sharded = P(ENV_AXIS)

    def env_specs(env_state):
        # every EnvState leaf with a leading env axis is sharded on it;
        # scalar leaves (PRNG key) replicated
        def spec(x):
            if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == ppo.env.num_envs:
                return sharded
            return replicated
        return jax.tree.map(spec, env_state)

    # the wrapped+jitted callable is built ONCE per env-state treedef and
    # cached — building it inside train_iter would create a fresh function
    # object (fresh jit cache entry -> recompile) every iteration
    _cache = {}

    def train_iter(ts, env_state, key):
        treedef = jax.tree.structure(env_state)
        fn = _cache.get(treedef)
        if fn is None:
            specs = env_specs(env_state)
            fn = jax.jit(jax.shard_map(
                body, mesh=mesh,
                in_specs=(replicated, specs, replicated),
                out_specs=(replicated, specs, replicated),
                check_vma=False,
            ), donate_argnums=(0, 1))
            _cache[treedef] = fn
        return fn(ts, env_state, key)

    train_iter.jit_cache = _cache  # introspection for tests

    def init_fn(key):
        ts = ppo.init(key)
        env_state = ppo.env.reset(key)
        # lay out the env state over the mesh
        def put(x, spec):
            return jax.device_put(x, NamedSharding(mesh, spec))
        specs = env_specs(env_state)
        env_state = jax.tree.map(put, env_state, specs)
        ts = jax.tree.map(lambda x: jax.device_put(x, NamedSharding(mesh, P())), ts)
        return ts, env_state

    return train_iter, init_fn
