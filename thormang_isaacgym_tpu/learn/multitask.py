"""Mixed multi-task batch training — one shared, sharded train iteration
covering several tasks (driver config #4: "Mixed multi-task batch (scooter
+ humanoid variants) sharded across 1 host, shared learner").

The reference has no multi-task machinery; running two tasks there means
two processes with two sims. The TPU-native version compiles ALL tasks'
PPO iterations (rollout scan + minibatch updates, one policy/learner per
task) into ONE jitted XLA program:

- no per-task recompilation (SURVEY.md §7.3 item 7): the program is traced
  once over every task and reused each epoch; task heterogeneity
  (different obs/action dims, different physics models) is resolved at
  trace time, not by retracing,
- one launch per epoch amortizes dispatch across tasks, and XLA is free to
  interleave independent per-task computations,
- the env axis of EVERY task is sharded over the same 1-D device mesh
  (parallel/mesh.py layout); each task's learner all-reduces its own
  gradients over ICI inside the shared program.
"""
from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from thormang_isaacgym_tpu.learn.ppo import PPO, PPOConfig
from thormang_isaacgym_tpu.parallel.mesh import ENV_AXIS, make_mesh


class MultiTaskPPO:
    """N independent PPO learners stepped by one compiled iteration.

    envs: {task_name: VecEnv}; cfgs: {task_name: PPOConfig}.
    mesh=None runs unsharded (single device); pass a Mesh (or True for the
    default full-device mesh) to shard every task's env axis over it.
    """

    def __init__(self, envs: dict, cfgs: dict, mesh=None):
        assert set(envs) == set(cfgs) and envs
        self.names = sorted(envs)
        if mesh is True:
            mesh = make_mesh()
        self.mesh = mesh
        axis = ENV_AXIS if mesh is not None else None
        self.algos = {n: PPO(envs[n], cfgs[n], axis_name=axis)
                      for n in self.names}
        if mesh is not None:
            for n in self.names:
                assert envs[n].num_envs % mesh.devices.size == 0, \
                    f"{n}: num_envs must divide the mesh"
        self._iter = None

    # ------------------------------------------------------------------
    def _body(self, tss, env_states, key):
        out_ts, out_es, mets = {}, {}, {}
        for i, name in enumerate(self.names):
            k = jax.random.fold_in(key, i)
            ts, es, m = self.algos[name].train_iteration(
                tss[name], env_states[name], k)
            out_ts[name], out_es[name], mets[name] = ts, es, m
        return out_ts, out_es, mets

    def _env_specs(self, env_states):
        def per_task(name):
            B = self.algos[name].env.num_envs

            def spec(x):
                if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == B:
                    return P(ENV_AXIS)
                return P()
            return jax.tree.map(spec, env_states[name])
        return {n: per_task(n) for n in self.names}

    # ------------------------------------------------------------------
    def init(self, key):
        tss, ess = {}, {}
        for i, name in enumerate(self.names):
            k1, k2 = jax.random.split(jax.random.fold_in(key, i))
            tss[name] = self.algos[name].init(k1)
            ess[name] = self.algos[name].env.reset(k2)
        if self.mesh is not None:
            specs = self._env_specs(ess)
            for n in self.names:
                ess[n] = jax.tree.map(
                    lambda x, s: jax.device_put(
                        x, NamedSharding(self.mesh, s)), ess[n], specs[n])
                tss[n] = jax.tree.map(
                    lambda x: jax.device_put(
                        x, NamedSharding(self.mesh, P())), tss[n])
        return tss, ess

    def train_iteration(self, tss, env_states, key):
        """One shared epoch over ALL tasks. Compiled exactly once."""
        if self._iter is None:
            if self.mesh is not None:
                specs = self._env_specs(env_states)

                def body(tss, ess, key):
                    key = jax.random.fold_in(
                        key, jax.lax.axis_index(ENV_AXIS))
                    return self._body(tss, ess, key)

                self._iter = jax.jit(jax.shard_map(
                    body, mesh=self.mesh,
                    in_specs=({n: P() for n in self.names}, specs, P()),
                    out_specs=({n: P() for n in self.names}, specs,
                               {n: P() for n in self.names}),
                    check_vma=False,
                ), donate_argnums=(0, 1))
            else:
                self._iter = jax.jit(self._body, donate_argnums=(0, 1))
        return self._iter(tss, env_states, key)

    # ------------------------------------------------------------------
    def train(self, num_epochs: int, seed: int = 42, log_every: int = 10,
              callback=None):
        key = jax.random.key(seed)
        key, k0 = jax.random.split(key)
        tss, ess = self.init(k0)
        history = []
        for epoch in range(num_epochs):
            key, sub = jax.random.split(key)
            tss, ess, mets = self.train_iteration(tss, ess, sub)
            if epoch % log_every == 0 or epoch == num_epochs - 1:
                row = {"epoch": epoch}
                for n in self.names:
                    row[n] = {k: float(v) for k, v in mets[n].items()}
                history.append(row)
                if callback:
                    callback(epoch, tss, row)
        return tss, ess, history
