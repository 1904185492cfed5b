"""Multi-agent PPO: parameter-shared IPPO over the agent axis.

The reference's multi-agent training path is unfinished (MA_VecTask exists,
`tasks/base/multi_vec_task.py`, but no MA-aware trainer is registered —
`train.py:125-148` plugs every task into the single-agent rl_games runner).
Completed here the TPU-native way: the policy is shared across agents and
the agent axis simply rides along as a trailing batch dimension — obs
(B, A, O) -> actions (B, A, act), rewards (B, A); every PPO reduction is
elementwise over (minibatch, A), so the only change is broadcasting the
shared per-env done/timeout (multi_vec_task.py:118-121: reset_buf is
per-env) onto the agent axis for GAE.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from thormang_isaacgym_tpu.engine.env import EnvState
from thormang_isaacgym_tpu.learn.ppo import PPO, PPOConfig, gaussian_logprob


class MAPPO(PPO):
    """PPO with a shared policy over `task.num_agents` agents."""

    def __init__(self, env, config: PPOConfig, axis_name: str | None = None):
        super().__init__(env, config, axis_name)
        self.num_agents = int(getattr(env.task, "num_agents", 1))
        assert self.num_agents > 1, "use PPO for single-agent tasks"

    def rollout(self, ts, env_state: EnvState, key):
        A = self.num_agents

        def step(carry, _):
            env_state, key = carry
            key, k_act = jax.random.split(key)
            obs = env_state.obs                        # (B, A, O)
            mu, log_std, value = self._policy(ts, obs)
            action = mu + jnp.exp(log_std) * jax.random.normal(k_act, mu.shape)
            logp = gaussian_logprob(mu, log_std, action)
            env_state = self.env.step_fn(env_state, action)
            B = obs.shape[0]
            # shared per-env done/timeout -> agent axis
            out = dict(obs=obs, action=action, logp=logp, value=value,
                       reward=env_state.reward,
                       done=jnp.broadcast_to(env_state.done[:, None], (B, A)),
                       timeout=jnp.broadcast_to(
                           env_state.timeout[:, None], (B, A)),
                       mu=mu, log_std=log_std)
            return (env_state, key), out

        (env_state, _), traj = jax.lax.scan(
            step, (env_state, key), None, length=self.cfg.horizon_length)
        return env_state, traj
