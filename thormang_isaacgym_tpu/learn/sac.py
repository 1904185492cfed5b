"""Soft Actor-Critic — parity with rl_games' `sac` agent as configured by
the reference's SAC train configs (`/root/reference/isaacgymenvs/cfg/train/
AntSAC.yaml`, `HumanoidSAC.yaml`): twin Q critics, squashed-Gaussian actor,
learnable temperature alpha against a target entropy (-num_actions), polyak
target update, uniform replay buffer.

TPU-native shape: the replay buffer lives on device as a fixed-size ring
pytree; one `train_iteration` = N env steps (collection) + M gradient steps,
all inside a single jit — no host round-trips.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from thormang_isaacgym_tpu.engine.env import EnvState, VecEnv


@dataclasses.dataclass(frozen=True)
class SACConfig:
    """Field names follow the rl_games SAC config keys (AntSAC.yaml)."""
    gamma: float = 0.99
    critic_tau: float = 0.005
    batch_size: int = 4096
    init_alpha: float = 1.0
    learnable_temperature: bool = True
    replay_buffer_size: int = 1_000_000
    num_seed_steps: int = 5           # collection-only iterations at start
    actor_lr: float = 3e-4
    critic_lr: float = 3e-4
    alpha_lr: float = 5e-3
    units: tuple = (512, 256)
    steps_per_iteration: int = 16     # env steps collected per iteration
    grad_steps: int = 16              # gradient steps per iteration
    log_std_bounds: tuple = (-5.0, 2.0)


class DoubleQ(nn.Module):
    units: tuple

    @nn.compact
    def __call__(self, obs, action):
        x = jnp.concatenate([obs, action], axis=-1)

        def q_net(x, name):
            for i, u in enumerate(self.units):
                x = nn.relu(nn.Dense(u, name=f"{name}_{i}")(x))
            return nn.Dense(1, name=f"{name}_out")(x)[..., 0]

        return q_net(x, "q1"), q_net(x, "q2")


class SquashedActor(nn.Module):
    num_actions: int
    units: tuple
    log_std_bounds: tuple

    @nn.compact
    def __call__(self, obs):
        x = obs
        for i, u in enumerate(self.units):
            x = nn.relu(nn.Dense(u, name=f"a_{i}")(x))
        mu = nn.Dense(self.num_actions, name="mu")(x)
        log_std = nn.Dense(self.num_actions, name="log_std")(x)
        lo, hi = self.log_std_bounds
        log_std = lo + 0.5 * (hi - lo) * (jnp.tanh(log_std) + 1.0)
        return mu, log_std


def _squashed_sample(key, mu, log_std):
    std = jnp.exp(log_std)
    eps = jax.random.normal(key, mu.shape)
    pre = mu + std * eps
    a = jnp.tanh(pre)
    logp = jnp.sum(
        -0.5 * eps**2 - log_std - 0.5 * jnp.log(2 * jnp.pi)
        - jnp.log(jnp.clip(1 - a**2, 1e-6)), axis=-1)
    return a, logp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SACTrainState:
    actor_params: Any
    critic_params: Any
    target_critic_params: Any
    log_alpha: jnp.ndarray
    actor_opt: Any
    critic_opt: Any
    alpha_opt: Any
    buffer: Any          # dict of ring arrays
    buffer_pos: jnp.ndarray
    buffer_full: jnp.ndarray
    step: jnp.ndarray


class SAC:
    def __init__(self, env: VecEnv, config: SACConfig):
        self.env = env
        self.cfg = config
        self.actor = SquashedActor(env.num_actions, config.units, config.log_std_bounds)
        self.critic = DoubleQ(config.units)
        self.target_entropy = -float(env.num_actions)
        self.actor_optimizer = optax.adam(config.actor_lr)
        self.critic_optimizer = optax.adam(config.critic_lr)
        self.alpha_optimizer = optax.adam(config.alpha_lr)
        # per-env slots: capacity in transitions, stored as (slots, B, ...)
        self.slots = max(2, config.replay_buffer_size // env.num_envs)
        self._train_iter = jax.jit(self.train_iteration, donate_argnums=(0, 1))

    def init(self, key) -> SACTrainState:
        obs0 = jnp.zeros((1, self.env.num_obs))
        act0 = jnp.zeros((1, self.env.num_actions))
        k1, k2 = jax.random.split(key)
        actor_params = self.actor.init(k1, obs0)
        critic_params = self.critic.init(k2, obs0, act0)
        B = self.env.num_envs
        buffer = dict(
            obs=jnp.zeros((self.slots, B, self.env.num_obs)),
            action=jnp.zeros((self.slots, B, self.env.num_actions)),
            reward=jnp.zeros((self.slots, B)),
            next_obs=jnp.zeros((self.slots, B, self.env.num_obs)),
            not_done=jnp.ones((self.slots, B)),
        )
        return SACTrainState(
            actor_params=actor_params,
            critic_params=critic_params,
            # independent copy: both fields are donated by train_iteration,
            # aliased buffers trip XLA's double-donation check
            target_critic_params=jax.tree.map(jnp.array, critic_params),
            log_alpha=jnp.log(jnp.asarray(self.cfg.init_alpha)),
            actor_opt=self.actor_optimizer.init(actor_params),
            critic_opt=self.critic_optimizer.init(critic_params),
            alpha_opt=self.alpha_optimizer.init(jnp.zeros(())),
            buffer=buffer,
            buffer_pos=jnp.asarray(0, jnp.int32),
            buffer_full=jnp.asarray(False),
            step=jnp.asarray(0, jnp.int32),
        )

    # ------------------------------------------------------------------
    def train_iteration(self, ts: SACTrainState, env_state: EnvState, key):
        cfg = self.cfg

        # ---- collect ----
        def collect(carry, _):
            ts, env_state, key = carry
            key, k_act = jax.random.split(key)
            obs = env_state.obs
            mu, log_std = self.actor.apply(ts.actor_params, obs)
            action, _ = _squashed_sample(k_act, mu, log_std)
            env_state = self.env.step_fn(env_state, action)
            # done excludes timeout for bootstrap correctness
            not_done = 1.0 - jnp.clip(env_state.done - env_state.timeout, 0.0, 1.0)
            slot = ts.buffer_pos % self.slots
            buffer = dict(
                obs=ts.buffer["obs"].at[slot].set(obs),
                action=ts.buffer["action"].at[slot].set(action),
                reward=ts.buffer["reward"].at[slot].set(env_state.reward),
                next_obs=ts.buffer["next_obs"].at[slot].set(env_state.obs),
                not_done=ts.buffer["not_done"].at[slot].set(not_done),
            )
            ts = dataclasses.replace(
                ts, buffer=buffer, buffer_pos=ts.buffer_pos + 1,
                buffer_full=ts.buffer_full | (ts.buffer_pos + 1 >= self.slots))
            return (ts, env_state, key), None

        key, k_col = jax.random.split(key)
        (ts, env_state, _), _ = jax.lax.scan(
            collect, (ts, env_state, k_col), None, length=cfg.steps_per_iteration)

        # ---- update ----
        n_valid = jnp.where(ts.buffer_full, self.slots, jnp.maximum(ts.buffer_pos, 1))

        def grad_step(carry, k):
            ts = carry
            k1, k2, k3, k4 = jax.random.split(k, 4)
            B = self.env.num_envs
            slot_idx = jax.random.randint(k1, (cfg.batch_size,), 0, n_valid)
            env_idx = jax.random.randint(k2, (cfg.batch_size,), 0, B)
            batch = {kk: v[slot_idx, env_idx] for kk, v in ts.buffer.items()}
            alpha = jnp.exp(ts.log_alpha)

            # critic update
            mu_n, ls_n = self.actor.apply(ts.actor_params, batch["next_obs"])
            a_n, logp_n = _squashed_sample(k3, mu_n, ls_n)
            q1_t, q2_t = self.critic.apply(ts.target_critic_params, batch["next_obs"], a_n)
            target = batch["reward"] + cfg.gamma * batch["not_done"] * (
                jnp.minimum(q1_t, q2_t) - alpha * logp_n)
            target = jax.lax.stop_gradient(target)

            def critic_loss(p):
                q1, q2 = self.critic.apply(p, batch["obs"], batch["action"])
                return ((q1 - target) ** 2 + (q2 - target) ** 2).mean()

            closs, cgrad = jax.value_and_grad(critic_loss)(ts.critic_params)
            cup, copt = self.critic_optimizer.update(cgrad, ts.critic_opt)
            critic_params = optax.apply_updates(ts.critic_params, cup)

            # actor update
            def actor_loss(p):
                mu, ls = self.actor.apply(p, batch["obs"])
                a, logp = _squashed_sample(k4, mu, ls)
                q1, q2 = self.critic.apply(critic_params, batch["obs"], a)
                return (alpha * logp - jnp.minimum(q1, q2)).mean(), logp

            (aloss, logp), agrad = jax.value_and_grad(actor_loss, has_aux=True)(ts.actor_params)
            aup, aopt = self.actor_optimizer.update(agrad, ts.actor_opt)
            actor_params = optax.apply_updates(ts.actor_params, aup)

            # temperature update
            if cfg.learnable_temperature:
                def alpha_loss(la):
                    return (jnp.exp(la) * jax.lax.stop_gradient(
                        -logp - self.target_entropy)).mean()
                _, lgrad = jax.value_and_grad(alpha_loss)(ts.log_alpha)
                lup, lopt = self.alpha_optimizer.update(lgrad, ts.alpha_opt)
                log_alpha = optax.apply_updates(ts.log_alpha, lup)
            else:
                log_alpha, lopt = ts.log_alpha, ts.alpha_opt

            # polyak target update
            tau = cfg.critic_tau
            target_params = jax.tree.map(
                lambda t, s: (1 - tau) * t + tau * s,
                ts.target_critic_params, critic_params)

            ts = dataclasses.replace(
                ts, actor_params=actor_params, critic_params=critic_params,
                target_critic_params=target_params, log_alpha=log_alpha,
                actor_opt=aopt, critic_opt=copt, alpha_opt=lopt)
            return ts, dict(critic_loss=closs, actor_loss=aloss,
                            alpha=jnp.exp(log_alpha))

        do_update = ts.step >= cfg.num_seed_steps
        keys = jax.random.split(key, cfg.grad_steps)

        def run_updates(ts):
            return jax.lax.scan(grad_step, ts, keys)

        def skip_updates(ts):
            aux = dict(critic_loss=jnp.zeros(cfg.grad_steps),
                       actor_loss=jnp.zeros(cfg.grad_steps),
                       alpha=jnp.full(cfg.grad_steps, jnp.exp(ts.log_alpha)))
            return ts, aux

        ts, aux = jax.lax.cond(do_update, run_updates, skip_updates, ts)
        ts = dataclasses.replace(ts, step=ts.step + 1)

        metrics = dict(
            reward_mean=env_state.reward.mean(),
            episode_return_mean=env_state.last_episode_return.mean(),
            critic_loss=aux["critic_loss"].mean(),
            actor_loss=aux["actor_loss"].mean(),
            alpha=aux["alpha"][-1],
        )
        return ts, env_state, metrics

    # ------------------------------------------------------------------
    def train(self, num_iterations: int, seed: int = 42, log_every: int = 10):
        key = jax.random.key(seed)
        key, k1, k2 = jax.random.split(key, 3)
        ts = self.init(k1)
        env_state = self.env.reset(k2)
        history = []
        for it in range(num_iterations):
            key, sub = jax.random.split(key)
            ts, env_state, metrics = self._train_iter(ts, env_state, sub)
            if it % log_every == 0 or it == num_iterations - 1:
                history.append({k: float(v) for k, v in metrics.items()} | {"iter": it})
        return ts, env_state, history
