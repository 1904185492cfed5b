"""PPO actor-learner — the rl_games `a2c_continuous` equivalent.

Algorithmic parity, knob for knob, with the reference's rl_games config
surface (`/root/reference/isaacgymenvs/cfg/train/GogoroPPO.yaml:38-73`,
`train.py:142-161`):

- synchronous on-policy: rollout `horizon_length` then `mini_epochs` x
  minibatch updates — rollout and update are phases of ONE jitted train
  iteration (SURVEY.md §2.2: actor/learner split stays synchronous)
- GAE(gamma, tau), advantage normalization, e_clip surrogate, clipped value
  loss, critic_coef, entropy_coef, bounds_loss_coef (soft bound 1.1),
  grad-norm clipping, reward shaper scale, value bootstrap on timeouts
  (`extras["time_outs"]` semantics, vec_task.py:345-351)
- adaptive KL learning rate (rl_games AdaptiveScheduler: lr /= 1.5 when
  kl > 2*threshold, lr *= 1.5 when kl < threshold/2, clamped [1e-6, 1e-2])
- obs / value running normalization (normalize_input / normalize_value)

Everything — env stepping included — runs inside one XLA program per
iteration; there is no host round-trip in the training loop.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from thormang_isaacgym_tpu.engine.env import EnvState, VecEnv
from thormang_isaacgym_tpu.learn.networks import (
    ActorCritic, ActorCriticRNN, ValueNet,
)
from thormang_isaacgym_tpu.learn.normalize import (
    RMSState, rms_denormalize, rms_normalize, rms_update,
)


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    """Field names follow the rl_games config keys (GogoroPPO.yaml:38-73)."""
    gamma: float = 0.99
    tau: float = 0.95                  # GAE lambda
    learning_rate: float = 1e-4
    lr_schedule: str = "adaptive"      # adaptive | fixed | linear
    kl_threshold: float = 0.002
    e_clip: float = 0.2
    clip_value: bool = True
    critic_coef: float = 2.0
    entropy_coef: float = 0.0
    bounds_loss_coef: float = 0.01
    grad_norm: float = 1.0
    truncate_grads: bool = True
    horizon_length: int = 64
    minibatch_size: int = 32768
    mini_epochs: int = 5
    reward_shaper_scale: float = 0.1
    normalize_input: bool = False
    normalize_value: bool = False
    normalize_advantage: bool = True
    value_bootstrap: bool = False
    max_epochs: int = 1000
    units: tuple = (512, 512, 512)
    activation: str = "elu"
    separate: bool = False
    fixed_sigma: bool = True
    sigma_init: float = 0.0
    mixed_precision: bool = True
    seed: int = 42
    # rl_games `rnn:` block + seq_len (LSTM policies:
    # AnymalTerrainPPO_LSTM.yaml, HumanoidPPO.yaml:68-75). rnn_units 0 = MLP.
    rnn_units: int = 0
    rnn_layers: int = 1
    rnn_before_mlp: bool = False
    rnn_concat_input: bool = False
    rnn_layer_norm: bool = False
    seq_len: int = 4

    @staticmethod
    def from_rlgames(cfg: dict) -> "PPOConfig":
        """Build from a reference-style train YAML dict (params.config +
        params.network)."""
        c = cfg.get("params", cfg)
        conf = c.get("config", {})
        net = c.get("network", {})
        mlp = net.get("mlp", {})
        space = net.get("space", {}).get("continuous", {})
        kw = {}
        m = {
            "gamma": "gamma", "tau": "tau", "learning_rate": "learning_rate",
            "lr_schedule": "lr_schedule", "kl_threshold": "kl_threshold",
            "e_clip": "e_clip", "clip_value": "clip_value",
            "critic_coef": "critic_coef", "entropy_coef": "entropy_coef",
            "bounds_loss_coef": "bounds_loss_coef", "grad_norm": "grad_norm",
            "truncate_grads": "truncate_grads", "horizon_length": "horizon_length",
            "minibatch_size": "minibatch_size", "mini_epochs": "mini_epochs",
            "normalize_input": "normalize_input", "normalize_value": "normalize_value",
            "normalize_advantage": "normalize_advantage",
            "value_bootstrap": "value_bootstrap", "max_epochs": "max_epochs",
            "mixed_precision": "mixed_precision",
        }
        for k, src in m.items():
            if src in conf:
                kw[k] = conf[src]
        if "reward_shaper" in conf:
            kw["reward_shaper_scale"] = conf["reward_shaper"].get("scale_value", 1.0)
        if "units" in mlp:
            kw["units"] = tuple(mlp["units"])
        if "activation" in mlp:
            kw["activation"] = mlp["activation"]
        if "separate" in net:
            kw["separate"] = net["separate"]
        if "fixed_sigma" in space:
            kw["fixed_sigma"] = space["fixed_sigma"]
        si = space.get("sigma_init")
        if isinstance(si, dict):
            si = si.get("val")
        if si is not None:
            kw["sigma_init"] = float(si)
        rnn = net.get("rnn")
        if rnn and rnn.get("name", "lstm") == "lstm":
            kw["rnn_units"] = int(rnn.get("units", 256))
            kw["rnn_layers"] = int(rnn.get("layers", 1))
            kw["rnn_before_mlp"] = bool(rnn.get("before_mlp", False))
            kw["rnn_concat_input"] = bool(rnn.get("concat_input", False))
            kw["rnn_layer_norm"] = bool(rnn.get("layer_norm", False))
        if "seq_length" in conf:
            kw["seq_len"] = int(conf["seq_length"])
        if "seq_len" in conf:
            kw["seq_len"] = int(conf["seq_len"])
        if isinstance(kw.get("learning_rate"), str):
            kw["learning_rate"] = float(kw["learning_rate"])
        return PPOConfig(**kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TrainState:
    params: Any
    opt_state: Any
    lr: jnp.ndarray
    obs_rms: RMSState
    value_rms: RMSState
    states_rms: RMSState     # privileged-state normalizer (asymmetric critic)
    epoch: jnp.ndarray


def gaussian_logprob(mu, log_std, action):
    std = jnp.exp(log_std)
    return jnp.sum(
        -0.5 * ((action - mu) / std) ** 2 - log_std - 0.5 * jnp.log(2 * jnp.pi),
        axis=-1)


def gaussian_entropy(log_std):
    return jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e), axis=-1)


def gaussian_kl(mu0, log_std0, mu1, log_std1):
    """KL(old || new), rl_games' policy_kl formulation."""
    std0, std1 = jnp.exp(log_std0), jnp.exp(log_std1)
    kl = log_std1 - log_std0 + (std0**2 + (mu0 - mu1) ** 2) / (2.0 * std1**2) - 0.5
    return jnp.sum(kl, axis=-1)


class PPO:
    """Binds a VecEnv + PPOConfig to a jitted train iteration."""

    def __init__(self, env: VecEnv, config: PPOConfig, axis_name: str | None = None):
        """axis_name: set when the train iteration runs inside shard_map over
        an env-sharded mesh — gradients and KL are pmean'd across shards
        (the TPU-native replacement for rl_games' NCCL all-reduce,
        `train.py:74-82` + `multi_gpu` config)."""
        self.env = env
        self.cfg = config
        self.axis_name = axis_name
        # asymmetric actor-critic: when the task provides privileged states
        # (Task.num_states > 0), the critic is a separate central value net
        # over them (shadow_hand.py:124-130 + rl_games central_value_config)
        self.num_states = int(getattr(env.task, "num_states", 0) or 0)
        self.asymmetric = self.num_states > 0
        self.value_net = ValueNet(
            units=config.units, activation=config.activation,
            compute_dtype=jnp.bfloat16 if config.mixed_precision else jnp.float32,
        ) if self.asymmetric else None
        # LSTM policy (rl_games rnn block). The hidden carry is threaded
        # through the rollout (zeroed on env done) and re-scanned from
        # stored seq-start carries in seq_len-truncated BPTT minibatches.
        # Divergence from rl_games, by design: the carry starts at zero
        # each train iteration (no cross-iteration persistence) — horizon
        # >> seq_len makes the warm-up negligible, and it keeps TrainState
        # free of per-env leaves (which must shard with the env axis).
        self.is_rnn = config.rnn_units > 0
        if self.is_rnn:
            self.network = ActorCriticRNN(
                num_actions=env.num_actions,
                units=config.units,
                rnn_units=config.rnn_units,
                rnn_layers=config.rnn_layers,
                before_mlp=config.rnn_before_mlp,
                concat_input=config.rnn_concat_input,
                layer_norm=config.rnn_layer_norm,
                activation=config.activation,
                fixed_sigma=config.fixed_sigma,
                sigma_init=config.sigma_init,
                compute_dtype=jnp.bfloat16 if config.mixed_precision else jnp.float32,
            )
            assert config.horizon_length % config.seq_len == 0, \
                "horizon_length must be a multiple of seq_len"
        else:
            self.network = ActorCritic(
                num_actions=env.num_actions,
                units=config.units,
                activation=config.activation,
                separate=config.separate,
                fixed_sigma=config.fixed_sigma,
                sigma_init=config.sigma_init,
                compute_dtype=jnp.bfloat16 if config.mixed_precision else jnp.float32,
            )
        batch = config.horizon_length * env.num_envs
        self.num_minibatches = max(1, batch // config.minibatch_size)
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(config.grad_norm)
            if config.truncate_grads else optax.identity(),
            optax.scale_by_adam(eps=1e-8),
            optax.scale_by_learning_rate(1.0, flip_sign=True),
        )
        self._train_iter = jax.jit(self.train_iteration, donate_argnums=(0, 1))

    # ------------------------------------------------------------------
    def init(self, key) -> TrainState:
        obs0 = jnp.zeros((1, self.env.num_obs))
        if self.is_rnn:
            params = self.network.init(key, obs0, self.network.zero_carry(1))
        else:
            params = self.network.init(key, obs0)
        if self.asymmetric:
            k2 = jax.random.fold_in(key, 1)
            params = {"ac": params,
                      "cv": self.value_net.init(k2, jnp.zeros((1, self.num_states)))}
        opt_state = self.optimizer.init(params)
        return TrainState(
            params=params, opt_state=opt_state,
            lr=jnp.asarray(self.cfg.learning_rate),
            obs_rms=RMSState.create((self.env.num_obs,)),
            value_rms=RMSState.create(()),
            states_rms=RMSState.create((max(self.num_states, 1),)),
            epoch=jnp.asarray(0, jnp.int32),
        )

    # ------------------------------------------------------------------
    def _apply(self, params, ts: TrainState, obs, states=None):
        """(mu, log_std, value); value from the central net when asymmetric."""
        if self.asymmetric:
            mu, log_std, _ = self.network.apply(params["ac"], obs)
            st = states
            if self.cfg.normalize_input:
                st = rms_normalize(ts.states_rms, st)
            value = self.value_net.apply(params["cv"], st)
        else:
            mu, log_std, value = self.network.apply(params, obs)
        return mu, log_std, value

    def _policy(self, ts: TrainState, obs, states=None):
        if self.cfg.normalize_input:
            obs = rms_normalize(ts.obs_rms, obs)
        mu, log_std, value = self._apply(ts.params, ts, obs, states)
        if self.cfg.normalize_value:
            value = rms_denormalize(ts.value_rms, value)
        return mu, log_std, value

    def _apply_rnn(self, params, ts: TrainState, obs, carry, states=None):
        p = params["ac"] if self.asymmetric else params
        mu, log_std, value, carry = self.network.apply(p, obs, carry)
        if self.asymmetric:
            st = states
            if self.cfg.normalize_input:
                st = rms_normalize(ts.states_rms, st)
            value = self.value_net.apply(params["cv"], st)
        return mu, log_std, value, carry

    def _policy_rnn(self, ts: TrainState, obs, carry, states=None):
        if self.cfg.normalize_input:
            obs = rms_normalize(ts.obs_rms, obs)
        mu, log_std, value, carry = self._apply_rnn(ts.params, ts, obs,
                                                    carry, states)
        if self.cfg.normalize_value:
            value = rms_denormalize(ts.value_rms, value)
        return mu, log_std, value, carry

    def act_deterministic(self, ts: TrainState, obs):
        """Play-mode action (mu, clamped) — parity with export.py ModelWrapper
        (`/root/reference/isaacgymenvs/export.py:134-157`)."""
        if self.cfg.normalize_input:
            obs = rms_normalize(ts.obs_rms, obs)
        p = ts.params["ac"] if self.asymmetric else ts.params
        mu, _, _ = self.network.apply(p, obs)
        return jnp.clip(mu, -1.0, 1.0)

    # ------------------------------------------------------------------
    def rollout(self, ts: TrainState, env_state: EnvState, key):
        """horizon_length steps; returns batched trajectories."""
        def step(carry, _):
            env_state, key = carry
            key, k_act = jax.random.split(key)
            obs = env_state.obs
            states = env_state.states
            mu, log_std, value = self._policy(ts, obs, states)
            action = mu + jnp.exp(log_std) * jax.random.normal(k_act, mu.shape)
            logp = gaussian_logprob(mu, log_std, action)
            env_state = self.env.step_fn(env_state, action)
            out = dict(obs=obs, action=action, logp=logp, value=value,
                       reward=env_state.reward, done=env_state.done,
                       timeout=env_state.timeout,
                       mu=mu, log_std=log_std)
            if self.asymmetric:
                out["states"] = states
            return (env_state, key), out

        (env_state, _), traj = jax.lax.scan(
            step, (env_state, key), None, length=self.cfg.horizon_length)
        return env_state, traj

    def rollout_rnn(self, ts: TrainState, env_state: EnvState, key):
        """LSTM rollout: threads the hidden carry (zeroed on env done) and
        stores each step's INPUT carry for seq-start BPTT restarts."""
        B = env_state.obs.shape[0]
        carry0 = self.network.zero_carry(B)

        def step(carry, _):
            env_state, key, hid = carry
            key, k_act = jax.random.split(key)
            mask = (1.0 - env_state.done)[:, None]
            hid = jax.tree.map(lambda x: x * mask, hid)
            # (layers, 2, B, H) snapshot of the input carry
            hid_store = jnp.stack([jnp.stack(p) for p in hid])
            obs, states = env_state.obs, env_state.states
            mu, log_std, value, hid = self._policy_rnn(ts, obs, hid, states)
            action = mu + jnp.exp(log_std) * jax.random.normal(k_act, mu.shape)
            logp = gaussian_logprob(mu, log_std, action)
            env_state = self.env.step_fn(env_state, action)
            out = dict(obs=obs, action=action, logp=logp, value=value,
                       reward=env_state.reward, done=env_state.done,
                       timeout=env_state.timeout,
                       mu=mu, log_std=log_std, carry=hid_store)
            if self.asymmetric:
                out["states"] = states
            return (env_state, key, hid), out

        (env_state, _, last_hid), traj = jax.lax.scan(
            step, (env_state, key, carry0), None,
            length=self.cfg.horizon_length)
        return env_state, traj, last_hid

    # ------------------------------------------------------------------
    def compute_gae(self, ts: TrainState, traj, last_value):
        cfg = self.cfg
        reward = traj["reward"] * cfg.reward_shaper_scale
        if cfg.value_bootstrap:
            # rl_games: rewards += gamma * values * timeouts
            reward = reward + cfg.gamma * traj["value"] * traj["timeout"]
        not_done = 1.0 - traj["done"]

        def scan_fn(carry, t):
            gae, next_value = carry
            delta = t["reward"] + cfg.gamma * next_value * t["not_done"] - t["value"]
            gae = delta + cfg.gamma * cfg.tau * t["not_done"] * gae
            return (gae, t["value"]), gae

        seq = dict(reward=reward, value=traj["value"], not_done=not_done)
        (_, _), advantages = jax.lax.scan(
            scan_fn,
            (jnp.zeros_like(last_value), last_value),
            seq, reverse=True)
        returns = advantages + traj["value"]
        return advantages, returns

    # ------------------------------------------------------------------
    def _loss(self, params, ts: TrainState, batch, lr_unused=None):
        cfg = self.cfg
        obs = batch["obs"]
        if cfg.normalize_input:
            obs = rms_normalize(ts.obs_rms, obs)
        mu, log_std, value = self._apply(params, ts, obs, batch.get("states"))

        logp = gaussian_logprob(mu, log_std, batch["action"])
        ratio = jnp.exp(logp - batch["logp"])
        adv = batch["adv"]
        surr1 = ratio * adv
        surr2 = jnp.clip(ratio, 1.0 - cfg.e_clip, 1.0 + cfg.e_clip) * adv
        a_loss = -jnp.minimum(surr1, surr2).mean()

        ret = batch["ret"]
        old_value = batch["value"]
        if cfg.normalize_value:
            ret = rms_normalize(ts.value_rms, ret)
            old_value = rms_normalize(ts.value_rms, old_value)
        if cfg.clip_value:
            v_clipped = old_value + jnp.clip(value - old_value, -cfg.e_clip, cfg.e_clip)
            v_loss = jnp.maximum((value - ret) ** 2, (v_clipped - ret) ** 2).mean()
        else:
            v_loss = ((value - ret) ** 2).mean()

        entropy = gaussian_entropy(log_std).mean()

        # rl_games bounds loss (soft bound 1.1)
        sb = 1.1
        b_loss = (jnp.clip(mu - sb, 0.0, None) ** 2
                  + jnp.clip(-sb - mu, 0.0, None) ** 2).sum(-1).mean()

        total = (a_loss + 0.5 * v_loss * cfg.critic_coef
                 - cfg.entropy_coef * entropy + cfg.bounds_loss_coef * b_loss)
        kl = gaussian_kl(batch["mu"], batch["log_std"], mu, log_std).mean()
        return total, dict(a_loss=a_loss, v_loss=v_loss, entropy=entropy,
                           b_loss=b_loss, kl=kl)

    # ------------------------------------------------------------------
    def _loss_rnn(self, params, ts: TrainState, batch, lr_unused=None):
        """Sequence-minibatch loss: re-scan the LSTM over each seq_len
        window from its stored seq-start carry (truncated BPTT — the
        rl_games seq_length training scheme), then the standard PPO loss
        over the flattened transitions. Mid-sequence dones zero the carry
        exactly as the rollout did."""
        cfg = self.cfg
        S, L = batch["obs"].shape[:2]
        obs = batch["obs"]
        if cfg.normalize_input:
            obs = rms_normalize(ts.obs_rms, obs)
        p = params["ac"] if self.asymmetric else params
        carry = tuple((batch["carry"][:, l, 0], batch["carry"][:, l, 1])
                      for l in range(cfg.rnn_layers))

        def step(c, xs):
            carry_h, prev_done = c
            obs_t, done_t = xs
            mask = (1.0 - prev_done)[:, None]
            carry_h = jax.tree.map(lambda x: x * mask, carry_h)
            mu, ls, v, carry_h = self.network.apply(p, obs_t, carry_h)
            return (carry_h, done_t), (mu, ls, v)

        xs = (jnp.moveaxis(obs, 1, 0), jnp.moveaxis(batch["done"], 1, 0))
        _, (mu, log_std, value) = jax.lax.scan(
            step, (carry, jnp.zeros(S)), xs)
        # (L, S, ...) -> (S*L, ...)
        mu = jnp.moveaxis(mu, 0, 1).reshape(S * L, -1)
        log_std = jnp.moveaxis(log_std, 0, 1).reshape(S * L, -1)
        value = jnp.moveaxis(value, 0, 1).reshape(S * L)
        if self.asymmetric:
            st = batch["states"].reshape(S * L, -1)
            if cfg.normalize_input:
                st = rms_normalize(ts.states_rms, st)
            value = self.value_net.apply(params["cv"], st)

        def fl(x):
            return x.reshape((S * L,) + x.shape[2:])

        logp = gaussian_logprob(mu, log_std, fl(batch["action"]))
        ratio = jnp.exp(logp - fl(batch["logp"]))
        adv = fl(batch["adv"])
        surr1 = ratio * adv
        surr2 = jnp.clip(ratio, 1.0 - cfg.e_clip, 1.0 + cfg.e_clip) * adv
        a_loss = -jnp.minimum(surr1, surr2).mean()
        ret = fl(batch["ret"])
        old_value = fl(batch["value"])
        if cfg.normalize_value:
            ret = rms_normalize(ts.value_rms, ret)
            old_value = rms_normalize(ts.value_rms, old_value)
        if cfg.clip_value:
            v_clipped = old_value + jnp.clip(value - old_value,
                                             -cfg.e_clip, cfg.e_clip)
            v_loss = jnp.maximum((value - ret) ** 2,
                                 (v_clipped - ret) ** 2).mean()
        else:
            v_loss = ((value - ret) ** 2).mean()
        entropy = gaussian_entropy(log_std).mean()
        sb = 1.1
        b_loss = (jnp.clip(mu - sb, 0.0, None) ** 2
                  + jnp.clip(-sb - mu, 0.0, None) ** 2).sum(-1).mean()
        total = (a_loss + 0.5 * v_loss * cfg.critic_coef
                 - cfg.entropy_coef * entropy + cfg.bounds_loss_coef * b_loss)
        kl = gaussian_kl(fl(batch["mu"]), fl(batch["log_std"]),
                         mu, log_std).mean()
        return total, dict(a_loss=a_loss, v_loss=v_loss, entropy=entropy,
                           b_loss=b_loss, kl=kl)

    # ------------------------------------------------------------------
    def _adaptive_lr(self, lr, kl):
        cfg = self.cfg
        if cfg.lr_schedule != "adaptive":
            return lr
        # a non-finite KL estimate means the update blew past the trust
        # region (inf/NaN ratio), not that KL is acceptable: treat it as
        # too-high so the controller CUTS lr instead of skipping both
        # branches (observed in the r5 ShadowHand run: one NaN minibatch
        # let lr pump 1.9e-4 -> 1e-2 and collapse the policy)
        kl = jnp.where(jnp.isfinite(kl), kl, 10.0 * cfg.kl_threshold)
        lr = jnp.where(kl > 2.0 * cfg.kl_threshold, lr / 1.5, lr)
        lr = jnp.where(kl < 0.5 * cfg.kl_threshold, lr * 1.5, lr)
        return jnp.clip(lr, 1e-6, 1e-2)

    # ------------------------------------------------------------------
    def train_iteration(self, ts: TrainState, env_state: EnvState, key):
        """One epoch: rollout + mini_epochs of minibatch SGD. Fully jitted."""
        cfg = self.cfg
        key, k_roll, k_perm = jax.random.split(key, 3)
        if self.is_rnn:
            env_state, traj, last_hid = self.rollout_rnn(ts, env_state, k_roll)
            mask = (1.0 - env_state.done)[:, None]
            last_hid = jax.tree.map(lambda x: x * mask, last_hid)
            _, _, last_value, _ = self._policy_rnn(
                ts, env_state.obs, last_hid, env_state.states)
        else:
            env_state, traj = self.rollout(ts, env_state, k_roll)
            _, _, last_value = self._policy(ts, env_state.obs, env_state.states)
        advantages, returns = self.compute_gae(ts, traj, last_value)

        if self.is_rnn:
            # sequence layout: (T, B, ...) -> (T/L * B, L, ...) with the
            # stored input carry at each sequence start
            L = cfg.seq_len
            T = cfg.horizon_length

            def flat(x):
                x = x.reshape((T // L, L) + x.shape[1:])
                x = jnp.moveaxis(x, 2, 1)
                return x.reshape((-1, L) + x.shape[3:])
        else:
            # flatten (T, B) -> (T*B,)
            def flat(x):
                return x.reshape((-1,) + x.shape[2:])

        batch = dict(
            obs=flat(traj["obs"]), action=flat(traj["action"]),
            logp=flat(traj["logp"]), value=flat(traj["value"]),
            mu=flat(traj["mu"]), log_std=flat(traj["log_std"]),
            adv=flat(advantages), ret=flat(returns),
        )
        if self.asymmetric:
            batch["states"] = flat(traj["states"])
        if self.is_rnn:
            batch["done"] = flat(traj["done"])
            starts = traj["carry"][::cfg.seq_len]        # (T/L, layers, 2, B, H)
            starts = jnp.moveaxis(starts, 3, 1)          # (T/L, B, layers, 2, H)
            batch["carry"] = starts.reshape((-1,) + starts.shape[2:])
        if cfg.normalize_advantage:
            adv = batch["adv"]
            batch["adv"] = (adv - adv.mean()) / (adv.std() + 1e-8)

        # update normalizers from this batch (rl_games updates online during
        # rollout; batched update is equivalent in expectation)
        if cfg.normalize_input:
            ts = dataclasses.replace(ts, obs_rms=rms_update(
                ts.obs_rms, batch["obs"].reshape(-1, self.env.num_obs)))
            if self.asymmetric:
                ts = dataclasses.replace(
                    ts, states_rms=rms_update(
                        ts.states_rms,
                        batch["states"].reshape(-1, self.num_states)))
        if cfg.normalize_value:
            # reshape: the return batch may carry a trailing agent axis
            ts = dataclasses.replace(ts, value_rms=rms_update(
                ts.value_rms, batch["ret"].reshape(-1)))

        if self.is_rnn:
            # N counts sequences; minibatch_size counts transitions
            N = batch["obs"].shape[0]
            mb = max(1, min(cfg.minibatch_size, N * cfg.seq_len) // cfg.seq_len)
            loss_fn = self._loss_rnn
        else:
            N = batch["obs"].shape[0]
            mb = min(cfg.minibatch_size, N)
            loss_fn = self._loss
        nmb = N // mb

        def mini_epoch(carry, k_ep):
            params, opt_state, lr = carry
            perm = jax.random.permutation(k_ep, N)

            def mb_step(carry, idx):
                params, opt_state, lr = carry
                mb_batch = jax.tree.map(lambda x: x[idx], batch)
                (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, ts, mb_batch)
                if self.axis_name is not None:
                    # data-parallel gradient all-reduce over the env mesh axis
                    grads = jax.lax.pmean(grads, self.axis_name)
                    aux = jax.tree.map(lambda x: jax.lax.pmean(x, self.axis_name), aux)
                updates, opt_state = self.optimizer.update(grads, opt_state, params)
                updates = jax.tree.map(lambda u: u * lr, updates)
                params = optax.apply_updates(params, updates)
                return (params, opt_state, lr), aux

            idxs = perm[: nmb * mb].reshape(nmb, mb)
            (params, opt_state, lr), auxs = jax.lax.scan(
                mb_step, (params, opt_state, lr), idxs)
            # rl_games AdaptiveScheduler semantics: the lr adapts once per
            # MINI-EPOCH on the kl averaged over its minibatches
            # (a2c_common.train_epoch), not per minibatch on the raw
            # minibatch kl — the latter oscillates at small minibatch
            # sizes and caused the reduced-scale Gogoro collapse
            # (PARITY_r03 epoch 49: lr pumped to 1.7e-3, then a kl=0.13
            # update destroyed the policy).
            lr = self._adaptive_lr(lr, auxs["kl"].mean())
            return (params, opt_state, lr), auxs

        keys = jax.random.split(k_perm, cfg.mini_epochs)
        (params, opt_state, lr), auxs = jax.lax.scan(
            mini_epoch, (ts.params, ts.opt_state, ts.lr), keys)

        ts = dataclasses.replace(
            ts, params=params, opt_state=opt_state, lr=lr, epoch=ts.epoch + 1)

        metrics = dict(
            reward_mean=traj["reward"].mean(),
            episode_return_mean=env_state.last_episode_return.mean(),
            episode_done_frac=traj["done"].mean(),
            kl=auxs["kl"][-1].mean(),
            a_loss=auxs["a_loss"].mean(),
            v_loss=auxs["v_loss"].mean(),
            entropy=auxs["entropy"].mean(),
            lr=lr,
        )
        return ts, env_state, metrics

    # ------------------------------------------------------------------
    def train(self, num_epochs: int, seed: int = None, log_every: int = 10,
              callback=None):
        """Host-side driver loop (checkpointing/logging live here)."""
        seed = self.cfg.seed if seed is None else seed
        key = jax.random.key(seed)
        key, k_init, k_env = jax.random.split(key, 3)
        ts = self.init(k_init)
        env_state = self.env.reset(k_env)
        history = []
        for epoch in range(num_epochs):
            key, sub = jax.random.split(key)
            ts, env_state, metrics = self._train_iter(ts, env_state, sub)
            if epoch % log_every == 0 or epoch == num_epochs - 1:
                m = {k: float(v) for k, v in metrics.items()}
                # per-task episode metrics (extras["episode"] pattern),
                # env-mean — same view the train CLI logs
                try:
                    for mk, mv in (env_state.metrics or {}).items():
                        m[f"env/{mk}"] = float(jnp.mean(mv))
                except Exception:
                    pass
                m["epoch"] = epoch
                history.append(m)
                if callback:
                    callback(epoch, ts, m)
        return ts, env_state, history
