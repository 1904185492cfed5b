"""AMP (Adversarial Motion Priors) learner — the rl_games `amp_continuous`
algorithm the reference registers at
`/root/reference/isaacgymenvs/train.py:133-140` (the learning modules
themselves are absent from the snapshot, SURVEY.md §0; the algorithm is
reconstructed from the registered config surface,
`cfg/train/HumanoidAMPPPO.yaml:70-90`).

PPO + a discriminator trained to separate demo motion windows from policy
windows:

- style reward  r_d = -log(max(1 - sigmoid(D), 1e-4)) * disc_reward_scale
- combined      r = task_reward_w * r_task + disc_reward_w * r_d
- disc loss     0.5*(BCE(D(demo),1) + BCE(D(agent),0))
                + disc_logit_reg * ||W_logits||^2
                + disc_grad_penalty * E_demo ||dD/dobs||^2
                + disc_weight_decay * ||W_disc||^2,
  added to the PPO loss with weight disc_coef (single optimizer)
- agent side of each disc minibatch = amp_minibatch current rollout windows
  + amp_minibatch replay windows; demo side = amp_minibatch fresh windows

TPU-native divergences (by design):
- demo windows are fetched fresh each iteration via the jitted MotionLib
  gather (`HumanoidAMP.fetch_amp_obs_demo`) instead of a 200k-row host-side
  demo buffer — on-device sampling makes the buffer pointless
- the policy replay buffer is a fixed-size on-device ring (default 2^16
  rows, configurable to the reference's 1M) with keep-prob subsampled
  inserts (amp_replay_keep_prob)
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from thormang_isaacgym_tpu.engine.env import EnvState, VecEnv
from thormang_isaacgym_tpu.learn.networks import AMPDiscriminator
from thormang_isaacgym_tpu.learn.normalize import (
    RMSState, rms_normalize, rms_update,
)
from thormang_isaacgym_tpu.learn.ppo import PPO, PPOConfig, TrainState


@dataclasses.dataclass(frozen=True)
class AMPConfig(PPOConfig):
    """Extends PPOConfig with the amp_continuous knobs
    (HumanoidAMPPPO.yaml:76-90)."""
    amp_batch_size: int = 512
    amp_minibatch_size: int = 4096
    disc_coef: float = 5.0
    disc_logit_reg: float = 0.05
    disc_grad_penalty: float = 5.0
    disc_reward_scale: float = 2.0
    disc_weight_decay: float = 0.0001
    normalize_amp_input: bool = True
    task_reward_w: float = 0.0
    disc_reward_w: float = 1.0
    amp_replay_buffer_size: int = 65536
    amp_replay_keep_prob: float = 0.01
    disc_units: tuple = (1024, 512)
    disc_activation: str = "relu"

    @staticmethod
    def from_rlgames(cfg: dict) -> "AMPConfig":
        base = PPOConfig.from_rlgames(cfg)
        c = cfg.get("params", cfg)
        conf = c.get("config", {})
        disc = c.get("network", {}).get("disc", {})
        kw = dataclasses.asdict(base)
        for k in ("amp_batch_size", "amp_minibatch_size", "disc_coef",
                  "disc_logit_reg", "disc_grad_penalty", "disc_reward_scale",
                  "disc_weight_decay", "normalize_amp_input",
                  "task_reward_w", "disc_reward_w", "amp_replay_buffer_size",
                  "amp_replay_keep_prob"):
            if k in conf:
                kw[k] = conf[k]
        if "units" in disc:
            kw["disc_units"] = tuple(disc["units"])
        if "activation" in disc:
            kw["disc_activation"] = disc["activation"]
        kw["units"] = tuple(kw["units"])
        return AMPConfig(**kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AMPTrainState(TrainState):
    amp_rms: RMSState = None
    replay: jnp.ndarray = None        # (R, num_amp_obs) ring buffer
    replay_count: jnp.ndarray = None  # scalar int32, valid rows
    replay_ptr: jnp.ndarray = None    # scalar int32, next write position


class AMPPPO(PPO):
    """PPO with an adversarial motion-prior discriminator. The bound env's
    task must expose `num_amp_obs`, a task-state `amp_obs` window and
    `fetch_amp_obs_demo(key, n)` (tasks/humanoid_amp.py)."""

    def __init__(self, env: VecEnv, config: AMPConfig,
                 axis_name: str | None = None):
        super().__init__(env, config, axis_name)
        task = env.task
        self.num_amp_obs = int(task.num_amp_obs)
        self.disc = AMPDiscriminator(
            units=config.disc_units, activation=config.disc_activation,
            compute_dtype=jnp.bfloat16 if config.mixed_precision
            else jnp.float32)
        # static minibatch geometry for the disc
        n_roll = config.horizon_length * env.num_envs
        self.amp_mb = min(config.amp_minibatch_size, n_roll,
                          config.minibatch_size)
        self.replay_size = config.amp_replay_buffer_size
        self.replay_insert = max(1, int(n_roll * config.amp_replay_keep_prob))

    # ------------------------------------------------------------------
    def _apply(self, params, ts: TrainState, obs, states=None):
        p = params["ac"] if isinstance(params, dict) and "ac" in params \
            else params
        mu, log_std, value = self.network.apply(p, obs)
        return mu, log_std, value

    def act_deterministic(self, ts: TrainState, obs):
        if self.cfg.normalize_input:
            obs = rms_normalize(ts.obs_rms, obs)
        mu, _, _ = self.network.apply(ts.params["ac"], obs)
        return jnp.clip(mu, -1.0, 1.0)

    # ------------------------------------------------------------------
    def init(self, key) -> AMPTrainState:
        base = super().init(key)
        k_disc = jax.random.fold_in(key, 77)
        disc_params = self.disc.init(
            k_disc, jnp.zeros((1, self.num_amp_obs)))
        params = {"ac": base.params, "disc": disc_params}
        opt_state = self.optimizer.init(params)
        return AMPTrainState(
            params=params, opt_state=opt_state, lr=base.lr,
            obs_rms=base.obs_rms, value_rms=base.value_rms,
            states_rms=base.states_rms, epoch=base.epoch,
            amp_rms=RMSState.create((self.num_amp_obs,)),
            replay=jnp.zeros((self.replay_size, self.num_amp_obs)),
            replay_count=jnp.asarray(0, jnp.int32),
            replay_ptr=jnp.asarray(0, jnp.int32),
        )

    # ------------------------------------------------------------------
    def _amp_norm(self, ts, obs):
        return rms_normalize(ts.amp_rms, obs) \
            if self.cfg.normalize_amp_input else obs

    def _disc_logits(self, params, ts, amp_obs):
        return self.disc.apply(params["disc"], self._amp_norm(ts, amp_obs))

    def _disc_reward(self, ts, amp_obs):
        """Style reward from the current discriminator (rl_games
        _calc_disc_rewards)."""
        logits = self._disc_logits(ts.params, ts, amp_obs)
        prob = jax.nn.sigmoid(logits)
        return -jnp.log(jnp.maximum(1.0 - prob, 1e-4)) \
            * self.cfg.disc_reward_scale

    # ------------------------------------------------------------------
    def rollout(self, ts: TrainState, env_state: EnvState, key):
        """PPO rollout + per-step AMP windows of the post-step state."""
        def step(carry, _):
            env_state, key = carry
            key, k_act = jax.random.split(key)
            obs = env_state.obs
            mu, log_std, value = self._policy(ts, obs)
            action = mu + jnp.exp(log_std) * jax.random.normal(k_act, mu.shape)
            logp = (-0.5 * ((action - mu) / jnp.exp(log_std)) ** 2
                    - log_std - 0.5 * jnp.log(2 * jnp.pi)).sum(-1)
            env_state = self.env.step_fn(env_state, action)
            B = obs.shape[0]
            out = dict(obs=obs, action=action, logp=logp, value=value,
                       reward=env_state.reward, done=env_state.done,
                       timeout=env_state.timeout, mu=mu, log_std=log_std,
                       amp_obs=env_state.task.amp_obs.reshape(
                           B, self.num_amp_obs))
            return (env_state, key), out

        (env_state, _), traj = jax.lax.scan(
            step, (env_state, key), None, length=self.cfg.horizon_length)
        return env_state, traj

    # ------------------------------------------------------------------
    def _loss(self, params, ts: TrainState, batch, lr_unused=None):
        cfg = self.cfg
        total, aux = super()._loss(params, ts, batch)

        agent_obs = self._amp_norm(ts, jnp.concatenate(
            [batch["amp_cur"], batch["amp_replay"]], axis=0))
        demo_obs = self._amp_norm(ts, batch["amp_demo"])

        def disc_on(x):
            return self.disc.apply(params["disc"], x)

        agent_logits = disc_on(agent_obs)
        demo_logits = disc_on(demo_obs)
        # rows are independent -> grad of the sum is the per-sample gradient
        demo_grad = jax.grad(lambda x: disc_on(x).sum())(demo_obs)

        pred_loss = 0.5 * (jax.nn.softplus(-demo_logits).mean()
                           + jax.nn.softplus(agent_logits).mean())
        dp = params["disc"]["params"]
        logit_reg = jnp.sum(dp["disc_logits"]["kernel"] ** 2)
        grad_pen = jnp.mean(jnp.sum(demo_grad ** 2, axis=-1))
        wd = sum(jnp.sum(v["kernel"] ** 2) for k, v in dp.items())
        disc_loss = (pred_loss + cfg.disc_logit_reg * logit_reg
                     + cfg.disc_grad_penalty * grad_pen
                     + cfg.disc_weight_decay * wd)
        total = total + cfg.disc_coef * disc_loss
        aux = dict(aux, disc_loss=pred_loss,
                   disc_agent_acc=(agent_logits < 0.0).mean(),
                   disc_demo_acc=(demo_logits > 0.0).mean(),
                   disc_grad_pen=grad_pen)
        return total, aux

    # ------------------------------------------------------------------
    def train_iteration(self, ts: AMPTrainState, env_state: EnvState, key):
        cfg = self.cfg
        key, k_roll, k_perm, k_demo, k_replay, k_ins = jax.random.split(key, 6)
        env_state, traj = self.rollout(ts, env_state, k_roll)
        _, _, last_value = self._policy(ts, env_state.obs)

        # ---- combined task + style reward (rl_games _combine_rewards) ----
        T, B = traj["reward"].shape
        amp_flat = traj["amp_obs"].reshape(T * B, self.num_amp_obs)
        disc_r = self._disc_reward(ts, amp_flat).reshape(T, B)
        traj = dict(traj)
        task_r = traj["reward"]
        traj["reward"] = (cfg.task_reward_w * task_r
                          + cfg.disc_reward_w * disc_r)
        advantages, returns = self.compute_gae(ts, traj, last_value)

        def flat(x):
            return x.reshape((-1,) + x.shape[2:])

        batch = dict(
            obs=flat(traj["obs"]), action=flat(traj["action"]),
            logp=flat(traj["logp"]), value=flat(traj["value"]),
            mu=flat(traj["mu"]), log_std=flat(traj["log_std"]),
            adv=flat(advantages), ret=flat(returns),
            amp_obs=amp_flat,
        )
        if cfg.normalize_advantage:
            adv = batch["adv"]
            batch["adv"] = (adv - adv.mean()) / (adv.std() + 1e-8)

        N = batch["obs"].shape[0]
        mb = min(cfg.minibatch_size, N)
        nmb = N // mb
        amp_mb = self.amp_mb

        # ---- demo windows for this iteration (fresh, on-device) ----
        n_demo = nmb * amp_mb
        demo_all = self.env.task.fetch_amp_obs_demo(k_demo, n_demo)

        # ---- normalizer updates ----
        if cfg.normalize_input:
            ts = dataclasses.replace(
                ts, obs_rms=rms_update(ts.obs_rms, batch["obs"]))
        if cfg.normalize_value:
            from thormang_isaacgym_tpu.learn.normalize import rms_update as ru
            ts = dataclasses.replace(ts, value_rms=ru(ts.value_rms,
                                                      batch["ret"]))
        if cfg.normalize_amp_input:
            ts = dataclasses.replace(
                ts, amp_rms=rms_update(
                    rms_update(ts.amp_rms, amp_flat), demo_all))

        # ---- replay-backed agent windows ----
        # sample per-(mini_epoch, minibatch) replay rows; fall back to
        # rollout rows while the ring is empty
        n_rep = cfg.mini_epochs * nmb * amp_mb
        rep_idx = jax.random.randint(
            k_replay, (n_rep,), 0, jnp.maximum(ts.replay_count, 1))
        fallback_idx = jax.random.randint(jax.random.fold_in(k_replay, 1),
                                          (n_rep,), 0, N)
        rep_rows = jnp.where((ts.replay_count > 0)[..., None],
                             ts.replay[rep_idx],
                             batch["amp_obs"][fallback_idx])
        rep_rows = rep_rows.reshape(cfg.mini_epochs, nmb, amp_mb,
                                    self.num_amp_obs)
        demo_rows = demo_all.reshape(nmb, amp_mb, self.num_amp_obs)

        def mini_epoch(carry, xs):
            params, opt_state, lr = carry
            k_ep, rep_ep = xs
            perm = jax.random.permutation(k_ep, N)

            def mb_step(carry, xs):
                params, opt_state, lr = carry
                idx, rep_mb, demo_mb = xs
                mb_batch = {k: v[idx] for k, v in batch.items()
                            if k != "amp_obs"}
                mb_batch["amp_cur"] = batch["amp_obs"][idx[:amp_mb]]
                mb_batch["amp_replay"] = rep_mb
                mb_batch["amp_demo"] = demo_mb
                (loss, aux), grads = jax.value_and_grad(
                    self._loss, has_aux=True)(params, ts, mb_batch)
                if self.axis_name is not None:
                    grads = jax.lax.pmean(grads, self.axis_name)
                    aux = jax.tree.map(
                        lambda x: jax.lax.pmean(x, self.axis_name), aux)
                updates, opt_state = self.optimizer.update(
                    grads, opt_state, params)
                updates = jax.tree.map(lambda u: u * lr, updates)
                params = optax.apply_updates(params, updates)
                lr = self._adaptive_lr(lr, aux["kl"])
                return (params, opt_state, lr), aux

            idxs = perm[: nmb * mb].reshape(nmb, mb)
            (params, opt_state, lr), auxs = jax.lax.scan(
                mb_step, (params, opt_state, lr), (idxs, rep_ep, demo_rows))
            return (params, opt_state, lr), auxs

        keys = jax.random.split(k_perm, cfg.mini_epochs)
        (params, opt_state, lr), auxs = jax.lax.scan(
            mini_epoch, (ts.params, ts.opt_state, ts.lr), (keys, rep_rows))

        # ---- insert a keep-prob subsample of this rollout into the ring ----
        ins_idx = jax.random.choice(k_ins, N, (self.replay_insert,),
                                    replace=False)
        pos = (ts.replay_ptr
               + jnp.arange(self.replay_insert)) % self.replay_size
        replay = ts.replay.at[pos].set(batch["amp_obs"][ins_idx])
        replay_count = jnp.minimum(ts.replay_count + self.replay_insert,
                                   self.replay_size)
        replay_ptr = (ts.replay_ptr + self.replay_insert) % self.replay_size

        ts = dataclasses.replace(
            ts, params=params, opt_state=opt_state, lr=lr,
            epoch=ts.epoch + 1, replay=replay, replay_count=replay_count,
            replay_ptr=replay_ptr)

        metrics = dict(
            reward_mean=traj["reward"].mean(),
            task_reward_mean=task_r.mean(),
            disc_reward_mean=disc_r.mean(),
            episode_return_mean=env_state.last_episode_return.mean(),
            episode_done_frac=traj["done"].mean(),
            kl=auxs["kl"][-1].mean(),
            a_loss=auxs["a_loss"].mean(),
            v_loss=auxs["v_loss"].mean(),
            disc_loss=auxs["disc_loss"].mean(),
            disc_agent_acc=auxs["disc_agent_acc"].mean(),
            disc_demo_acc=auxs["disc_demo_acc"].mean(),
            entropy=auxs["entropy"].mean(),
            lr=lr,
        )
        return ts, env_state, metrics
