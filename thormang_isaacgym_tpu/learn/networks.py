"""Actor-critic networks — parity with rl_games' `actor_critic` network as
configured by the reference train configs
(`/root/reference/isaacgymenvs/cfg/train/GogoroPPO.yaml:10-36`):

- shared MLP trunk (separate: False), elu activations, units e.g. [512]*3
- continuous head: mu (linear), state-independent log_std parameter
  (fixed_sigma: True, sigma_init 0 -> std = 1)
- value head: linear scalar

Dense layers run in bf16 on the MXU with f32 accumulation/params — the
TPU-native equivalent of rl_games' mixed_precision: True.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class ActorCritic(nn.Module):
    num_actions: int
    units: Sequence[int] = (512, 512, 512)
    activation: str = "elu"
    separate: bool = False
    fixed_sigma: bool = True
    sigma_init: float = 0.0
    compute_dtype: jnp.dtype = jnp.float32

    def _mlp(self, x, name):
        act = getattr(nn, self.activation)
        for i, u in enumerate(self.units):
            x = nn.Dense(u, name=f"{name}_{i}", dtype=self.compute_dtype)(x)
            x = act(x)
        return x

    @nn.compact
    def __call__(self, obs):
        x = obs.astype(self.compute_dtype)
        trunk = self._mlp(x, "trunk")
        if self.separate:
            vtrunk = self._mlp(x, "vtrunk")
        else:
            vtrunk = trunk
        mu = nn.Dense(self.num_actions, name="mu", dtype=self.compute_dtype)(trunk)
        value = nn.Dense(1, name="value", dtype=self.compute_dtype)(vtrunk)
        if self.fixed_sigma:
            log_std = self.param(
                "log_std", nn.initializers.constant(self.sigma_init), (self.num_actions,))
            log_std = jnp.broadcast_to(log_std, mu.shape)
        else:
            log_std = nn.Dense(self.num_actions, name="sigma", dtype=self.compute_dtype)(trunk)
        # hard bound: exp(2*log_std) in the KL overflows f32 past ~44, and
        # an entropy bonus can push the (otherwise unconstrained) parameter
        # there once |a| >> 1 makes its policy-gradient vanish (observed:
        # ShadowHand entropy 0.6 -> 556 over 20k resumed epochs, i.e.
        # per-dim std e^27 - uniform-random rollouts and NaN KL)
        log_std = jnp.clip(log_std, -5.0, 2.0)
        return mu.astype(jnp.float32), log_std.astype(jnp.float32), value[..., 0].astype(jnp.float32)


class ActorCriticRNN(nn.Module):
    """Actor-critic with an LSTM between trunk and heads — the rl_games
    `rnn:` network block (`cfg/train/AnymalTerrainPPO_LSTM.yaml`,
    `HumanoidPPO.yaml:68-75`: name lstm, units, layers, before_mlp,
    concat_input, layer_norm; trained with `seq_len` truncated BPTT).

    Stepwise API: `__call__(obs, carry) -> (mu, log_std, value, carry')`
    where carry is a tuple over layers of flax LSTMCell (c, h) pairs. The
    PPO rollout threads the carry and zeroes it on env done; training
    re-scans sequences from stored seq-start carries.
    """
    num_actions: int
    units: Sequence[int] = (256, 128)
    rnn_units: int = 256
    rnn_layers: int = 1
    before_mlp: bool = False
    concat_input: bool = False
    layer_norm: bool = False
    activation: str = "elu"
    fixed_sigma: bool = True
    sigma_init: float = 0.0
    compute_dtype: jnp.dtype = jnp.float32

    def _mlp(self, x, name):
        act = getattr(nn, self.activation)
        for i, u in enumerate(self.units):
            x = nn.Dense(u, name=f"{name}_{i}", dtype=self.compute_dtype)(x)
            x = act(x)
        return x

    @nn.compact
    def __call__(self, obs, carry):
        x = obs.astype(self.compute_dtype)
        if not self.before_mlp:
            x = self._mlp(x, "trunk")
            if self.concat_input:
                x = jnp.concatenate([x, obs.astype(self.compute_dtype)], -1)
        new_carry = []
        for l in range(self.rnn_layers):
            cell = nn.OptimizedLSTMCell(self.rnn_units, name=f"lstm_{l}",
                                        dtype=self.compute_dtype)
            (c, h) = carry[l]
            (c, h), x = cell((c.astype(self.compute_dtype),
                              h.astype(self.compute_dtype)), x)
            new_carry.append((c.astype(jnp.float32), h.astype(jnp.float32)))
        if self.layer_norm:
            x = nn.LayerNorm(dtype=self.compute_dtype, name="rnn_ln")(x)
        if self.before_mlp:
            x = self._mlp(x, "trunk")
        mu = nn.Dense(self.num_actions, name="mu", dtype=self.compute_dtype)(x)
        value = nn.Dense(1, name="value", dtype=self.compute_dtype)(x)
        if self.fixed_sigma:
            log_std = self.param(
                "log_std", nn.initializers.constant(self.sigma_init),
                (self.num_actions,))
            log_std = jnp.broadcast_to(log_std, mu.shape)
        else:
            log_std = nn.Dense(self.num_actions, name="sigma",
                               dtype=self.compute_dtype)(x)
        log_std = jnp.clip(log_std, -5.0, 2.0)   # see ActorCritic
        return (mu.astype(jnp.float32), log_std.astype(jnp.float32),
                value[..., 0].astype(jnp.float32), tuple(new_carry))

    def zero_carry(self, batch: int):
        return tuple(
            (jnp.zeros((batch, self.rnn_units)),
             jnp.zeros((batch, self.rnn_units)))
            for _ in range(self.rnn_layers))


class AMPDiscriminator(nn.Module):
    """AMP discriminator — the rl_games `disc:` network block
    (`/root/reference/isaacgymenvs/cfg/train/HumanoidAMPPPO.yaml:33-38`:
    MLP [1024, 512] relu -> 1 logit). The final layer is named
    `disc_logits` so the logit-weight regularizer (disc_logit_reg) can
    target its kernel."""
    units: Sequence[int] = (1024, 512)
    activation: str = "relu"
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, amp_obs):
        x = amp_obs.astype(self.compute_dtype)
        act = getattr(nn, self.activation)
        for i, u in enumerate(self.units):
            x = nn.Dense(u, name=f"disc_{i}", dtype=self.compute_dtype)(x)
            x = act(x)
        logit = nn.Dense(1, name="disc_logits", dtype=self.compute_dtype)(x)
        return logit[..., 0].astype(jnp.float32)


class ValueNet(nn.Module):
    """Central value network for asymmetric actor-critic: the critic reads
    privileged full-state observations (rl_games central_value_config, used
    by ShadowHand/Trifinger asymm configs, e.g.
    `cfg/train/ShadowHandPPOAsymm*.yaml`)."""
    units: Sequence[int] = (512, 512, 256)
    activation: str = "elu"
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, states):
        x = states.astype(self.compute_dtype)
        act = getattr(nn, self.activation)
        for i, u in enumerate(self.units):
            x = nn.Dense(u, name=f"cv_{i}", dtype=self.compute_dtype)(x)
            x = act(x)
        v = nn.Dense(1, name="cv_value", dtype=self.compute_dtype)(x)
        return v[..., 0].astype(jnp.float32)
