"""Running mean/std normalization — parity with rl_games' RunningMeanStd
(used when `normalize_input` / `normalize_value` are set, e.g.
`/root/reference/isaacgymenvs/cfg/train/HumanoidPPO.yaml`).

Pure-functional: state is a pytree updated with Welford-style batched moments.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RMSState:
    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray

    @staticmethod
    def create(shape=()):
        return RMSState(jnp.zeros(shape), jnp.ones(shape), jnp.asarray(1e-4))


def rms_update(state: RMSState, batch: jnp.ndarray) -> RMSState:
    """batch: (N, *shape) — parallel-variance (Chan) update."""
    bmean = batch.mean(axis=0)
    bvar = batch.var(axis=0)
    bcount = batch.shape[0]
    delta = bmean - state.mean
    tot = state.count + bcount
    new_mean = state.mean + delta * (bcount / tot)
    m_a = state.var * state.count
    m_b = bvar * bcount
    m2 = m_a + m_b + delta**2 * state.count * bcount / tot
    return RMSState(new_mean, m2 / tot, tot)


def rms_normalize(state: RMSState, x: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip((x - state.mean) / jnp.sqrt(state.var + 1e-5), -5.0, 5.0)


def rms_denormalize(state: RMSState, x: jnp.ndarray) -> jnp.ndarray:
    return x * jnp.sqrt(state.var + 1e-5) + state.mean
