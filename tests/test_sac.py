"""SAC learner tests (rl_games AntSAC.yaml-parity agent)."""
import jax
import numpy as np

import thormang_isaacgym_tpu as tgx
from thormang_isaacgym_tpu.learn.sac import SAC, SACConfig


def test_sac_iteration_runs():
    env = tgx.make("Cartpole", num_envs=16, seed=0)
    sac = SAC(env, SACConfig(units=(32, 32), batch_size=256,
                             replay_buffer_size=4096, steps_per_iteration=8,
                             grad_steps=4, num_seed_steps=1))
    key = jax.random.key(0)
    ts = sac.init(key)
    env_state = sac.env.reset(key)
    for _ in range(3):
        key, sub = jax.random.split(key)
        ts, env_state, metrics = sac._train_iter(ts, env_state, sub)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    assert int(ts.step) == 3
    assert int(ts.buffer_pos) == 24


def test_sac_improves_cartpole():
    env = tgx.make("Cartpole", num_envs=64, seed=0)
    sac = SAC(env, SACConfig(units=(64, 64), batch_size=1024,
                             replay_buffer_size=100_000,
                             steps_per_iteration=16, grad_steps=8,
                             num_seed_steps=2))
    ts, env_state, hist = sac.train(num_iterations=40, seed=1, log_every=5)
    first = hist[0]["reward_mean"]
    best = max(h["reward_mean"] for h in hist)
    assert best > first - 0.2  # not diverging
    assert np.isfinite(hist[-1]["critic_loss"])
