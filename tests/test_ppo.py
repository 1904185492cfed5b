"""PPO learner tests: mechanics + a cartpole learning-curve regression
(SURVEY.md §4: "learning-curve regression on cartpole ... as integration
tests")."""
import jax
import jax.numpy as jnp
import numpy as np

import thormang_isaacgym_tpu as tgx
from thormang_isaacgym_tpu.learn.ppo import PPO, PPOConfig


def make_ppo(num_envs=64, **kw):
    env = tgx.make("Cartpole", num_envs=num_envs, seed=0)
    defaults = dict(
        horizon_length=32, minibatch_size=1024, mini_epochs=4,
        learning_rate=3e-4, units=(64, 64), kl_threshold=0.008,
        mixed_precision=False,
    )
    defaults.update(kw)
    return PPO(env, PPOConfig(**defaults))


def test_train_iteration_runs_and_is_finite():
    ppo = make_ppo(num_envs=16, horizon_length=8, minibatch_size=128)
    key = jax.random.key(0)
    ts = ppo.init(key)
    env_state = ppo.env.reset(key)
    ts, env_state, metrics = ppo._train_iter(ts, env_state, key)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    assert int(ts.epoch) == 1


def test_gae_matches_reference_impl():
    """GAE against a straightforward numpy implementation."""
    ppo = make_ppo(num_envs=4, horizon_length=6)
    T, B = 6, 4
    rng = np.random.RandomState(0)
    traj = dict(
        reward=jnp.array(rng.randn(T, B).astype(np.float32)),
        value=jnp.array(rng.randn(T, B).astype(np.float32)),
        done=jnp.array((rng.rand(T, B) < 0.2).astype(np.float32)),
        timeout=jnp.zeros((T, B), jnp.float32),
    )
    last_value = jnp.array(rng.randn(B).astype(np.float32))
    ts = ppo.init(jax.random.key(0))
    adv, ret = ppo.compute_gae(ts, traj, last_value)

    gamma, lam, scale = ppo.cfg.gamma, ppo.cfg.tau, ppo.cfg.reward_shaper_scale
    r = np.asarray(traj["reward"]) * scale
    v = np.asarray(traj["value"])
    nd = 1.0 - np.asarray(traj["done"])
    expected = np.zeros((T, B), np.float32)
    gae = np.zeros(B, np.float32)
    next_v = np.asarray(last_value)
    for t in reversed(range(T)):
        delta = r[t] + gamma * next_v * nd[t] - v[t]
        gae = delta + gamma * lam * nd[t] * gae
        expected[t] = gae
        next_v = v[t]
    np.testing.assert_allclose(np.asarray(adv), expected, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ret), expected + v, atol=1e-5)


def test_cartpole_learns():
    """Reward must improve substantially within a small budget."""
    ppo = make_ppo(num_envs=128, horizon_length=32, minibatch_size=2048,
                   mini_epochs=4, reward_shaper_scale=1.0)
    ts, env_state, history = ppo.train(num_epochs=60, seed=3, log_every=5)
    first = history[0]["reward_mean"]
    best = max(h["reward_mean"] for h in history)
    # random policy ~0.3-0.6; trained > 0.9 (near max 1.0 per step)
    assert best > 0.85, (first, best, [h["reward_mean"] for h in history])
    # the policy should also reduce early terminations
    last_done = history[-1]["episode_done_frac"]
    assert last_done < history[0]["episode_done_frac"] + 1e-6 or last_done < 0.01


def test_deterministic_play_action_bounded():
    ppo = make_ppo(num_envs=8)
    ts = ppo.init(jax.random.key(0))
    obs = jnp.array(np.random.RandomState(0).randn(8, 4).astype(np.float32)) * 10
    act = ppo.act_deterministic(ts, obs)
    assert float(jnp.abs(act).max()) <= 1.0
