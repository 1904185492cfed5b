"""Env-framework tests: rollout mechanics, auto-reset, determinism, and the
Gogoro task's physical sanity (gyroscopic stability)."""
import jax
import jax.numpy as jnp
import numpy as np
import os
import pytest

import thormang_isaacgym_tpu as tgx


@pytest.fixture(scope="module")
def cartpole_env():
    return tgx.make("Cartpole", num_envs=32, seed=0)


def rollout(env, state, steps, policy=None, key=None):
    key = key if key is not None else jax.random.key(123)

    @jax.jit
    def run(state, key):
        def body(carry, _):
            state, key = carry
            key, sub = jax.random.split(key)
            if policy is None:
                actions = jax.random.uniform(
                    sub, (env.num_envs, env.num_actions), minval=-1.0, maxval=1.0)
            else:
                actions = policy(state.obs)
            state = env.step_fn(state, actions)
            return (state, key), (state.reward, state.done, state.obs)
        (state, _), traj = jax.lax.scan(body, (state, key), None, length=steps)
        return state, traj

    return run(state, key)


def test_cartpole_rollout_and_autoreset(cartpole_env):
    env = cartpole_env
    state = env.reset(jax.random.key(0))
    assert state.obs.shape == (32, 4)
    final, (rew, done, obs) = rollout(env, state, 200)
    rew, done, obs = map(np.asarray, (rew, done, obs))
    assert np.isfinite(obs).all()
    assert np.isfinite(rew).all()
    # random actions must kill some episodes within 200 steps
    assert done.sum() > 0
    # progress resets after done
    assert int(final.progress.max()) < 200
    # obs bounded: cart position inside rail limits
    assert np.abs(obs[..., 0]).max() < 4.5


def test_determinism(cartpole_env):
    env = cartpole_env
    s1 = env.reset(jax.random.key(7))
    s2 = env.reset(jax.random.key(7))
    f1, (r1, _, _) = rollout(env, s1, 50, key=jax.random.key(5))
    f2, (r2, _, _) = rollout(env, s2, 50, key=jax.random.key(5))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_array_equal(np.asarray(f1.q), np.asarray(f2.q))


def test_seed_changes_trajectories(cartpole_env):
    env = cartpole_env
    s1 = env.reset(jax.random.key(1))
    s2 = env.reset(jax.random.key(2))
    assert not np.allclose(np.asarray(s1.q), np.asarray(s2.q))


@pytest.mark.skipif(not os.path.exists("/root/reference/assets"), reason="no reference assets")
class TestGogoro:
    @pytest.fixture(scope="class")
    def env(self):
        return tgx.make("Gogoro", num_envs=16, seed=0)

    def test_obs_shapes_and_stability(self, env):
        state = env.reset(jax.random.key(0))
        assert state.obs.shape == (16, 6)
        # straight-line riding with zero steering: the scooter should stay
        # upright for a while (gyroscopic + drive stability at speed)
        zero_policy = lambda obs: jnp.zeros((env.num_envs, 1))
        final, (rew, done, obs) = rollout(env, state, 100, policy=zero_policy)
        obs = np.asarray(obs)
        assert np.isfinite(obs).all()
        assert np.isfinite(np.asarray(final.q)).all()
        # roll channel bounded (not exploding)
        assert np.abs(np.asarray(final.q[:, 2]) - 0.2).max() < 2.0  # z stays near ground

    def test_speed_tracks_command(self, env):
        state = env.reset(jax.random.key(1))
        zero_policy = lambda obs: jnp.zeros((env.num_envs, 1))
        final, (rew, done, obs) = rollout(env, state, 150, policy=zero_policy)
        # rear wheel spins up toward its velocity command for envs that have
        # been alive a while (regularized Coulomb friction allows some creep,
        # and the 170 Nm effort clamp limits spin-up under load)
        rid = env.task.rid
        wheel_vel = np.asarray(final.qd[:, 6 + rid])
        cmd = np.asarray(final.task.speed_cmd)
        mature = (np.asarray(final.done) < 0.5) & (np.asarray(final.progress) > 30)
        if mature.sum() > 0:
            ratio = wheel_vel[mature] / cmd[mature]
            assert np.median(ratio) > 0.4, (wheel_vel[mature], cmd[mature])
            # and the scooter actually moves (root linear velocity is world
            # frame; heading is random, so check the speed magnitude)
            speed = np.linalg.norm(np.asarray(final.qd[mature, 3:5]), axis=1)
            assert np.median(speed) > 0.3, speed


def test_nan_quarantine():
    """Failure detection (SURVEY.md §5): a non-finite physics state rolls
    back to the pre-step state, zeroes the reward, and force-resets the
    env instead of poisoning the batch."""
    import dataclasses
    import thormang_isaacgym_tpu as tgx

    env = tgx.make("Cartpole", num_envs=4, seed=0)
    state = env.reset(jax.random.key(0))
    q = np.asarray(state.q).copy()
    q[1, 0] = np.nan                       # corrupt env 1's carried state
    state = dataclasses.replace(state, q=jnp.asarray(q),
                                progress=state.progress + 5)
    state = env.step(state, jnp.zeros((4, 1)))
    # the corrupted env is repaired in place: swapped to a fresh reset
    # state (progress restarts), everything finite, batch unpoisoned
    assert bool(jnp.isfinite(state.obs).all())
    assert bool(jnp.isfinite(state.q).all())
    assert bool(jnp.isfinite(state.reward).all())
    assert int(state.progress[1]) == 1     # restarted
    assert int(state.progress[0]) == 6     # others unaffected
    state = env.step(state, jnp.zeros((4, 1)))
    assert bool(jnp.isfinite(state.obs).all())


def test_stagger_episodes_decorrelates_timeouts():
    """stagger_episodes randomizes initial progress so episode timeouts
    spread out instead of firing in one synchronized wave (the r3 Gogoro
    parity sawtooth)."""
    env = tgx.make("Cartpole", num_envs=64, seed=0, stagger_episodes=True)
    state = env.reset(jax.random.key(0))
    p = np.asarray(state.progress)
    assert p.min() >= 0 and p.max() < env.task.max_episode_length
    assert np.unique(p).size > 16          # actually spread out
    # and the default remains phase-locked at zero
    env0 = tgx.make("Cartpole", num_envs=8, seed=0)
    assert (np.asarray(env0.reset(jax.random.key(0)).progress) == 0).all()
