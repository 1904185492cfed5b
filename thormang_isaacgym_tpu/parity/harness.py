"""Golden-trajectory parity harness (SURVEY.md §7.1 item 9).

Replays fixed-seed random-action rollouts — the same protocol as the
reference's only verification mechanism (`MA_VecTask.random_actions`,
`multi_vec_task.py:219-227`, and the export parity set,
`export.py:175-200`) — and records observations/rewards/dones as golden
`.npz` files. CI compares fresh rollouts against the goldens, catching any
silent physics or task-spec drift. Determinism is by construction (stateless
PRNG streams), so the comparison is tight.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def record_trajectory(env, *, steps: int, seed: int = 1234):
    """Fixed-seed random-action rollout. Returns dict of numpy arrays."""
    key = jax.random.key(seed)
    state = env.reset(key)

    @jax.jit
    def run(state, key):
        def body(carry, _):
            state, key = carry
            key, sub = jax.random.split(key)
            actions = jax.random.uniform(
                sub, (env.num_envs, env.num_actions), minval=-1.0, maxval=1.0)
            state = env.step_fn(state, actions)
            return (state, key), (state.obs, state.reward, state.done)

        (state, _), (obs, rew, done) = jax.lax.scan(
            body, (state, key), None, length=steps)
        return state, obs, rew, done

    state, obs, rew, done = run(state, jax.random.fold_in(key, 7))
    return dict(
        obs=np.asarray(obs), reward=np.asarray(rew), done=np.asarray(done),
        final_q=np.asarray(state.q), final_qd=np.asarray(state.qd),
    )


def golden_path(name: str) -> str:
    d = os.path.join(os.path.dirname(__file__), "..", "..", "tests", "goldens")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, f"{name}.npz")


def save_golden(name: str, traj: dict) -> None:
    np.savez_compressed(golden_path(name), **traj)


def load_golden(name: str):
    path = golden_path(name)
    if not os.path.exists(path):
        return None
    return dict(np.load(path))


def check_or_record(name: str, env, *, steps: int, seed: int = 1234,
                    atol: float = 2e-3) -> str:
    """Compare against the stored golden; record it if absent (or if
    REGEN_GOLDENS=1). Returns 'recorded' or 'matched'; raises on mismatch."""
    traj = record_trajectory(env, steps=steps, seed=seed)
    golden = load_golden(name)
    if golden is None or os.environ.get("REGEN_GOLDENS") == "1":
        save_golden(name, traj)
        return "recorded"
    for k in ("reward", "done", "final_q"):
        np.testing.assert_allclose(
            traj[k], golden[k], atol=atol,
            err_msg=f"golden-trajectory drift in {name}:{k}")
    return "matched"
