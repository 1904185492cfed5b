"""Benchmark: Gogoro env-steps/s at 4096 envs on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md); the only order-of-magnitude
anchor is the Isaac Gym paper's ~100k env-steps/s at humanoid scale on a
single A100 (PAPERS.md, arXiv 2108.10470). vs_baseline is value / 100_000
against that anchor.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp


def main():
    num_envs = 4096
    steps = 100

    import thormang_isaacgym_tpu as tgx

    try:
        env = tgx.make("Gogoro", num_envs=num_envs, seed=42)
        task_name = "Gogoro"
    except FileNotFoundError:
        env = tgx.make("Cartpole", num_envs=num_envs, seed=42)
        task_name = "Cartpole"

    key = jax.random.key(0)
    state = env.reset(key)

    @jax.jit
    def run(state, key):
        def body(carry, _):
            state, key = carry
            key, sub = jax.random.split(key)
            actions = jax.random.uniform(
                sub, (num_envs, env.num_actions), minval=-1.0, maxval=1.0)
            state = env.step_fn(state, actions)
            return (state, key), None

        (state, key), _ = jax.lax.scan(body, (state, key), None, length=steps)
        # scalar summary: pulling it to the host is a true completion
        # barrier (block_until_ready is unreliable on the tunneled backend)
        return state, key, jnp.sum(state.q[:, 2]) + jnp.sum(state.reward)

    t0 = time.perf_counter()
    state, key, s = run(state, key)
    float(s)
    compile_s = time.perf_counter() - t0
    print(f"compile+first run: {compile_s:.1f}s", file=sys.stderr)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, key, s = run(state, key)
        float(s)
        times.append(time.perf_counter() - t0)
    elapsed = min(times)

    env_steps_per_s = num_envs * steps / elapsed
    print(json.dumps({
        "metric": f"{task_name.lower()}_env_steps_per_s_4096envs_1chip",
        "value": round(env_steps_per_s, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(env_steps_per_s / 100_000.0, 3),
    }))


if __name__ == "__main__":
    main()
