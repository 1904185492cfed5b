"""Benchmark: Gogoro env-steps/s at 4096 envs on one chip (flagship), plus
Humanoid and ShadowHand secondary numbers on stderr.

Prints ONE JSON line on stdout: {"metric", "value", "unit", "vs_baseline"}.
Secondary benches (humanoid / shadow hand — the round-1/round-3 asks) print
as JSON lines on stderr so the driver contract (one stdout line) holds.

The reference publishes no numbers (BASELINE.md); the only order-of-magnitude
anchor is the Isaac Gym paper's ~100k env-steps/s at humanoid scale on a
single A100 (PAPERS.md, arXiv 2108.10470). vs_baseline is value / 100_000
against that anchor.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# persistent compilation cache: repeat bench runs skip the cold compile
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("THORMANG_COMPILE_CACHE",
                                 "/tmp/thormang_xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def bench_env(env, num_envs, steps=100, repeats=3):
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

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        state, key, s = run(state, key)
        float(s)
        times.append(time.perf_counter() - t0)
    return num_envs * steps / min(times), compile_s


def main():
    import thormang_isaacgym_tpu as tgx

    num_envs = 4096
    try:
        env = tgx.make("Gogoro", num_envs=num_envs, seed=42)
        task_name = "Gogoro"
    except FileNotFoundError:
        env = tgx.make("Cartpole", num_envs=num_envs, seed=42)
        task_name = "Cartpole"
    rate, compile_s = bench_env(env, num_envs)
    print(f"compile+first run: {compile_s:.1f}s", file=sys.stderr)
    flagship = {
        "metric": f"{task_name.lower()}_env_steps_per_s_4096envs_1chip",
        "value": round(rate, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(rate / 100_000.0, 3),
    }
    # the driver contract (ONE stdout JSON line) must survive a timeout
    # mid-secondary: print the flagship FIRST, secondaries go to stderr
    print(json.dumps(flagship), flush=True)

    # secondary benches (stderr): humanoid-scale + manipulation-scale +
    # the contact-rich factory scene (fused pair-collision kernel)
    for name, n in (("Humanoid", 4096), ("ShadowHand", 1024),
                    ("FactoryTaskNutBoltPick", 1024),
                    ("AnymalTerrain", 4096)):
        if os.environ.get("THORMANG_BENCH_SECONDARY", "1") != "1":
            break
        try:
            env2 = tgx.make(name, num_envs=n, seed=42)
            r2, c2 = bench_env(env2, n, steps=50, repeats=2)
            print(json.dumps({
                "metric": f"{name.lower()}_env_steps_per_s_{n}envs_1chip",
                "value": round(r2, 1), "unit": "env-steps/s",
                "compile_s": round(c2, 1),
                "vs_baseline": round(r2 / 100_000.0, 3),
            }), file=sys.stderr)
            del env2
        except Exception as e:  # secondary benches must not break the line
            print(f"secondary bench {name} failed: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
