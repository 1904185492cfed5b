import time, jax, jax.numpy as jnp, numpy as np
import thormang_isaacgym_tpu as tgx
env = tgx.make("Gogoro", num_envs=4096, seed=42)
key = jax.random.key(0)
state = env.reset(key)

@jax.jit
def run(state, key):
    def body(carry, _):
        state, key = carry
        key, sub = jax.random.split(key)
        actions = jax.random.uniform(sub, (4096, env.num_actions), minval=-1., maxval=1.)
        state = env.step_fn(state, actions)
        return (state, key), None
    (state, key), _ = jax.lax.scan(body, (state, key), None, length=100)
    return state, key, jnp.sum(state.q[:, 2]) + jnp.sum(state.reward)

t0=time.perf_counter(); state, key, s = run(state, key); print("compile+run:", time.perf_counter()-t0, float(s), flush=True)
for i in range(3):
    t0=time.perf_counter()
    state, key, s = run(state, key)
    sv = float(s)
    dt=time.perf_counter()-t0
    print(f"rep {i}: {dt*1e3:.1f} ms -> {4096*100/dt:,.0f} env-steps/s", flush=True)
