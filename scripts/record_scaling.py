"""Record SCALING_r04.json — sharded-training scaling measurement
(VERDICT r3 item 10; BASELINE.json north star ">=80% scaling efficiency
at 1 chip / 1 host / >=2 hosts").

Hardware reality: this box tunnels to ONE real TPU chip, so true
multi-chip ICI scaling cannot be wall-clock-measured here. What CAN be
measured honestly:

1. SPMD partition overhead (CPU host, fixed 2 vCPUs): the same PPO train
   iteration at the same TOTAL env count, unsharded vs shard_mapped over
   an N-virtual-device mesh. The mesh adds no compute and the host adds
   no parallelism, so t_unsharded / t_sharded isolates the overhead the
   partitioner + collectives add — the quantity that would eat scaling
   efficiency on a real slice (rollout is communication-free by
   construction; only the learner's gradient pmean crosses devices).

2. Per-device program equivalence: the sharded program's leaves stay
   sharded (no silent all-gather), asserted via shardings.

Run: python scripts/record_scaling.py [--task Gogoro] [--envs 512]
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("THORMANG_COMPILE_CACHE",
                                 "/tmp/thormang_xla_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def time_iters(train_iter, ts, es, key, iters=6):
    import jax.numpy as jnp
    # warmup / compile
    ts, es, m = train_iter(ts, es, key)
    jax.tree.map(lambda x: getattr(x, "block_until_ready", lambda: x)(), m)
    t0 = time.perf_counter()
    for i in range(iters):
        key = jax.random.fold_in(key, i)
        ts, es, m = train_iter(ts, es, key)
    jax.tree.map(lambda x: getattr(x, "block_until_ready", lambda: x)(), m)
    return (time.perf_counter() - t0) / iters, ts, es


def main(task="Gogoro", envs=512):
    import numpy as np
    from jax.sharding import Mesh

    import thormang_isaacgym_tpu as tgx
    from thormang_isaacgym_tpu.learn.ppo import PPO, PPOConfig
    from thormang_isaacgym_tpu.parallel.mesh import ENV_AXIS, shard_ppo
    from thormang_isaacgym_tpu.utils.config import CFG_ROOT, load_yaml

    ycfg = os.path.join(CFG_ROOT, "train", f"{task}PPO.yaml")
    cfg = PPOConfig.from_rlgames(load_yaml(ycfg)) if os.path.exists(ycfg) \
        else PPOConfig()
    cfg = dataclasses.replace(
        cfg, minibatch_size=min(cfg.minibatch_size,
                                envs * cfg.horizon_length),
        mixed_precision=False)

    out = {"schema": "scaling_v1", "recorded": time.strftime("%F"),
           "task": task, "num_envs_total": envs,
           "host": "2 vCPU, 8 virtual XLA devices",
           "note": ("one real TPU chip only (tunneled) - this measures "
                    "SPMD partition overhead at fixed total work, not "
                    "multi-chip speedup; rollout shards communicate "
                    "nothing, learner grads pmean per minibatch"),
           "points": []}

    # unsharded baseline (single device)
    env = tgx.make(task, num_envs=envs, seed=3)
    ppo = PPO(env, cfg)
    key = jax.random.key(0)
    ts = ppo.init(key)
    es = env.reset(key)
    t1, _, _ = time_iters(ppo._train_iter, ts, es, key)
    steps = envs * cfg.horizon_length
    out["points"].append({"devices": 1, "sharded": False,
                          "iter_s": round(t1, 4),
                          "env_steps_per_s": round(steps / t1, 1)})
    print("unsharded 1dev:", round(t1, 3), "s/iter", flush=True)

    for n in (2, 4, 8):
        devs = jax.devices()[:n]
        mesh = Mesh(np.array(devs), (ENV_AXIS,))
        env = tgx.make(task, num_envs=envs, seed=3)
        ppo_s = PPO(env, cfg, axis_name=ENV_AXIS)
        train_iter, init_fn = shard_ppo(ppo_s, mesh)
        ts, es = init_fn(jax.random.key(0))
        t_n, ts, es = time_iters(train_iter, ts, es, jax.random.key(1))
        # leaves stayed sharded over the mesh
        n_shards = len(es.q.sharding.device_set)
        eff = t1 / t_n
        out["points"].append({
            "devices": n, "sharded": True, "iter_s": round(t_n, 4),
            "env_steps_per_s": round(steps / t_n, 1),
            "env_state_shards": n_shards,
            "partition_overhead_efficiency": round(eff, 3)})
        print(f"sharded {n}dev: {t_n:.3f} s/iter  "
              f"efficiency(t1/tN at fixed work) {eff:.3f}", flush=True)

    effs = [p["partition_overhead_efficiency"] for p in out["points"]
            if p.get("sharded")]
    out["partition_overhead_efficiency_min"] = min(effs)
    out["meets_80pct_overhead_budget"] = bool(min(effs) >= 0.8)
    path = os.path.join(os.path.dirname(__file__), "..", "SCALING_r04.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", os.path.abspath(path))


if __name__ == "__main__":
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    main(task=kv.get("--task", kv.get("task", "Gogoro")),
         envs=int(kv.get("--envs", kv.get("envs", 512))))
