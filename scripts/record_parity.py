"""Record PARITY_r03: reduced-scale learning-curve regressions at reference
hyperparameters (VERDICT r2 item 10; BASELINE.json "PPO return parity vs
the reference under fixed seed").

For each task: train with the knobs from its reference train YAML (env
count reduced; everything algorithmic unchanged), record the reward curve,
and write PARITY_r03.json at the repo root. tests/test_parity.py asserts
the committed curve thresholds stay reproducible in CI.

Run: python scripts/record_parity.py [--quick]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SPECS = [
    # (task, train_yaml_name, num_envs, epochs, final reward_mean floor)
    # floors sit ~25% under healthy reduced-scale runs (reward_mean is the
    # per-step shaped reward, not the episode return)
    ("Cartpole", "CartpolePPO", 64, 60, 0.75),
    ("Ant", "AntPPO", 64, 60, 0.55),
    ("Gogoro", "GogoroPPO", 64, 50, 0.4),
]


def main(quick=False):
    import jax
    # the environment preloads jax with the TPU plugin (sitecustomize);
    # parity curves are a CPU-reproducible artifact — force the backend
    # before any computation
    jax.config.update("jax_platforms", "cpu")

    from thormang_isaacgym_tpu.learn.ppo import PPO, PPOConfig
    from thormang_isaacgym_tpu.tasks import make
    from thormang_isaacgym_tpu.utils.config import CFG_ROOT, load_yaml

    out = {"schema": "parity_curve_v1", "recorded": time.strftime("%F"),
           "tasks": {}}
    for task, yaml_name, n, epochs, floor in SPECS:
        if quick and task != "Cartpole":
            continue
        t0 = time.time()
        tcfg = load_yaml(os.path.join(CFG_ROOT, "train",
                                      f"{yaml_name}.yaml"))
        cfg = PPOConfig.from_rlgames(tcfg)
        # reduced scale: env count + minibatch shrink together so the
        # update geometry (nmb, epochs) is preserved
        import dataclasses
        cfg = dataclasses.replace(
            cfg, minibatch_size=min(cfg.minibatch_size,
                                    n * cfg.horizon_length),
            max_epochs=epochs, mixed_precision=False)
        env = make(task, num_envs=n, seed=7)
        algo = PPO(env, cfg)
        ts, env_state, hist = algo.train(epochs, seed=7, log_every=5)
        curve = [(h["epoch"], round(h["reward_mean"], 4)) for h in hist]
        final = sum(r for _, r in curve[-2:]) / 2
        out["tasks"][task] = {
            "train_cfg": yaml_name, "num_envs": n, "epochs": epochs,
            "curve": curve, "final_reward_mean": round(final, 4),
            "floor": floor, "passed": bool(final >= floor),
            "wall_s": round(time.time() - t0, 1),
        }
        print(task, "final", final, "floor", floor,
              "PASS" if final >= floor else "FAIL", flush=True)
    path = os.path.join(os.path.dirname(__file__), "..", "PARITY_r03.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", os.path.abspath(path))


if __name__ == "__main__":
    main(quick="--quick" in sys.argv)
