"""Mixed multi-task training CLI — driver config #4.

Usage:
  python -m thormang_isaacgym_tpu.runtime.train_multi \
      tasks=Gogoro,Humanoid num_envs=2048 max_iterations=200

Each task gets its reference train YAML (<Task>PPO.yaml) and its own
policy/learner; every epoch steps ALL tasks inside one compiled, sharded
program (learn/multitask.MultiTaskPPO). num_envs applies per task (and is
scaled into each task's minibatch like runtime/train.py does).

Writes runs/<experiment>/metrics.jsonl with per-task metric rows.
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import jax

import thormang_isaacgym_tpu as tgx
from thormang_isaacgym_tpu.learn.multitask import MultiTaskPPO
from thormang_isaacgym_tpu.learn.ppo import PPOConfig
from thormang_isaacgym_tpu.utils.config import CFG_ROOT, load_yaml


def _kv(argv):
    out = {}
    for a in argv:
        if "=" in a:
            k, v = a.split("=", 1)
            out[k] = v
    return out


def main(argv=None):
    args = _kv(sys.argv[1:] if argv is None else argv)
    task_names = args.get("tasks", "Gogoro,Humanoid").split(",")
    num_envs = int(args.get("num_envs", 1024))
    max_iter = int(args.get("max_iterations", 100))
    seed = int(args.get("seed", 42))
    exp = args.get("experiment", "multi_" + "_".join(task_names))

    envs, cfgs = {}, {}
    for name in task_names:
        yaml_path = os.path.join(CFG_ROOT, "train", f"{name}PPO.yaml")
        cfg = PPOConfig.from_rlgames(load_yaml(yaml_path)) \
            if os.path.exists(yaml_path) else PPOConfig()
        cfg = dataclasses.replace(
            cfg,
            minibatch_size=min(cfg.minibatch_size,
                               num_envs * cfg.horizon_length),
            mixed_precision=False)
        envs[name] = tgx.make(name, num_envs=num_envs, seed=seed)
        cfgs[name] = cfg

    n_dev = len(jax.devices())
    use_mesh = n_dev > 1 and all(num_envs % n_dev == 0 for _ in task_names)
    mt = MultiTaskPPO(envs, cfgs, mesh=True if use_mesh else None)

    run_dir = os.path.join(args.get("output_root", "runs"), exp)
    os.makedirs(run_dir, exist_ok=True)
    log_path = os.path.join(run_dir, "metrics.jsonl")
    t0 = time.time()
    print(f"multi-task: {task_names} x {num_envs} envs, "
          f"mesh={'%d dev' % n_dev if use_mesh else 'off'}", flush=True)

    def cb(epoch, tss, row):
        row = dict(row)
        row["time"] = round(time.time() - t0, 1)
        steps = sum((epoch + 1) * cfgs[n].horizon_length * num_envs
                    for n in task_names)
        row["env_steps_all_tasks"] = steps
        row["fps"] = round(steps / max(row["time"], 1e-9), 1)
        with open(log_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)

    mt.train(max_iter, seed=seed, log_every=int(args.get("log_every", 10)),
             callback=cb)
    return 0


if __name__ == "__main__":
    sys.exit(main())
