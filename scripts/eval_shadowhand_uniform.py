"""Final-stage ShadowHand evaluation: run a trained policy on the
REFERENCE task (goal_curriculum=False — uniform random reorientation
goals from reset_target_pose semantics, tolerance 0.1) and report
consecutive-success EMA, successes/episode and rot_dist.

Run: python scripts/eval_shadowhand_uniform.py runs/sh_cur_r5c/nn/best.ckpt
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main(ckpt, num_envs=2048, steps=1800, seed=5, deterministic=True):
    import thormang_isaacgym_tpu as tgx
    from thormang_isaacgym_tpu.learn.ppo import PPO, PPOConfig
    from thormang_isaacgym_tpu.runtime.checkpoint import load_train_state
    from thormang_isaacgym_tpu.utils.config import CFG_ROOT, load_yaml

    tcfg = load_yaml(os.path.join(CFG_ROOT, "train", "ShadowHandPPO.yaml"))
    cfg = PPOConfig.from_rlgames(tcfg)
    env = tgx.make("ShadowHand", num_envs=num_envs, seed=seed,
                   goal_curriculum=False)
    ppo = PPO(env, cfg)
    ts = ppo.init(jax.random.key(0))
    ts = load_train_state(ckpt, ts)
    state = env.reset(jax.random.key(seed))

    @jax.jit
    def step(ts, state, key):
        if deterministic:
            a = ppo.act_deterministic(ts, state.obs)
        else:
            a, _, _, _ = ppo.act(ts, state.obs, key)
        return env.step_fn(state, a)

    key = jax.random.key(seed + 1)
    hist = []
    for i in range(steps):
        key, k = jax.random.split(key)
        state = step(ts, state, k)
        if i % 100 == 99:
            hist.append({
                "step": i + 1,
                "cons_successes": round(float(
                    state.metrics["consecutive_successes"].mean()), 4),
                "successes_mean": round(float(
                    state.metrics["successes"].mean()), 4),
                "rot_dist_mean": round(float(
                    state.metrics["rot_dist"].mean()), 4),
                "goal_dist_mean": round(float(
                    state.metrics["goal_dist"].mean()), 4),
            })
    out = {"checkpoint": ckpt, "num_envs": num_envs, "steps": steps,
           "goal_curriculum": False, "deterministic": deterministic,
           "history": hist, "final": hist[-1]}
    print(json.dumps(out["final"]))
    return out


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "runs/sh_cur_r5c/nn/best.ckpt")
