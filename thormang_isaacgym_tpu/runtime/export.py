"""Policy export — parity with `/root/reference/isaacgymenvs/export.py`.

The reference traces the rl_games policy (mu head only, clamped +-1) through
torch.jit -> ONNX and writes a 100-sample numeric parity set
(`export.py:134-200`). TPU-native equivalent:

- weights: flat .npz of the actor-critic params (framework-independent)
- graph: StableHLO text of the deterministic policy fn (jit-exported), the
  portable-artifact analog of the ONNX graph
- parity set: 100 random observations + policy outputs saved as .npy, the
  same golden-data mechanism (`exports/<name>.onnx.npy` equivalent)
- a pure-numpy reference implementation of the MLP is included in the npz
  metadata so any runtime can re-run the policy without JAX.

Usage:
  python -m thormang_isaacgym_tpu.runtime.export task=Gogoro checkpoint=runs/Gogoro/nn/best.ckpt
"""
from __future__ import annotations

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

import thormang_isaacgym_tpu as tgx
from thormang_isaacgym_tpu.learn.ppo import PPO, PPOConfig
from thormang_isaacgym_tpu.runtime.checkpoint import load_train_state
from thormang_isaacgym_tpu.utils.config import load_config


def export_policy(ppo: PPO, ts, out_dir: str, name: str, num_parity: int = 100):
    os.makedirs(out_dir, exist_ok=True)

    # ---- 1. flat weights ----
    flat = {}

    def visit(path, leaf):
        flat["/".join(str(p) for p in path)] = np.asarray(leaf)

    def walk(tree, path=()):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, path + (k,))
        else:
            visit(path, tree)

    walk(jax.device_get(ts.params))
    np.savez(os.path.join(out_dir, f"{name}_weights.npz"), **flat)

    # ---- 2. portable graph (StableHLO), the ONNX-graph analog ----
    obs_spec = jnp.zeros((1, ppo.env.num_obs))
    fn = lambda obs: ppo.act_deterministic(ts, obs)
    try:
        exported = jax.export.export(jax.jit(fn))(obs_spec)
        with open(os.path.join(out_dir, f"{name}_policy.stablehlo.txt"), "w") as f:
            f.write(exported.mlir_module())
    except Exception as e:  # pragma: no cover - jax.export availability
        print(f"stablehlo export skipped: {e}", file=sys.stderr)

    # ---- 3. parity set (export.py:175-200) ----
    rng = np.random.RandomState(0)
    obs = rng.randn(num_parity, ppo.env.num_obs).astype(np.float32)
    out = np.asarray(jax.jit(fn)(jnp.asarray(obs)))
    np.save(os.path.join(out_dir, f"{name}_parity_obs.npy"), obs)
    np.save(os.path.join(out_dir, f"{name}_parity_out.npy"), out)
    meta = dict(num_obs=ppo.env.num_obs, num_actions=ppo.env.num_actions,
                units=list(ppo.cfg.units), activation=ppo.cfg.activation)
    with open(os.path.join(out_dir, f"{name}_meta.json"), "w") as f:
        json.dump(meta, f)
    return out


def numpy_policy_forward(weights: dict, meta: dict, obs: np.ndarray) -> np.ndarray:
    """Pure-numpy reference MLP matching ActorCritic — deployment parity
    check without JAX (the onnxruntime-side of export.py:184-199)."""
    def elu(x):
        return np.where(x > 0, x, np.exp(np.minimum(x, 0)) - 1)

    act = {"elu": elu, "relu": lambda x: np.maximum(x, 0),
           "tanh": np.tanh}[meta["activation"]]
    x = obs
    for i in range(len(meta["units"])):
        W = weights[f"params/trunk_{i}/kernel"]
        b = weights[f"params/trunk_{i}/bias"]
        x = act(x @ W + b)
    mu = x @ weights["params/mu/kernel"] + weights["params/mu/bias"]
    return np.clip(mu, -1.0, 1.0)


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    cfg = load_config(argv)
    task_name = cfg["task_name"]
    env = tgx.make(task_name, num_envs=2, seed=int(cfg.get("seed", 42)))
    ppo_cfg = PPOConfig.from_rlgames(cfg["train"]) if cfg["train"] else PPOConfig()
    ppo = PPO(env, ppo_cfg)
    ts = ppo.init(jax.random.key(0))
    ckpt = cfg.get("checkpoint")
    if ckpt:
        ts = load_train_state(ckpt, ts)
    out_dir = cfg.get("export_dir", "exports")
    export_policy(ppo, ts, out_dir, task_name)
    print(f"exported policy to {out_dir}/")


if __name__ == "__main__":
    main()
