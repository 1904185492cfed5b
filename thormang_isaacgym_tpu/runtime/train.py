"""Train/play CLI — parity with `/root/reference/isaacgymenvs/train.py`.

Usage:
  python -m thormang_isaacgym_tpu.runtime.train task=Cartpole max_iterations=50
  python -m thormang_isaacgym_tpu.runtime.train task=Gogoro num_envs=1024
  python -m thormang_isaacgym_tpu.runtime.train task=Gogoro test=true checkpoint=runs/Gogoro/nn/last.ckpt

Maps the reference flow (`train.py:50-161`): config composition -> env
creation -> PPO runner -> checkpoints under runs/<name>/nn/ + config dump to
runs/<name>/config.yaml. Multi-device sharding replaces the torchrun
multi-GPU path: if more than one JAX device is visible, the env axis is
sharded automatically.
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import yaml

import thormang_isaacgym_tpu as tgx
from thormang_isaacgym_tpu.learn.ppo import PPO, PPOConfig
from thormang_isaacgym_tpu.runtime.checkpoint import load_train_state, save_train_state
from thormang_isaacgym_tpu.utils.config import load_config


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    cfg = load_config(argv)
    # multi-host wiring (the torchrun equivalent, reference train.py:74-82):
    # must run BEFORE any other jax call
    from thormang_isaacgym_tpu.parallel.distributed import maybe_initialize
    dist_info = maybe_initialize(cfg)
    if dist_info["initialized"]:
        print(f"multi-host: process {dist_info['process_id']}/"
              f"{dist_info['num_processes']}, "
              f"{len(jax.devices())} global devices")
    # persistent XLA compilation cache: cold-start compiles (~5 min for the
    # fused Gogoro kernel, BENCH_r02 tail) are paid once per machine
    cache_dir = cfg.get("compilation_cache_dir",
                        os.environ.get("THORMANG_COMPILE_CACHE",
                                       "/tmp/thormang_xla_cache"))
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    task_name = cfg["task_name"]
    num_envs = cfg.get("num_envs") or cfg["task"].get("env", {}).get("numEnvs", 4096)
    seed = int(cfg.get("seed", 42))

    env = tgx.make(task_name, num_envs=int(num_envs), seed=seed,
                   cfg=cfg.get("task") or None)
    # algo dispatch (train.py:133-148: amp_continuous registered beside
    # a2c_continuous)
    algo_name = ((cfg.get("train") or {}).get("params", {})
                 .get("algo", {}).get("name", "a2c_continuous"))
    if algo_name == "amp_continuous":
        from thormang_isaacgym_tpu.learn.amp import AMPPPO, AMPConfig
        ppo_cls, cfg_cls = AMPPPO, AMPConfig
    elif algo_name == "ma_ppo" or getattr(env.task, "num_agents", 1) > 1:
        from thormang_isaacgym_tpu.learn.ma import MAPPO
        ppo_cls, cfg_cls = MAPPO, PPOConfig
    else:
        ppo_cls, cfg_cls = PPO, PPOConfig
    ppo_cfg = cfg_cls.from_rlgames(cfg["train"]) if cfg["train"] else cfg_cls()

    n_dev = len(jax.devices())
    exp_name = cfg.get("experiment") or task_name
    run_dir = os.path.join(cfg.get("output_root", "runs"), exp_name)
    os.makedirs(os.path.join(run_dir, "nn"), exist_ok=True)
    with open(os.path.join(run_dir, "config.yaml"), "w") as f:
        yaml.safe_dump(cfg, f)

    # wandb experiment tracking at rank 0 (reference train.py:84-97);
    # real wandb if installed, offline-compatible writer otherwise
    wandb_run = None
    if cfg.get("wandb_activate") and not dist_info.get("process_id"):
        from thormang_isaacgym_tpu.runtime.wandb_lite import init as _wb_init
        wandb_run = _wb_init(
            project=cfg.get("wandb_project", "thormang_isaacgym_tpu"),
            group=cfg.get("wandb_group", ""),
            entity=cfg.get("wandb_entity"),
            name=f"{cfg.get('wandb_name', exp_name)}"
                 f"_{time.strftime('%d-%H-%M-%S')}",
            config=cfg, dir=run_dir)

    if n_dev > 1 and int(num_envs) % n_dev == 0:
        from thormang_isaacgym_tpu.parallel.mesh import ENV_AXIS, shard_ppo
        ppo = ppo_cls(env, ppo_cfg, axis_name=ENV_AXIS)
        train_iter, init_fn = shard_ppo(ppo)
        key = jax.random.key(seed)
        ts, env_state = init_fn(key)
    else:
        ppo = ppo_cls(env, ppo_cfg)
        key = jax.random.key(seed)
        key, k1, k2 = jax.random.split(key, 3)
        ts = ppo.init(k1)
        env_state = env.reset(k2)
        train_iter = ppo._train_iter

    ckpt = cfg.get("checkpoint")
    if ckpt:
        ts = load_train_state(ckpt, ts)
        print(f"restored checkpoint {ckpt}")

    if cfg.get("test"):
        video = None
        if cfg.get("capture_video"):
            # RecordVideo equivalent (reference train.py:114-121): write a
            # GIF of env 0's evaluation rollout under runs/<exp>/videos/
            os.makedirs(os.path.join(run_dir, "videos"), exist_ok=True)
            video = os.path.join(run_dir, "videos", "eval.gif")
        return play(env, ppo, ts, episodes=int(cfg.get("test_episodes", 3)),
                    video=video, live=not cfg.get("headless", True))

    max_iter = int(cfg.get("max_iterations", 1000))
    log_path = os.path.join(run_dir, "metrics.jsonl")
    # TensorBoard sink (rl_games algo-observer equivalent, train.py:84-97)
    from thormang_isaacgym_tpu.runtime.tb import SummaryWriter
    tb = SummaryWriter(os.path.join(run_dir, "summaries"))
    # jax.profiler trace of a few steady-state iterations (SURVEY.md §5:
    # "jax.profiler traces are cheap wins"); view with xprof/tensorboard
    profile_at = int(cfg.get("profile_epoch", -1))
    best_reward = -float("inf")
    t_start = time.time()
    with open(log_path, "a") as logf:
        for epoch in range(max_iter):
            key, sub = jax.random.split(key)
            if epoch == profile_at:
                jax.profiler.start_trace(os.path.join(run_dir, "profile"))
            ts, env_state, metrics = train_iter(ts, env_state, sub)
            if epoch == profile_at + 2 and profile_at >= 0:
                jax.tree.map(
                    lambda x: getattr(x, "block_until_ready", lambda: x)(),
                    metrics)
                jax.profiler.stop_trace()
                print(f"profile trace written to {run_dir}/profile")
            if epoch % 10 == 0 or epoch == max_iter - 1:
                m = {k: float(v) for k, v in metrics.items()}
                # per-task episode metrics (the reference's extras["episode"]
                # scalars, anymal_terrain.py:418-423): env-mean of each entry
                try:
                    for mk, mv in (env_state.metrics or {}).items():
                        m[f"env/{mk}"] = float(jax.numpy.mean(mv))
                except Exception:
                    pass
                m["epoch"] = epoch
                m["time"] = round(time.time() - t_start, 1)
                m["env_steps"] = (epoch + 1) * ppo.cfg.horizon_length * env.num_envs
                m["fps"] = round(m["env_steps"] / m["time"], 1)
                print(json.dumps(m))
                logf.write(json.dumps(m) + "\n")
                logf.flush()
                tb.add_scalars(m, epoch)
                tb.flush()
                if wandb_run is not None:
                    wandb_run.log(m, step=epoch)
                if m["reward_mean"] > best_reward:
                    best_reward = m["reward_mean"]
                    save_train_state(os.path.join(run_dir, "nn", "best.ckpt"), ts)
            if epoch % 50 == 0:
                save_train_state(os.path.join(run_dir, "nn", "last.ckpt"), ts)
    save_train_state(os.path.join(run_dir, "nn", "last.ckpt"), ts)
    if wandb_run is not None:
        wandb_run.finish()
    print(f"done: best reward_mean {best_reward:.3f}; checkpoints in {run_dir}/nn")
    return ts


def play(env, ppo, ts, episodes=3, video=None, live=False):
    """Deterministic policy evaluation (the reference's test=True path).

    live=True serves the interactive browser viewer while playing (the
    reference's headless=False viewer loop, vec_task.py:408-440)."""
    import numpy as np

    key = jax.random.key(0)
    state = env.reset(key)
    step = jax.jit(env.step_fn, donate_argnums=(0,))
    act = jax.jit(ppo.act_deterministic)
    total, count = 0.0, 0
    returns = np.zeros(env.num_envs)
    logger = None
    viewer = None
    if live:
        from thormang_isaacgym_tpu.runtime.viewer import LiveViewer
        viewer = LiveViewer(env)
    if video:
        from thormang_isaacgym_tpu.runtime.replay import StateLogger
        logger = StateLogger(env.task.model,
                             dt=getattr(env.task.sim_params, "dt", 1 / 30))
    for _ in range(env.task.max_episode_length * episodes):
        actions = act(ts, state.obs)
        state = step(state, actions)
        if viewer is not None:
            from thormang_isaacgym_tpu.runtime.viewer import ViewerClosed
            try:
                viewer.render(state)
            except ViewerClosed:
                break
        if logger is not None and len(logger) < 300:
            logger.add(np.asarray(state.q[0]))
        r = np.asarray(state.reward)
        d = np.asarray(state.done)
        returns += r
        finished = d > 0.5
        if finished.any():
            total += returns[finished].sum()
            count += int(finished.sum())
            returns[finished] = 0.0
        if count >= episodes * env.num_envs:
            break
    mean_ret = total / max(count, 1)
    if logger is not None and len(logger):
        from thormang_isaacgym_tpu.runtime.replay import render_video
        render_video(logger, video, every=2)
        print(f"video written to {video}")
    print(json.dumps({"play_mean_return": mean_ret, "episodes": count}))
    return mean_ret


if __name__ == "__main__":
    main()
