"""Mixed multi-task batch training (driver config #4): several tasks with
separate policies stepped by ONE compiled, sharded train iteration
(learn/multitask.py). Runs on the 8-virtual-device CPU mesh (conftest)."""
import jax
import numpy as np

import thormang_isaacgym_tpu as tgx
from thormang_isaacgym_tpu.learn.multitask import MultiTaskPPO
from thormang_isaacgym_tpu.learn.ppo import PPOConfig


def _cfg(horizon=16, envs=64):
    return PPOConfig(horizon_length=horizon, minibatch_size=envs * horizon,
                     mini_epochs=2, mixed_precision=False,
                     units=(32, 32), learning_rate=3e-4)


def test_multitask_shared_iteration_sharded():
    envs = {
        "Cartpole": tgx.make("Cartpole", num_envs=64, seed=0),
        "Ant": tgx.make("Ant", num_envs=64, seed=0),
    }
    cfgs = {n: _cfg() for n in envs}
    mt = MultiTaskPPO(envs, cfgs, mesh=True)
    assert mt.mesh is not None and mt.mesh.devices.size == 8
    tss, ess, hist = mt.train(6, seed=1, log_every=1)
    # one compiled program for all tasks, reused each epoch
    assert mt._iter is not None
    # both tasks actually trained: finite losses, train state advanced
    for name in ("Cartpole", "Ant"):
        rows = [h[name] for h in hist]
        assert all(np.isfinite(r["reward_mean"]) for r in rows)
        assert all(np.isfinite(r["a_loss"]) for r in rows)
        assert int(tss[name].epoch) == 6
    # env states stayed sharded over the mesh env axis
    shard_counts = {
        n: len(ess[n].q.sharding.device_set) for n in envs}
    assert all(c == 8 for c in shard_counts.values()), shard_counts


def test_multitask_single_device():
    envs = {
        "Cartpole": tgx.make("Cartpole", num_envs=32, seed=0),
        "BallBalance": tgx.make("BallBalance", num_envs=32, seed=0),
    }
    cfgs = {n: _cfg(envs=32) for n in envs}
    mt = MultiTaskPPO(envs, cfgs, mesh=None)
    tss, ess, hist = mt.train(3, seed=2, log_every=1)
    assert len(hist) == 3
    for name in envs:
        assert np.isfinite(hist[-1][name]["reward_mean"])
