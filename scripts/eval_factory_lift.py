"""Scripted close-and-lift evaluation for FactoryTaskNutBoltPick — the
reference's post-reach success protocol
(`/root/reference/isaacgymenvs/tasks/factory/factory_task_nut_bolt_pick.py:145-152`
_close_gripper + _lift_gripper at episode end): run the TRAINED policy for
the reach phase, then script gripper closure and a vertical lift, and score
success = nut raised well off the table while the gripper holds it.

Run: python scripts/eval_factory_lift.py runs/factory_pick_r5/nn/best.ckpt
Prints one JSON line with success_rate and phase stats.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main(ckpt, num_envs=128, reach_steps=96, close_steps=60, lift_steps=120,
         seed=3):
    import thormang_isaacgym_tpu as tgx
    from thormang_isaacgym_tpu.learn.ppo import PPO, PPOConfig
    from thormang_isaacgym_tpu.runtime.checkpoint import load_train_state
    from thormang_isaacgym_tpu.tasks.factory import NUT_H, TABLE_Z
    from thormang_isaacgym_tpu.utils.config import CFG_ROOT, load_yaml

    tcfg = load_yaml(os.path.join(CFG_ROOT, "train",
                                  "FactoryTaskNutBoltPickPPO.yaml"))
    cfg = PPOConfig.from_rlgames(tcfg)

    env = tgx.make("FactoryTaskNutBoltPick", num_envs=num_envs, seed=seed)
    ppo = PPO(env, cfg)
    ts = ppo.init(jax.random.key(0))
    ts = load_train_state(ckpt, ts)

    # a second env whose controller targets a CLOSED gripper: the task
    # reads _gripper_target at trace time, so set it before first step
    env_closed = tgx.make("FactoryTaskNutBoltPick", num_envs=num_envs,
                          seed=seed)
    env_closed.task._gripper_target = 0.0

    state = env.reset(jax.random.key(seed))

    @jax.jit
    def reach_step(ts, state):
        a = ppo.act_deterministic(ts, state.obs)
        return env.step_fn(state, a)

    zero = jnp.zeros((num_envs, env.num_actions))
    lift_a = zero.at[:, 2].set(0.25)         # gentle +z position action

    def _yaw(q):
        # yaw of the frame's x-axis about world z
        x = jax.vmap(lambda qq: __import__(
            "thormang_isaacgym_tpu.core.quat", fromlist=["rotate"]).rotate(
                qq, jnp.asarray([1.0, 0.0, 0.0])))(q)
        return jnp.arctan2(x[:, 1], x[:, 0])

    @jax.jit
    def align_step(state):
        """Yaw-align the gripper to the nut's nearest FLAT before closing:
        the nut is a square annulus, so a 45-deg-off grip pinches corners
        (half-diagonal 17 mm vs 12 mm flats) and slips during the lift.
        The reference's hex-mesh nut has no such worst case; this
        alignment is the scripted-grasp analog of squaring the wrench."""
        gq = jax.vmap(env.task._eef)(state.q, state.qd)[1]
        dyaw = _yaw(state.q[:, 3:7]) - _yaw(gq)
        # wrap into the square's symmetry group: (-45, 45] deg
        dyaw = jnp.mod(dyaw + jnp.pi / 4, jnp.pi / 2) - jnp.pi / 4
        a = jnp.zeros((num_envs, env.num_actions))
        a = a.at[:, 5].set(jnp.clip(dyaw / 0.1, -1.0, 1.0))
        return env.step_fn(state, a)

    @jax.jit
    def close_step(state):
        return env_closed.step_fn(state, zero)

    @jax.jit
    def lift_step(state):
        return env_closed.step_fn(state, lift_a)

    import dataclasses as _dc

    def _hold(s):
        """Zero the episode clock so the engine's timeout auto-reset
        cannot fire inside the scripted phases."""
        return _dc.replace(s, progress=jnp.zeros_like(s.progress))

    for _ in range(reach_steps):
        state = reach_step(ts, state)
    kd_reach = float(jnp.mean(state.metrics["keypoint_dist"]))
    state = _hold(state)
    for _ in range(30):
        state = _hold(align_step(state))
    for _ in range(close_steps):
        state = _hold(close_step(state))
    for _ in range(lift_steps):
        state = _hold(lift_step(state))

    nut_z = np.asarray(state.q[:, env.task.qN + 2])
    lifted = nut_z - TABLE_Z > 3.0 * 2.0 * NUT_H
    out = {
        "checkpoint": ckpt, "num_envs": num_envs,
        "reach_keypoint_dist": round(kd_reach, 4),
        "phases": {"reach": reach_steps, "close": close_steps,
                   "lift": lift_steps},
        "nut_height_above_table_mean": round(float(
            (nut_z - TABLE_Z).mean()), 4),
        "lift_threshold_m": round(3.0 * 2.0 * NUT_H, 4),
        "success_rate": round(float(lifted.mean()), 4),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "runs/factory_pick_r5/nn/best.ckpt")
