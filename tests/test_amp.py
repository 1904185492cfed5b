"""AMP stack tests: MotionLib, HumanoidAMP env, AMPPPO discriminator
training. Reference: tasks/humanoid_amp.py, tasks/amp/humanoid_amp_base.py,
amp/utils_amp/motion_lib.py, cfg/train/HumanoidAMPPPO.yaml."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thormang_isaacgym_tpu.learn.motion_lib import (
    MotionLib, canonicalize_clip, make_gait_clip,
)
from thormang_isaacgym_tpu.models import amp_humanoid as AH
from thormang_isaacgym_tpu.tasks import make
from thormang_isaacgym_tpu.tasks.humanoid_amp import (
    NUM_AMP_OBS_PER_STEP, build_amp_observations, dof_to_obs,
)


@pytest.fixture(scope="module")
def gait():
    return make_gait_clip(n_cycles=2)


@pytest.fixture(scope="module")
def mlib(gait):
    return MotionLib([gait])


def test_amp_model_spec():
    """28 DOFs in the reference layout; 4 key bodies; sites for the hands
    (humanoid_amp_base.py:41-47)."""
    from thormang_isaacgym_tpu.models.amp_humanoid import load_amp_humanoid
    m = load_amp_humanoid()
    assert m.nj == 28
    assert AH.DOF_OFFSETS == [0, 3, 6, 9, 10, 13, 14, 17, 18, 21, 24, 25, 28]
    assert "right_hand" in m.sites and "left_hand" in m.sites
    assert m.body_id("right_foot") >= 0 and m.body_id("left_foot") >= 0


def test_motion_state_at_frame_times(mlib, gait):
    """get_motion_state at exact frame times returns the stored frames."""
    fps = float(gait["fps"])
    ids = jnp.zeros(3, jnp.int32)
    times = jnp.array([0.0, 5 / fps, 10 / fps])
    rp, rr, dp, rv, rav, dv, kp = mlib.get_motion_state(ids, times)
    np.testing.assert_allclose(np.asarray(rp),
                               gait["root_pos"][[0, 5, 10]], atol=1e-4)
    np.testing.assert_allclose(np.asarray(dp),
                               gait["dof_pos"][[0, 5, 10]], atol=1e-4)
    np.testing.assert_allclose(np.asarray(kp),
                               gait["key_pos"][[0, 5, 10]], atol=1e-4)


def test_motion_state_blend_midpoint(mlib, gait):
    """Halfway between frames -> lerp midpoint of positions."""
    fps = float(gait["fps"])
    t = jnp.array([2.5 / fps])
    rp, _, dp, _, _, _, _ = mlib.get_motion_state(jnp.zeros(1, jnp.int32), t)
    np.testing.assert_allclose(
        np.asarray(rp[0]),
        0.5 * (gait["root_pos"][2] + gait["root_pos"][3]), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(dp[0]),
        0.5 * (gait["dof_pos"][2] + gait["dof_pos"][3]), atol=1e-4)


def test_euler_chart_round_trip():
    """dof -> quat (dof_to_obs path) inverts the motion-lib quat -> dof
    conversion for the spherical joints."""
    from thormang_isaacgym_tpu.core import quat as Q
    rng = np.random.default_rng(0)
    e = rng.uniform(-1.0, 1.0, (16, 3))
    q = Q.from_euler_xyz(jnp.asarray(e[:, 2]), jnp.asarray(e[:, 1]),
                         jnp.asarray(e[:, 0]))
    from thormang_isaacgym_tpu.learn.motion_lib import _np_quat_to_euler_zyx
    back = _np_quat_to_euler_zyx(np.asarray(q))
    np.testing.assert_allclose(back, e, atol=1e-5)


def test_amp_obs_dims(gait):
    obs = build_amp_observations(
        jnp.asarray(gait["root_pos"][:4]), jnp.asarray(gait["root_rot"][:4]),
        jnp.asarray(gait["root_vel"][:4]),
        jnp.asarray(gait["root_ang_vel"][:4]),
        jnp.asarray(gait["dof_pos"][:4]), jnp.asarray(gait["dof_vel"][:4]),
        jnp.asarray(gait["key_pos"][:4]))
    assert obs.shape == (4, NUM_AMP_OBS_PER_STEP)
    assert dof_to_obs(jnp.zeros((2, 28))).shape == (2, 52)


def test_humanoid_amp_env_rollout():
    """Random-action rollout: finite obs, AMP window rolls, some envs
    terminate early on contact."""
    env = make("HumanoidAMP", num_envs=8, seed=0)
    key = jax.random.key(0)
    st = env.reset(key)
    assert st.obs.shape == (8, 105)
    assert st.task.amp_obs.shape == (8, 2, 105)
    prev_cur = np.asarray(st.task.amp_obs[:, 0])
    any_done = False
    for i in range(20):
        key, k = jax.random.split(key)
        a = jax.random.uniform(k, (8, 28), minval=-1, maxval=1)
        st = env.step(st, a)
        any_done = any_done or bool(np.any(np.asarray(st.done) > 0))
    assert np.all(np.isfinite(np.asarray(st.obs)))
    # window rolled: history slot equals an earlier current slot for
    # non-reset envs on the first step
    assert not np.allclose(np.asarray(st.task.amp_obs[:, 0]), prev_cur)


def test_fetch_amp_obs_demo():
    env = make("HumanoidAMP", num_envs=4, seed=0)
    demo = env.task.fetch_amp_obs_demo(jax.random.key(3), 32)
    assert demo.shape == (32, 210)
    assert np.all(np.isfinite(np.asarray(demo)))
    # windows are not all identical (time sampling works)
    assert np.std(np.asarray(demo[:, 0])) > 1e-5


def test_amp_ppo_discriminator_learns():
    """3 iterations: disc separates demo from (random-ish) policy — demo
    accuracy should beat chance and the style reward must be positive."""
    from thormang_isaacgym_tpu.learn.amp import AMPConfig, AMPPPO
    env = make("HumanoidAMP", num_envs=8, seed=0)
    cfg = AMPConfig(horizon_length=8, minibatch_size=32, mini_epochs=2,
                    amp_minibatch_size=16, amp_replay_buffer_size=128,
                    units=(64, 64), disc_units=(64, 64),
                    normalize_input=True, normalize_value=True,
                    normalize_amp_input=True, learning_rate=5e-5,
                    lr_schedule="constant", mixed_precision=False)
    algo = AMPPPO(env, cfg)
    ts, env_state, hist = algo.train(3, seed=0, log_every=1)
    last = hist[-1]
    assert np.isfinite(last["disc_loss"])
    assert last["disc_demo_acc"] > 0.6
    assert last["disc_reward_mean"] > 0.0
    # replay ring received inserts
    assert int(ts.replay_count) > 0
