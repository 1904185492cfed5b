"""Task-family smoke + physical sanity tests (Ant, Humanoid, DR)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import thormang_isaacgym_tpu as tgx


def rollout(env, state, steps, key=None):
    key = key if key is not None else jax.random.key(3)

    @jax.jit
    def run(state, key):
        def body(carry, _):
            state, key = carry
            key, sub = jax.random.split(key)
            actions = jax.random.uniform(
                sub, (env.num_envs, env.num_actions), minval=-1.0, maxval=1.0)
            state = env.step_fn(state, actions)
            return (state, key), (state.reward, state.done)
        (state, _), traj = jax.lax.scan(body, (state, key), None, length=steps)
        return state, traj

    return run(state, key)


def test_ant_rollout():
    env = tgx.make("Ant", num_envs=16, seed=0)
    assert env.num_obs == 60 and env.num_actions == 8
    state = env.reset(jax.random.key(0))
    # spawn above ground, feet near ground
    z0 = np.asarray(state.q[:, 2])
    assert (z0 > 0.2).all() and (z0 < 1.0).all()
    final, (rew, done) = rollout(env, state, 60)
    assert np.isfinite(np.asarray(final.q)).all()
    assert np.isfinite(np.asarray(rew)).all()
    # ant stays in a physical envelope: 8 x 15 Nm motors on a ~0.9 kg body
    # store ~144 J, enough for multi-meter hops under synchronized random
    # torques — but a contact explosion shows up as hundreds of meters
    assert np.abs(np.asarray(final.q[:, 2])).max() < 40.0


def test_ant_stands_with_zero_action():
    env = tgx.make("Ant", num_envs=8, seed=0)
    state = env.reset(jax.random.key(1))

    @jax.jit
    def run(state):
        def body(s, _):
            return env.step_fn(s, jnp.zeros((8, 8))), s.q[:, 2]
        return jax.lax.scan(body, state, None, length=60)

    final, zs = run(state)
    # with zero torques the ant settles on its legs; torso stays above
    # termination height for most envs (no contact explosion)
    z = np.asarray(final.q[:, 2])
    assert np.isfinite(z).all()
    assert (z > 0.1).all(), z


@pytest.mark.skipif(not os.path.exists("/root/reference/assets"), reason="no reference assets")
def test_humanoid_rollout():
    env = tgx.make("Humanoid", num_envs=8, seed=0)
    N = env.task.model.nj
    assert env.num_obs == 12 + 4 * N + 14
    state = env.reset(jax.random.key(0))
    z0 = np.asarray(state.q[:, 2])
    assert (z0 > 0.5).all()  # humanoid spawns standing
    final, (rew, done) = rollout(env, state, 40)
    assert np.isfinite(np.asarray(final.q)).all()
    assert np.isfinite(np.asarray(rew)).all()


def test_dr_changes_params_on_reset():
    """gravity/mass DR: randomized leaves differ across envs after resets."""
    env = tgx.make("Gogoro", num_envs=8, seed=0, randomize=True) \
        if os.path.exists("/root/reference/assets") else None
    if env is None:
        pytest.skip("no reference assets")
    state = env.reset(jax.random.key(0))
    g = np.asarray(state.params.gravity[:, 2])
    m = np.asarray(state.params.body_mass[:, 0])
    # initial DR applied at init: envs differ
    assert np.unique(g.round(6)).size > 1
    assert np.unique(m.round(6)).size > 1
    assert (np.abs(g + 9.81) < 9.81 * 0.06).all()


def test_anymal_rollout():
    env = tgx.make("Anymal", num_envs=8, seed=0)
    assert env.num_obs == 61 and env.num_actions == 12
    state = env.reset(jax.random.key(0))
    final, (rew, done) = rollout(env, state, 60)
    assert np.isfinite(np.asarray(final.q)).all()
    assert np.isfinite(np.asarray(rew)).all()
    assert (np.asarray(rew) >= 0).all()  # anymal reward clipped at 0
    assert np.abs(np.asarray(final.q[:, 2])).max() < 2.0


def test_anymal_stands_with_default_pose():
    env = tgx.make("Anymal", num_envs=4, seed=0)
    state = env.reset(jax.random.key(2))

    @jax.jit
    def run(state):
        def body(s, _):
            return env.step_fn(s, jnp.zeros((4, 12))), None
        s, _ = jax.lax.scan(body, state, None, length=90)
        return s

    final = run(state)
    z = np.asarray(final.q[:, 2])
    # PD holds the default crouch: base stays up around ~0.5 m
    assert (z > 0.3).all() and (z < 0.9).all(), z


def test_anymal_terrain_rollout():
    env = tgx.make("AnymalTerrain", num_envs=8, seed=0,
                   num_levels=4, num_types=4)
    assert env.num_obs == 188
    state = env.reset(jax.random.key(0))
    # spawned on the terrain grid at per-env origins
    assert np.asarray(state.q[:, 0]).std() > 0.1 or np.asarray(state.q[:, 1]).std() > 0.1
    final, (rew, done) = rollout(env, state, 40)
    assert np.isfinite(np.asarray(final.q)).all()
    assert np.isfinite(np.asarray(rew)).all()
    obs = np.asarray(final.obs)
    assert obs.shape == (8, 188)
    # height scan channel occupied (terrain non-flat somewhere)
    heights = obs[:, 24:164]
    assert np.isfinite(heights).all()


def test_ingenuity_rollout_and_hover():
    env = tgx.make("Ingenuity", num_envs=4, seed=0)
    assert env.num_obs == 13 and env.num_actions == 6
    state = env.reset(jax.random.key(0))
    final, (rew, done) = rollout(env, state, 30)
    assert np.isfinite(np.asarray(final.q)).all()
    # constant near-hover thrust keeps the copter airborne and upright
    state = env.reset(jax.random.key(2))
    a = jnp.tile(jnp.asarray([0, 0, 0.1395, 0, 0, 0.1395], jnp.float32), (4, 1))
    for _ in range(100):
        state = env.step(state, a)
    z = np.asarray(state.q[:, 2])
    assert (z > 0.5).all(), z
    assert (np.abs(np.asarray(state.q[:, 3])) > 0.95).all()  # upright quat


def test_quadcopter_rollout():
    env = tgx.make("Quadcopter", num_envs=4, seed=0)
    assert env.num_obs == 24 and env.num_actions == 12
    state = env.reset(jax.random.key(0))
    final, (rew, done) = rollout(env, state, 30)
    assert np.isfinite(np.asarray(final.q)).all()
    assert np.isfinite(np.asarray(rew)).all()


def test_gogoro_paper_rollout():
    """Paper variant (gogoro_realistic_turning_sim_paper.py): 160-dim
    20-frame window, direct steering with per-env delay, pushes; the
    scooter stays upright for the first steps at speed (gyro effect)."""
    env = tgx.make("GogoroPaper", num_envs=4, seed=0)
    assert env.num_obs == 160 and env.num_actions == 1
    state = env.reset(jax.random.key(0))
    for _ in range(15):
        state = env.step(state, jnp.zeros((4, 1)))
    assert np.isfinite(np.asarray(state.obs)).all()
    ob = np.asarray(state.obs).reshape(4, 20, 8)
    assert np.allclose(ob[:, :, 1], 0.0)          # yaw channel zeroed (:544)
    # per-env steer delay in [0, 5)
    d = np.asarray(state.task.steer_delay)
    assert ((d >= 0) & (d < 5)).all()
    # rewards clipped non-negative unless fallen (:760-761)
    r = np.asarray(state.reward)
    assert ((r >= 0.0) | (r == -1.0)).all()


def test_humanoid_mjcf_spec():
    """Classic Humanoid spec via the MJCF importer: nv_humanoid 21 DOFs,
    obs 110 / act 21 (reference humanoid.py:67-68,143)."""
    env = tgx.make("HumanoidMJCF", num_envs=2, seed=0)
    assert env.num_obs == 110 and env.num_actions == 21
    state = env.reset(jax.random.key(0))
    for _ in range(10):
        state = env.step(state, jnp.zeros((2, 21)))
    # stands under zero action at the default pose
    assert np.all(np.asarray(state.q[:, 2]) > 0.8)
    assert np.isfinite(np.asarray(state.obs)).all()


def test_mjcf_importer_ant():
    """nv_ant MJCF parses to the 8-DOF floating ant with gear table."""
    import os as _os
    from thormang_isaacgym_tpu.models.mjcf import load_mjcf
    path = _os.path.join(_os.path.dirname(__file__), "..", "assets",
                         "mjcf", "nv_ant.xml")
    m = load_mjcf(_os.path.abspath(path))
    assert m.nj == 8 and m.floating
    assert (np.asarray(m.motor_efforts) == 15.0).all()


def test_mjcf_fk_zero_pose_matches_cumulative_body_pos():
    """FK regression for the MJCF joint-anchor handling (ADVICE r3): at the
    zero pose every body frame must sit at the cumulative MJCF body `pos`
    down the chain plus that body's (shared) joint anchor. The r3 importer
    double-counted anchors, compressing nv_humanoid's legs by ~0.4 m
    (right_foot at z=-0.768 instead of -1.178 relative to the torso)."""
    import xml.etree.ElementTree as ET

    from thormang_isaacgym_tpu.models.mjcf import load_mjcf
    from thormang_isaacgym_tpu.ops.kinematics import forward_kinematics

    path = os.path.join(os.path.dirname(__file__), "..", "assets",
                        "mjcf", "nv_humanoid.xml")
    path = os.path.abspath(path)
    m = load_mjcf(path)

    # expected frame = cumulative <body pos> + first joint anchor
    # (all nv_humanoid body frames are axis-aligned: no quat/euler attrs)
    expected = {}

    def walk(el, base):
        pos = base + np.array([float(x) for x in
                               el.get("pos", "0 0 0").split()])
        jel = el.find("joint")
        anchor = np.zeros(3)
        if jel is not None and jel.get("type") != "free":
            anchor = np.array([float(x) for x in
                               jel.get("pos", "0 0 0").split()])
        expected[el.get("name")] = pos + anchor
        for c in el.findall("body"):
            walk(c, pos)

    root = ET.parse(path).getroot().find("worldbody").find("body")
    walk(root, np.zeros(3))
    root_pos = expected[root.get("name")]

    nq = 7 + m.nj
    q = jnp.zeros(nq).at[3].set(1.0)  # identity root pose at origin
    frames = forward_kinematics(m, q, jnp.zeros(6 + m.nj))
    pos = np.asarray(frames.pos)
    name_to_idx = {n: i for i, n in enumerate(m.body_names)}
    for name, exp in expected.items():
        i = name_to_idx[name]
        np.testing.assert_allclose(
            pos[i], exp - root_pos, atol=1e-5,
            err_msg=f"body {name}: FK {pos[i]} != MJCF {exp - root_pos}")
    # the advisor's concrete check: right_foot ~0.41 m below r3's value
    assert abs(pos[name_to_idx["right_foot"]][2] - (-1.178)) < 1e-3


def test_gogoro_combined_rider_ik():
    """Combined THORMANG+scooter (reference tasks/gogoro/gogoro.py):
    articulated rider held by PD at the riding pose, freewheel assists,
    wheel spin-up, DLS IK keeping hands on the handlebar ends. The scooter
    is spawned leaning (roll=-0.3, :307-309) and must be caught by the
    freewheels; the IK keeps both hands within a few mm of the grips."""
    env = tgx.make("GogoroCombined", num_envs=2, seed=3)
    assert env.num_obs == 8 and env.num_actions == 1
    state = env.reset(jax.random.key(0))
    rolls = []
    for i in range(60):
        state = env.step(state, jnp.zeros((2, 1)))
        rolls.append(float(np.asarray(state.obs)[0, 0]))
    assert np.isfinite(np.asarray(state.obs)).all()
    # episode survives (no perpetual resets): progress advanced past 50
    assert int(np.asarray(state.progress)[0]) >= 50
    # lean recovered from -0.3 toward upright at some point
    assert min(abs(r) for r in rolls) < 0.1
    # IK hands-on-handlebars: mean hand-to-grip distance under 1 cm
    assert float(np.asarray(state.metrics["hand_err"]).mean()) < 0.01
    # spin-up ramp: wheel speed grew
    assert float(np.asarray(state.obs)[0, 4]) * 100 > 2.0
