"""Multi-actor scene tests: composition, forest dynamics, actor-actor
contact."""
import jax
import jax.numpy as jnp
import numpy as np

from thormang_isaacgym_tpu.models import load_urdf
from thormang_isaacgym_tpu.models.scene import compose
from thormang_isaacgym_tpu.ops import SimParams, build_step_fn, zero_controls

BALL = """
<robot name="ball">
  <link name="ball"><inertial><mass value="0.5"/>
    <inertia ixx="0.0008" iyy="0.0008" izz="0.0008" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision><geometry><sphere radius="0.06"/></geometry></collision>
  </link>
</robot>"""

TABLE = """
<robot name="table">
  <link name="top"><inertial><mass value="20.0"/>
    <inertia ixx="1" iyy="1" izz="1" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision><geometry><box size="1.0 1.0 0.1"/></geometry></collision>
  </link>
</robot>"""


def test_compose_layout():
    ball = load_urdf(BALL)
    table = load_urdf(TABLE, fix_base_link=True)
    scene = compose([(ball, (0, 0, 1.0, 1, 0, 0, 0)),
                     (table, (0, 0, 0.5, 1, 0, 0, 0))])
    assert scene.n_roots == 2
    assert scene.roots_floating == (True, False)
    assert scene.nq == 7 and scene.nv == 6  # only the ball has state
    assert scene.nb == 2 and scene.nj == 0
    assert scene.ng == 2


def test_ball_settles_on_fixed_table():
    ball = load_urdf(BALL)
    table = load_urdf(TABLE, fix_base_link=True)
    scene = compose([(ball, (0, 0, 1.0, 1, 0, 0, 0)),
                     (table, (0, 0, 0.5, 1, 0, 0, 0))])
    sp = SimParams(dt=0.005, substeps=4, contact_stiffness=2e4,
                   contact_damping=200.0)
    step = build_step_fn(scene, sp)
    params = jax.tree.map(lambda x: x[None], scene.default_params())
    # ball above the table top (top surface at z=0.55)
    q = jnp.array([[0.1, 0.0, 0.9, 1.0, 0, 0, 0]])
    qd = jnp.zeros((1, 6))
    ctrl = zero_controls(scene, 1)
    wrench = jnp.zeros((1, scene.nb, 6))

    @jax.jit
    def run(q, qd):
        def body(c, _):
            q, qd = c
            return step(params, q, qd, ctrl, wrench)[:2], None
        (q, qd), _ = jax.lax.scan(body, (q, qd), None, length=400)
        return q, qd

    q1, qd1 = run(q, qd)
    z = float(q1[0, 2])
    # rests on the table top: 0.55 + 0.06 radius minus small penetration
    assert 0.55 < z < 0.62, z
    assert float(jnp.abs(qd1).max()) < 0.1


def test_two_floating_actors_fall_independently():
    ball = load_urdf(BALL)
    scene = compose([(ball, (0, 0, 1.0, 1, 0, 0, 0)),
                     (ball, (2, 0, 2.0, 1, 0, 0, 0))])
    assert scene.n_roots == 2 and scene.nq == 14 and scene.nv == 12
    sp = SimParams(dt=0.005, substeps=2)
    step = build_step_fn(scene, sp)
    params = jax.tree.map(lambda x: x[None], scene.default_params())
    q = jnp.array([[0, 0, 5.0, 1, 0, 0, 0,   2, 0, 8.0, 1, 0, 0, 0]], dtype=jnp.float32)
    qd = jnp.zeros((1, 12))
    ctrl = zero_controls(scene, 1)
    wrench = jnp.zeros((1, scene.nb, 6))
    for _ in range(20):  # 0.1 s
        q, qd, _ = step(params, q, qd, ctrl, wrench)
    # both in free fall: z = z0 - g t^2/2 = z0 - 0.049
    np.testing.assert_allclose(float(q[0, 2]), 5.0 - 0.049, atol=2e-3)
    np.testing.assert_allclose(float(q[0, 9]), 8.0 - 0.049, atol=2e-3)
    # x positions unchanged and independent
    np.testing.assert_allclose(float(q[0, 7]), 2.0, atol=1e-5)


def test_ball_balance_task():
    import thormang_isaacgym_tpu as tgx
    env = tgx.make("BallBalance", num_envs=8, seed=0)
    assert env.num_obs == 24 and env.num_actions == 3
    state = env.reset(jax.random.key(0))

    @jax.jit
    def run(state, key):
        def body(carry, _):
            state, key = carry
            key, sub = jax.random.split(key)
            a = jax.random.uniform(sub, (8, 3), minval=-1.0, maxval=1.0)
            return (env.step_fn(state, a), key), (state.reward, state.q[:, 2])
        (state, _), (rew, tray_z) = jax.lax.scan(body, (state, key), None, length=80)
        return state, rew, tray_z

    final, rew, tray_z = run(state, jax.random.key(5))
    assert np.isfinite(np.asarray(final.q)).all()
    assert np.isfinite(np.asarray(rew)).all()
    # the tripod stays in a physical envelope under random thrash (the
    # soft attractor pins allow transient hops, but no explosion)
    assert np.abs(np.asarray(tray_z)).max() < 12.0
    # ball stays in a physical envelope (no contact explosion)
    assert np.abs(np.asarray(final.q[:, 7:10])).max() < 20.0


def test_ball_rests_on_tray():
    """Sphere-cylinder: the ball must be supported by the tray disk."""
    import thormang_isaacgym_tpu as tgx
    env = tgx.make("BallBalance", num_envs=4, seed=0)
    state = env.reset(jax.random.key(2))

    @jax.jit
    def run(state):
        def body(s, _):
            return env.step_fn(s, jnp.zeros((4, 3))), s.q[:, 9]  # ball z
        return jax.lax.scan(body, state, None, length=120)

    final, ball_z = run(state)
    bz = np.asarray(ball_z)
    # the ball must INTERACT with the tray: during the drop it must spend
    # time in the tray-surface band (fall-through would pass straight to
    # the floor), and never explode
    from thormang_isaacgym_tpu.tasks.ball_balance import TRAY_H, BALL_R
    assert np.isfinite(bz).all()
    assert np.abs(bz).max() < 20.0
    touched = (np.abs(bz - (TRAY_H + BALL_R)) < 0.25).any(axis=0)
    assert touched.sum() >= 2, bz.min(0)
