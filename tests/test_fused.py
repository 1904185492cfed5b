"""Parity of the fused Pallas physics kernel vs the XLA reference path.

Runs the Pallas kernel in interpret mode on CPU (the dedicated TPU run is
the driver bench) and cross-checks one and several substeps against
ops.sim.build_step_fn on the same inputs.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thormang_isaacgym_tpu.ops.fused import build_fused_step_fn, fused_eligible
from thormang_isaacgym_tpu.ops.sim import SimParams, build_step_fn, zero_controls


def _rollout_pair(task, B=4, steps=3, seed=0, tol=2e-3):
    model = task.model
    sp = task.sim_params
    assert fused_eligible(model, None, None)
    xla_step = jax.jit(build_step_fn(model, sp, fused=False))
    fused_step = jax.jit(build_fused_step_fn(model, sp, n_steps=sp.substeps,
                                             interpret=True))

    key = jax.random.key(seed)
    params = model.default_params().batch(B)
    ks = jax.random.split(key, 4)
    q0 = jnp.tile(_init_q(task, model)[None], (B, 1))
    q0 = q0 + 0.01 * jax.random.normal(ks[0], q0.shape) * _q_noise_mask(model)
    qd = 0.1 * jax.random.normal(ks[1], (B, model.nv))
    ctrl = zero_controls(model, B)
    ctrl = ctrl._replace(
        target_pos=0.1 * jax.random.normal(ks[2], (B, model.nj)),
        target_vel=jnp.zeros((B, model.nj)),
        effort=0.5 * jax.random.normal(ks[3], (B, model.nj)))
    wrench = jnp.zeros((B, model.nb, 6))

    q_a, qd_a = q0, qd
    q_b, qd_b = q0, qd
    for _ in range(steps):
        q_a, qd_a, net_a = xla_step(params, q_a, qd_a, ctrl, wrench)
        q_b, qd_b, net_b = fused_step(params, q_b, qd_b, ctrl, wrench)
    np.testing.assert_allclose(np.asarray(q_a), np.asarray(q_b),
                               atol=tol, rtol=tol)
    np.testing.assert_allclose(np.asarray(qd_a), np.asarray(qd_b),
                               atol=10 * tol, rtol=10 * tol)
    np.testing.assert_allclose(np.asarray(net_a), np.asarray(net_b),
                               atol=1.0, rtol=5e-3)


def _init_q(task, model):
    # spawn a reasonable state via the task's own reset
    key = jax.random.key(1)
    params = model.default_params()
    q, qd, _, _ = task.reset_fn(key, params, jax.tree.map(
        lambda x: x[0], task.default_task_state(jax.random.key(2))))
    return q


def _q_noise_mask(model):
    """Perturb only joint coords (keep root quats valid)."""
    m = np.zeros(model.nq, np.float32)
    m[7 * model.n_floating:] = 1.0
    return jnp.asarray(m)


SLOW = __import__("os").environ.get("THORMANG_SLOW_TESTS") != "1"


def test_fused_cartpole_matches_xla():
    from thormang_isaacgym_tpu.tasks.cartpole import Cartpole
    _rollout_pair(Cartpole(num_envs=4), steps=5)


def test_fused_floating_body_matches_xla():
    """Tiny floating model (free sphere + one revolute arm): exercises the
    floating-root LDLT solve, gravity, plane contact and quat integration
    with a CI-sized compile (the 2-vCPU runner can't compile the 40-body
    kernels; those run as THORMANG_SLOW_TESTS=1 and on the TPU bench)."""
    from thormang_isaacgym_tpu.models import load_urdf

    urdf = """
<robot name="tiny">
  <link name="base">
    <inertial><mass value="1.0"/>
      <inertia ixx="0.01" iyy="0.01" izz="0.01" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision><geometry><sphere radius="0.1"/></geometry></collision>
  </link>
  <link name="arm">
    <inertial><origin xyz="0 0 -0.1"/><mass value="0.3"/>
      <inertia ixx="0.002" iyy="0.002" izz="0.001" ixy="0" ixz="0" iyz="0"/></inertial>
    <collision><origin xyz="0 0 -0.2"/><geometry><sphere radius="0.05"/></geometry></collision>
  </link>
  <joint name="hinge" type="revolute">
    <parent link="base"/><child link="arm"/>
    <origin xyz="0.1 0 0"/><axis xyz="0 1 0"/>
    <limit lower="-1.5" upper="1.5" effort="10" velocity="10"/>
  </joint>
</robot>"""
    model = load_urdf(urdf)
    sp = SimParams(dt=1 / 60, substeps=2, contact_stiffness=5e3,
                   contact_damping=100.0)
    xla_step = jax.jit(build_step_fn(model, sp, fused=False))
    fused_step = jax.jit(build_fused_step_fn(model, sp, interpret=True))
    B = 4
    params = model.default_params().batch(B)
    key = jax.random.key(7)
    k1, k2 = jax.random.split(key)
    # spawn above ground, random orientation-ish (normalized quat)
    qr = jax.random.normal(k1, (B, 4))
    qr = qr / jnp.linalg.norm(qr, axis=-1, keepdims=True)
    q = jnp.concatenate([
        jnp.tile(jnp.asarray([0.0, 0.0, 0.3]), (B, 1)), qr,
        0.5 * jax.random.normal(k2, (B, 1))], axis=-1)
    qd = 0.2 * jax.random.normal(k2, (B, model.nv))
    ctrl = zero_controls(model, B)
    wrench = jnp.zeros((B, model.nb, 6))
    qa, qda = q, qd
    qb, qdb = q, qd
    for _ in range(12):
        qa, qda, neta = xla_step(params, qa, qda, ctrl, wrench)
        qb, qdb, netb = fused_step(params, qb, qdb, ctrl, wrench)
    np.testing.assert_allclose(np.asarray(qa), np.asarray(qb),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(neta), np.asarray(netb),
                               atol=0.5, rtol=5e-3)


@pytest.mark.skipif(SLOW, reason="big-model emulation compile; set THORMANG_SLOW_TESTS=1")
def test_fused_ant_matches_xla():
    from thormang_isaacgym_tpu.tasks.ant import Ant
    _rollout_pair(Ant(num_envs=2), steps=3)


@pytest.mark.skipif(SLOW or not __import__("os").path.exists(
    "/root/reference/assets/urdf/gogoro/urdf/scooter_V13.urdf"),
    reason="big-model emulation compile; set THORMANG_SLOW_TESTS=1")
def test_fused_gogoro_matches_xla():
    """The 40-body flagship: locked joints, wheels (rim contact), drives."""
    from thormang_isaacgym_tpu.tasks.gogoro import Gogoro
    _rollout_pair(Gogoro(num_envs=2), steps=2, tol=5e-3)


@pytest.mark.skipif(SLOW, reason="big-model emulation compile; set THORMANG_SLOW_TESTS=1")
def test_fused_franka_fixed_base():
    """Fixed-root arm (static root pose folds at trace time)."""
    from thormang_isaacgym_tpu.models.franka import load_franka
    from thormang_isaacgym_tpu.ops.sim import SimParams

    class _T:
        pass

    model = load_franka()
    sp = SimParams(dt=1 / 60, substeps=2)
    xla_step = jax.jit(build_step_fn(model, sp, fused=False))
    fused_step = jax.jit(build_fused_step_fn(model, sp, interpret=True))
    B = 2
    params = model.default_params().batch(B)
    key = jax.random.key(3)
    q = 0.3 * jax.random.normal(key, (B, model.nq))
    qd = jnp.zeros((B, model.nv))
    ctrl = zero_controls(model, B)
    wrench = jnp.zeros((B, model.nb, 6))
    for _ in range(3):
        qa, qda, _ = xla_step(params, q, qd, ctrl, wrench)
        qb, qdb, _ = fused_step(params, q, qd, ctrl, wrench)
        np.testing.assert_allclose(np.asarray(qa), np.asarray(qb),
                                   atol=2e-3, rtol=2e-3)
        q, qd = qa, qda


def _pair_scene():
    """Synthetic multi-actor scene exercising every pair kind the fused v2
    narrowphase implements: fixed box table + floating ball (sphere-box),
    floating capsule (capbox + capcap + sphere-capsule), floating cube
    (boxbox + sphere-box)."""
    from thormang_isaacgym_tpu.models import load_urdf
    from thormang_isaacgym_tpu.models.scene import compose

    ball = load_urdf("""
<robot name="ball"><link name="b"><inertial><mass value="0.3"/>
  <inertia ixx="0.0005" iyy="0.0005" izz="0.0005" ixy="0" ixz="0" iyz="0"/>
  </inertial>
  <collision><geometry><sphere radius="0.05"/></geometry></collision>
</link></robot>""")
    cap = load_urdf("""
<robot name="cap"><link name="c"><inertial><mass value="0.4"/>
  <inertia ixx="0.001" iyy="0.001" izz="0.0004" ixy="0" ixz="0" iyz="0"/>
  </inertial>
  <collision><geometry><capsule radius="0.04" length="0.2"/></geometry>
  </collision>
</link></robot>""")
    cube = load_urdf("""
<robot name="cube"><link name="k"><inertial><mass value="0.5"/>
  <inertia ixx="0.0008" iyy="0.0008" izz="0.0008" ixy="0" ixz="0" iyz="0"/>
  </inertial>
  <collision><geometry><box size="0.12 0.12 0.12"/></geometry></collision>
</link></robot>""")
    table = load_urdf("""
<robot name="table"><link name="t"><inertial><mass value="10.0"/>
  <inertia ixx="1" iyy="1" izz="1" ixy="0" ixz="0" iyz="0"/></inertial>
  <collision><geometry><box size="0.8 0.8 0.1"/></geometry></collision>
</link></robot>""", fix_base_link=True)
    scene = compose([
        (ball, (0.05, 0.02, 0.62, 1, 0, 0, 0)),
        (cap, (-0.04, 0.05, 0.60, 0.9238795, 0, 0.3826834, 0), "capA/"),
        (cap, (0.08, 0.06, 0.63, 1, 0, 0, 0), "capB/"),
        (cube, (0.02, -0.06, 0.64, 1, 0, 0, 0)),
        (table, (0, 0, 0.5, 1, 0, 0, 0)),
    ])
    return scene


@pytest.mark.skipif(SLOW, reason="box-box/capbox narrowphase emulation is a "
                    "~30k-op XLA CPU compile; set THORMANG_SLOW_TESTS=1")
def test_fused_pair_scene_matches_xla():
    """Fused v2: actor-pair collision (sphere/capcap/capbox/boxbox) and the
    implicit added-inertia contact reaction, cross-checked against the XLA
    collide path on a cluster of bodies dropped onto a fixed table."""
    from thormang_isaacgym_tpu.ops import collide as collide_mod
    from thormang_isaacgym_tpu.ops.fused import _pair_candidate_count

    model = _pair_scene()
    kinds = {k for (_, _, k) in collide_mod._pairs(model)}
    assert {"sphere", "capcap", "capbox", "boxbox"} <= kinds
    assert fused_eligible(model, None, None)
    assert _pair_candidate_count(model) <= 256
    sp = SimParams(dt=1 / 60, substeps=2, contact_stiffness=2e4,
                   contact_damping=500.0)
    xla_step = jax.jit(build_step_fn(model, sp, fused=False))
    fused_step = jax.jit(build_fused_step_fn(model, sp, interpret=True))
    B = 4
    params = model.default_params().batch(B)
    key = jax.random.key(11)
    k1, k2 = jax.random.split(key)
    q = jnp.tile(jnp.asarray(np.concatenate([
        np.array([0.05, 0.02, 0.62, 1, 0, 0, 0]),
        np.array([-0.04, 0.05, 0.60, 0.9238795, 0, 0.3826834, 0]),
        np.array([0.08, 0.06, 0.63, 1, 0, 0, 0]),
        np.array([0.02, -0.06, 0.64, 1, 0, 0, 0]),
    ]), np.float32)[None], (B, 1))
    qd = 0.1 * jax.random.normal(k2, (B, model.nv))
    ctrl = zero_controls(model, B)
    wrench = jnp.zeros((B, model.nb, 6))
    qa, qda = q, qd
    qb, qdb = q, qd
    contact_seen = False
    for i in range(25):
        qa, qda, neta = xla_step(params, qa, qda, ctrl, wrench)
        qb, qdb, netb = fused_step(params, qb, qdb, ctrl, wrench)
        contact_seen = contact_seen or float(np.abs(np.asarray(neta)).max()) > 0.5
        np.testing.assert_allclose(np.asarray(qa), np.asarray(qb),
                                   atol=5e-3, rtol=5e-3,
                                   err_msg=f"step {i}")
        np.testing.assert_allclose(np.asarray(neta), np.asarray(netb),
                                   atol=1.0, rtol=1e-2, err_msg=f"step {i}")
    assert contact_seen  # the scene must actually collide


def test_fused_tendon_matches_xla():
    """Fused v2 tendon springs (ShadowHand J0/J1 coupling mechanism) vs the
    XLA passive_forces tendon block."""
    import dataclasses

    from thormang_isaacgym_tpu.models import load_urdf

    model = load_urdf("""
<robot name="twolink">
  <link name="base"><inertial><mass value="1.0"/>
    <inertia ixx="0.01" iyy="0.01" izz="0.01" ixy="0" ixz="0" iyz="0"/>
    </inertial></link>
  <link name="l1"><inertial><origin xyz="0 0 -0.1"/><mass value="0.2"/>
    <inertia ixx="0.001" iyy="0.001" izz="0.0005" ixy="0" ixz="0" iyz="0"/>
    </inertial></link>
  <link name="l2"><inertial><origin xyz="0 0 -0.1"/><mass value="0.1"/>
    <inertia ixx="0.0005" iyy="0.0005" izz="0.0002" ixy="0" ixz="0"
    iyz="0"/></inertial></link>
  <joint name="j1" type="revolute"><parent link="base"/><child link="l1"/>
    <origin xyz="0 0 -0.05"/><axis xyz="0 1 0"/>
    <limit lower="-1.5" upper="1.5" effort="5" velocity="10"/></joint>
  <joint name="j2" type="revolute"><parent link="l1"/><child link="l2"/>
    <origin xyz="0 0 -0.2"/><axis xyz="0 1 0"/>
    <limit lower="-1.5" upper="1.5" effort="5" velocity="10"/></joint>
</robot>""", fix_base_link=True)
    d = dict(model._defaults)
    d["tendon_stiffness"] = np.array([25.0], np.float32)
    d["tendon_damping"] = np.array([0.2], np.float32)
    model = dataclasses.replace(
        model, tendons=(((1.0, -1.0), -0.05, 0.05, "t0"),))
    object.__setattr__(model, "_defaults", d)
    sp = SimParams(dt=1 / 60, substeps=2)
    xla_step = jax.jit(build_step_fn(model, sp, fused=False))
    fused_step = jax.jit(build_fused_step_fn(model, sp, interpret=True))
    B = 3
    params = model.default_params().batch(B)
    q = jnp.asarray([[0.0, 0.4], [0.3, -0.3], [-0.2, 0.2]], jnp.float32)
    qd = jnp.zeros((B, model.nv))
    ctrl = zero_controls(model, B)
    wrench = jnp.zeros((B, model.nb, 6))
    qa, qda = q, qd
    qb, qdb = q, qd
    for _ in range(10):
        qa, qda, _ = xla_step(params, qa, qda, ctrl, wrench)
        qb, qdb, _ = fused_step(params, qb, qdb, ctrl, wrench)
    # tendon limit spring must have pulled |q1 - q2| toward the 0.05 band
    assert float(np.abs(np.asarray(qa)[:, 0] - np.asarray(qa)[:, 1]).max()) \
        < 0.75
    np.testing.assert_allclose(np.asarray(qa), np.asarray(qb),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(qda), np.asarray(qdb),
                               atol=2e-2, rtol=2e-2)


def test_fused_pair_capsule_scene_matches_xla():
    """Default-CI fused v2 cross-check on a box-free pair scene (sphere +
    capsule narrowphase + the added-inertia reaction): a ball and two
    capsules dropped onto a fixed horizontal capsule bar. The box kinds
    compile too slowly for the 2-vCPU CI and run in the gated
    test_fused_pair_scene_matches_xla instead."""
    from thormang_isaacgym_tpu.models import load_urdf
    from thormang_isaacgym_tpu.models.scene import compose
    from thormang_isaacgym_tpu.ops import collide as collide_mod

    ball = load_urdf("""
<robot name="ball"><link name="b"><inertial><mass value="0.3"/>
  <inertia ixx="0.0005" iyy="0.0005" izz="0.0005" ixy="0" ixz="0" iyz="0"/>
  </inertial>
  <collision><geometry><sphere radius="0.05"/></geometry></collision>
</link></robot>""")
    cap = load_urdf("""
<robot name="cap"><link name="c"><inertial><mass value="0.4"/>
  <inertia ixx="0.001" iyy="0.001" izz="0.0004" ixy="0" ixz="0" iyz="0"/>
  </inertial>
  <collision><geometry><capsule radius="0.04" length="0.2"/></geometry>
  </collision>
</link></robot>""")
    bar = load_urdf("""
<robot name="bar"><link name="t"><inertial><mass value="10.0"/>
  <inertia ixx="1" iyy="1" izz="1" ixy="0" ixz="0" iyz="0"/></inertial>
  <collision><geometry><capsule radius="0.08" length="0.8"/></geometry>
  </collision>
</link></robot>""", fix_base_link=True)
    # bar axis horizontal (rot about y by 90deg)
    model = compose([
        (ball, (0.0, 0.02, 0.78, 1, 0, 0, 0)),
        (cap, (-0.02, 0.05, 0.75, 0.9238795, 0, 0.3826834, 0), "capA/"),
        (cap, (0.04, 0.03, 0.80, 1, 0, 0, 0), "capB/"),
        (bar, (0, 0, 0.6, 0.7071068, 0, 0.7071068, 0)),
    ])
    kinds = {k for (_, _, k) in collide_mod._pairs(model)}
    assert kinds == {"sphere", "capcap"}
    sp = SimParams(dt=1 / 60, substeps=2, contact_stiffness=2e4,
                   contact_damping=500.0)
    xla_step = jax.jit(build_step_fn(model, sp, fused=False))
    fused_step = jax.jit(build_fused_step_fn(model, sp, interpret=True))
    B = 4
    params = model.default_params().batch(B)
    key = jax.random.key(5)
    q = jnp.tile(jnp.asarray(np.concatenate([
        np.array([0.0, 0.02, 0.78, 1, 0, 0, 0]),
        np.array([-0.02, 0.05, 0.75, 0.9238795, 0, 0.3826834, 0]),
        np.array([0.04, 0.03, 0.80, 1, 0, 0, 0]),
    ]), np.float32)[None], (B, 1))
    qd = 0.1 * jax.random.normal(key, (B, model.nv))
    ctrl = zero_controls(model, B)
    wrench = jnp.zeros((B, model.nb, 6))
    qa, qda = q, qd
    qb, qdb = q, qd
    contact_seen = False
    for i in range(20):
        qa, qda, neta = xla_step(params, qa, qda, ctrl, wrench)
        qb, qdb, netb = fused_step(params, qb, qdb, ctrl, wrench)
        contact_seen = contact_seen or \
            float(np.abs(np.asarray(neta)).max()) > 0.5
        np.testing.assert_allclose(np.asarray(qa), np.asarray(qb),
                                   atol=5e-3, rtol=5e-3, err_msg=f"step {i}")
        np.testing.assert_allclose(np.asarray(neta), np.asarray(netb),
                                   atol=1.0, rtol=1e-2, err_msg=f"step {i}")
    assert contact_seen


def _two_actor_scene(urdf_a, urdf_b, pose_a, pose_b, fix_b=True):
    from thormang_isaacgym_tpu.models import load_urdf
    from thormang_isaacgym_tpu.models.scene import compose
    return compose([(load_urdf(urdf_a), pose_a, "A/"),
                    (load_urdf(urdf_b, fix_base_link=fix_b), pose_b, "B/")])


_CUBE = """
<robot name="cube"><link name="k"><inertial><mass value="0.5"/>
  <inertia ixx="0.0008" iyy="0.0008" izz="0.0008" ixy="0" ixz="0" iyz="0"/>
  </inertial>
  <collision><geometry><box size="0.12 0.12 0.12"/></geometry></collision>
</link></robot>"""
_CAP = """
<robot name="cap"><link name="c"><inertial><mass value="0.4"/>
  <inertia ixx="0.001" iyy="0.001" izz="0.0004" ixy="0" ixz="0" iyz="0"/>
  </inertial>
  <collision><geometry><capsule radius="0.04" length="0.2"/></geometry>
  </collision>
</link></robot>"""


def _pair_kind_check(scene, expect_kind, q0=None, steps=20, tol=5e-3):
    """CI-sized fused-vs-XLA narrowphase cross-check: exactly one floating
    actor pair, spawned overlapping at altitude (no ground contact) so the
    compile stays within the 2-vCPU CI budget. Shrunk from
    test_fused_pair_scene_matches_xla per the r4 review: ShadowHand's fused
    scene is 3 boxbox + 15 capbox pairs, so those two kinds must be
    numerically verified in DEFAULT CI, not only in the slow lane."""
    from thormang_isaacgym_tpu.ops import collide as collide_mod

    kinds = [k for (_, _, k) in collide_mod._pairs(scene)]
    assert kinds == [expect_kind], kinds
    sp = SimParams(dt=1 / 60, substeps=1, contact_stiffness=2e4,
                   contact_damping=500.0)
    xla_step = jax.jit(build_step_fn(scene, sp, fused=False))
    fused_step = jax.jit(build_fused_step_fn(scene, sp, interpret=True))
    B = 4
    params = scene.default_params().batch(B)
    if q0 is None:
        # floating root(s) spawn at their compose() pose
        base = np.asarray(scene.root_base_pose, np.float32).reshape(-1, 7)
        flo = [i for i, f in enumerate(scene.roots_floating) if f]
        q0 = base[flo].reshape(-1)
    q = jnp.tile(jnp.asarray(np.asarray(q0, np.float32))[None], (B, 1))
    assert q.shape[1] == scene.nq
    qd = 0.05 * jax.random.normal(jax.random.key(5), (B, scene.nv))
    ctrl = zero_controls(scene, B)
    wrench = jnp.zeros((B, scene.nb, 6))
    qa, qda = q, qd
    qb, qdb = q, qd
    contact_seen = False
    for i in range(steps):
        qa, qda, neta = xla_step(params, qa, qda, ctrl, wrench)
        qb, qdb, netb = fused_step(params, qb, qdb, ctrl, wrench)
        contact_seen = contact_seen or float(np.abs(np.asarray(neta)).max()) > 0.5
        np.testing.assert_allclose(np.asarray(qa), np.asarray(qb),
                                   atol=tol, rtol=tol, err_msg=f"step {i}")
        np.testing.assert_allclose(np.asarray(neta), np.asarray(netb),
                                   atol=1.0, rtol=1e-2, err_msg=f"step {i}")
    assert contact_seen


def test_fused_boxbox_pair_matches_xla():
    """One box-box SAT pair (17 candidates): a cube dropped 2 mm onto a
    FIXED cube — persistent resting contact at ~weight-scale forces."""
    scene = _two_actor_scene(
        _CUBE, _CUBE,
        (0.02, 0.01, 5.122, 0.9990482, 0.0, 0.0, 0.0436194),  # 5 deg yaw
        (0.0, 0.0, 5.0, 1, 0, 0, 0))
    _pair_kind_check(scene, "boxbox")


def test_fused_capbox_pair_matches_xla():
    """One capsule-box pair (4 candidates): a horizontal capsule dropped
    2 mm onto a FIXED cube."""
    scene = _two_actor_scene(
        _CAP, _CUBE,
        (0.0, 0.0, 5.102, 0.7071068, 0, 0.7071068, 0),  # axis along x
        (0.0, 0.0, 5.0, 1, 0, 0, 0))
    _pair_kind_check(scene, "capbox")
