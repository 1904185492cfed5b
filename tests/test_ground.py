"""Ground-spec handling: constant-height planes (factory tabletop) and
heightfield terrain (AnymalTerrain) through BOTH physics backends.

The fused kernel's heightfield mode contracts the terrain to a per-candidate
LOCAL PLANE sampled once per control step (ops/fused._ground_plane_sampler);
the XLA path samples the same bilinear surface per substep with sloped
normals (ops/contact.py ground_grad_fn). On flat terrain the two are the
same surface exactly; on slopes they differ only by the per-control-step
sampling freeze, bounded by candidate motion within one control step.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thormang_isaacgym_tpu.engine.terrain import Heightfield
from thormang_isaacgym_tpu.models import load_urdf
from thormang_isaacgym_tpu.ops.fused import build_fused_step_fn, fused_eligible
from thormang_isaacgym_tpu.ops.sim import SimParams, build_step_fn, zero_controls

_TINY = """
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


def _mk(seed=7, B=4, z0=0.6):
    model = load_urdf(_TINY)
    sp = SimParams(dt=1 / 60, substeps=2, contact_stiffness=5e3,
                   contact_damping=100.0)
    params = model.default_params().batch(B)
    k1, k2 = jax.random.split(jax.random.key(seed))
    qr = jax.random.normal(k1, (B, 4))
    qr = qr / jnp.linalg.norm(qr, axis=-1, keepdims=True)
    q = jnp.concatenate([
        jnp.tile(jnp.asarray([0.0, 0.0, z0]), (B, 1)), qr,
        0.5 * jax.random.normal(k2, (B, 1))], axis=-1)
    qd = 0.2 * jax.random.normal(k2, (B, model.nv))
    ctrl = zero_controls(model, B)
    wrench = jnp.zeros((B, model.nb, 6))
    return model, sp, params, q, qd, ctrl, wrench


def _run_pair(step_a, step_b, params, q, qd, ctrl, wrench, steps,
              atol_q, atol_net=0.5):
    qa, qda = q, qd
    qb, qdb = q, qd
    for _ in range(steps):
        qa, qda, neta = step_a(params, qa, qda, ctrl, wrench)
        qb, qdb, netb = step_b(params, qb, qdb, ctrl, wrench)
    np.testing.assert_allclose(np.asarray(qa), np.asarray(qb),
                               atol=atol_q, rtol=atol_q)
    np.testing.assert_allclose(np.asarray(neta)[..., 0:3],
                               np.asarray(netb)[..., 0:3],
                               atol=atol_net, rtol=5e-3)


def test_fused_constant_ground_matches_xla():
    """A raised plane (the factory-table case, tasks/factory.py
    ground_height_fn -> TABLE_Z float): fused plane path vs XLA path."""
    model, sp, params, q, qd, ctrl, wrench = _mk(z0=0.55)
    assert fused_eligible(model, 0.3, None)
    xla = jax.jit(build_step_fn(model, sp, ground_height_fn=0.3, fused=False))
    fus = jax.jit(build_fused_step_fn(model, sp, ground=0.3, interpret=True))
    _run_pair(xla, fus, params, q, qd, ctrl, wrench, steps=12, atol_q=2e-3)


def test_fused_flat_heightfield_matches_plane():
    """A CONSTANT heightfield must reproduce the plane-at-height results
    through the heightfield machinery of both backends."""
    model, sp, params, q, qd, ctrl, wrench = _mk(z0=0.45)
    hf = Heightfield(np.full((16, 16), 0.2, np.float32), 0.25,
                     origin=(-2.0, -2.0))
    assert fused_eligible(model, hf, None)
    fus_hf = jax.jit(build_fused_step_fn(model, sp, ground=hf, interpret=True))
    fus_pl = jax.jit(build_fused_step_fn(model, sp, ground=0.2, interpret=True))
    xla_hf = jax.jit(build_step_fn(model, sp, ground_height_fn=hf, fused=False))
    _run_pair(fus_pl, fus_hf, params, q, qd, ctrl, wrench, steps=12,
              atol_q=1e-4)
    _run_pair(xla_hf, fus_hf, params, q, qd, ctrl, wrench, steps=12,
              atol_q=2e-3)


def test_fused_sloped_heightfield_close_to_xla():
    """Gentle slope: both backends use the identical local-plane surface
    model (height_and_grad_fn); the only difference is the fused path's
    once-per-control-step sampling freeze, so trajectories must agree to a
    tolerance bounded by per-step candidate motion."""
    model, sp, params, q, qd, ctrl, wrench = _mk(z0=0.5)
    i = np.arange(24, dtype=np.float32)
    heights = np.broadcast_to(0.05 * i[:, None], (24, 24)).copy()  # 20% grade
    hf = Heightfield(heights, 0.25, origin=(-3.0, -3.0))
    fus = jax.jit(build_fused_step_fn(model, sp, ground=hf, interpret=True))
    xla = jax.jit(build_step_fn(model, sp, ground_height_fn=hf, fused=False))
    _run_pair(xla, fus, params, q, qd, ctrl, wrench, steps=12, atol_q=8e-3,
              atol_net=1.5)


def test_sloped_contact_normal_direction():
    """A sphere resting on a 45-degree slope must receive a contact force
    tilted INTO the slope normal (x-component opposing the grade), not the
    world vertical — the physical behavior the sloped-normal path adds."""
    import dataclasses
    model, sp, params, q, qd, ctrl, wrench = _mk(B=1, z0=0.0)
    # single substep so the returned net force is the from-rest reaction
    # (later substeps are friction-dominated once the body bounces)
    sp = dataclasses.replace(sp, substeps=1)
    i = np.arange(40, dtype=np.float32)
    heights = np.broadcast_to(0.25 * i[:, None], (40, 40)).copy()  # slope 1:1
    hf = Heightfield(heights, 0.25, origin=(-5.0, -5.0))
    step = jax.jit(build_step_fn(model, sp, ground_height_fn=hf, fused=False))
    # place the sphere slightly penetrating the slope at x=0 (z(0,.)=5*0.25=...)
    z_surf = float(hf.height_fn()(jnp.asarray([0.0]), jnp.asarray([0.0]))[0])
    q = q.at[0, 0:3].set(jnp.asarray([0.0, 0.0, z_surf + 0.06]))
    q = q.at[0, 3:7].set(jnp.asarray([1.0, 0.0, 0.0, 0.0]))
    qd = jnp.zeros_like(qd)
    _, _, net = step(params, q, qd, ctrl, wrench)
    f = np.asarray(net)[0, 0, 0:3]
    assert f[2] > 0.0, f
    # uphill-pointing (negative-x gradient reaction): n = (-1, 0, 1)/sqrt(2)
    assert f[0] < -0.1 * abs(f[2]), f


def test_net_torque_contract():
    """Every task module that reads EnvState.net_torque must declare
    uses_net_torque=True on a Task subclass it defines (else the fused
    backend hands it zeros)."""
    import importlib
    import inspect
    import pkgutil

    import thormang_isaacgym_tpu.tasks as tasks_pkg
    from thormang_isaacgym_tpu.engine.env import Task

    offenders = []
    for info in pkgutil.iter_modules(tasks_pkg.__path__):
        mod = importlib.import_module(f"thormang_isaacgym_tpu.tasks.{info.name}")
        src = inspect.getsource(mod)
        if ".net_torque" not in src:
            continue
        ok = any(isinstance(c, type) and issubclass(c, Task)
                 and getattr(c, "uses_net_torque", False)
                 for c in vars(mod).values())
        if not ok:
            offenders.append(info.name)
    assert not offenders, f"tasks read net_torque without declaring it: {offenders}"


def test_need_torque_false_zero_torque_rows():
    """need_torque=False: identical forces, zero torque half, and the
    kernel output shrinks to 3 rows/body."""
    model, sp, params, q, qd, ctrl, wrench = _mk(z0=0.12)
    f6 = jax.jit(build_fused_step_fn(model, sp, interpret=True,
                                     need_torque=True))
    f3 = jax.jit(build_fused_step_fn(model, sp, interpret=True,
                                     need_torque=False))
    q6, qd6, net6 = f6(params, q, qd, ctrl, wrench)
    q3, qd3, net3 = f3(params, q, qd, ctrl, wrench)
    np.testing.assert_allclose(np.asarray(q6), np.asarray(q3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(net6)[..., 0:3],
                               np.asarray(net3)[..., 0:3], atol=1e-5)
    assert np.all(np.asarray(net3)[..., 3:6] == 0.0)
    assert float(np.abs(np.asarray(net6)[..., 3:6]).max()) > 0.0


def test_need_torque_subset_bodies():
    """need_torque=<body ids>: torque rows match the all-body kernel on the
    declared bodies and read zero elsewhere; forces unchanged."""
    model, sp, params, q, qd, ctrl, wrench = _mk(z0=0.12)
    f_all = jax.jit(build_fused_step_fn(model, sp, interpret=True,
                                        need_torque=True))
    _, _, net_all = f_all(params, q, qd, ctrl, wrench)
    # pick the body with the largest torque as the declared sensor body
    mags = np.abs(np.asarray(net_all)[..., 3:6]).sum(axis=(0, 2))
    b_sense = int(mags.argmax())
    f_sub = jax.jit(build_fused_step_fn(model, sp, interpret=True,
                                        need_torque=(b_sense,)))
    q_s, _, net_sub = f_sub(params, q, qd, ctrl, wrench)
    np.testing.assert_allclose(np.asarray(net_all)[..., 0:3],
                               np.asarray(net_sub)[..., 0:3], atol=1e-5)
    np.testing.assert_allclose(np.asarray(net_sub)[:, b_sense, 3:6],
                               np.asarray(net_all)[:, b_sense, 3:6],
                               atol=1e-5)
    others = [b for b in range(model.nb) if b != b_sense]
    if others:
        assert np.all(np.asarray(net_sub)[:, others, 3:6] == 0.0)
