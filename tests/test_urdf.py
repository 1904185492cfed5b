"""URDF compiler tests: hand-written assets + the reference scooter URDF."""
import os

import numpy as np

from thormang_isaacgym_tpu.models import load_urdf
from thormang_isaacgym_tpu.models.robot import GEOM_CYLINDER, PRISMATIC, REVOLUTE

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets")
REF_SCOOTER = "/root/reference/assets/urdf/gogoro/urdf/scooter_V13.urdf"


def test_pendulum_parse():
    m = load_urdf(os.path.join(ASSETS, "pendulum.urdf"), fix_base_link=True)
    assert m.nb == 2
    assert m.nj == 1
    assert not m.floating
    assert m.nq == 1 and m.nv == 1
    assert m.joint_type[0] == REVOLUTE
    d = m.default_params()
    np.testing.assert_allclose(np.asarray(d.body_mass), [10.0, 1.2])
    np.testing.assert_allclose(np.asarray(d.body_com)[1], [0, 0, -0.7])


def test_cartpole_parse():
    m = load_urdf(os.path.join(ASSETS, "cartpole.urdf"), fix_base_link=True)
    assert m.nj == 2
    assert m.joint_type[m.dof_id("slider_to_cart")] == PRISMATIC
    assert m.joint_type[m.dof_id("cart_to_pole")] == REVOLUTE
    d = m.default_params()
    assert float(d.dof_lower[m.dof_id("slider_to_cart")]) == -4.0
    assert float(d.drive_effort_limit[m.dof_id("slider_to_cart")]) == 1000.0
    # two collision geoms: cart box + pole capsule
    assert m.ng == 2


def test_scooter_parse():
    if not os.path.exists(REF_SCOOTER):
        import pytest
        pytest.skip("reference assets unavailable")
    wheel = {"type": "cylinder", "size": (0.2, 0.045),
             "pos": (0, 0, 0), "quat": (1.0, 0, 0, 0)}
    m = load_urdf(
        REF_SCOOTER,
        mesh_overrides={"front": wheel, "back": wheel},
    )
    # 39 movable DOFs: 34 revolute (33 thormang + steering) + 2 continuous
    # wheels + 3 prismatic base_x/y/z (SURVEY.md §2.3 asset table)
    assert m.nj == 39, m.joint_names
    assert m.floating
    for name in ("steering_joint", "front_wheel_joint", "rear_wheel_joint",
                 "base_x", "base_y", "base_z"):
        assert name in m.joint_names
    assert m.joint_type[m.dof_id("base_x")] == PRISMATIC
    # root must be the scooter body
    assert m.body_names[0] == "body"
    # wheels got cylinder collision
    wheel_geoms = [g for g in m.geoms if g.gtype == GEOM_CYLINDER]
    assert len(wheel_geoms) == 2
    # total mass is dominated by the scooter body (79.2) + rider
    d = m.default_params()
    total = float(np.sum(np.asarray(d.body_mass)))
    assert 100.0 < total < 250.0, total
    # parent ordering invariant for the dynamics sweeps
    assert all(m.parent[i] < i for i in range(1, m.nb))


def test_fixed_link_merging():
    urdf = """
    <robot name="t">
      <link name="a"><inertial><mass value="1"/><inertia ixx="0.1" iyy="0.1" izz="0.1" ixy="0" ixz="0" iyz="0"/></inertial></link>
      <joint name="jfix" type="fixed"><parent link="a"/><child link="b"/><origin xyz="1 0 0"/></joint>
      <link name="b"><inertial><mass value="1"/><inertia ixx="0.1" iyy="0.1" izz="0.1" ixy="0" ixz="0" iyz="0"/></inertial></link>
      <joint name="jrev" type="revolute"><parent link="b"/><child link="c"/><origin xyz="0 1 0"/><axis xyz="0 0 1"/>
        <limit lower="-1" upper="1" effort="10" velocity="5"/></joint>
      <link name="c"><inertial><mass value="2"/><inertia ixx="0.2" iyy="0.2" izz="0.2" ixy="0" ixz="0" iyz="0"/></inertial></link>
    </robot>
    """
    m = load_urdf(urdf, fix_base_link=True)
    assert m.nb == 2  # b merged into a
    assert m.nj == 1
    d = m.default_params()
    # merged mass 2, com at midpoint x=0.5
    np.testing.assert_allclose(float(d.body_mass[0]), 2.0)
    np.testing.assert_allclose(np.asarray(d.body_com)[0], [0.5, 0, 0], atol=1e-6)
    # revolute joint origin composed through the fixed joint: (1,1,0)
    np.testing.assert_allclose(m.joint_pos[0], (1.0, 1.0, 0.0), atol=1e-6)
    # merged link addressable as site
    assert "b" in m.sites
