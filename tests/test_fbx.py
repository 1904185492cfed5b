"""Binary-FBX mocap importer (learn/fbx.py) against the reference's real
CMU clips and its SDK-authored skeleton snapshot (cmu_tpose.npy)."""
import os

import numpy as np
import pytest

_DATA = "/root/reference/isaacgymenvs/tasks/amp/poselib/data"
pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(_DATA, "07_01_cmu.fbx")),
    reason="reference CMU mocap not present")


def _load():
    from thormang_isaacgym_tpu.learn.fbx import load_fbx_motion
    return load_fbx_motion(os.path.join(_DATA, "07_01_cmu.fbx"))


def test_skeleton_matches_reference_tpose():
    """Node names + topology must equal the skeleton the reference's
    Autodesk-SDK importer produced (cmu_tpose.npy ships in-repo)."""
    m = _load()
    d = np.load(os.path.join(_DATA, "cmu_tpose.npy"),
                allow_pickle=True).item()
    st = d["skeleton_tree"]
    assert [str(x) for x in st["node_names"]] == m.skeleton.node_names
    assert np.array_equal(st["parent_indices"]["arr"],
                          m.skeleton.parent_indices)
    # bone offsets: same tree shape (subject 7 vs the tpose's subject 1 —
    # lengths differ by anthropometry, directions must agree)
    lt_ref = st["local_translation"]["arr"][1:]
    lt_got = np.asarray(m.skeleton.local_translation)[1:]
    n_ref = np.linalg.norm(lt_ref, axis=-1)
    n_got = np.linalg.norm(lt_got, axis=-1)
    mask = (n_ref > 0.1) & (n_got > 0.1)
    cos = np.sum(lt_ref * lt_got, axis=-1)[mask] / (n_ref * n_got)[mask]
    assert cos.min() > 0.99


def test_motion_is_physical_walk():
    """07_01 is a CMU walk: Z-up, hips ~0.9 m (16 units), toes touching
    the ground, meters of travel, alternating feet, constant bone length."""
    m = _load()
    assert m.fps == 120.0
    assert m.num_frames > 200
    _, g_pos = m.fk()
    root_z = g_pos[:, 0, 2]
    assert 14.0 < root_z.min() and root_z.max() < 20.0
    toes = g_pos[:, [m.skeleton.index("LeftToeBase"),
                     m.skeleton.index("RightToeBase")], 2]
    assert toes.min() > -2.0 and toes.min() < 1.0
    travel = np.linalg.norm(g_pos[-1, 0, :2] - g_pos[0, 0, :2])
    assert travel > 30.0          # > 1.7 m
    lf, rf = m.skeleton.index("LeftFoot"), m.skeleton.index("RightFoot")
    switches = np.abs(np.diff(
        (g_pos[:, lf, 2] < g_pos[:, rf, 2]).astype(int))).sum()
    assert switches >= 6
    j = m.skeleton.index("LeftLeg")
    L = np.linalg.norm(g_pos[:, j] - g_pos[:, int(m.skeleton.parent_indices[j])],
                       axis=-1)
    assert L.std() < 1e-3


def test_fbx_to_amp_clip_pipeline():
    """FBX -> retarget (reference cmu config) -> canonical AMP clip:
    meter-scale root height and forward travel on the AMP humanoid."""
    from thormang_isaacgym_tpu.learn.motion_lib import _load_any

    clip = _load_any(os.path.join(_DATA, "07_01_cmu.fbx"))
    rt = np.asarray(clip["root_pos"])
    assert 0.6 < rt[:, 2].min() and rt[:, 2].max() < 1.2
    assert np.linalg.norm(rt[-1, :2] - rt[0, :2]) > 1.5
    assert np.isfinite(np.asarray(clip["dof_pos"])).all()
    assert np.abs(np.asarray(clip["dof_vel"])).max() < 50.0
