"""poselib ingestion (VERDICT r3 item 8): reference SkeletonState/Motion
.npy I/O, CMU->AMP retargeting (reference retarget config schema), joint
projection, and MotionLib ingestion of reference-format clips."""
import os

import numpy as np
import pytest

from thormang_isaacgym_tpu.learn import poselib as PL

TPOSE_DIR = "/root/reference/isaacgymenvs/tasks/amp/poselib/data"
AMP_TPOSE = os.path.join(TPOSE_DIR, "amp_humanoid_tpose.npy")
CMU_TPOSE = os.path.join(TPOSE_DIR, "cmu_tpose.npy")

needs_ref = pytest.mark.skipif(not os.path.exists(AMP_TPOSE),
                               reason="reference tpose data absent")


@needs_ref
def test_tpose_roundtrip(tmp_path):
    t = PL.SkeletonMotion.from_file(AMP_TPOSE)
    assert t.num_frames == 1
    assert "pelvis" in t.skeleton.node_names
    # unit quats, valid tree
    assert np.allclose(np.linalg.norm(t.local_rotation, axis=-1), 1.0,
                       atol=1e-5)
    p = str(tmp_path / "tp.npy")
    t.to_file(p)
    t2 = PL.SkeletonMotion.from_file(p)
    np.testing.assert_allclose(t.local_rotation, t2.local_rotation,
                               atol=1e-6)
    np.testing.assert_allclose(t.root_translation, t2.root_translation,
                               atol=1e-6)
    assert t.skeleton.node_names == t2.skeleton.node_names


def _swing_motion(tpose, swing_joints, F=60, fps=30.0, amp=0.5,
                  forward_axis=0, speed=1.0):
    """Synthesize a walk-ish SkeletonMotion on any skeleton: sinusoidal
    swings about local y at the given joints, forward root motion."""
    sk = tpose.skeleton
    J = len(sk.node_names)
    t = np.arange(F) / fps
    rot = np.tile(tpose.local_rotation[0][None], (F, 1, 1))
    for k, name in enumerate(swing_joints):
        j = sk.index(name)
        phase = np.pi * (k % 2)
        ang = amp * np.sin(2 * np.pi * 1.4 * t + phase)
        q = PL._from_angle_axis(ang, (0.0, 1.0, 0.0))
        rot[:, j] = PL._qmul(rot[:, j], q)
    trans = np.tile(tpose.root_translation[0][None], (F, 1))
    trans[:, forward_axis] += speed * t
    return PL.SkeletonMotion(sk, PL._qnorm(rot), trans, fps)


@needs_ref
def test_retarget_cmu_to_amp(tmp_path):
    """A motion synthesized on the CMU skeleton retargets onto the AMP
    humanoid with the reference retarget config values
    (data/configs/retarget_cmu_to_amp.json: rotation [0,0,0.7071,0.7071],
    scale 0.056444) and converts to a MotionLib clip."""
    cmu = PL.SkeletonMotion.from_file(CMU_TPOSE)
    m = _swing_motion(cmu, ["LeftUpLeg", "RightUpLeg", "LeftArm",
                            "RightArm"], forward_axis=0,
                      speed=1.0 / 0.056444)
    src_path = str(tmp_path / "cmu_motion.npy")
    m.to_file(src_path)

    cfg = {
        "source_tpose": CMU_TPOSE,
        "target_tpose": AMP_TPOSE,
        "joint_mapping": {
            "Hips": "pelvis", "LeftUpLeg": "left_thigh",
            "LeftLeg": "left_shin", "LeftFoot": "left_foot",
            "RightUpLeg": "right_thigh", "RightLeg": "right_shin",
            "RightFoot": "right_foot", "Spine1": "torso", "Head": "head",
            "LeftArm": "left_upper_arm", "LeftForeArm": "left_lower_arm",
            "LeftHand": "left_hand", "RightArm": "right_upper_arm",
            "RightForeArm": "right_lower_arm", "RightHand": "right_hand",
        },
        "rotation": [0, 0, 0.7071068, 0.7071068],
        "scale": 0.056444,
        "root_height_offset": 0.05,
    }
    clip = PL.load_motion_file(src_path, retarget_cfg=cfg)
    for k in ("root_pos", "root_rot", "dof_pos", "dof_vel", "key_pos"):
        assert np.isfinite(clip[k]).all(), k
    # the retargeted root moved forward ~ scale * source distance = ~2 m
    dist = np.linalg.norm(clip["root_pos"][-1, :2] - clip["root_pos"][0, :2])
    assert 1.0 < dist < 3.5, dist
    # feet-on-ground: lowest key body (feet) near z=0 + height offset
    min_foot = float(clip["key_pos"][..., 2].min())
    assert -0.05 < min_foot < 0.25, min_foot
    # legs actually swing in dof space
    assert float(np.abs(clip["dof_vel"]).max()) > 0.5


@needs_ref
def test_motionlib_ingests_reference_npy(tmp_path):
    """MotionLib loads a SkeletonMotion npy authored on the AMP skeleton
    directly (the reference's own motion format)."""
    from thormang_isaacgym_tpu.learn.motion_lib import default_motion_lib

    amp = PL.SkeletonMotion.from_file(AMP_TPOSE)
    m = _swing_motion(amp, ["left_thigh", "right_thigh", "left_upper_arm",
                            "right_upper_arm"], F=45, speed=1.2)
    p = str(tmp_path / "amp_walk.npy")
    m.to_file(p)
    lib = default_motion_lib(p)
    assert lib.num_motions() == 1
    import jax
    ids = np.zeros(4, np.int32)
    times = np.linspace(0.0, 1.0, 4).astype(np.float32)
    st = lib.get_motion_state(ids, times)
    for leaf in jax.tree.leaves(st):
        assert np.isfinite(np.asarray(leaf)).all()
