import numpy as np
import pytest

from egotap_tpu.core.skeleton import get_skeleton, bone_vectors


def test_unrealego_preset():
    sk = get_skeleton("UnrealEgo")
    sk.validate()
    assert sk.num_joints == 16
    assert sk.parents == (0, 0, 1, 1, 2, 3, 4, 5, 2, 3, 8, 9, 10, 11, 12, 13)
    assert sk.joint_names[0] == "head"
    assert sk.estimate_head and sk.stereo
    assert sk.num_heatmaps == 15


def test_egocap_preset():
    sk = get_skeleton("EgoCap")
    sk.validate()
    assert sk.num_joints == 18
    assert sk.parents == (0, 0, 1, 2, 3, 4, 1, 6, 7, 8, 2, 10, 11, 12, 6, 14, 15, 16)
    assert not sk.estimate_head
    assert sk.num_heatmaps == 17


def test_unknown_preset_raises():
    with pytest.raises(ValueError):
        get_skeleton("nope")


def test_bone_vectors():
    sk = get_skeleton("UnrealEgo")
    pose = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    bv = bone_vectors(pose, sk.parents_array())
    assert bv.shape == (15, 3)
    # joint 1's bone = pose[1] - pose[0]
    np.testing.assert_allclose(bv[0], pose[1] - pose[0])
    # joint 9 (thigh_r) parent is 3
    np.testing.assert_allclose(bv[8], pose[9] - pose[3])


def test_topological_order():
    for name in ("UnrealEgo", "EgoCap"):
        sk = get_skeleton(name)
        for child in range(1, sk.num_joints):
            assert sk.parents[child] < child or (child == 1 and sk.parents[child] == 0)
