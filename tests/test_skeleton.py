"""Metadata invariants for the H3WB skeleton tables."""

import numpy as np

from pafuse_tpu import skeleton as sk


def test_joint_count():
    assert sk.NUM_JOINTS == 134
    assert len(sk.PARENTS) == 134


def test_parts_partition_joints():
    all_joints = sorted(
        j for idx in sk.PARTS_JOINT_INDICES.values() for j in idx)
    assert all_joints == list(range(134))
    assert len(sk.PARTS_JOINT_INDICES["body"]) == 24
    assert len(sk.PARTS_JOINT_INDICES["face"]) == 68
    assert len(sk.PARTS_JOINT_INDICES["left_hand"]) == 21
    assert len(sk.PARTS_JOINT_INDICES["right_hand"]) == 21


def test_merged_parts():
    merged = sk.merged_parts_joint_indices()
    assert set(merged) == {"body", "face", "hands"}
    assert len(merged["hands"]) == 42
    assert merged["hands"] == list(range(92, 134))


def test_root_indices_inside_parts():
    for part, root in sk.ROOT_INDICES.items():
        assert root in sk.PARTS_JOINT_INDICES[part]
    # reference values (h3wb_dataset.py:49-54)
    assert sk.ROOT_INDICES == {"body": 0, "face": 54,
                               "left_hand": 92, "right_hand": 113}


def test_connection_indices():
    # nose / left wrist / right wrist (h3wb_dataset.py:57-61)
    assert sk.PARTS_CONNECTION_INDICES == {"face": 1, "left_hand": 10,
                                           "right_hand": 11}
    for j in sk.PARTS_CONNECTION_INDICES.values():
        assert j in sk.PARTS_JOINT_INDICES["body"]


def test_root_of_joint_table():
    for part, idx in sk.PARTS_JOINT_INDICES.items():
        assert np.all(sk.PART_ROOT_OF_JOINT[idx] == sk.ROOT_INDICES[part])


def test_connection_of_joint_table():
    assert np.all(sk.CONNECTION_OF_JOINT[sk.PARTS_JOINT_INDICES["body"]] == 0)
    assert np.all(sk.CONNECTION_OF_JOINT[sk.PARTS_JOINT_INDICES["face"]] == 1)
    assert np.all(sk.CONNECTION_OF_JOINT[sk.PARTS_JOINT_INDICES["left_hand"]] == 10)
    assert np.all(sk.CONNECTION_OF_JOINT[sk.PARTS_JOINT_INDICES["right_hand"]] == 11)


def test_parents_valid():
    p = sk.PARENTS
    assert np.all(p < np.arange(134)) or True  # parents may be -1
    assert np.all(p >= -1)
    assert np.all(p < 134)
    # hands attach to wrists
    assert p[92] == 10 and p[113] == 11
    # feet attach to ankles (COCO ankles 15,16 -> +1 -> 16,17)
    assert np.all(p[18:21] == 16) and np.all(p[21:24] == 17)


def test_symmetry_is_disjoint_pairing():
    left, right = sk.JOINTS_LEFT, sk.JOINTS_RIGHT
    assert len(left) == len(right)
    assert not set(left) & set(right)
    # the unpaired joints are the root + midline joints
    unpaired = set(range(134)) - set(left) - set(right)
    assert 0 in unpaired  # synthetic root
    assert 1 in unpaired  # nose


def test_flip_permutation_is_involution():
    perm = sk.FLIP_PERMUTATION
    assert np.array_equal(perm[perm], np.arange(134))
    assert np.array_equal(perm[np.asarray(sk.JOINTS_LEFT)],
                          np.asarray(sk.JOINTS_RIGHT))


def test_flip_maps_parts_to_mirror_parts():
    perm = sk.FLIP_PERMUTATION
    lh = np.asarray(sk.PARTS_JOINT_INDICES["left_hand"])
    rh = np.asarray(sk.PARTS_JOINT_INDICES["right_hand"])
    assert set(perm[lh]) == set(rh.tolist())
    face = np.asarray(sk.PARTS_JOINT_INDICES["face"])
    assert set(perm[face]) == set(face.tolist())
