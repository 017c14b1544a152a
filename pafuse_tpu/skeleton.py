"""H3WB (Human3.6M WholeBody) skeleton metadata as static constants.

The reference implementation (``/root/reference/common/h3wb_dataset.py:14-213``)
derives this metadata at runtime from the ``train_h3wb.npz`` metadata record.
We precompute it once: the H3WB layout is the COCO-WholeBody 133-keypoint
layout with a synthetic root joint (mid-hip) inserted at index 0, giving 134
joints.

Joint layout (0-based, root added):

====================  ==========  =====
part                  indices     count
====================  ==========  =====
root (synthetic)      0           1
body (COCO-17)        1..17       17
left foot             18..20      3
right foot            21..23      3
face (iBUG-68)        24..91      68
left hand             92..112     21
right hand            113..133    21
====================  ==========  =====

Part grouping, per-part roots and body attachment points follow
``h3wb_dataset.py:49-61,198-213`` exactly.  The left/right symmetry tables are
built from the COCO-WholeBody conventions (the reference reads them from the
npz metadata; the *pairing* below is the standard mirror correspondence for
COCO body joints, feet, iBUG-68 face landmarks and the 21-point hand layout).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import numpy as np

NUM_JOINTS = 134
ROOT_INDEX = 0

# ---------------------------------------------------------------------------
# Part index tables (reference: h3wb_dataset.py:198-213  compute_part_joint_indices)
# ---------------------------------------------------------------------------

_BODY = list(range(1, 18))          # COCO body 17
_LEFT_FOOT = [18, 19, 20]
_RIGHT_FOOT = [21, 22, 23]
_FACE = list(range(24, 92))         # 68 landmarks
_LEFT_HAND = list(range(92, 113))   # 21
_RIGHT_HAND = list(range(113, 134))  # 21

#: dict part -> list of joint indices.  ``body`` includes the synthetic root
#: and both feet, mirroring h3wb_dataset.py:206-213.
PARTS_JOINT_INDICES: Dict[str, List[int]] = {
    "body": [ROOT_INDEX] + _BODY + _LEFT_FOOT + _RIGHT_FOOT,   # 24 joints
    "face": list(_FACE),                                        # 68 joints
    "left_hand": list(_LEFT_HAND),                              # 21 joints
    "right_hand": list(_RIGHT_HAND),                            # 21 joints
}

#: per-part root joint (reference: h3wb_dataset.py:49-54).  Joint 54 is the
#: nose tip (face landmark #30), 92/113 are the wrists of each hand part.
ROOT_INDICES: Dict[str, int] = {
    "body": 0,
    "face": 54,
    "left_hand": 92,
    "right_hand": 113,
}

#: body joints the non-body parts re-attach to (reference: h3wb_dataset.py:57-61):
#: nose (1), left wrist (10), right wrist (11).
PARTS_CONNECTION_INDICES: Dict[str, int] = {
    "face": 1,
    "left_hand": 10,
    "right_hand": 11,
}


def merged_parts_joint_indices() -> Dict[str, List[int]]:
    """Part table with both hands merged into one ``hands`` entry.

    Mirrors the ``data.merge_hands`` branch in diffusionpose.py:77-83.
    """
    return {
        "body": list(PARTS_JOINT_INDICES["body"]),
        "face": list(PARTS_JOINT_INDICES["face"]),
        "hands": list(PARTS_JOINT_INDICES["left_hand"])
        + list(PARTS_JOINT_INDICES["right_hand"]),
    }


def parts_table(merge_hands: bool) -> Dict[str, List[int]]:
    return merged_parts_joint_indices() if merge_hands else {
        k: list(v) for k, v in PARTS_JOINT_INDICES.items()
    }


# ---------------------------------------------------------------------------
# Per-joint root/connection lookup tables — the TPU-friendly reformulation.
#
# The reference centers parts with a python loop over parts + fancy-index
# writes (common/utils.py:95-126).  On TPU we express both operations as a
# single gather:
#   centered[j]  = pose[j] - pose[PART_ROOT_OF_JOINT[j]]
#   assembled[j] = part_pose[j] + part_pose[CONNECTION_OF_JOINT[j]]
# which XLA compiles to one fused gather/subtract with no scatter.
# ---------------------------------------------------------------------------

def _build_root_of_joint() -> np.ndarray:
    table = np.zeros(NUM_JOINTS, dtype=np.int32)
    for part, joints in PARTS_JOINT_INDICES.items():
        table[joints] = ROOT_INDICES[part]
    return table


def _build_connection_of_joint() -> np.ndarray:
    # body joints attach to the global root (0); others to their body anchor.
    table = np.zeros(NUM_JOINTS, dtype=np.int32)
    for part, joints in PARTS_JOINT_INDICES.items():
        table[joints] = PARTS_CONNECTION_INDICES.get(part, 0)
    return table


#: PART_ROOT_OF_JOINT[j] = index of the root of the part that owns joint j.
PART_ROOT_OF_JOINT: np.ndarray = _build_root_of_joint()
#: CONNECTION_OF_JOINT[j] = body joint that part-local joint j re-attaches to.
CONNECTION_OF_JOINT: np.ndarray = _build_connection_of_joint()


# ---------------------------------------------------------------------------
# Parent table (reference: h3wb_dataset.py:138-161 prepare_skeleton, root_added=True)
# ---------------------------------------------------------------------------

def _build_parents() -> np.ndarray:
    body = [-1, -1, -1, -1, -1, -1, 0, 0, 6, 7, 8, 9, 0, 0, 12, 13, 14, 15]
    left_foot = [15, 15, 15]
    right_foot = [16, 16, 16]
    face = [-1] * 68
    left_hand = [9, 91, 92, 93, 94, 91, 96, 97, 98, 91, 100, 101, 102, 91,
                 104, 105, 106, 91, 108, 109, 110]
    right_hand = [10, 112, 113, 114, 115, 112, 117, 118, 119, 112, 121, 122,
                  123, 112, 125, 126, 127, 112, 129, 130, 131]
    shift = lambda xs: [x + 1 for x in xs]  # noqa: E731  (root inserted at 0)
    parents = (body + shift(left_foot) + shift(right_foot) + face
               + shift(left_hand) + shift(right_hand))
    return np.asarray(parents, dtype=np.int32)


PARENTS: np.ndarray = _build_parents()


# ---------------------------------------------------------------------------
# Left/right symmetry (mirror correspondence), used for flip augmentation and
# flip test-time augmentation.  JOINTS_LEFT[i] mirrors JOINTS_RIGHT[i].
# ---------------------------------------------------------------------------

def _build_symmetry() -> Tuple[List[int], List[int]]:
    left: List[int] = []
    right: List[int] = []

    # COCO body: (left, right) pairs, +1 for the root offset.
    body_pairs = [(1, 2), (3, 4), (5, 6), (7, 8), (9, 10), (11, 12),
                  (13, 14), (15, 16)]
    for l, r in body_pairs:
        left.append(l + 1)
        right.append(r + 1)

    # Feet.
    for l, r in zip(_LEFT_FOOT, _RIGHT_FOOT):
        left.append(l)
        right.append(r)

    # iBUG-68 face mirror pairs (local 0-based landmark ids); the first entry
    # of each pair is on the subject's RIGHT side.
    face_pairs_rl = (
        [(i, 16 - i) for i in range(8)]            # jaw contour
        + [(17 + i, 26 - i) for i in range(5)]     # eyebrows
        + [(31, 35), (32, 34)]                     # nostrils
        + [(36, 45), (37, 44), (38, 43), (39, 42), (40, 47), (41, 46)]  # eyes
        + [(48, 54), (49, 53), (50, 52), (59, 55), (58, 56)]  # outer lips
        + [(60, 64), (61, 63), (67, 65)]           # inner lips
    )
    face_off = _FACE[0]
    for r, l in face_pairs_rl:
        left.append(l + face_off)
        right.append(r + face_off)

    # Hands: elementwise correspondence.
    for l, r in zip(_LEFT_HAND, _RIGHT_HAND):
        left.append(l)
        right.append(r)

    return left, right


JOINTS_LEFT, JOINTS_RIGHT = _build_symmetry()


def flip_permutation_from_symmetry(joints_left, joints_right,
                                   num_joints: int = NUM_JOINTS) -> np.ndarray:
    """Permutation P with P[left]=right, P[right]=left, identity elsewhere —
    lets flip be a single gather instead of two fancy-index writes."""
    perm = np.arange(num_joints, dtype=np.int32)
    perm[np.asarray(joints_left)] = np.asarray(joints_right, dtype=np.int32)
    perm[np.asarray(joints_right)] = np.asarray(joints_left, dtype=np.int32)
    return perm


def symmetry_from_metadata(metadata, add_root: bool = True):
    """Rebuild ``joints_left/right`` exactly as the reference constructor does
    from the npz metadata record (h3wb_dataset.py:27-38): keypoints listed on
    *both* sides (midline) are dropped from both lists, then every index is
    shifted by 1 when the synthetic root is injected at joint 0.

    Element order is preserved from the metadata lists — the pairing
    ``left[i] <-> right[i]`` is whatever the upstream H3WB release defines,
    which is what flip augmentation and flip-TTA must follow on real data.
    """
    joints_left = list(metadata["left_side"])
    joints_right = list(metadata["right_side"])
    dups = [kp for kp in joints_left if kp in joints_right]
    offset = 1 if add_root else 0
    left = [int(ele) + offset for ele in joints_left if ele not in dups]
    right = [int(ele) + offset for ele in joints_right if ele not in dups]
    return left, right


FLIP_PERMUTATION: np.ndarray = flip_permutation_from_symmetry(
    JOINTS_LEFT, JOINTS_RIGHT)

#: 133-keypoint (no synthetic root) variant for ``data.num_kps=133`` runs:
#: same mirror pairs shifted down by the root offset (the root pairs with
#: nothing, so dropping it keeps the permutation valid).
FLIP_PERMUTATION_NO_ROOT: np.ndarray = flip_permutation_from_symmetry(
    [j - 1 for j in JOINTS_LEFT], [j - 1 for j in JOINTS_RIGHT],
    num_joints=NUM_JOINTS - 1)


# ---------------------------------------------------------------------------
# Container used by code that needs "a dataset-like metadata object" without
# loading any data (mirrors the attributes of Human3WBDataset the model uses).
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SkeletonInfo:
    """Static skeleton/part metadata consumed by the model and metrics."""

    num_joints: int = NUM_JOINTS
    parents: np.ndarray = dataclasses.field(default_factory=lambda: PARENTS.copy())
    joints_left: Tuple[int, ...] = tuple(JOINTS_LEFT)
    joints_right: Tuple[int, ...] = tuple(JOINTS_RIGHT)
    root_indices: Dict[str, int] = dataclasses.field(
        default_factory=lambda: dict(ROOT_INDICES))
    parts_connection_indices: Dict[str, int] = dataclasses.field(
        default_factory=lambda: dict(PARTS_CONNECTION_INDICES))
    parts_joint_indices: Dict[str, List[int]] = dataclasses.field(
        default_factory=lambda: {k: list(v) for k, v in PARTS_JOINT_INDICES.items()})

    @property
    def flip_permutation(self) -> np.ndarray:
        return FLIP_PERMUTATION.copy()

    @property
    def part_root_of_joint(self) -> np.ndarray:
        return PART_ROOT_OF_JOINT.copy()

    @property
    def connection_of_joint(self) -> np.ndarray:
        return CONNECTION_OF_JOINT.copy()

    def parts(self, merge_hands: bool = True) -> Dict[str, List[int]]:
        return parts_table(merge_hands)


H3WB = SkeletonInfo()

# 17-joint Human3.6M-style layout for the MPI-INF-3DHP body-only variant
# (reference: common/diffusionpose_3dhp.py).  Indices follow the H36M-17
# convention used by the reference's 3DHP path.
NUM_JOINTS_3DHP = 17
JOINTS_LEFT_3DHP = [5, 6, 7, 11, 12, 13]
JOINTS_RIGHT_3DHP = [2, 3, 4, 8, 9, 10]
FLIP_PERMUTATION_3DHP: np.ndarray = np.arange(NUM_JOINTS_3DHP, dtype=np.int32)
FLIP_PERMUTATION_3DHP[np.asarray(JOINTS_LEFT_3DHP)] = np.asarray(JOINTS_RIGHT_3DHP)
FLIP_PERMUTATION_3DHP[np.asarray(JOINTS_RIGHT_3DHP)] = np.asarray(JOINTS_LEFT_3DHP)
