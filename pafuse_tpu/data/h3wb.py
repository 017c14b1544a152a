"""H3WB dataset: loading, root-joint injection, normalization.

Reference behavior: ``/root/reference/common/h3wb_dataset.py`` and the data
prep in ``main_h3wb.py:613-648``.

Two sources:

* **Real data** — ``<data_dir>/train_h3wb.npz`` + ``task1_test_3d.npz`` in
  the official H3WB release format.
* **Synthetic data** — when the npz files are absent (or forced by config) a
  deterministic synthetic dataset with the same structure is fabricated:
  smooth random 3D motion, projected to 2D through the real H36M cameras, so
  the full pipeline (including reprojection-based J_Agg selection) is
  exercisable without the private dataset.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from pafuse_tpu import geometry, skeleton as sk
from pafuse_tpu.data import cameras as cam_tables


class Human3WBDataset:
    """Container mirroring the reference dataset's public surface.

    ``dataset[subject][action]`` -> dict with keys ``positions`` (global 3D),
    ``positions_3d`` (list per camera, camera space, meters after
    ``prepare_data``), ``pose_2d`` (list per camera, pixels then normalized).
    """

    def __init__(self, data: Dict[str, Dict[str, dict]],
                 cameras: Dict[str, List[dict]], fps: int = 50,
                 joints_left: Optional[List[int]] = None,
                 joints_right: Optional[List[int]] = None):
        self._data = data
        self._cameras = cameras
        self._fps = fps
        self.skeleton_info = sk.H3WB
        self.num_kps = sk.NUM_JOINTS
        self.parts_joint_indices = {k: list(v)
                                    for k, v in sk.PARTS_JOINT_INDICES.items()}
        self.root_indices = dict(sk.ROOT_INDICES)
        self.parts_connection_indices = dict(sk.PARTS_CONNECTION_INDICES)
        # symmetry: npz-metadata-derived when available (exactly the
        # reference's construction, h3wb_dataset.py:27-38), else the static
        # COCO-WholeBody tables
        self.joints_left = list(joints_left if joints_left is not None
                                else sk.JOINTS_LEFT)
        self.joints_right = list(joints_right if joints_right is not None
                                 else sk.JOINTS_RIGHT)
        self.flip_permutation = sk.flip_permutation_from_symmetry(
            self.joints_left, self.joints_right, self.num_kps)
        self.keypoints_metadata = {
            "layout_name": "h3wb",
            "num_joints": self.num_kps,
            "keypoints_symmetry": [list(self.joints_left),
                                   list(self.joints_right)],
        }
        # per-part one-hot indicator vectors (h3wb_dataset.py:73-77); order
        # follows the reference's kps_order
        self.kps_order = ["body", "left_foot", "right_foot", "face",
                          "left_hand", "right_hand"]
        part_ranges = {"body": range(1, 18), "left_foot": range(18, 21),
                       "right_foot": range(21, 24), "face": range(24, 92),
                       "left_hand": range(92, 113),
                       "right_hand": range(113, 134)}
        self.predefined_one_hot_vec = np.zeros(
            (len(self.kps_order), self.num_kps, 1), dtype=np.float32)
        for ind, part in enumerate(self.kps_order):
            self.predefined_one_hot_vec[ind, list(part_ranges[part])] = 1.0

    # reference MocapDataset surface (mocap_dataset.py:11-44)
    def subjects(self):
        return self._data.keys()

    def cameras(self):
        return self._cameras

    def fps(self):
        return self._fps

    def __getitem__(self, subject):
        return self._data[subject]

    def skeleton(self):
        return self.skeleton_info


# ---------------------------------------------------------------------------
# Real-data loading
# ---------------------------------------------------------------------------

def _add_root(poses: np.ndarray, hip_indices=(11, 12)) -> np.ndarray:
    """Insert mid-hip root at joint 0 (h3wb_dataset.py:163-193).

    poses: (F, 133, C) -> (F, 134, C).
    """
    f, j, c = poses.shape
    out = np.zeros((f, j + 1, c), dtype=poses.dtype)
    out[:, 1:] = poses
    out[:, 0] = 0.5 * (poses[:, hip_indices[0]] + poses[:, hip_indices[1]])
    return out


def load_real(data_dir: str) -> Human3WBDataset:
    """Load the official npz files (h3wb_dataset.py:14-136)."""
    path = os.path.join(data_dir, "train_h3wb.npz")
    raw = np.load(path, allow_pickle=True)
    train_data = raw["train_data"].item()
    test_path = os.path.join(data_dir, "task1_test_3d.npz")
    if os.path.exists(test_path):
        test_data = np.load(test_path, allow_pickle=True)["data"].item()
        train_data.update(test_data)

    # Derive flip symmetry from the npz metadata when present — the same
    # construction as the reference (h3wb_dataset.py:27-38), so real-data
    # runs cannot diverge from it.  The static tables stay as a checked
    # fallback for metadata-less files.
    joints_left = joints_right = None
    if "metadata" in getattr(raw, "files", []):
        meta = raw["metadata"].item()
        if "left_side" in meta and "right_side" in meta:
            joints_left, joints_right = sk.symmetry_from_metadata(meta)
            perm = sk.flip_permutation_from_symmetry(
                joints_left, joints_right, sk.NUM_JOINTS)
            if not np.array_equal(perm, sk.FLIP_PERMUTATION):
                print("WARNING: npz-derived flip symmetry differs from the "
                      "static COCO-WholeBody table; using the npz metadata "
                      "(reference behavior).")

    cameras = cam_tables.build_cameras()
    data: Dict[str, Dict[str, dict]] = {}
    for subject, actions in train_data.items():
        data[subject] = {}
        for action, act in actions.items():
            positions = _add_root(np.squeeze(act["global_3d"]))
            positions_3d, pose_2d = [], []
            for cam_id in cam_tables.CAMERA_ORDER_IDS:
                positions_3d.append(_add_root(np.squeeze(act[cam_id]["camera_3d"])))
                pose_2d.append(_add_root(np.squeeze(act[cam_id]["pose_2d"])))
            data[subject][action] = {
                "positions": positions,
                "positions_3d": positions_3d,
                "pose_2d": pose_2d,
            }
    return Human3WBDataset(data, cameras, joints_left=joints_left,
                           joints_right=joints_right)


# ---------------------------------------------------------------------------
# Synthetic data (structure-compatible stand-in)
# ---------------------------------------------------------------------------

def _smooth_noise(rng: np.random.RandomState, frames: int, shape, sigma=8):
    """Low-frequency random walk: gaussian noise smoothed along time."""
    x = rng.randn(frames + 2 * sigma * 3, *shape).astype(np.float32)
    kernel = np.exp(-0.5 * (np.arange(-3 * sigma, 3 * sigma + 1) / sigma) ** 2)
    kernel /= kernel.sum()
    x = np.apply_along_axis(lambda m: np.convolve(m, kernel, mode="valid"), 0, x)
    return x[:frames]


def _synth_pose_track(rng: np.random.RandomState, frames: int) -> np.ndarray:
    """Plausible (F, 134, 3) global pose track in millimeters."""
    # static template: body roughly upright, face/hands clustered near anchors
    template = np.zeros((sk.NUM_JOINTS, 3), dtype=np.float32)
    template[:, 2] = 1000.0
    body_z = np.array([1000, 1600, 1600, 1620, 1620, 1450, 1450, 1250, 1250,
                       1050, 1050, 1000, 1000, 600, 600, 150, 150],
                      dtype=np.float32)
    body_x = np.array([0, -40, 40, -90, 90, -200, 200, -260, 260, -300, 300,
                       -120, 120, -130, 130, -140, 140], dtype=np.float32)
    template[1:18, 2] = body_z
    template[1:18, 0] = body_x
    template[18:21] = template[16] + np.array([[-30, 80, -30]]) * np.arange(1, 4)[:, None] / 3
    template[21:24] = template[17] + np.array([[30, 80, -30]]) * np.arange(1, 4)[:, None] / 3
    face_local = rng.uniform(-80, 80, (68, 3)).astype(np.float32)
    template[24:92] = template[1] + face_local
    lh_local = rng.uniform(-90, 90, (21, 3)).astype(np.float32)
    rh_local = rng.uniform(-90, 90, (21, 3)).astype(np.float32)
    template[92:113] = template[10] + lh_local
    template[113:134] = template[11] + rh_local

    global_drift = _smooth_noise(rng, frames, (3,)) * 300.0          # (F,3)
    jitter = _smooth_noise(rng, frames, (sk.NUM_JOINTS, 3)) * 60.0
    track = template[None] + global_drift[:, None, :] + jitter
    track[..., 1] += 3000.0  # keep in front of cameras
    # keep the root joint = mid-hip invariant (as add_root would produce)
    track[:, 0] = 0.5 * (track[:, 12] + track[:, 13])
    # H3WB physical coincidences: face root == nose, hand roots == wrists
    # (required for exact wb_pose_from_parts round-trips, as in real data)
    track[:, 54] = track[:, 1]
    track[:, 92] = track[:, 10]
    track[:, 113] = track[:, 11]
    return track.astype(np.float32)


def make_synthetic(subjects=("S1", "S5", "S6", "S7", "S8"),
                   actions_per_subject: int = 2,
                   frames_per_action: int = 120,
                   seed: int = 0) -> Human3WBDataset:
    """Fabricate an H3WB-shaped dataset with real camera geometry."""
    from pafuse_tpu.utils.backend import host_compute
    rng = np.random.RandomState(seed)
    cameras = cam_tables.build_cameras(subjects)
    action_names = ["Walking", "Sitting", "Eating", "Posing", "Phoning",
                    "Greeting"]
    data: Dict[str, Dict[str, dict]] = {}
    # host_compute: the per-action geometry below must not dispatch to a
    # (possibly tunneled) accelerator backend -- see utils.backend
    with host_compute():
        _build_synthetic(data, subjects, cameras, rng, actions_per_subject,
                         frames_per_action, action_names)
    return Human3WBDataset(data, cameras)


def _build_synthetic(data, subjects, cameras, rng, actions_per_subject,
                     frames_per_action, action_names):
    for subject in subjects:
        data[subject] = {}
        cams = cameras[subject]
        for a in range(actions_per_subject):
            name = f"{action_names[a % len(action_names)]} {a // len(action_names) + 1}"
            world_mm = _synth_pose_track(rng, frames_per_action)      # mm
            positions_3d, pose_2d = [], []
            for cam in cams:
                cam3d_m = geometry.world_to_camera(
                    world_mm / 1000.0, cam["orientation"], cam["translation"])
                cam3d_m = np.asarray(cam3d_m, dtype=np.float32)
                proj = geometry.project_to_2d(
                    cam3d_m[None], cam["intrinsic"][None])[0]
                px = geometry.image_coordinates(
                    np.asarray(proj, dtype=np.float32),
                    w=cam["res_w"], h=cam["res_h"])
                positions_3d.append(cam3d_m * 1000.0)  # stored in mm like real npz
                pose_2d.append(px.astype(np.float32))
            data[subject][name] = {
                "positions": world_mm,
                "positions_3d": positions_3d,
                "pose_2d": pose_2d,
            }


# ---------------------------------------------------------------------------
# Prep (main_h3wb.py:620-648)
# ---------------------------------------------------------------------------

def prepare_data(dataset: Human3WBDataset) -> Dict[str, Dict[str, List[np.ndarray]]]:
    """In-place mm->m conversion of 3D and screen-normalization of 2D.

    Returns the normalized 2D keypoints dict {subject: {action: [per-cam]}}.
    """
    from pafuse_tpu.utils.backend import host_compute
    keypoints: Dict[str, Dict[str, List[np.ndarray]]] = {}
    with host_compute():  # per-sequence jnp ops stay off the accelerator
        for subject in dataset.subjects():
            keypoints[subject] = {}
            for action in dataset[subject].keys():
                anim = dataset[subject][action]
                anim["positions_3d"] = [
                    (p / 1000.0).astype(np.float32)
                    for p in anim["positions_3d"]]
                kps_list = []
                for cam_idx, kps in enumerate(anim["pose_2d"]):
                    cam = dataset.cameras()[subject][cam_idx]
                    kps = kps.astype(np.float32)
                    kps[..., :2] = geometry.normalize_screen_coordinates(
                        kps[..., :2], w=cam["res_w"], h=cam["res_h"])
                    kps_list.append(kps)
                anim["pose_2d"] = kps_list
                keypoints[subject][action] = kps_list
    return keypoints


def load_dataset(data_dir: str = "data", synthetic: str | bool = "auto",
                 **synth_kwargs) -> Human3WBDataset:
    """Load real data if present, else synthesize (per ``data.synthetic``)."""
    real_exists = os.path.exists(os.path.join(data_dir, "train_h3wb.npz"))
    if synthetic is True or (str(synthetic) == "auto" and not real_exists):
        return make_synthetic(**synth_kwargs)
    if not real_exists:
        raise FileNotFoundError(
            f"train_h3wb.npz not found under {data_dir!r} and synthetic data "
            "disabled")
    return load_real(data_dir)


def fetch(subjects, keypoints, dataset, stride: int = 1, action_filter=None,
          subset: float = 1.0, parse_3d_poses: bool = True):
    """Select per-(subject, action, camera) arrays (main_h3wb.py:57-118)."""
    from pafuse_tpu.utils.misc import deterministic_random

    out_poses_3d, out_poses_2d, out_cams = [], [], []
    for subject in subjects:
        for action in keypoints[subject].keys():
            if action_filter is not None and not any(
                    action.startswith(a) for a in action_filter):
                continue
            poses_2d = keypoints[subject][action]
            out_poses_2d.extend(poses_2d)
            if subject in dataset.cameras():
                cams = dataset.cameras()[subject]
                assert len(cams) == len(poses_2d), "Camera count mismatch"
                out_cams.extend(c["intrinsic"] for c in cams if "intrinsic" in c)
            if parse_3d_poses and "positions_3d" in dataset[subject][action]:
                poses_3d = dataset[subject][action]["positions_3d"]
                assert len(poses_3d) == len(poses_2d), "Camera count mismatch"
                out_poses_3d.extend(poses_3d)

    if not out_cams:
        out_cams = None
    if not out_poses_3d:
        out_poses_3d = None

    if subset < 1:
        for i in range(len(out_poses_2d)):
            n_frames = int(round(len(out_poses_2d[i]) // stride * subset) * stride)
            start = deterministic_random(
                0, len(out_poses_2d[i]) - n_frames + 1, str(len(out_poses_2d[i])))
            out_poses_2d[i] = out_poses_2d[i][start:start + n_frames:stride]
            if out_poses_3d is not None:
                out_poses_3d[i] = out_poses_3d[i][start:start + n_frames:stride]
    elif stride > 1:
        for i in range(len(out_poses_2d)):
            out_poses_2d[i] = out_poses_2d[i][::stride]
            if out_poses_3d is not None:
                out_poses_3d[i] = out_poses_3d[i][::stride]

    return out_cams, out_poses_3d, out_poses_2d


def fetch_actions(actions, keypoints, dataset, stride: int = 1):
    """Select arrays for a list of (subject, action) pairs
    (main_h3wb.py:533-564)."""
    out_poses_3d, out_poses_2d, out_cams = [], [], []
    for subject, action in actions:
        poses_2d = keypoints[subject][action]
        out_poses_2d.extend(poses_2d)
        poses_3d = dataset[subject][action]["positions_3d"]
        assert len(poses_3d) == len(poses_2d), "Camera count mismatch"
        out_poses_3d.extend(poses_3d)
        if subject in dataset.cameras():
            cams = dataset.cameras()[subject]
            out_cams.extend(c["intrinsic"] for c in cams if "intrinsic" in c)
    if stride > 1:
        for i in range(len(out_poses_2d)):
            out_poses_2d[i] = out_poses_2d[i][::stride]
            out_poses_3d[i] = out_poses_3d[i][::stride]
    return out_cams, out_poses_3d, out_poses_2d
