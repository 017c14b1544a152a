"""MPI-INF-3DHP dataset path (17-joint body-only variant).

Reference behavior: the orphaned 3DHP stack
(``/root/reference/common/diffusionpose_3dhp.py`` +
``common/generators_3dhp.py``), rebuilt here as a first-class model family
per BASELINE.json config #3.

Data format: the standard P-STMO-style npz files
(``data_train_3dhp.npz``/``data_test_3dhp.npz``) hold dicts keyed by
(subject, sequence) with per-camera 2D/3D arrays in millimeters; the test set
carries per-frame validity masks.  A deterministic synthetic fallback with
the same structure is provided.

Differences vs the H3WB path, all handled by config:
  * 17 joints, single (monolithic) MixSTE2, channel size ``model.cs``;
  * model operates in meters internally, data/metrics in millimeters
    (``mm_scale``, diffusionpose_3dhp.py:212, 256, 281-287);
  * eval uses per-frame ``valid_frame`` masks
    (losses.mpjpe_diffusion_3dhp; generators_3dhp.py:198-258).
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np

from pafuse_tpu import skeleton as sk

NUM_JOINTS = sk.NUM_JOINTS_3DHP  # 17


def _smooth(rng: np.random.RandomState, frames: int, shape, sigma=6):
    x = rng.randn(frames + 6 * sigma, *shape).astype(np.float32)
    k = np.exp(-0.5 * (np.arange(-3 * sigma, 3 * sigma + 1) / sigma) ** 2)
    k /= k.sum()
    x = np.apply_along_axis(lambda m: np.convolve(m, k, mode="valid"), 0, x)
    return x[:frames]


def make_synthetic(num_train_seqs: int = 3, num_test_seqs: int = 2,
                   frames: int = 80, seed: int = 0):
    """Synthetic 3DHP-shaped data: returns (train, test) dicts.

    train[(subject, seq)] = {'data_2d': (F,17,2) normalized,
                             'data_3d': (F,17,3) mm}
    test[seq] = {... , 'valid': (F,) bool}
    """
    rng = np.random.RandomState(seed)

    def seq(f):
        base = rng.uniform(-500, 500, (NUM_JOINTS, 3)).astype(np.float32)
        track = base[None] + _smooth(rng, f, (NUM_JOINTS, 3)) * 120.0
        track = track - track[:, :1]  # root-relative, mm
        p2 = track[..., :2] / 2000.0 + _smooth(rng, f, (NUM_JOINTS, 2)) * 0.01
        return p2.astype(np.float32), track.astype(np.float32)

    train = {}
    for i in range(num_train_seqs):
        p2, p3 = seq(frames)
        train[(f"S{i + 1}", f"Seq{i % 2 + 1}")] = {"data_2d": p2, "data_3d": p3}
    test = {}
    for i in range(num_test_seqs):
        p2, p3 = seq(frames)
        valid = np.ones(frames, dtype=bool)
        valid[rng.rand(frames) < 0.1] = False
        test[f"TS{i + 1}"] = {"data_2d": p2, "data_3d": p3, "valid": valid}
    return train, test


def load_dataset(data_dir: str = "data", synthetic: str | bool = "auto",
                 **kwargs):
    """Load real 3DHP npz files when present, else synthesize."""
    train_path = os.path.join(data_dir, "data_train_3dhp.npz")
    test_path = os.path.join(data_dir, "data_test_3dhp.npz")
    real = os.path.exists(train_path) and os.path.exists(test_path)
    if synthetic is True or (str(synthetic) == "auto" and not real):
        return make_synthetic(**kwargs)
    if not real:
        raise FileNotFoundError(f"3DHP npz files not found under {data_dir!r}")

    raw_train = np.load(train_path, allow_pickle=True)["data"].item()
    raw_test = np.load(test_path, allow_pickle=True)["data"].item()
    train = {}
    for key, cams in raw_train.items():
        # key: (subject, seq); cams: {cam_idx: {'data_2d':…, 'data_3d':…}}
        for cam_idx, arrs in cams.items():
            train[(key[0], f"{key[1]}_cam{cam_idx}")] = {
                "data_2d": np.asarray(arrs["data_2d"], np.float32),
                "data_3d": np.asarray(arrs["data_3d"], np.float32),
            }
    test = {}
    for seq, arrs in raw_test.items():
        test[seq] = {
            "data_2d": np.asarray(arrs["data_2d"], np.float32),
            "data_3d": np.asarray(arrs["data_3d"], np.float32),
            "valid": np.asarray(arrs.get("valid", arrs.get("valid_frame")),
                                bool).reshape(-1),
        }
    return train, test


def train_arrays(train: Dict) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    p3 = [v["data_3d"] for v in train.values()]
    p2 = [v["data_2d"] for v in train.values()]
    return p3, p2
