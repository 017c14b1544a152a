"""Real-data-format coverage without the private datasets:

* fabricate a ``train_h3wb.npz`` + ``task1_test_3d.npz`` in the official
  release structure and exercise ``h3wb.load_real``;
* fabricate a reference-style torch ``.bin`` checkpoint and load it through
  the CLI checkpoint path (``general.evaluate=*.bin``).
"""

import os

import numpy as np
import pytest
import jax

from pafuse_tpu import checkpoints, skeleton as sk
from pafuse_tpu.data import h3wb


def _realistic_action(rng, frames, cams):
    """One action in the official npz layout whose CONTENT is drawn from the
    same generative process as the synthetic training data
    (``h3wb._synth_pose_track`` + real H36M camera projection): smooth pose
    tracks, body-plausible joint layout, true intrinsics/extrinsics.  Joint 0
    (the injected root) is stripped back to the 133-joint release layout; the
    loaders re-inject it as mid-hip (h3wb_dataset.py:163-193), which is exact
    because the track keeps root == mid-hip by construction.

    Purpose: rehearse the ±0.5 mm parity harness at a checkpoint's REAL
    operating regime (~40-60 mm for the e80 flagship) instead of the
    off-distribution randn regime (~580 mm) the plain fabrication gives.
    """
    from pafuse_tpu import geometry
    from pafuse_tpu.data import h3wb as h3wb_mod

    track = h3wb_mod._synth_pose_track(rng, frames)     # (F, 134, 3) mm, world
    d = {"global_3d": track[:, 1:].copy(),
         "frame_id": np.arange(frames)}
    for cam in cams:
        cam3d_m = geometry.world_to_camera(
            track / 1000.0, cam["orientation"], cam["translation"])
        cam3d_m = np.asarray(cam3d_m, dtype=np.float32)
        proj = geometry.project_to_2d(cam3d_m[None], cam["intrinsic"][None])[0]
        px = geometry.image_coordinates(
            np.asarray(proj, dtype=np.float32),
            w=cam["res_w"], h=cam["res_h"]).astype(np.float32)
        d[cam["id"]] = {"camera_3d": (cam3d_m * 1000.0)[:, 1:],
                        "pose_2d": px[:, 1:],
                        "sample_id": np.arange(frames)}
    return d


def _make_reference_npz(tmp_path, frames=12,
                        test_actions=("Posing 1",),
                        realistic=False, seed=None):
    """Write npz files shaped like the official H3WB release
    (h3wb_dataset.py:17-24, 123-132): 133 joints, per-camera dicts.

    ``realistic=True`` fills them with training-distribution pose tracks
    (see ``_realistic_action``) instead of raw randn; ``seed`` defaults to 0
    (plain) / 977 (realistic — distinct from the training stream's seed 0 so
    rehearsal sequences are never literal training sequences).
    """
    rng = np.random.RandomState((977 if realistic else 0)
                                if seed is None else seed)
    cam_ids = ["54138969", "55011271", "58860488", "60457274"]

    if realistic:
        from pafuse_tpu.data import cameras as cam_tables
        from pafuse_tpu.utils.backend import host_compute
        cameras = cam_tables.build_cameras(("S1", "S5", "S8"))

        def action(subject="S8"):
            with host_compute():
                return _realistic_action(rng, frames, cameras[subject])
    else:
        def action(subject="S8"):
            d = {"global_3d": rng.randn(frames, 133, 3).astype(np.float32) * 100,
                 "frame_id": np.arange(frames)}
            for cam in cam_ids:
                d[cam] = {
                    "camera_3d": rng.randn(frames, 133, 3).astype(np.float32) * 100,
                    "pose_2d": rng.rand(frames, 133, 2).astype(np.float32) * 1000,
                    "sample_id": np.arange(frames),
                }
            return d

    train_data = {"S1": {"Walking 1": action("S1")},
                  "S5": {"Sitting 1": action("S5")}}
    # full metadata record in the official layout: 0-based part lists over
    # the 133 pre-root joints, side lists (the reference shifts them by +1
    # itself, h3wb_dataset.py:34-38), and per-subject camera entries
    metadata = {
        "left_side": [j - 1 for j in sk.JOINTS_LEFT],
        "right_side": [j - 1 for j in sk.JOINTS_RIGHT],
        "body": list(range(17)),
        "left_foot": [17, 18, 19], "right_foot": [20, 21, 22],
        "face": list(range(23, 91)),
        "left_hand": list(range(91, 112)),
        "right_hand": list(range(112, 133)),
    }
    for subj in ("S1", "S5", "S8"):
        metadata[subj] = {cam: {"id": cam} for cam in cam_ids}
    np.savez(tmp_path / "train_h3wb.npz",
             train_data=np.array(train_data, dtype=object),
             metadata=np.array(metadata, dtype=object))
    test_data = {"S8": {name: action("S8") for name in test_actions}}
    np.savez(tmp_path / "task1_test_3d.npz",
             data=np.array(test_data, dtype=object))


def test_load_real_format(tmp_path):
    _make_reference_npz(tmp_path)
    ds = h3wb.load_real(str(tmp_path))
    assert set(ds.subjects()) == {"S1", "S5", "S8"}
    anim = ds["S1"]["Walking 1"]
    # root injected: 133 -> 134
    assert anim["positions"].shape == (12, 134, 3)
    assert len(anim["positions_3d"]) == 4
    assert anim["positions_3d"][0].shape == (12, 134, 3)
    assert anim["pose_2d"][0].shape == (12, 134, 2)
    # root = mid-hip of the original joints 11/12 (now 12/13)
    p = anim["positions_3d"][0]
    np.testing.assert_allclose(p[:, 0], 0.5 * (p[:, 12] + p[:, 13]),
                               atol=1e-4)
    # S8 merged from the test npz
    assert "Posing 1" in ds["S8"]

    kps = h3wb.prepare_data(ds)
    assert np.abs(kps["S1"]["Walking 1"][0]).max() < 3  # normalized

    # flip symmetry derived from npz metadata matches the static tables
    assert ds.joints_left == list(sk.JOINTS_LEFT)
    assert ds.joints_right == list(sk.JOINTS_RIGHT)
    np.testing.assert_array_equal(ds.flip_permutation, sk.FLIP_PERMUTATION)


def test_realistic_npz_mode(tmp_path):
    """The realistic fabrication must produce loadable release-format npz
    whose content matches the synthetic-training distribution: root == mid-hip
    after injection, 2D inside the image frame, camera_3d consistent with the
    world track through the real extrinsics."""
    from pafuse_tpu import geometry
    from pafuse_tpu.data import cameras as cam_tables

    _make_reference_npz(tmp_path, frames=8, realistic=True)
    ds = h3wb.load_real(str(tmp_path))
    anim = ds["S8"]["Posing 1"]
    p3d = anim["positions_3d"][0]
    assert p3d.shape == (8, 134, 3)
    # root re-injected == mid-hip (exact: the track keeps the coincidence)
    np.testing.assert_allclose(p3d[:, 0], 0.5 * (p3d[:, 12] + p3d[:, 13]),
                               atol=1e-4)
    # 2D lands inside the image frame (real projection, not randn)
    cam = ds.cameras()["S8"][0]
    px = anim["pose_2d"][0]
    assert px.min() > -200 and px[..., 0].max() < cam["res_w"] + 200
    # camera_3d is the world track through the real extrinsics (mm)
    world = anim["positions"]
    expect = np.asarray(geometry.world_to_camera(
        world / 1000.0, cam["orientation"], cam["translation"])) * 1000.0
    np.testing.assert_allclose(p3d, expect, atol=0.5)  # mm; f32 round-trip
    # part coincidences the model was trained with (face root == nose, ...)
    np.testing.assert_allclose(world[:, 54], world[:, 1], atol=1e-3)
    np.testing.assert_allclose(world[:, 92], world[:, 10], atol=1e-3)


def test_load_real_follows_npz_symmetry_order(tmp_path, capsys):
    """If the npz metadata pairs joints differently from our static tables,
    the loader must follow the npz (reference behavior), not the tables."""
    _make_reference_npz(tmp_path)
    # rewrite metadata with a deliberately different pairing: swap the
    # element order of the right list's first two entries
    raw = np.load(tmp_path / "train_h3wb.npz", allow_pickle=True)
    meta = raw["metadata"].item()
    right = list(meta["right_side"])
    right[0], right[1] = right[1], right[0]
    meta["right_side"] = right
    np.savez(tmp_path / "train_h3wb.npz",
             train_data=raw["train_data"],
             metadata=np.array(meta, dtype=object))
    ds = h3wb.load_real(str(tmp_path))
    assert ds.joints_right[0] == right[0] + 1
    assert not np.array_equal(ds.flip_permutation, sk.FLIP_PERMUTATION)
    assert "WARNING" in capsys.readouterr().out


def test_load_dataset_auto_prefers_real(tmp_path):
    _make_reference_npz(tmp_path)
    ds = h3wb.load_dataset(str(tmp_path), synthetic="auto")
    assert "Walking 1" in ds["S1"]  # real, not the synthetic action set


def test_torch_bin_checkpoint_via_cli(tmp_path, monkeypatch):
    """Write a reference-format .bin and evaluate it through the CLI."""
    import torch
    from pafuse_tpu.cli.main_h3wb import build_model
    from pafuse_tpu import config as cfg_mod

    args = cfg_mod.load_config(overrides=[
        "model.number_of_frames=9", "model.dep=1", "ft2d.timestep=20"])
    model = build_model(args, is_train=False, num_proposals=1,
                        sampling_timesteps=1)
    params = model.init_params(jax.random.PRNGKey(3))
    sd = checkpoints.export_torch_state_dict(params)
    bin_path = tmp_path / "pafuse_model.bin"
    torch.save({"model_pos": {k: torch.from_numpy(v) for k, v in sd.items()},
                "epoch": 77, "lr": 1e-5}, str(bin_path))

    restored = checkpoints.load_torch_checkpoint(str(bin_path), params)
    assert restored["epoch"] == 77
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    # full CLI eval run loading the .bin (debug mode)
    monkeypatch.chdir(tmp_path)
    from pafuse_tpu.cli import main_h3wb
    main_h3wb.main([
        "data.synthetic=true", "model.number_of_frames=9", "model.dep=1",
        "ft2d.timestep=20", "ft2d.sampling_timesteps=1",
        "ft2d.num_proposals=1", "ft2d.debug=true", "general.nolog=true",
        f"general.evaluate={bin_path}",
        f"general.checkpoint={tmp_path}/out",
    ])
    assert os.path.exists(tmp_path / "out" / "h36m_test_log_H1_K1.txt")
