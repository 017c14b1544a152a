"""Visualization smoke tests (matplotlib Agg) and the draw CLI."""

import os

import numpy as np
import pytest

import matplotlib
matplotlib.use("Agg")

from pafuse_tpu import viz


def test_limb_table_covers_connected_joints():
    children = {c for c, p, _ in viz.LIMBS}
    # every non-face, non-root joint has a bone; face joints are dots
    from pafuse_tpu import skeleton as sk
    expected = {j for j in range(134)
                if sk.PARENTS[j] >= 0}
    assert children == expected


def test_draw_3d_image(tmp_path):
    rng = np.random.RandomState(0)
    preds = rng.randn(2, 3, 2, 134, 3).astype(np.float32)  # (S,H,F,J,3)
    gt = rng.randn(2, 134, 3).astype(np.float32)
    viz.draw_3d_image(preds, gt, str(tmp_path), max_frames=1)
    assert (tmp_path / "frame0_t0.png").exists()
    assert (tmp_path / "frame0_t1.png").exists()


def test_draw_3d_image_select(tmp_path):
    rng = np.random.RandomState(1)
    preds = rng.randn(1, 2, 2, 134, 3).astype(np.float32)
    sel = rng.randn(1, 2, 134, 3).astype(np.float32)
    gt = rng.randn(2, 134, 3).astype(np.float32)
    viz.draw_3d_image_select(preds, sel, gt, str(tmp_path), max_frames=1)
    assert (tmp_path / "select_f0_t0.png").exists()


def test_render_animation_gif(tmp_path):
    rng = np.random.RandomState(2)
    poses = {"Ours": rng.randn(3, 134, 3).astype(np.float32)}
    out = viz.render_animation(poses, fps=5,
                               output=str(tmp_path / "anim.gif"), size=3)
    assert os.path.exists(out)
    assert os.path.getsize(out) > 0


def test_draw_cli(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from pafuse_tpu.cli import draw_h3wb
    draw_h3wb.main([
        "data.synthetic=true", "model.number_of_frames=9", "model.dep=1",
        "ft2d.timestep=20", "ft2d.sampling_timesteps=1",
        "ft2d.num_proposals=2", "viz.viz_subject=S8",
        "viz.viz_action=Walking", "viz.viz_limit=3",
    ])
    plots = list((tmp_path / "plot").rglob("*.png"))
    assert plots, "draw CLI produced no renders"


def test_draw_3d_image_hypotheses(tmp_path):
    rng = np.random.RandomState(3)
    preds = rng.randn(2, 4, 7, 134, 3).astype(np.float32)   # (S,H,F,J,3)
    gt = rng.randn(7, 134, 3).astype(np.float32)
    viz.draw_3d_image_hypotheses(preds, gt, str(tmp_path), frame_skip=5)
    # last step only, frames 0 and 5
    assert (tmp_path / "hyp_f0_t1.png").exists()
    assert (tmp_path / "hyp_f5_t1.png").exists()
    assert not (tmp_path / "hyp_f0_t0.png").exists()
    viz.draw_3d_image_hypotheses(preds, gt, str(tmp_path), frame_skip=5,
                                 steps="all", prefix="all_")
    assert (tmp_path / "all_hyp_f0_t0.png").exists()


def test_render_animation_with_video_backdrop(tmp_path):
    rng = np.random.RandomState(4)
    poses = {"Ours": rng.randn(6, 134, 3).astype(np.float32)}
    kp2d = rng.rand(6, 134, 2).astype(np.float32) * 100
    frames = [np.full((20, 20, 3), i * 20, np.uint8) for i in range(10)]
    out = viz.render_animation(
        poses, fps=10, output=str(tmp_path / "anim.gif"), size=3,
        keypoints_2d=kp2d, viewport=(100, 100),
        input_video_frames=frames, input_video_skip=2, downsample=2)
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_draw_cli_export_and_knobs(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from pafuse_tpu.cli import draw_h3wb
    export = tmp_path / "preds.npy"
    draw_h3wb.main([
        "data.synthetic=true", "model.number_of_frames=9", "model.dep=1",
        "ft2d.timestep=20", "ft2d.sampling_timesteps=1",
        "ft2d.num_proposals=2", "viz.viz_subject=S8",
        "viz.viz_action=Walking", "viz.viz_limit=6",
        "viz.viz_downsample=2", f"viz.viz_export={export}",
    ])
    assert export.exists()
    arr = np.load(export)
    assert arr.shape[-2:] == (134, 3)
    hyp = list((tmp_path / "plot").rglob("hyp_*.png"))
    assert hyp, "no hypothesis renders produced"
    # viz_downsample honored: select renders only on even frames
    sel = sorted(p.name for p in (tmp_path / "plot").rglob("select_f*.png"))
    assert sel and all(int(n.split("_f")[1].split("_")[0]) % 2 == 0
                       for n in sel)
