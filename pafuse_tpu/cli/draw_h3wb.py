"""Qualitative H3WB rendering: GT vs J-Agg-selected predictions per frame.

Reference behavior: ``/root/reference/main_draw_h3wb.py`` (hydra main,
33-674): evaluate one (subject, action, camera) sequence with
return_predictions, stitch windows back to a timeline, re-add the GT
trajectory, convert to world coordinates, reproject hypotheses, render
GT + selected pose per frame/DDIM step into ``./plot``.

Usage:
    python -m pafuse_tpu.cli.draw_h3wb viz.viz_subject=S8 \
        viz.viz_action=Sitting viz.viz_camera=0 general.evaluate=best.npz
"""

from __future__ import annotations

import os
import sys

import numpy as np

from pafuse_tpu import config as cfg_mod


def main(argv=None):
    args = cfg_mod.parse_cli(argv if argv is not None else sys.argv[1:])
    if args.viz.compare:
        # the reference's compare branch imports common.model_poseformer,
        # which does not exist in its repo (main_draw_h3wb.py:397-398 —
        # viz.compare=true crashes there too); hard-error instead of
        # silently ignoring the knob
        raise ValueError(
            "viz.compare is not supported: the reference's PoseFormer "
            "comparison path is broken/legacy (missing "
            "common/model_poseformer)")

    import jax
    import jax.numpy as jnp
    from pafuse_tpu import checkpoints, geometry, viz
    from pafuse_tpu.utils.backend import ensure_backend
    ensure_backend()
    from pafuse_tpu.cli.main_h3wb import build_model
    from pafuse_tpu.data import h3wb, windows as win

    dataset = h3wb.load_dataset(args.data.data_dir, args.data.synthetic)
    keypoints = h3wb.prepare_data(dataset)

    subject = args.viz.viz_subject
    cam_idx = int(args.viz.viz_camera)
    action = args.viz.viz_action
    # allow prefix matching ('Sitting' -> 'Sitting 1')
    actions = [a for a in dataset[subject].keys() if a.startswith(action)]
    if not actions:
        raise SystemExit(f"No action matching {action!r} for {subject}")
    action = actions[0]
    print(f"Rendering {subject}/{action} camera {cam_idx}")

    model = build_model(args, is_train=False,
                        num_proposals=args.ft2d.num_proposals,
                        sampling_timesteps=args.ft2d.sampling_timesteps,
                        flip_permutation=getattr(dataset, "flip_permutation",
                                                 None))
    params = model.init_params(jax.random.PRNGKey(0))
    chk = args.general.evaluate or args.general.resume
    if chk:
        chk_path = os.path.join(args.general.checkpoint, chk)
        if not os.path.exists(chk_path):
            chk_path = chk
        print("Loading checkpoint", chk_path)
        if chk_path.endswith(".bin"):
            params = checkpoints.load_torch_checkpoint(
                chk_path, params,
                part_based=args.general.part_based_model)["params"]
        else:
            params = checkpoints.load_state(chk_path, params)["params"]

    cam = dataset.cameras()[subject][cam_idx]
    seq_2d = keypoints[subject][action][cam_idx]
    seq_3d = dataset[subject][action]["positions_3d"][cam_idx]
    rf = args.model.number_of_frames
    total = seq_2d.shape[0]
    if args.viz.viz_limit and args.viz.viz_limit > 0:
        total = min(total, int(args.viz.viz_limit))
        seq_2d, seq_3d = seq_2d[:total], seq_3d[:total]

    # windowed flip-TTA sampling (same path as in-the-wild lifting)
    flip = geometry.flip_pose_np(seq_2d, model.flip_permutation)
    w2d, w3d = win.eval_data_prepare(rf, seq_2d, seq_3d)
    w2d_flip, _ = win.eval_data_prepare(rf, flip)
    traj = w3d[:, :, :1].copy()

    @jax.jit
    def sample(params, key, x2d, x2d_flip):
        preds = model.eval_forward(params, key, x2d, x2d_flip)
        return geometry.wb_pose_from_parts(preds)

    preds = np.asarray(sample(params, jax.random.PRNGKey(0),
                              jnp.asarray(w2d), jnp.asarray(w2d_flip)))
    # re-add GT trajectory (main_draw_h3wb.py:430-437)
    preds_abs = preds + traj[:, None, None]

    # (W,S,H,F,J,3) -> stitched (S,H,T,J,3)
    stitched = win.stitch_windows(preds_abs.transpose(1, 2, 0, 3, 4, 5),
                                  total, rf)
    gt_abs = seq_3d

    # J-Agg selection: reproject all hypotheses, pick per-joint hypothesis
    # minimizing 2D error (main_draw_h3wb.py:462-467)
    from pafuse_tpu.utils.backend import host_compute
    S, H = stitched.shape[:2]
    with host_compute():   # host-side post-processing off the accelerator
        reproj = np.asarray(geometry.project_to_2d(
            stitched.reshape(S * H * total, 134, 3),
            np.tile(cam["intrinsic"][None], (S * H * total, 1))))
    reproj = reproj.reshape(S, H, total, 134, 2)
    err2d = np.linalg.norm(reproj - seq_2d[None, None], axis=-1)  # S,H,T,J
    sel = err2d.argmin(axis=1)                                    # S,T,J
    selected = np.take_along_axis(
        stitched, sel[:, None, :, :, None], axis=1)[:, 0]         # S,T,J,3

    # world coordinates for rendering (main_draw_h3wb.py:440-447)
    R, t = cam["orientation"], cam["translation"]
    with host_compute():
        sel_world = np.asarray(geometry.camera_to_world(selected, R, t))
        gt_world = np.asarray(geometry.camera_to_world(gt_abs, R, t))
        hyp_world = np.asarray(geometry.camera_to_world(stitched, R, t))

    # joint-position export (main_draw_h3wb.py:424-427)
    if args.viz.viz_export:
        print("Exporting joint positions to", args.viz.viz_export)
        np.save(args.viz.viz_export, stitched)

    out_dir = os.path.join("plot", f"{subject}_{action}_{cam_idx}".replace(" ", "_"))
    skip = max(1, int(args.viz.viz_downsample))
    show_gt = not bool(args.viz.viz_no_ground_truth)
    viz.draw_3d_image_select(hyp_world, sel_world, gt_world, out_dir,
                             azim=float(cam.get("azimuth", 70.0)),
                             frame_skip=skip, show_gt=show_gt)
    # GT vs each hypothesis, every 5th frame like the reference
    # (visualization.py:372-449)
    viz.draw_3d_image_hypotheses(hyp_world, gt_world, out_dir,
                                 azim=float(cam.get("azimuth", 70.0)),
                                 frame_skip=5 * skip, show_gt=show_gt)
    print(f"Wrote renders to {out_dir}")


if __name__ == "__main__":
    main()
