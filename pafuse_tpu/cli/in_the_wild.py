"""In-the-wild video inference: OpenPifPaf wholebody 2D keypoints -> batched
PAFUSE lifting -> per-frame 3D renders.

Reference behavior: ``/root/reference/in_the_wild/h3wb_diffusion.py`` and
``in_the_wild/utils.py:322-376`` (evaluate_diffusion).

Usage:
    python -m pafuse_tpu.cli.in_the_wild in_the_wild.video_path=yoga/004.mp4 \
        general.evaluate=best_epoch.npz ft2d.num_proposals=5
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Optional

import numpy as np

from pafuse_tpu import config as cfg_mod


def load_openpifpaf_keypoints(json_path: str, num_kps: int = 134) -> np.ndarray:
    """Parse OpenPifPaf wholebody JSON lines into (F, 134, 2) pixel keypoints
    with the synthetic root inserted from the hip midpoint
    (h3wb_diffusion.py:58-69)."""
    records = []
    with open(json_path) as f:
        for line in f:
            line = line.strip()
            if line:
                records.append(json.loads(line))
    keypoints = np.zeros((len(records), num_kps, 2), dtype=np.float32)
    for ind, rec in enumerate(records):
        preds = rec.get("predictions", [])
        if not preds:
            continue  # keep zeros for detection-less frames
        kp = preds[0]["keypoints"]
        keypoints[ind, 1:, 0] = kp[0::3]
        keypoints[ind, 1:, 1] = kp[1::3]
        # synthetic root: mid-hip (joints 12/13 after the root shift)
        keypoints[ind, 0] = 0.5 * (keypoints[ind, 12] + keypoints[ind, 13])
    return keypoints


def video_dims(video_path: str):
    import cv2
    cap = cv2.VideoCapture(video_path)
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    fps = cap.get(cv2.CAP_PROP_FPS) or 25
    cap.release()
    return w, h, fps


def dump_frames(video_path: str, out_dir: str) -> int:
    import cv2
    os.makedirs(out_dir, exist_ok=True)
    cap = cv2.VideoCapture(video_path)
    count = 0
    while cap.isOpened():
        ret, frame = cap.read()
        if not ret:
            break
        cv2.imwrite(os.path.join(out_dir, f"frame_{count}.jpg"), frame)
        count += 1
    cap.release()
    return count


def lift_video(args, keypoints_norm: np.ndarray, params, model,
               rng=None) -> np.ndarray:
    """Batched DDIM lifting of an arbitrary-length keypoint sequence.

    Mirrors evaluate_diffusion (in_the_wild/utils.py:322-376): window the
    sequence, run flip-TTA sampling without GT, assemble whole-body poses,
    stitch back to the timeline.  Returns (S, H, F_total, J, 3).
    """
    import jax
    import jax.numpy as jnp
    from pafuse_tpu import geometry
    from pafuse_tpu.data import windows as win

    receptive_field = args.model.number_of_frames
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    flip = geometry.flip_pose_np(keypoints_norm, model.flip_permutation)
    w2d, _ = win.eval_data_prepare(receptive_field, keypoints_norm)
    w2d_flip, _ = win.eval_data_prepare(receptive_field, flip)

    @jax.jit
    def sample(params, key, x2d, x2d_flip):
        preds = model.eval_forward(params, key, x2d, x2d_flip)
        return geometry.wb_pose_from_parts(preds)

    from pafuse_tpu.utils.backend import run_chunked_pipelined

    bs = max(1, args.model.batch_size // receptive_field)

    def call(w2d_c, w2d_flip_c):
        nonlocal rng
        rng, sub = jax.random.split(rng)
        return sample(params, sub, jnp.asarray(w2d_c),
                      jnp.asarray(w2d_flip_c))

    preds = run_chunked_pipelined(call, (w2d, w2d_flip), bs)  # (W,S,H,F,J,3)

    total = keypoints_norm.shape[0]
    # (W, S, H, F, J, 3) -> (S, H, W, F, J, 3) -> stitch to (S, H, T, J, 3)
    preds = preds.transpose(1, 2, 0, 3, 4, 5)
    return win.stitch_windows(preds, total, receptive_field)


def main(argv=None):
    args = cfg_mod.parse_cli(argv if argv is not None else sys.argv[1:])
    t0 = time.time()

    video_path = args.in_the_wild.video_path
    dir_name = os.path.dirname(video_path)
    basename = os.path.basename(video_path)
    video_name = basename[: basename.rfind(".")] if "." in basename else basename
    out_dir = f"outputs/{video_name}"
    os.makedirs(out_dir, exist_ok=True)

    import jax
    from pafuse_tpu import checkpoints, geometry
    from pafuse_tpu.cli.main_h3wb import build_model
    from pafuse_tpu.utils.backend import ensure_backend
    ensure_backend()

    model = build_model(args, is_train=False,
                        num_proposals=args.ft2d.num_proposals,
                        sampling_timesteps=args.ft2d.sampling_timesteps)
    params = model.init_params(jax.random.PRNGKey(0))

    chk = args.general.resume or args.general.evaluate
    if chk:
        chk_path = os.path.join(args.general.checkpoint, chk)
        if not os.path.exists(chk_path):
            chk_path = chk
        print("Loading checkpoint", chk_path)
        if chk_path.endswith(".bin"):
            restored = checkpoints.load_torch_checkpoint(
                chk_path, params, part_based=args.general.part_based_model)
        else:
            restored = checkpoints.load_state(chk_path, params)
        from pafuse_tpu.utils.backend import commit_params
        # loaders return host numpy; commit once so the per-window-batch
        # jitted sampler doesn't re-transfer the full tree every call
        params = commit_params(restored["params"])

    json_path = os.path.join(dir_name, f"{basename}.openpifpaf.json")
    keypoints = load_openpifpaf_keypoints(json_path, args.data.num_kps)
    print(f"Loaded {keypoints.shape[0]} frames of 2D keypoints")

    if os.path.exists(video_path):
        w, h, fps = video_dims(video_path)
        dump_frames(video_path, out_dir)
    else:
        w, h, fps = 1000, 1002, 25
    from pafuse_tpu.utils.backend import host_compute
    with host_compute():   # host-side prep off the (tunneled) accelerator
        keypoints = np.asarray(geometry.normalize_screen_coordinates(
            keypoints[..., :2], w=w, h=h), dtype=np.float32)
    print(f"-------------- load data spends {time.time() - t0:.2f} seconds")

    prediction = lift_video(args, keypoints, params, model)  # (S,H,T,J,3)
    np.save(os.path.join(out_dir, f"test_3d_{video_name}_output.npy"),
            prediction, allow_pickle=True)

    # camera->world with the hard-coded S1-cam0 rotation, floor rebase
    # (h3wb_diffusion.py:138-143)
    rot = np.array([0.14070565, -0.15007018, -0.7552408, 0.62232804],
                   dtype=np.float32)
    # np.array (copy): np.asarray of a jax array is a read-only view
    with host_compute():
        world = np.array(geometry.camera_to_world(prediction, rot, 0.0))
    world[..., 2] -= world[..., 2].min()
    np.save(os.path.join(out_dir,
                         f"test_3d_output_{video_name}_postprocess.npy"),
            world, allow_pickle=True)
    print(f"-------------- lifting spends {time.time() - t0:.2f} seconds")

    from pafuse_tpu import viz
    # render the final-DDIM-step mean pose per frame (in_the_wild/visualization.py:195-281)
    viz.draw_3d_image(world[-1:], None, out_dir, azim=70.0,
                      max_frames=int(args.viz.viz_limit)
                      if args.viz.viz_limit and args.viz.viz_limit > 0 else None)

    # animated gif/mp4 with the source video as 2D backdrop (capability of
    # common/visualization.py:726-909; honors viz_skip/viz_downsample/
    # viz_limit/viz_size/viz_bitrate)
    if args.viz.viz_output:
        def frame_image(idx):
            path = os.path.join(out_dir, f"frame_{idx}.jpg")
            if os.path.exists(path):
                import matplotlib.image as mpimg
                return mpimg.imread(path)
            return None

        mean_pose = world[-1].mean(axis=0)  # final step, hypothesis mean
        with host_compute():
            kp_px = np.asarray(geometry.image_coordinates(
                keypoints.copy(), w=w, h=h))
        anim_out = os.path.join(out_dir, os.path.basename(args.viz.viz_output))
        written = viz.render_animation(
            {"reconstruction": mean_pose}, int(fps), anim_out,
            bitrate=int(args.viz.viz_bitrate), limit=int(args.viz.viz_limit),
            size=float(args.viz.viz_size), keypoints_2d=kp_px,
            viewport=(w, h),
            input_video_frames=frame_image if os.path.exists(video_path) else None,
            input_video_skip=int(args.viz.viz_skip),
            downsample=int(args.viz.viz_downsample))
        print(f"Wrote animation to {written}")

    print(f"total spend {time.time() - t0:.2f} seconds; renders in {out_dir}")
    print("To make a video: ffmpeg -framerate 25 -i "
          f"{out_dir}/frame%d_t0.png -pix_fmt yuv420p {out_dir}/{video_name}.mp4")


if __name__ == "__main__":
    main()
