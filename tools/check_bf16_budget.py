#!/usr/bin/env python
"""bf16 accuracy budget (round-4 VERDICT #3).

The headline bench runs bfloat16 + the fused block kernel while the CLI
default is ``tpu.compute_dtype: float32`` — this tool measures what that
difference costs in MILLIMETERS on a full synthetic-S8 action-wise
evaluation, at the headline op-point:

  A. float32 activations, ``highest`` matmul precision, XLA path
     (the strictest f32 interpretation of the CLI default);
  B. bfloat16 activations + fused block Pallas kernel
     (the headline bench configuration, ``tpu.use_pallas=auto``);
  C. float32 activations at DEFAULT matmul precision, XLA path
     (what ``tpu.compute_dtype=float32`` actually executes on TPU —
     f32 dots decompose to bf16 passes).

Both runs consume IDENTICAL injected DDIM noise tables
(check_parity.action_noise_tables), so every mm of delta is numerics, not
sampling variance.  Writes ``BF16_BUDGET.json`` and prints a markdown table
for PARITY.md.

    python tools/check_bf16_budget.py                # flagship, P=20,T=10
    python tools/check_bf16_budget.py --dep 1 --frames 9 --timestep 20 \
        --proposals 2 --steps 2 --synthetic-frames 60    # CPU-testable
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--proposals", type=int, default=20)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--frames", type=int, default=27)
    ap.add_argument("--dep", type=int, default=8)
    ap.add_argument("--timestep", type=int, default=1000)
    ap.add_argument("--synthetic-actions", type=int, default=2)
    ap.add_argument("--synthetic-frames", type=int, default=405)
    ap.add_argument("--sub-batch", type=int, default=8,
                    help="window sub-batch bound; 8 (not the bench's 32) "
                         "because the f32 XLA path + the per-batch injected "
                         "noise tables need ~4x the HBM of bf16+kernel "
                         "(32-window f32 eval OOMs a 15.75G v5e)")
    ap.add_argument("--from-npz", default="",
                    help="load trained params from this native checkpoint "
                         "(deltas on random weights are not representative "
                         "— the untrained model's 650-1000 mm errors scale "
                         "the numeric noise with them)")
    ap.add_argument("--out", default=os.path.join(REPO, "BF16_BUDGET.json"))
    a = ap.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp
    from pafuse_tpu import evaluate as ev
    from pafuse_tpu.data import h3wb
    from pafuse_tpu.diffusion import D3DP, D3DPConfig
    from pafuse_tpu.cli.main_h3wb import collect_actions
    from pafuse_tpu.ops.attention import (select_attention_fn,
                                          select_block_fn)
    from pafuse_tpu.utils.backend import (enable_compilation_cache,
                                          host_compute)
    from check_parity import action_noise_tables, window_count
    enable_compilation_cache()

    with host_compute():
        dataset = h3wb.make_synthetic(
            subjects=("S8",), actions_per_subject=a.synthetic_actions,
            frames_per_action=a.synthetic_frames)
        keypoints = h3wb.prepare_data(dataset)
    all_actions, _ = collect_actions(dataset, ["S8"])
    pin = ev.pinned_window_batch(
        [kp for act in keypoints["S8"] for kp in keypoints["S8"][act]],
        a.frames, sub_batch=a.sub_batch)

    cfg = D3DPConfig(frames=a.frames, timesteps=a.timestep, depth=a.dep,
                     num_proposals=a.proposals, sampling_timesteps=a.steps)

    def run(mode):
        if mode == "bf16_block":
            dtype = (jnp.bfloat16
                     if jax.devices()[0].platform != "cpu" else jnp.float32)
            model = D3DP(cfg, compute_dtype=dtype,
                         flip_permutation=dataset.flip_permutation,
                         attention_fn=select_attention_fn("auto"),
                         block_fn=select_block_fn("auto"))
            prec = "default"
        elif mode == "f32_default":
            model = D3DP(cfg, flip_permutation=dataset.flip_permutation)
            prec = "default"
        else:                                   # f32_highest
            model = D3DP(cfg, flip_permutation=dataset.flip_permutation)
            prec = "highest"
        params = model.init_params(jax.random.PRNGKey(0))
        if a.from_npz:
            from pafuse_tpu import checkpoints
            params = checkpoints.load_state(a.from_npz, params)["params"]
        per_action = {}
        with jax.default_matmul_precision(prec):
            for ai, action_key in enumerate(sorted(all_actions)):
                cams, p3d, p2d = h3wb.fetch_actions(
                    all_actions[action_key], keypoints, dataset)
                n_win = sum(window_count(np.squeeze(k).shape[0], a.frames)
                            for k in p2d)
                noise = action_noise_tables(ai, n_win, a.proposals, a.steps,
                                            a.frames, cfg.num_kps)
                acc, _ = ev.evaluate_sequences(
                    model, params, zip(cams, p3d, p2d), None,
                    receptive_field=a.frames, num_proposals=a.proposals,
                    sampling_timesteps=a.steps, window_batch=pin,
                    noise_table=noise)
                per_action[action_key] = acc.means_mm()
        keys = next(iter(per_action.values())).keys()
        avg = {k: float(np.atleast_1d(np.mean(
            [m[k] for m in per_action.values()], axis=0))[-1])
            for k in keys}
        for agg in ("P_Best_PB", "P_Agg_PB"):
            avg[f"{agg}_hands"] = 0.5 * (avg[f"{agg}_left_hand"]
                                         + avg[f"{agg}_right_hand"])
        return avg

    print("run A: f32 + highest matmul precision (XLA) ...", flush=True)
    f32_hi = run("f32_highest")
    print("run B: bf16 + fused block kernel (headline bench) ...", flush=True)
    bf16 = run("bf16_block")
    print("run C: f32 + default matmul precision (CLI default) ...",
          flush=True)
    f32_def = run("f32_default")

    metrics = sorted(f32_hi)
    table = ["| metric | f32+highest (mm) | bf16+kernel (mm) | delta (mm) | "
             "f32 default-prec delta (mm) |",
             "|---|---|---|---|---|"]
    worst = 0.0
    out = {"op_point": f"P={a.proposals},T={a.steps}",
           "workload": f"synthetic S8, {a.synthetic_actions} actions x "
                       f"{a.synthetic_frames} frames, injected noise",
           "backend": jax.default_backend(), "metrics": {}}
    for k in metrics:
        d = bf16[k] - f32_hi[k]
        d_def = f32_def[k] - f32_hi[k]
        worst = max(worst, abs(d))
        out["metrics"][k] = {"f32_highest": f32_hi[k], "bf16_block": bf16[k],
                             "delta": d, "f32_default_delta": d_def}
        table.append(f"| {k} | {f32_hi[k]:.3f} | {bf16[k]:.3f} | {d:+.4f} | "
                     f"{d_def:+.4f} |")
    out["worst_abs_delta_mm"] = worst
    with open(a.out, "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
    print("\n".join(table))
    print(f"\nworst |bf16+kernel - f32+highest| = {worst:.4f} mm "
          f"(budget reference: 0.5 mm)")
    print(f"wrote {a.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
