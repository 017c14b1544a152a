#!/usr/bin/env python
"""Accuracy–latency Pareto for the serving op-point tiers (round-5
VERDICT #2).

The reference's own pitch for ``num_proposals``/``sampling_timesteps`` is
the accuracy↔efficiency trade (/root/reference/README.md:46-49,
config/config.yaml:85-86); docs/OPERATIONS.md recommends P=5,T=2 (+ a
1x1 latency tier) purely from the measured SLO table.  This tool measures
the missing half: the full synthetic-S8 action-wise evaluation with a
TRAINED checkpoint at each tier, so the SLO table can carry a millimeter
column next to its p50 column.

Modes:
  f32_default — float32 activations, default matmul precision, XLA path
                (the CLI default; what `general.evaluate` runs)
  bf16_block  — bfloat16 + fused block Pallas kernel (what the SERVING
                service and the headline bench actually execute)

All runs at one op-point consume IDENTICAL injected DDIM noise tables
(check_parity.action_noise_tables), so mode deltas are numerics, not
sampling variance; different op-points draw different tables (a tier
change re-samples by construction).

    python tools/pareto_tiers.py --from-npz /tmp/train80/ckpt/epoch_80.npz
    python tools/pareto_tiers.py --dep 1 --frames 9 --timestep 20 \
        --op-points 1x1,2x2 --synthetic-frames 60      # CPU-testable
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

HEADLINE = ("J_Best", "P_Best", "P_Agg", "J_Agg", "P_Best_PB")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--op-points", default="1x1,5x2,10x5,20x10",
                    help="comma list of PxT tiers (ordered cheap->expensive)")
    ap.add_argument("--modes", default="f32_default,bf16_block")
    ap.add_argument("--frames", type=int, default=27)
    ap.add_argument("--dep", type=int, default=8)
    ap.add_argument("--timestep", type=int, default=1000)
    ap.add_argument("--synthetic-actions", type=int, default=2)
    ap.add_argument("--synthetic-frames", type=int, default=405)
    ap.add_argument("--sub-batch", type=int, default=8,
                    help="window sub-batch bound (8: the f32 path + injected "
                         "noise tables need ~4x the HBM of bf16+kernel)")
    ap.add_argument("--from-npz", default="",
                    help="trained native checkpoint (REQUIRED for a "
                         "meaningful Pareto; random weights live at "
                         "650-1000 mm where tiers are indistinguishable)")
    ap.add_argument("--out", default=os.path.join(REPO, "PARETO_TIERS.json"))
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

    op_points = []
    for tok in a.op_points.split(","):
        P, T = tok.lower().split("x")
        op_points.append((int(P), int(T)))
    modes = a.modes.split(",")

    def build(mode, P, T):
        cfg = D3DPConfig(frames=a.frames, timesteps=a.timestep, depth=a.dep,
                         num_proposals=P, sampling_timesteps=T)
        if mode == "bf16_block":
            dtype = (jnp.bfloat16
                     if jax.devices()[0].platform != "cpu" else jnp.float32)
            model = D3DP(cfg, compute_dtype=dtype,
                         flip_permutation=dataset.flip_permutation,
                         attention_fn=select_attention_fn("auto"),
                         block_fn=select_block_fn("auto"))
        else:                                   # f32_default
            model = D3DP(cfg, flip_permutation=dataset.flip_permutation)
        params = model.init_params(jax.random.PRNGKey(0))
        if a.from_npz:
            from pafuse_tpu import checkpoints
            params = checkpoints.load_state(a.from_npz, params)["params"]
        return model, params

    def run(mode, P, T):
        model, params = build(mode, P, T)
        per_action = {}
        for ai, action_key in enumerate(sorted(all_actions)):
            cams, p3d, p2d = h3wb.fetch_actions(all_actions[action_key],
                                                keypoints, dataset)
            n_win = sum(window_count(np.squeeze(k).shape[0], a.frames)
                        for k in p2d)
            noise = action_noise_tables(ai, n_win, P, T, a.frames,
                                        model.cfg.num_kps)
            acc, _ = ev.evaluate_sequences(
                model, params, zip(cams, p3d, p2d), None,
                receptive_field=a.frames, num_proposals=P,
                sampling_timesteps=T, window_batch=pin, noise_table=noise)
            per_action[action_key] = acc.means_mm()
        keys = next(iter(per_action.values())).keys()
        avg = {k: float(np.atleast_1d(np.mean(
            [m[k] for m in per_action.values()], axis=0))[-1])
            for k in keys}
        for agg in ("P_Best_PB", "P_Agg_PB"):
            avg[f"{agg}_hands"] = 0.5 * (avg[f"{agg}_left_hand"]
                                         + avg[f"{agg}_right_hand"])
        return avg

    out = {"workload": f"synthetic S8, {a.synthetic_actions} actions x "
                       f"{a.synthetic_frames} frames, injected noise, "
                       f"checkpoint={a.from_npz or 'random-init'}",
           "backend": jax.default_backend(), "tiers": {}}
    # resumable: keep already-measured tiers when re-run after a timeout
    if os.path.exists(a.out):
        with open(a.out) as f:
            prev = json.load(f)
        if prev.get("workload") == out["workload"]:
            out["tiers"] = prev.get("tiers", {})

    for (P, T) in op_points:
        key = f"P{P}T{T}"
        tier = out["tiers"].setdefault(key, {})
        for mode in modes:
            if mode in tier:
                print(f"{key} {mode}: cached", flush=True)
                continue
            print(f"{key} {mode}: evaluating ...", flush=True)
            tier[mode] = run(mode, P, T)
            with open(a.out, "w") as f:
                json.dump(out, f, indent=2, sort_keys=True)
            print(f"  {key} {mode}: " + "  ".join(
                f"{m}={tier[mode][m]:.2f}" for m in HEADLINE), flush=True)

    # markdown for PARITY.md / docs/OPERATIONS.md
    for mode in modes:
        print(f"\nmode {mode}:")
        print("| tier (PxT) | " + " | ".join(HEADLINE) + " |")
        print("|---" * (len(HEADLINE) + 1) + "|")
        for (P, T) in op_points:
            t = out["tiers"][f"P{P}T{T}"].get(mode)
            if t:
                print(f"| {P}x{T} | "
                      + " | ".join(f"{t[m]:.2f}" for m in HEADLINE) + " |")
    print(f"\nwrote {a.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
