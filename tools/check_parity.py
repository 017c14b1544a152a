#!/usr/bin/env python
"""One-command real-checkpoint parity harness (±0.5 mm target).

Given the private H3WB npz files and the released reference checkpoint
(``pafuse_model.bin``), this tool

1. converts the torch checkpoint to our parameter tree,
2. (optional) runs an *implementation-level* parity check on real data:
   the reference torch sampler (imported read-only from /root/reference,
   identical weights, identical injected noise) vs our ``lax.scan`` DDIM,
   reporting the max deviation in millimeters,
3. evaluates the S8 test subject at the requested op-points with the exact
   reference metric vocabulary (J_Best / P_Best / P_Agg / J_Agg, action-wise
   average),
4. diffs the numbers against a reference-side eval log
   (``h36m_test_log_H{P}_K{T}.txt`` produced by the reference driver — or
   any file with the same ``action-wise average`` lines) and verdicts each
   metric against the ±0.5 mm budget,
5. writes ``PARITY_REAL.md``.

Usage (flagship config):

    PYTHONPATH=/root/repo python tools/check_parity.py \
        --data-dir data --checkpoint checkpoint/pafuse_model.bin \
        --op-points 1x1,10x5 --reference-log ref_logs/h36m_test_log_H10_K5.txt

Exit codes: 0 parity within budget (or no reference log to compare),
2 missing artifacts, 3 parity budget exceeded.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

METRICS = ("J_Best", "P_Best", "P_Agg", "J_Agg")

#: reference averaged-block labels (main_h3wb.py:1253-1358) -> our
#: EvalAccumulator keys ('*_hands' is the (L+R)/2 composite)
LABEL_TO_KEY = {
    "J_Best": "J_Best", "P_Best": "P_Best",
    "P_Agg": "P_Agg", "J_Agg": "J_Agg",
    "P_Best (Part-Based)": "P_Best_PB",
    "P_Best (Part-Based) BODY": "P_Best_PB_body",
    "P_Best (Part-Based) FACE": "P_Best_PB_face",
    "P_Best (Part-Based) HANDS": "P_Best_PB_hands",
    "P_Best (Part-Based) LEFT HAND": "P_Best_PB_left_hand",
    "P_Best (Part-Based) RIGHT HAND": "P_Best_PB_right_hand",
    "P_Agg (Part-Based)": "P_Agg_PB",
    "P_Agg (Part-Based) BODY": "P_Agg_PB_body",
    "P_Agg (Part-Based) FACE": "P_Agg_PB_face",
    "P_Agg (Part-Based) HANDS": "P_Agg_PB_hands",
    "P_Agg (Part-Based) LEFT HAND": "P_Agg_PB_left_hand",
    "P_Agg (Part-Based) RIGHT HAND": "P_Agg_PB_right_hand",
}


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", default="data")
    p.add_argument("--checkpoint", default="checkpoint/pafuse_model.bin")
    p.add_argument("--op-points", default="1x1,10x5",
                   help="comma list of PxT evaluation op-points")
    p.add_argument("--reference-log", action="append", default=[],
                   help="reference eval log(s) to diff against (repeatable; "
                        "matched to op-points by their H{P}_K{T} filename or "
                        "in order)")
    p.add_argument("--skip-data-check", action="store_true",
                   help="skip the loader-vs-reference data-prep comparison")
    p.add_argument("--impl-windows", type=int, default=2,
                   help="windows of real data for the torch-vs-ours "
                        "implementation check (0 = skip)")
    p.add_argument("--budget-mm", type=float, default=0.5)
    p.add_argument("--inject-noise", action="store_true",
                   help="evaluate with deterministic per-window DDIM noise "
                        "(action_noise_tables) so a reference run patched to "
                        "consume the same tables is bit-aligned — turns the "
                        "metric diff into a pure pipeline-equality check")
    p.add_argument("--trials", type=int, default=0,
                   help="measure the SAMPLING-VARIANCE ENVELOPE: run each "
                        "op-point N extra times with independent DDIM noise "
                        "seeds (no injection) and record per-metric "
                        "mean±stddev to --envelope-out.  Pre-registers the "
                        "interpretation of a real-data run whose torch-side "
                        "initial noise can never be matched "
                        "(diffusionpose.py:283)")
    p.add_argument("--envelope-out", default="PARITY_ENVELOPE.json",
                   help="where --trials writes the envelope; also read at "
                        "verdict time to widen the per-metric budget by "
                        "2*sqrt(2)*sigma (the pre-registered decision rule)")
    p.add_argument("--p2", action="store_true",
                   help="also compute Protocol #2 (Procrustes) metrics and "
                        "diff them against the reference log's 'Protocol #2 "
                        "... action-wise average' lines (keys P2_*)")
    p.add_argument("--out", default="PARITY_REAL.md")
    # model shape overrides (defaults = flagship); lets tests exercise the
    # harness end-to-end with a tiny fabricated checkpoint
    p.add_argument("--frames", type=int, default=27)
    p.add_argument("--batch-size", type=int, default=1024,
                   help="eval window sub-batch bound; the reference "
                        "sub-batches eval windows in chunks of "
                        "model.batch_size (main_h3wb.py:306), and P_Best "
                        "selects its argmin hypothesis by BATCH-mean error, "
                        "so strict parity needs the same boundaries")
    p.add_argument("--dep", type=int, default=8)
    p.add_argument("--timestep", type=int, default=1000)
    p.add_argument("--subjects", default="S8")
    return p.parse_args(argv)


def window_count(n_frames: int, receptive_field: int) -> int:
    """Windows produced by eval_data_prepare for one sequence."""
    return max(1, -(-int(n_frames) // receptive_field))


def action_noise_tables(action_index: int, n_windows: int, P: int, S: int,
                        F: int, N: int):
    """Deterministic per-action DDIM noise tables, shared between our
    evaluation (``evaluate_sequences(noise_table=...)``) and the reference
    driver (``tools/rehearse_parity.py`` monkeypatches ``torch.randn`` to
    consume the same arrays), so the metric diff compares the PIPELINES with
    bit-identical stochasticity.

    Returns ``init`` of shape (n_windows, P, F, N, 3) and ``step`` of shape
    (n_windows, S, P, F, N, 3); windows indexed in pooled (sequence-major)
    order, which is also the reference's per-sequence consumption order.
    """
    import numpy as np
    rng = np.random.RandomState(977_001 + action_index)
    init = rng.randn(n_windows, P, F, N, 3).astype(np.float32)
    step = rng.randn(n_windows, S, P, F, N, 3).astype(np.float32)
    return init, step


def parse_reference_log(path):
    """Extract {metric: value_mm} from 'action-wise average' lines, incl.
    part-based breakdowns and Protocol #2 (prefixed 'P2_') — the last DDIM
    step's block wins, matching how results are quoted."""
    out = {}
    pat = re.compile(r"Protocol #(\d)\s+\(MPJPE\) action-wise average "
                     r"([\w #()-]+?):\s*(-?[0-9.]+)\s*mm")
    with open(path) as f:
        for line in f:
            m = pat.search(line)
            if not m:
                continue
            key = LABEL_TO_KEY.get(m.group(2).strip())
            if key is None:
                continue
            if m.group(1) == "2":
                key = "P2_" + key
            out[key] = float(m.group(3))  # later steps overwrite
    return out


def data_prep_check(data_dir, dataset):
    """Load the same npz through the REFERENCE's Human3WBDataset (read-only
    import) and compare every prepared array and metadata table against our
    loader — catches data-prep divergence (root injection, per-camera
    arrays, part tables, symmetry) before any model runs.

    Returns the number of compared arrays; raises AssertionError on any
    mismatch."""
    import numpy as np
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from common.h3wb_dataset import Human3WBDataset as RefDS

    ref = RefDS(os.path.join(data_dir, "train_h3wb.npz"))
    # metadata tables
    assert ref.root_indices == dataset.root_indices
    assert ref.parts_connection_indices == dataset.parts_connection_indices
    for part, idx in ref.parts_joint_indices.items():
        assert list(idx) == list(dataset.parts_joint_indices[part]), part
    left, right = ref.keypoints_metadata["keypoints_symmetry"]
    assert list(left) == list(dataset.joints_left)
    assert list(right) == list(dataset.joints_right)

    n = 0
    for subject in ref.subjects():
        for action in ref[subject].keys():
            r = ref[subject][action]
            o = dataset[subject][action]
            np.testing.assert_array_equal(
                np.asarray(r["positions"], np.float32), o["positions"],
                err_msg=f"{subject}/{action} positions")
            for c in range(len(r["positions_3d"])):
                np.testing.assert_array_equal(
                    np.asarray(r["positions_3d"][c], np.float32),
                    o["positions_3d"][c],
                    err_msg=f"{subject}/{action} cam{c} 3d")
                np.testing.assert_array_equal(
                    np.asarray(r["pose_2d"][c], np.float32),
                    o["pose_2d"][c],
                    err_msg=f"{subject}/{action} cam{c} 2d")
                n += 2
            n += 1
    return n


def implementation_check(model, params, dataset, keypoints, subjects,
                         n_windows, receptive_field):
    """Reference torch sampler vs ours on real 2D windows: identical
    weights + injected noise => same predictions (reports max |delta| mm)."""
    import types
    import numpy as np
    from torch_oracle import _install_timm_stub, patch_cuda_to_cpu
    _install_timm_stub()
    patch_cuda_to_cpu()
    import torch
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from common.diffusionpose import D3DP as RefD3DP
    import jax
    import jax.numpy as jnp
    from pafuse_tpu import checkpoints, skeleton as sk
    from pafuse_tpu.data import windows as win

    cfg = model.cfg
    P, S = 2, 2  # small op-point keeps the torch side tractable

    class Cfg:
        general = types.SimpleNamespace(part_based_model=cfg.part_based)
        model_ = types.SimpleNamespace(
            number_of_frames=cfg.frames, test_time_augmentation=True,
            diff_model="MixSTE2", input_size=cfg.input_size, dep=cfg.depth,
            cs=cfg.cs)
        model = model_
        data = types.SimpleNamespace(num_kps=cfg.num_kps,
                                     merge_hands=cfg.merge_hands)
        ft2d = types.SimpleNamespace(timestep=cfg.timesteps, scale=cfg.scale,
                                     sampling_timesteps=S, num_proposals=P)

    class Ds:
        metadata = {}
        root_indices = dict(dataset.root_indices)
        parts_joint_indices = {k: list(v)
                               for k, v in sk.PARTS_JOINT_INDICES.items()}

    ref = RefD3DP(Cfg(), list(dataset.joints_left),
                  list(dataset.joints_right), Ds(), is_train=False,
                  num_proposals=P, sampling_timesteps=S)
    ref.device = "cpu"
    ref.eval()
    sd = checkpoints.export_torch_state_dict(params,
                                             part_based=cfg.part_based)
    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=False)
    assert not unexpected, f"unexpected keys: {unexpected[:5]}"

    # real 2D windows from the first test sequence
    subject = subjects[0]
    action = next(iter(keypoints[subject]))
    seq_2d = keypoints[subject][action][0]
    w2d, _ = win.eval_data_prepare(receptive_field, seq_2d)
    w2d = w2d[:n_windows]
    B, F = w2d.shape[0], receptive_field
    x2d_flip = w2d.copy()
    x2d_flip[..., 0] *= -1
    x2d_flip = x2d_flip[:, :, dataset.flip_permutation]

    rng = np.random.RandomState(0)
    init_noise = rng.randn(B, P, F, cfg.num_kps, 3).astype(np.float32)
    step_noise = rng.randn(S, B, P, F, cfg.num_kps, 3).astype(np.float32)

    consumed = {"i": -1}

    def fake_randn(*shape, **kwargs):
        if len(shape) == 1 and isinstance(shape[0], (tuple, torch.Size)):
            shape = tuple(shape[0])
        if consumed["i"] == -1:
            consumed["i"] = 0
            return torch.from_numpy(init_noise.reshape(shape))
        i = consumed["i"]
        consumed["i"] += 1
        return torch.from_numpy(step_noise[i].reshape(shape))

    orig_randn, orig_like = torch.randn, torch.randn_like
    torch.randn = fake_randn
    torch.randn_like = lambda t: fake_randn(tuple(t.shape))
    try:
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(w2d), None,
                          input_2d_flip=torch.from_numpy(x2d_flip)).numpy()
    finally:
        torch.randn, torch.randn_like = orig_randn, orig_like

    # force f32 + XLA attention for an apples-to-apples numerics check;
    # 'highest' matmul precision because TPU f32 matmuls otherwise run in
    # bf16 passes (multi-mm deviation vs torch-CPU f32 at flagship depth)
    from pafuse_tpu.diffusion import D3DP, D3DPConfig
    import dataclasses
    ours = D3DP(dataclasses.replace(cfg, num_proposals=P,
                                    sampling_timesteps=S),
                flip_permutation=dataset.flip_permutation)
    with jax.default_matmul_precision("highest"):
        out = np.asarray(ours.ddim_sample(
            params, jax.random.PRNGKey(1), jnp.asarray(w2d),
            jnp.asarray(x2d_flip), init_noise=init_noise,
            step_noise=step_noise))
    delta_mm = float(np.abs(out - ref_out).max()) * 1000.0
    return delta_mm


def main(argv=None):
    a = parse_args(argv)
    missing = [p for p in (os.path.join(a.data_dir, "train_h3wb.npz"),
                           a.checkpoint) if not os.path.exists(p)]
    if missing:
        print("Missing required artifacts:")
        for m in missing:
            print(f"  {m}")
        print("Mount the official H3WB npz files and the released "
              "pafuse_model.bin, then re-run.")
        return 2

    import numpy as np
    import jax
    from pafuse_tpu import checkpoints, evaluate as ev
    from pafuse_tpu.data import h3wb
    from pafuse_tpu.diffusion import D3DP, D3DPConfig
    from pafuse_tpu.cli.main_h3wb import collect_actions

    print("Loading real dataset...")
    dataset = h3wb.load_real(a.data_dir)

    lines_prep = []
    if not a.skip_data_check:
        print("Data-prep parity vs the reference loader...")
        n_arrays = data_prep_check(a.data_dir, dataset)
        print(f"  {n_arrays} arrays bit-identical")
        lines_prep = ["## Data preparation parity", "",
                      f"{n_arrays} prepared arrays (global/per-camera 3D, "
                      "2D) bit-identical to the reference loader; part "
                      "tables and symmetry lists equal.", ""]

    keypoints = h3wb.prepare_data(dataset)
    subjects = a.subjects.split(",")

    op_points = []
    for tok in a.op_points.split(","):
        P, T = tok.lower().split("x")
        op_points.append((int(P), int(T)))

    cfg = D3DPConfig(frames=a.frames, timesteps=a.timestep, depth=a.dep,
                     num_proposals=op_points[0][0],
                     sampling_timesteps=op_points[0][1])
    model = D3DP(cfg, flip_permutation=dataset.flip_permutation)
    params = model.init_params(jax.random.PRNGKey(0))
    print(f"Converting {a.checkpoint} ...")
    params = checkpoints.load_torch_checkpoint(
        a.checkpoint, params, part_based=cfg.part_based)["params"]

    lines = ["# PARITY_REAL — real-checkpoint parity report", ""]
    lines += lines_prep
    ok = True

    if a.impl_windows > 0:
        print("Implementation check (torch reference vs ours, identical "
              "weights + noise, real 2D windows)...")
        delta_mm = implementation_check(
            model, params, dataset, keypoints, subjects, a.impl_windows,
            a.frames)
        lines += [f"## Implementation parity (P=2,T=2, "
                  f"{a.impl_windows} real windows)",
                  "",
                  f"max |ours - reference| = **{delta_mm:.4f} mm** "
                  "(same weights, same injected noise)", ""]
        print(f"  max deviation: {delta_mm:.4f} mm")
        ok &= delta_mm < a.budget_mm

    # map reference logs to op points: by H{P}_K{T} in filename, else order
    ref_logs = {}
    unmatched = list(a.reference_log)
    for path in list(unmatched):
        m = re.search(r"H(\d+)_K(\d+)", os.path.basename(path))
        if m:
            ref_logs[(int(m.group(1)), int(m.group(2)))] = path
            unmatched.remove(path)
    for (pt, path) in zip([p for p in op_points if p not in ref_logs],
                          unmatched):
        ref_logs[pt] = path

    all_actions, _ = collect_actions(dataset, subjects)
    pin = ev.pinned_window_batch(
        [kp for s in subjects for act in keypoints[s]
         for kp in keypoints[s][act]], a.frames,
        sub_batch=a.batch_size)

    def run_s8(P, T, inject_noise, rng_seed=0):
        """One full S8 action-wise evaluation -> {metric: final-step mm}."""
        per_action = {}
        # 'highest' matmul precision: strict-parity evaluation (TPU f32
        # dots otherwise decompose to bf16 passes; see PARITY.md)
        with jax.default_matmul_precision("highest"):
            for ai, action_key in enumerate(sorted(all_actions)):
                cams, p3d, p2d = h3wb.fetch_actions(
                    all_actions[action_key], keypoints, dataset)
                noise = None
                if inject_noise:
                    n_win = sum(window_count(np.squeeze(k).shape[0], a.frames)
                                for k in p2d)
                    noise = action_noise_tables(
                        ai, n_win, P, T, a.frames, model.cfg.num_kps)
                # sequence_batches: P_Best picks its argmin hypothesis by
                # BATCH-mean error, so batch composition must match the
                # reference's per-sequence sub-batching for strict parity
                acc, p2_acc = ev.evaluate_sequences(
                    model, params, zip(cams, p3d, p2d), None,
                    rng=jax.random.PRNGKey(rng_seed),
                    receptive_field=a.frames, num_proposals=P,
                    sampling_timesteps=T, window_batch=pin,
                    noise_table=noise, sequence_batches=True,
                    collect_p2=a.p2)
                means = acc.means_mm()
                if p2_acc is not None:
                    means.update(p2_acc.means_mm())
                per_action[action_key] = means
        keys = next(iter(per_action.values())).keys()
        avg = {k: float(np.atleast_1d(np.mean(
            [m[k] for m in per_action.values()], axis=0))[-1])
            for k in keys}
        for agg in ("P_Best_PB", "P_Agg_PB"):   # (L+R)/2 composite
            avg[f"{agg}_hands"] = 0.5 * (avg[f"{agg}_left_hand"]
                                         + avg[f"{agg}_right_hand"])
        return avg

    # sampling-variance envelope: per-metric stddev over independent-seed
    # runs (no injection).  Loaded (if previously measured) to widen the
    # verdict budget; (re)measured when --trials > 0.
    envelope = {}
    if os.path.exists(a.envelope_out):
        with open(a.envelope_out) as f:
            envelope = json.load(f)

    for (P, T) in op_points:
        op_key = f"P{P}T{T}"
        if a.trials > 0:
            print(f"Envelope at P={P}, T={T}: {a.trials} independent-seed "
                  "trials ...")
            trial_avgs = [run_s8(P, T, inject_noise=False,
                                 rng_seed=1000 + t)
                          for t in range(a.trials)]
            env = {k: {"mean": float(np.mean([m[k] for m in trial_avgs])),
                       "std": float(np.std([m[k] for m in trial_avgs],
                                           ddof=1)),
                       "n": a.trials}
                   for k in trial_avgs[0]}
            envelope[op_key] = env
            with open(a.envelope_out, "w") as f:
                json.dump(envelope, f, indent=2, sort_keys=True)
            print(f"  wrote {a.envelope_out} [{op_key}]")

        print(f"Evaluating S8 at P={P}, T={T}"
              + (" (injected noise)" if a.inject_noise else "") + " ...")
        avg = run_s8(P, T, a.inject_noise)

        lines += [f"## Op-point P={P}, T={T} (S8, action-wise average, "
                  "final DDIM step)", ""]
        if op_key in envelope:
            env = envelope[op_key]
            lines += ["Sampling-variance envelope "
                      f"(n={next(iter(env.values()))['n']} independent-seed "
                      "runs; pre-registered decision rule: "
                      "|delta| <= budget + 2*sqrt(2)*sigma — the sqrt(2) "
                      "because a cross-framework diff subtracts TWO "
                      "independent noise draws):", "",
                      "| metric | mean (mm) | sigma (mm) |", "|---|---|---|"]
            lines += [f"| {k} | {v['mean']:.3f} | {v['std']:.4f} |"
                      for k, v in sorted(env.items())]
            lines.append("")
        if a.inject_noise:
            lines += ["_Injected-noise mode: both pipelines consumed "
                      "identical per-window DDIM noise tables, so any "
                      "delta is implementation/numeric, not sampling "
                      "variance._", ""]
        ref_vals = (parse_reference_log(ref_logs[(P, T)])
                    if (P, T) in ref_logs else None)
        # headline metrics first, then every part-based key both sides have
        compare = list(METRICS) + sorted(
            k for k in avg if k not in METRICS
            and (ref_vals is None or k in ref_vals))
        if ref_vals:
            env = envelope.get(op_key, {})
            lines += ["| metric | ours (mm) | reference (mm) | delta (mm) | "
                      "budget (mm) | within |",
                      "|---|---|---|---|---|---|"]
            for k in compare:
                d = avg[k] - ref_vals.get(k, float("nan"))
                # pre-registered rule: implementation budget plus the
                # two-sided ~95% envelope of a difference of two
                # INDEPENDENT sampling-noise draws (ours vs the reference's
                # unmatchable torch.randn init, diffusionpose.py:283)
                # injected-noise runs are bit-aligned: no sampling variance
                # to excuse, keep the bare implementation budget
                sigma = (0.0 if a.inject_noise
                         else env.get(k, {}).get("std", 0.0))
                budget_k = a.budget_mm + 2.0 * (2.0 ** 0.5) * sigma
                within = abs(d) <= budget_k
                ok &= within
                lines.append(f"| {k} | {avg[k]:.3f} | "
                             f"{ref_vals.get(k, float('nan')):.3f} | "
                             f"{d:+.3f} | {budget_k:.3f} | "
                             f"{'yes' if within else '**NO**'} |")
            if not env and not a.inject_noise:
                lines += ["", "_No sampling-variance envelope for this "
                          "op-point (run --trials N first); using the bare "
                          f"±{a.budget_mm:.1f} mm budget._"]
        else:
            lines += ["| metric | ours (mm) |", "|---|---|"]
            lines += [f"| {k} | {avg[k]:.3f} |" for k in compare]
            lines += ["", "_No reference log supplied for this op-point; "
                      "run the reference eval and pass --reference-log._"]
        lines.append("")
        print(json.dumps({f"P{P}T{T}": avg}))
        # flush after every op-point: a timeout mid-matrix (trials at the
        # slowest op-point run last and longest) must not lose the report
        # for the op-points already evaluated
        with open(a.out, "w") as f:
            f.write("\n".join(lines + [
                "## Verdict", "",
                "INCOMPLETE — run ended before all op-points", ""]))

    verdict = ("PASS — all comparisons within budget" if ok
               else "FAIL — at least one comparison exceeded the budget")
    lines += ["## Verdict", "", verdict, ""]
    with open(a.out, "w") as f:
        f.write("\n".join(lines))
    print(f"Wrote {a.out}: {verdict}")
    return 0 if ok else 3


if __name__ == "__main__":
    sys.exit(main())
