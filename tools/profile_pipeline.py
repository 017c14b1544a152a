#!/usr/bin/env python
"""Attribute the pipeline-vs-sampler throughput gap (round-4 VERDICT #7).

Runs the headline bench workload (flagship model, P=20, T=10, flip-TTA)
through ``evaluate_sequences`` with the phase-timing hook and prints:

* bare sampler frames/sec (same jit, no pipeline around it),
* pipeline frames/sec on the bench workload,
* the wall-clock phase breakdown (host_prep / transfer / dispatch / drain),
* padded-row accounting (the final partial batch's replicated rows), and
* an A/B where the workload divides the window batch exactly (zero padded
  rows) — isolating the partial-final-batch cost.

    python tools/profile_pipeline.py            # flagship (TPU)
    python tools/profile_pipeline.py --seqs 4 --frames 405
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--proposals", type=int, default=20)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--frames-rf", type=int, default=27)
    ap.add_argument("--dep", type=int, default=8)
    ap.add_argument("--timestep", type=int, default=1000)
    ap.add_argument("--seqs", type=int, default=8)
    ap.add_argument("--frames", type=int, default=405,
                    help="frames per sequence (405 = 15 windows -> 8 seqs "
                         "= 120 windows: 3 full 32-batches + 24-row tail)")
    a = ap.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp
    from pafuse_tpu import evaluate as ev
    from pafuse_tpu.diffusion import D3DP, D3DPConfig
    from pafuse_tpu.ops.attention import (select_attention_fn,
                                          select_block_fn)
    from pafuse_tpu.utils.backend import enable_compilation_cache, sync
    enable_compilation_cache()

    cfg = D3DPConfig(frames=a.frames_rf, timesteps=a.timestep, depth=a.dep,
                     num_proposals=a.proposals, sampling_timesteps=a.steps)
    dtype = (jnp.bfloat16 if jax.devices()[0].platform != "cpu"
             else jnp.float32)
    model = D3DP(cfg, compute_dtype=dtype,
                 attention_fn=select_attention_fn("auto"),
                 block_fn=select_block_fn("auto"))
    params = model.init_params(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    cam = np.array([2.29, 2.29, 0.02, -0.01, -0.2, 0.24, -0.002, 0.001,
                    -0.0005], np.float32)

    def make_seqs(n_seqs, frames):
        return [(cam, (0.1 * rng.randn(frames, cfg.num_kps, 3)
                       + [0, 0, 4]).astype(np.float32),
                 rng.randn(frames, cfg.num_kps, 2).astype(np.float32))
                for _ in range(n_seqs)]

    # ---- bare sampler (the bench's measure_ours shape: one 32-window jit)
    W = 32
    x2d = jnp.asarray(rng.randn(W, a.frames_rf, cfg.num_kps, 2), jnp.float32)
    x2f = jnp.asarray(rng.randn(W, a.frames_rf, cfg.num_kps, 2), jnp.float32)

    @jax.jit
    def sample(params, key, x2d, x2f):
        return model.ddim_sample(params, key, x2d, x2f)

    key = jax.random.PRNGKey(1)
    sync(sample(params, key, x2d, x2f))
    t0 = time.perf_counter()
    iters = 3
    for i in range(iters):
        sync(sample(params, jax.random.fold_in(key, i), x2d, x2f))
    sampler_fps = iters * W * a.frames_rf / (time.perf_counter() - t0)

    def run_pipeline(seqs, label):
        pin = ev.pinned_window_batch([s[2] for s in seqs], a.frames_rf,
                                     sub_batch=32)
        # warm
        ev.evaluate_sequences(model, params, seqs, None,
                              rng=jax.random.PRNGKey(1),
                              receptive_field=a.frames_rf,
                              num_proposals=a.proposals,
                              sampling_timesteps=a.steps, window_batch=pin)
        tm = {}
        t0 = time.perf_counter()
        acc, _ = ev.evaluate_sequences(model, params, seqs, None,
                                       rng=jax.random.PRNGKey(2),
                                       receptive_field=a.frames_rf,
                                       num_proposals=a.proposals,
                                       sampling_timesteps=a.steps,
                                       window_batch=pin, timings=tm)
        total = time.perf_counter() - t0
        frames = sum(s[2].shape[0] for s in seqs)
        tm = dict(tm)
        tm["total"] = total
        tm["other"] = total - sum(tm.get(k, 0.0) for k in
                                  ("host_prep", "transfer", "dispatch",
                                   "drain"))
        tm["fps"] = frames / total
        print(f"{label}: {tm['fps']:.2f} f/s  "
              + "  ".join(f"{k}={tm[k]:.2f}s" for k in
                          ("host_prep", "transfer", "dispatch", "drain",
                           "other", "total"))
              + f"  windows={tm.get('windows')} padded={tm.get('padded_rows')}",
              flush=True)
        return tm

    out = {"sampler_fps": round(sampler_fps, 2),
           "op_point": f"P={a.proposals},T={a.steps}",
           "backend": jax.default_backend()}
    print(f"bare sampler: {sampler_fps:.2f} f/s", flush=True)

    # bench workload: 8 x 405 frames = 120 windows (24-row partial tail)
    out["bench_workload"] = run_pipeline(make_seqs(a.seqs, a.frames),
                                         "bench workload")
    # exact-multiple workload: 128 windows = 4 full 32-batches, zero padding
    exact = make_seqs(a.seqs, 16 * a.frames_rf)  # 16 windows/seq x 8 = 128
    out["exact_workload"] = run_pipeline(exact, "exact-multiple workload")
    out["pipeline_over_sampler"] = round(
        out["bench_workload"]["fps"] / sampler_fps, 3)
    out["exact_over_sampler"] = round(
        out["exact_workload"]["fps"] / sampler_fps, 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
