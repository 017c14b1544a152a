#!/usr/bin/env python
"""Headline benchmark: H3WB lifting throughput at the BASELINE.json op-point
(P=20 proposals, T=10 DDIM steps, flip TTA, part-based model).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec", "vs_baseline": N}

``vs_baseline`` is the speedup over the PyTorch-CPU reference pipeline at the
same op-point.  The torch baseline is measured once (tools/measure_torch_baseline.py,
which *runs* the reference in place on CPU) and cached in
``BASELINE_MEASURED.json``; if unavailable a conservative stored measurement
is used.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

NUM_PROPOSALS = 20
SAMPLING_TIMESTEPS = 10
# 32 windows x 20 proposals x 2 flip orientations: with bf16 logits and the
# fused block kernel the attention intermediates stay in VMEM, so batches
# that OOMed in round 1 (>8 windows) now fit with headroom; throughput is
# flat past ~16 windows (40.8 f/s @16, 42.6 @32 measured honestly).
WINDOWS = 32
FRAMES = 27


def measure_ours() -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pafuse_tpu.diffusion import D3DP, D3DPConfig
    from pafuse_tpu.ops.attention import select_attention_fn
    from pafuse_tpu.utils.backend import enable_compilation_cache, sync
    enable_compilation_cache()

    cfg = D3DPConfig(num_proposals=NUM_PROPOSALS,
                     sampling_timesteps=SAMPLING_TIMESTEPS)
    from pafuse_tpu.ops.attention import select_block_fn, select_layer_fn
    dtype = jnp.bfloat16 if jax.devices()[0].platform != "cpu" else jnp.float32
    # auto = fused whole-BLOCK Pallas kernel on TPU (best measured config).
    # PAFUSE_BENCH_PALLAS=0 forces the XLA path; =attn the attention-only
    # kernel; =layer the whole-layer kernel (documented negative result).
    env = os.environ.get("PAFUSE_BENCH_PALLAS", "")
    use = {"0": "false", "attn": "true", "block": "block",
           "block_t": "block_t", "layer": "layer"}.get(env, "auto")
    from pafuse_tpu.ops.attention import (select_block_t_fn,
                                          set_experimental_kernels)
    if use in ("block_t", "layer"):
        # explicit A/B request for a retained negative-result variant —
        # PAFUSE_BENCH_PALLAS IS the experimenter's opt-in (README "Support
        # tiers"); enable process-locally instead of mutating the env
        set_experimental_kernels(True)
    model = D3DP(cfg, compute_dtype=dtype,
                 attention_fn=select_attention_fn(use),
                 block_fn=select_block_fn(use),
                 block_t_fn=select_block_t_fn(use),
                 layer_fn=select_layer_fn(use))
    params = model.init_params(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    x2d = jnp.asarray(rng.randn(WINDOWS, FRAMES, 134, 2), jnp.float32)
    x2d_flip = jnp.asarray(rng.randn(WINDOWS, FRAMES, 134, 2), jnp.float32)

    @jax.jit
    def sample(params, key, x2d, x2d_flip):
        return model.ddim_sample(params, key, x2d, x2d_flip)

    key = jax.random.PRNGKey(1)
    sync(sample(params, key, x2d, x2d_flip))  # compile + full execution

    # Timing note: block_until_ready does NOT synchronize through tunneled
    # PJRT plugins; every iteration must end in a host readback that
    # data-depends on the result (utils.backend.sync) or throughput is
    # overstated by orders of magnitude.
    n_iters = 3
    t0 = time.perf_counter()
    for i in range(n_iters):
        sync(sample(params, jax.random.fold_in(key, i), x2d, x2d_flip))
    dt = time.perf_counter() - t0
    frames = n_iters * WINDOWS * FRAMES
    return frames / dt


def measure_pipeline() -> float:
    """CLI-equivalent evaluation pipeline throughput: host windowing ->
    flip-TTA DDIM sampling -> ALL aggregation metrics (J_Best/P_Best/P_Agg/
    J_Agg + part-based breakdowns) -> host accumulation, via
    ``evaluate.evaluate_sequences`` — the number a user of the reference's
    ``general.evaluate`` workload actually experiences (sans report I/O).

    Timed warm (one full compile+run first); the timed call ends in the
    accumulator's host readbacks, which are the honest sync."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pafuse_tpu.diffusion import D3DP, D3DPConfig
    from pafuse_tpu import evaluate as ev
    from pafuse_tpu.ops.attention import (select_attention_fn, select_block_fn,
                                          select_layer_fn)
    from pafuse_tpu.utils.backend import enable_compilation_cache
    enable_compilation_cache()

    cfg = D3DPConfig(num_proposals=NUM_PROPOSALS,
                     sampling_timesteps=SAMPLING_TIMESTEPS)
    dtype = jnp.bfloat16 if jax.devices()[0].platform != "cpu" else jnp.float32
    model = D3DP(cfg, compute_dtype=dtype,
                 attention_fn=select_attention_fn("auto"),
                 block_fn=select_block_fn("auto"),
                 layer_fn=select_layer_fn("auto"))
    params = model.init_params(jax.random.PRNGKey(0))

    # synthetic S8-like workload: PIPE_SEQS sequences x PIPE_FRAMES frames
    rng = np.random.RandomState(0)
    n_seqs = int(os.environ.get("PAFUSE_BENCH_PIPE_SEQS", 8))
    frames = int(os.environ.get("PAFUSE_BENCH_PIPE_FRAMES", 405))
    cam = np.array([2.29, 2.29, 0.02, -0.01, -0.2, 0.24, -0.002, 0.001,
                    -0.0005], np.float32)
    seqs = [(cam,
             (0.1 * rng.randn(frames, 134, 3) + [0, 0, 4]).astype(np.float32),
             rng.randn(frames, 134, 2).astype(np.float32))
            for _ in range(n_seqs)]
    pin = ev.pinned_window_batch([s[2] for s in seqs], FRAMES, sub_batch=32)

    def run(key):
        acc, _ = ev.evaluate_sequences(
            model, params, seqs, None, rng=key, receptive_field=FRAMES,
            num_proposals=NUM_PROPOSALS,
            sampling_timesteps=SAMPLING_TIMESTEPS, window_batch=pin)
        assert acc.n > 0
        return acc

    run(jax.random.PRNGKey(1))  # compile + warm
    t0 = time.perf_counter()
    run(jax.random.PRNGKey(2))
    dt = time.perf_counter() - t0
    return n_seqs * frames / dt


def torch_baseline_fps() -> float:
    cache = os.path.join(REPO, "BASELINE_MEASURED.json")
    if os.path.exists(cache):
        with open(cache) as f:
            return json.load(f)["torch_cpu_fps"]
    # Measure at a tiny op-point and scale: the reference's DDIM cost is
    # linear in P*T (proposals ride the batch; one denoiser pass per step
    # per flip orientation).  A direct P=20,T=10 torch-CPU call takes >10
    # minutes, so we measure P=4,T=1 and divide.
    try:
        sys.path.insert(0, os.path.join(REPO, "tools"))
        from measure_torch_baseline import measure
        p0, t0 = 4, 1
        fps_small = measure(num_proposals=p0, sampling_timesteps=t0,
                            windows=1, iters=1)
        fps = fps_small * (p0 * t0) / (NUM_PROPOSALS * SAMPLING_TIMESTEPS)
        with open(cache, "w") as f:
            json.dump({"torch_cpu_fps": fps,
                       "op_point": f"P={NUM_PROPOSALS},T={SAMPLING_TIMESTEPS} "
                                   f"(scaled linearly from P={p0},T={t0})"},
                      f)
        return fps
    except Exception as e:
        print(f"torch baseline unavailable ({e}); using stored estimate",
              file=sys.stderr)
        return float("nan")


def probe_backend(timeout_s: int = 180) -> None:
    """Fail fast if the accelerator backend is unreachable.

    A stalled tunnel makes ``jax.devices()`` hang in a retry loop with no
    error (observed multi-hour outages); probing in a subprocess with a
    timeout turns an indefinite hang into a clear failure."""
    import subprocess
    try:
        out = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.devices())"],
            capture_output=True, timeout=timeout_s, text=True)
    except subprocess.TimeoutExpired:
        print(f"bench: accelerator backend unreachable (jax.devices() hung "
              f"for {timeout_s}s — tunnel stall?); refusing to hang",
              file=sys.stderr)
        sys.exit(2)
    if out.returncode != 0:
        print(f"bench: backend probe failed:\n{out.stderr[-500:]}",
              file=sys.stderr)
        sys.exit(2)


def main():
    probe_backend()
    fps = measure_ours()
    pipe_fps = None
    if os.environ.get("PAFUSE_BENCH_PIPELINE", "1") != "0":
        try:
            pipe_fps = measure_pipeline()
        except Exception as e:   # the headline metric must still print
            print(f"pipeline bench failed ({e})", file=sys.stderr)
    base = torch_baseline_fps()
    vs = fps / base if base == base and base > 0 else None
    if pipe_fps is not None:
        # secondary metric first; the driver parses the LAST line
        print(json.dumps({
            "metric": f"full evaluation pipeline (windowing + flip-TTA DDIM "
                      f"+ all metrics) P={NUM_PROPOSALS} x "
                      f"T={SAMPLING_TIMESTEPS}, warm",
            "value": round(pipe_fps, 2),
            "unit": "frames/sec",
            "vs_baseline": (round(pipe_fps / base, 2)
                            if base == base and base > 0 else None),
        }))
    out = {
        "metric": f"H3WB lifting throughput, P={NUM_PROPOSALS} proposals x "
                  f"T={SAMPLING_TIMESTEPS} DDIM steps, flip-TTA, part-based "
                  "MixSTE (134 joints)",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }
    if pipe_fps is not None:
        out["pipeline_fps"] = round(pipe_fps, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
