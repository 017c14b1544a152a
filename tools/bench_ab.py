#!/usr/bin/env python
"""A/B throughput of execution strategies at the headline op-point
(P=20, T=10, flip-TTA): unpacked parts vs packed parts, across window-batch
sizes.  Prints one JSON line per (mode, windows) point.

    python tools/bench_ab.py [--windows 8,16,32] [--modes unpacked,packed]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NUM_PROPOSALS = 20
SAMPLING_TIMESTEPS = 10
FRAMES = 27


def measure(windows: int, packed: bool, iters: int = 5) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pafuse_tpu.diffusion import D3DP, D3DPConfig
    from pafuse_tpu.utils.backend import enable_compilation_cache, sync
    enable_compilation_cache()

    cfg = D3DPConfig(num_proposals=NUM_PROPOSALS,
                     sampling_timesteps=SAMPLING_TIMESTEPS)
    dtype = jnp.bfloat16 if jax.devices()[0].platform != "cpu" else jnp.float32
    model = D3DP(cfg, compute_dtype=dtype, packed_parts=packed)
    params = model.init_params(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    x2d = jnp.asarray(rng.randn(windows, FRAMES, 134, 2), jnp.float32)
    x2d_flip = jnp.asarray(rng.randn(windows, FRAMES, 134, 2), jnp.float32)

    @jax.jit
    def sample(params, key, x2d, x2d_flip):
        return model.ddim_sample(params, key, x2d, x2d_flip)

    key = jax.random.PRNGKey(1)
    sync(sample(params, key, x2d, x2d_flip))  # compile + full execution

    # honest timing: host readback per iteration (see utils.backend.sync)
    t0 = time.perf_counter()
    for i in range(iters):
        sync(sample(params, jax.random.fold_in(key, i), x2d, x2d_flip))
    dt = time.perf_counter() - t0
    return iters * windows * FRAMES / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--windows", default="8,16,32")
    p.add_argument("--modes", default="unpacked,packed")
    p.add_argument("--iters", type=int, default=5)
    a = p.parse_args()
    for mode in a.modes.split(","):
        for w in [int(x) for x in a.windows.split(",")]:
            try:
                fps = measure(w, packed=(mode == "packed"), iters=a.iters)
                print(json.dumps({"mode": mode, "windows": w,
                                  "frames_per_sec": round(fps, 1)}),
                      flush=True)
            except Exception as e:  # OOM etc.
                print(json.dumps({"mode": mode, "windows": w,
                                  "error": f"{type(e).__name__}: {str(e)[:120]}"}),
                      flush=True)


if __name__ == "__main__":
    main()
