#!/usr/bin/env python
"""Honest throughput datapoint for the 17-joint 3DHP variant at the
headline op-point (P=20, T=10, flip-TTA, monolithic cs=288 backbone).

    python tools/bench_3dhp.py [--windows 32] [--iters 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--windows", type=int, default=32)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--proposals", type=int, default=20)
    p.add_argument("--steps", type=int, default=10)
    a = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from pafuse_tpu import skeleton as sk
    from pafuse_tpu.diffusion import D3DP, D3DPConfig
    from pafuse_tpu.ops.attention import select_attention_fn, select_block_fn
    from pafuse_tpu.utils.backend import enable_compilation_cache, sync
    enable_compilation_cache()

    F = 27
    cfg = D3DPConfig(frames=F, num_kps=sk.NUM_JOINTS_3DHP, timesteps=1000,
                     num_proposals=a.proposals, sampling_timesteps=a.steps,
                     part_based=False, mm_scale=True, cs=288)
    dtype = (jnp.bfloat16 if jax.devices()[0].platform != "cpu"
             else jnp.float32)
    model = D3DP(cfg, flip_permutation=sk.FLIP_PERMUTATION_3DHP,
                 compute_dtype=dtype,
                 attention_fn=select_attention_fn("auto"),
                 block_fn=select_block_fn("auto"))
    params = model.init_params(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    x2d = jnp.asarray(rng.randn(a.windows, F, 17, 2), jnp.float32)
    x2d_flip = jnp.asarray(rng.randn(a.windows, F, 17, 2), jnp.float32)

    @jax.jit
    def sample(params, key, x2d, x2d_flip):
        return model.ddim_sample(params, key, x2d, x2d_flip)

    key = jax.random.PRNGKey(1)
    sync(sample(params, key, x2d, x2d_flip))  # compile + full execution
    t0 = time.perf_counter()
    for i in range(a.iters):
        sync(sample(params, jax.random.fold_in(key, i), x2d, x2d_flip))
    dt = time.perf_counter() - t0
    fps = a.iters * a.windows * F / dt
    print(json.dumps({
        "metric": f"3DHP 17-joint lifting throughput, P={a.proposals} x "
                  f"T={a.steps}, flip-TTA, monolithic cs=288",
        "value": round(fps, 2), "unit": "frames/sec",
        "windows": a.windows,
    }))


if __name__ == "__main__":
    main()
