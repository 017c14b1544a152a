#!/usr/bin/env python
"""A/B timing of the temporal block at flagship shapes: materialized
HBM-transpose path (swapaxes -> pallas_block -> swapaxes, today's default)
vs the axis-aware kernel (pallas_block_temporal on the native layout).

Both variants map (B, F, N, C) -> (B, F, N, C), so N chained calls under
one jit (with a data dependency between calls) time the full per-layer
temporal cost including any transpose copies; the loop ends in a host
readback (the honest sync through the tunneled backend).

    python tools/bench_block_t.py --N 24 --C 384           # body
    python tools/bench_block_t.py --N 68 --C 224           # face
    python tools/bench_block_t.py --N 21 --C 256           # hand
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
    p.add_argument("--N", type=int, default=24, help="joints (rows axis)")
    p.add_argument("--C", type=int, default=384)
    p.add_argument("--B", type=int, default=1280,
                   help="window batch (32 windows x 20 proposals x 2 flip)")
    p.add_argument("--F", type=int, default=27)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--chain", type=int, default=24)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    a = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from pafuse_tpu.models import mixste
    from pafuse_tpu.ops.attention import pallas_block, pallas_block_temporal
    from pafuse_tpu.utils.backend import enable_compilation_cache, sync
    enable_compilation_cache()

    dtype = jnp.bfloat16 if a.dtype == "bf16" else jnp.float32
    cfg = mixste.MixSTEConfig(num_frames=a.F, num_joints=a.N, embed_dim=a.C,
                              num_heads=a.heads)
    params = mixste.init_mixste(jax.random.PRNGKey(0), cfg)
    bp, on = params["TTEblocks"][0], params["Temporal_norm"]
    x = jnp.asarray(
        np.random.RandomState(0).randn(a.B, a.F, a.N, a.C) * 0.1, dtype)

    def via_transpose(z):
        B, F, N, C = z.shape
        zt = jnp.swapaxes(z, 1, 2).reshape(B * N, F, C)
        y = pallas_block(bp, on, zt, a.heads, dtype)
        return jnp.swapaxes(y.reshape(B, N, F, C), 1, 2)

    def axis_aware(z):
        return pallas_block_temporal(bp, on, z, a.heads, dtype)

    results = {}
    for name, call in [("transpose+block", via_transpose),
                       ("block_t", axis_aware)]:
        @jax.jit
        def chain(z, _call=call):
            for _ in range(a.chain):
                z = _call(z) * jnp.asarray(0.5, dtype)  # data dep, bounded
            return z
        t0 = time.perf_counter()
        sync(chain(x))  # compile + first run
        print(f"{name}: compile+first {time.perf_counter() - t0:.0f}s",
              flush=True)
        best = float("inf")
        for _ in range(a.iters):
            t0 = time.perf_counter()
            sync(chain(x))
            best = min(best, (time.perf_counter() - t0) / a.chain)
        results[name] = best * 1e3
        print(f"{name}: {best * 1e3:.2f} ms/call", flush=True)

    print(json.dumps({"shape": [a.B, a.F, a.N, a.C], "dtype": a.dtype,
                      "ms_per_call": results}))


if __name__ == "__main__":
    sys.exit(main())
