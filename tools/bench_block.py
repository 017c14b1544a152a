#!/usr/bin/env python
"""Per-call timing of the fused block kernel at a given tile shape.

Times ``pallas_block`` (or the XLA block with --xla) via N chained calls
under one jit with a data dependency between calls, ending in a host
readback (the honest sync through the tunneled backend).  Used for the
face-attention policy A/B (docs/ROADMAP.md):

    PAFUSE_ATTN_POLICY=auto  python tools/bench_block.py --L 68 --C 224
    PAFUSE_ATTN_POLICY=heads python tools/bench_block.py --L 68 --C 224
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
    p.add_argument("--L", type=int, default=68)
    p.add_argument("--C", type=int, default=224)
    p.add_argument("--B", type=int, default=34560,
                   help="total batch rows (flagship face spatial tile: "
                        "32 windows x 20 proposals x 2 flip x 27 frames)")
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--chain", type=int, default=50)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--xla", action="store_true")
    p.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    a = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from pafuse_tpu.models import mixste
    from pafuse_tpu.ops.attention import pallas_block
    from pafuse_tpu.utils.backend import enable_compilation_cache, sync
    enable_compilation_cache()

    dtype = jnp.bfloat16 if a.dtype == "bf16" else jnp.float32
    cfg = mixste.MixSTEConfig(num_frames=27, num_joints=a.L, embed_dim=a.C,
                              num_heads=a.heads)
    params = mixste.init_mixste(jax.random.PRNGKey(0), cfg)
    bp, on = params["STEblocks"][0], params["Spatial_norm"]
    x = jnp.asarray(np.random.RandomState(0).randn(a.B, a.L, a.C) * 0.1,
                    dtype)

    if a.xla:
        def call(z):
            return mixste._layernorm(
                on, mixste._block(bp, z, a.heads, dtype)).astype(dtype)
    else:
        def call(z):
            return pallas_block(bp, on, z, a.heads, dtype)

    @jax.jit
    def chained(z):
        for _ in range(a.chain):
            z = call(z) * 0.5  # keep magnitudes bounded; forces dependency
        return z

    sync(chained(x))  # compile + one run
    t0 = time.perf_counter()
    for _ in range(a.iters):
        sync(chained(x))
    dt = time.perf_counter() - t0
    ms_per_call = dt / (a.iters * a.chain) * 1000.0
    print(json.dumps({
        "impl": "xla" if a.xla else "pallas_block",
        "policy": os.environ.get("PAFUSE_ATTN_POLICY", "auto"),
        "L": a.L, "C": a.C, "B": a.B, "dtype": a.dtype,
        "ms_per_call": round(ms_per_call, 2),
    }))


if __name__ == "__main__":
    main()
