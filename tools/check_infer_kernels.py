#!/usr/bin/env python
"""On-chip numerics check of the inference Pallas kernels vs the XLA path —
RESUMABLE (round-4 VERDICT #1b).

Cold Mosaic compiles through the tunneled backend can exceed a 15-minute
chip window, so the full matrix could never finish in one shot.  This tool
therefore:

* enables the persistent XLA compilation cache (recompiles are ~free on
  rerun),
* checks ONE shape at a time and records each result in a manifest
  (``KERNEL_NUMERICS.json`` at the repo root) immediately after it
  completes, and
* skips shapes already present in the manifest — rerunning after a timeout
  continues where the previous attempt died.

Default matrix = the SHIPPED path only: the fused whole-block kernel
(``pallas_block``, the ``tpu.use_pallas=auto`` default) at the four
flagship tile shapes (body/face/hand spatial + temporal).  The retained
negative-result variants (axis-aware temporal kernel, whole-layer kernel)
are exercised only with ``--all`` (they are A/B evidence behind
``tpu.experimental_kernels``, see README "Support tiers").

    python tools/check_infer_kernels.py            # shipped matrix, resume
    python tools/check_infer_kernels.py --all      # + experimental variants
    python tools/check_infer_kernels.py --only block:L68:C224
    python tools/check_infer_kernels.py --force    # re-measure everything
    python tools/check_infer_kernels.py --status   # print manifest, no chip

Expected class in f32 mode: ~1.5e-3 max abs diff (TPU f32 matmuls decompose
to bf16 passes at default precision on BOTH paths).  Threshold: 5e-3.
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MANIFEST = os.path.join(REPO, "KERNEL_NUMERICS.json")
THRESHOLD = 5e-3

# Shipped path: the whole-block kernel at every flagship tile shape
# (body/face/hand spatial tokens + the 27-frame temporal tokens).
DEFAULT_CASES = [("block", L, C) for (L, C) in
                 [(24, 384), (68, 224), (21, 256), (27, 384)]]
# Experimental tier (negative-result A/B variants): axis-aware temporal
# kernel at the part widths, whole-layer kernel at raw token lengths.
EXPERIMENTAL_CASES = ([("block_t", N, C) for (N, C) in
                       [(24, 384), (68, 224), (21, 256)]] +
                      [("layer", L, C) for (L, C) in
                       [(24, 384), (68, 224), (21, 256)]])


def case_key(kind, L, C):
    return f"{kind}:L{L}:C{C}"


def load_manifest():
    if os.path.exists(MANIFEST):
        with open(MANIFEST) as f:
            return json.load(f)
    return {"threshold": THRESHOLD, "results": {}}


def save_manifest(m):
    tmp = MANIFEST + ".tmp"
    with open(tmp, "w") as f:
        json.dump(m, f, indent=2, sort_keys=True)
    os.replace(tmp, MANIFEST)


def check_block(L, C, B=100, num_heads=8, seed=0):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pafuse_tpu.models import mixste
    from pafuse_tpu.ops.attention import pallas_block
    cfg = mixste.MixSTEConfig(num_frames=27, num_joints=L, embed_dim=C,
                              num_heads=num_heads)
    p = mixste.init_mixste(jax.random.PRNGKey(seed), cfg)
    bp, on = p["STEblocks"][0], p["Spatial_norm"]
    x = jnp.asarray(np.random.RandomState(seed).randn(B, L, C), jnp.float32)
    y = pallas_block(bp, on, x, num_heads, jnp.float32)
    ref = mixste._layernorm(on, mixste._block(bp, x, num_heads, jnp.float32))
    return float(jnp.max(jnp.abs(y - np.asarray(ref))))


def check_block_t(N, C, B=40, F=27, num_heads=8, seed=0):
    """Axis-aware temporal kernel on the native (B, F, N, C) layout vs the
    transposed XLA reference.  Exercises the joint-tile overhang (N=68 does
    not divide the 24-row tile) and the in-VMEM frame-axis relayout."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pafuse_tpu.models import mixste
    from pafuse_tpu.ops.attention import pallas_block_temporal
    cfg = mixste.MixSTEConfig(num_frames=F, num_joints=N, embed_dim=C,
                              num_heads=num_heads)
    p = mixste.init_mixste(jax.random.PRNGKey(seed), cfg)
    bp, on = p["TTEblocks"][0], p["Temporal_norm"]
    x = jnp.asarray(np.random.RandomState(seed).randn(B, F, N, C),
                    jnp.float32)
    y = pallas_block_temporal(bp, on, x, num_heads, jnp.float32)
    xt = jnp.swapaxes(x, 1, 2).reshape(B * N, F, C)
    ref = mixste._layernorm(on, mixste._block(bp, xt, num_heads, jnp.float32))
    ref = jnp.swapaxes(np.asarray(ref).reshape(B, N, F, C), 1, 2)
    return float(jnp.max(jnp.abs(y - ref)))


def check_layer(L, C, B=6, num_heads=8, seed=0):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pafuse_tpu.models import mixste
    from pafuse_tpu.ops.attention import pallas_layer
    cfg = mixste.MixSTEConfig(num_frames=27, num_joints=L, embed_dim=C,
                              num_heads=num_heads, depth=1)
    p = mixste.init_mixste(jax.random.PRNGKey(seed), cfg)
    rng = np.random.RandomState(seed)
    x2d = jnp.asarray(rng.randn(B, 27, L, 2), jnp.float32)
    x3d = jnp.asarray(rng.randn(B, 27, L, 3), jnp.float32)
    t = jnp.asarray(rng.randint(0, 1000, (B,)), jnp.int32)
    fwd = lambda **kw: mixste.mixste_forward(p, cfg, x2d, x3d, t,
                                             compute_dtype=jnp.float32, **kw)
    return float(jnp.max(jnp.abs(fwd(layer_fn=pallas_layer) - fwd())))


CHECKERS = {"block": check_block, "block_t": check_block_t,
            "layer": check_layer}


def print_status(m, cases):
    res = m.get("results", {})
    missing = []
    worst = 0.0
    for kind, L, C in cases:
        key = case_key(kind, L, C)
        if key in res:
            d = res[key]["max_abs_diff"]
            worst = max(worst, d)
            print(f"  {key:20s} {d:.2e}  ({res[key]['when']}, "
                  f"{res[key]['backend']}, {res[key]['elapsed_s']:.0f}s)")
        else:
            missing.append(key)
            print(f"  {key:20s} MISSING")
    if missing:
        print(f"{len(missing)} shape(s) unmeasured -> rerun to continue")
        return None
    ok = worst < m.get("threshold", THRESHOLD)
    print(f"worst {worst:.2e} -> {'OK' if ok else 'FAIL'}")
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true",
                    help="include experimental variants (block_t, layer)")
    ap.add_argument("--only", help="run one case, e.g. block:L68:C224")
    ap.add_argument("--force", action="store_true",
                    help="re-measure shapes already in the manifest")
    ap.add_argument("--status", action="store_true",
                    help="print the manifest and exit (no device work)")
    args = ap.parse_args()

    cases = list(DEFAULT_CASES) + (EXPERIMENTAL_CASES if args.all else [])
    if args.only:
        kind, ls, cs = args.only.split(":")
        cases = [(kind, int(ls[1:]), int(cs[1:]))]

    manifest = load_manifest()
    if args.status:
        ok = print_status(manifest, cases)
        # 0 = all measured + within threshold; 2 = manifest incomplete
        # (rerun to continue); 1 = numeric FAIL — distinct so CI can tell
        # "keep going" from "kernel numerics out of threshold"
        return 0 if ok else (2 if ok is None else 1)

    from pafuse_tpu.utils.backend import enable_compilation_cache
    enable_compilation_cache()
    import jax
    if jax.default_backend() == "cpu":
        print("CPU backend: kernels decline (fallback paths are exercised "
              "by tests/test_mixste.py) — nothing to check here")
        return 0
    backend = jax.default_backend()

    for kind, L, C in cases:
        key = case_key(kind, L, C)
        if not args.force and key in manifest["results"]:
            print(f"{key:20s} cached {manifest['results'][key]['max_abs_diff']:.2e}",
                  flush=True)
            continue
        t0 = time.time()
        print(f"{key:20s} measuring...", flush=True)
        d = CHECKERS[kind](L, C)
        manifest["results"][key] = {
            "max_abs_diff": d,
            "when": time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime()),
            "backend": backend,
            "elapsed_s": round(time.time() - t0, 1),
        }
        save_manifest(manifest)   # written per shape: timeouts lose <=1 shape
        print(f"{key:20s} max|diff| vs XLA = {d:.2e} "
              f"({time.time() - t0:.0f}s)", flush=True)

    ok = print_status(manifest, cases)
    return 0 if ok else (2 if ok is None else 1)


if __name__ == "__main__":
    sys.exit(main())
