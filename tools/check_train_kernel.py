#!/usr/bin/env python
"""On-chip correctness check of the trainable fused block kernel.

Compares ``ops.block_grad.block_train_apply`` (Pallas forward + custom
Pallas VJP) against the XLA autodiff reference (``mixste._block`` with the
same stochastic-depth branch masks applied, followed by the outer
LayerNorm) at the three flagship part shapes + the temporal shape.

Run on the TPU (the kernel declines on CPU):

    python tools/check_train_kernel.py

Prints max relative gradient error per shape; the expected class is
<=2e-3 (TPU matmul precision noise — both paths multiply in bf16 passes
at default precision).
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

from pafuse_tpu.models import mixste
from pafuse_tpu.ops.block_grad import block_train_apply, train_block_available


def _xla_ref(bp, on, x, m1, m2, num_heads):
    h = mixste._attention(bp["attn"], mixste._layernorm(bp["norm1"], x),
                          num_heads, jnp.float32)
    x = x + h * m1[:, None, None]
    h = mixste._mlp(bp["mlp"], mixste._layernorm(bp["norm2"], x), jnp.float32)
    x = x + h * m2[:, None, None]
    return mixste._layernorm(on, x)


def check(L, C, B=96, num_heads=8, seed=0, drop=True):
    cfg = mixste.MixSTEConfig(num_frames=27, num_joints=L, embed_dim=C)
    params = mixste.init_mixste(jax.random.PRNGKey(seed), cfg)
    bp, on = params["STEblocks"][0], params["Spatial_norm"]
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, L, C), jnp.float32)
    if drop:  # mix of kept / dropped / rescaled rows
        m1 = jnp.asarray((rng.rand(B) > 0.3) / 0.7, jnp.float32)
        m2 = jnp.asarray((rng.rand(B) > 0.3) / 0.7, jnp.float32)
    else:
        m1 = m2 = jnp.ones((B,), jnp.float32)
    g = jnp.asarray(rng.randn(B, L, C), jnp.float32)

    def loss_kernel(bp, on, x):
        return jnp.vdot(block_train_apply(bp, on, x, m1, m2, num_heads), g)

    def loss_ref(bp, on, x):
        return jnp.vdot(_xla_ref(bp, on, x, m1, m2, num_heads), g)

    y_k = block_train_apply(bp, on, x, m1, m2, num_heads)
    y_r = _xla_ref(bp, on, x, m1, m2, num_heads)
    fwd_err = float(jnp.max(jnp.abs(y_k - y_r)))

    gk = jax.jit(jax.grad(loss_kernel, argnums=(0, 1, 2)))(bp, on, x)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(bp, on, x)

    def rel(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        return np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-12)

    errs = {}
    for (ka, kb) in [(gk[0], gr[0]), (gk[1], gr[1])]:
        fa = jax.tree_util.tree_leaves_with_path(ka)
        fb = dict(jax.tree_util.tree_leaves_with_path(kb))
        for path, leaf in fa:
            errs[jax.tree_util.keystr(path)] = rel(leaf, fb[path])
    errs["dx"] = rel(gk[2], gr[2])
    worst = max(errs.items(), key=lambda kv: kv[1])
    print(f"L={L:3d} C={C:3d}: fwd max|diff|={fwd_err:.2e}  "
          f"grad max rel err={worst[1]:.2e} ({worst[0]})", flush=True)
    return worst[1]


def main():
    if not train_block_available():
        print("train kernel unavailable (CPU backend) — nothing to check")
        return 0
    worst = 0.0
    for (L, C) in [(24, 384), (68, 224), (21, 256), (27, 384)]:
        worst = max(worst, check(L, C))
    ok = worst < 5e-3
    print(f"worst grad rel err {worst:.2e} -> {'OK' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
