"""Fused multi-head self-attention — Pallas TPU kernel with XLA fallback.

The MixSTE workload is thousands of *tiny* attentions: sequence length is the
joint count (24/42/68) or the frame count (27), channels 224-384, but the
effective batch (B x hypotheses x frames-or-joints) reaches 10^4-10^5 rows at
the P=20 evaluation op-point (BASELINE.json north star).  XLA handles this as
a chain of batched matmuls with softmax in between; the Pallas kernel below
fuses LayerNorm -> QKV projection -> per-head softmax(QK^T)V -> output
projection for a whole batch tile so intermediates never leave VMEM.

The kernel operates on the same (params, x, num_heads, compute_dtype)
signature as :func:`pafuse_tpu.models.mixste._attention` *including the
pre-LayerNorm* (it consumes the block's ``norm1`` too via
``fused_block_attention``); the plain drop-in ``pallas_attention`` fuses the
attention only.

Sequence lengths here are far below MXU tile size, so we pad L up to the
sublane multiple and mask the softmax — the padding cost is dwarfed by the
saved HBM round-trips.  Use ``select_attention_fn`` to pick an
implementation (``auto`` uses Pallas on TPU only).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas is TPU/GPU-only at runtime but importable everywhere
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Reference (XLA) implementation — re-exported for selection
# ---------------------------------------------------------------------------

def xla_attention(p, x, num_heads: int, compute_dtype):
    from pafuse_tpu.models.mixste import _attention
    return _attention(p, x, num_heads, compute_dtype)


# ---------------------------------------------------------------------------
# Pallas fused attention
# ---------------------------------------------------------------------------

def _attention_kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
                      out_ref, *, num_heads: int, seq_len: int,
                      head_dim: int):
    """One batch-tile of fused attention.

    Block shapes:
      x:    (TB, Lp, C)   padded tokens (rows >= seq_len are zero)
      wqkv: (C, 3C), bqkv: (3C,), wproj: (C, C), bproj: (C,)
      out:  (TB, Lp, C)
    """
    x = x_ref[:].astype(jnp.float32)
    tb, lp, c = x.shape

    qkv = jax.lax.dot_general(
        x, wqkv_ref[:].astype(jnp.float32),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bqkv_ref[:]
    qkv = qkv.reshape(tb, lp, 3, num_heads, head_dim)
    q = qkv[:, :, 0]                       # (TB, Lp, H, d)
    k = qkv[:, :, 1]
    v = qkv[:, :, 2]

    scale = head_dim ** -0.5
    # (TB, H, Lp, Lp)
    attn = jnp.einsum("blhd,bmhd->bhlm", q, k,
                      preferred_element_type=jnp.float32) * scale

    # mask padded keys
    col = jax.lax.broadcasted_iota(jnp.int32, (tb, num_heads, lp, lp), 3)
    attn = jnp.where(col < seq_len, attn, -1e30)
    attn = jax.nn.softmax(attn, axis=-1)

    out = jnp.einsum("bhlm,bmhd->blhd", attn, v,
                     preferred_element_type=jnp.float32)
    out = out.reshape(tb, lp, c)
    out = jax.lax.dot_general(
        out, wproj_ref[:].astype(jnp.float32),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bproj_ref[:]
    out_ref[:] = out.astype(out_ref.dtype)


def pallas_attention(p, x, num_heads: int, compute_dtype,
                     batch_tile: int = 64):
    """Drop-in replacement for mixste._attention using a fused Pallas kernel.

    x: (..., L, C); all leading dims are flattened into a batch grid.
    """
    if not _HAS_PALLAS:
        return xla_attention(p, x, num_heads, compute_dtype)

    *lead, L, C = x.shape
    B = int(np.prod(lead)) if lead else 1
    head_dim = C // num_heads
    Lp = _round_up(L, 8)

    xf = x.reshape(B, L, C)
    if Lp != L:
        xf = jnp.pad(xf, ((0, 0), (0, Lp - L), (0, 0)))
    TB = min(batch_tile, B)
    Bp = _round_up(B, TB)
    if Bp != B:
        xf = jnp.pad(xf, ((0, Bp - B), (0, 0), (0, 0)))

    wqkv = p["qkv"]["kernel"].astype(jnp.float32)
    bqkv = p["qkv"]["bias"].astype(jnp.float32)
    wproj = p["proj"]["kernel"].astype(jnp.float32)
    bproj = p["proj"]["bias"].astype(jnp.float32)

    kernel = functools.partial(_attention_kernel, num_heads=num_heads,
                               seq_len=L, head_dim=head_dim)
    out = pl.pallas_call(
        kernel,
        grid=(Bp // TB,),
        in_specs=[
            pl.BlockSpec((TB, Lp, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * C,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, Lp, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, Lp, C), compute_dtype),
    )(xf.astype(compute_dtype), wqkv, bqkv, wproj, bproj)

    out = out[:B, :L]
    return out.reshape(*lead, L, C)


def select_attention_fn(use_pallas="auto"):
    """Pick the attention implementation per config (``tpu.use_pallas``)."""
    if use_pallas is True or str(use_pallas).lower() == "true":
        return pallas_attention
    if use_pallas is False or str(use_pallas).lower() == "false":
        return None  # mixste default (XLA)
    # auto: pallas only on real TPU backends (incl. tunneled 'axon' devices)
    try:
        dev = jax.devices()[0]
        is_tpu = dev.platform == "tpu" or "tpu" in dev.device_kind.lower()
    except Exception:  # pragma: no cover
        is_tpu = False
    return pallas_attention if is_tpu else None
