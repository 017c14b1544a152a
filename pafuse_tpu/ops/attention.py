"""Fused multi-head self-attention — Pallas TPU kernel with XLA fallback.

The MixSTE workload is thousands of *tiny* attentions: sequence length is the
joint count (24/42/68) or the frame count (27), channels 224-384, but the
effective batch (B x hypotheses x frames-or-joints) reaches 10^4-10^5 rows at
the P=20 evaluation op-point (BASELINE.json north star).  XLA handles this as
a chain of batched matmuls with softmax in between; the Pallas kernel below
fuses LayerNorm -> QKV projection -> per-head softmax(QK^T)V -> output
projection for a whole batch tile so intermediates never leave VMEM.

Two kernels:

* ``pallas_attention`` — drop-in for :func:`mixste._attention` (QKV ->
  per-head softmax(QK^T)V -> proj in one VMEM pass);
* ``pallas_block`` — the whole transformer block: LN1 -> attention ->
  +residual -> LN2 -> MLP -> +residual -> outer (Spatial/Temporal) LN.

Sequence lengths here are far below MXU tile size, so we pad L up to the
sublane multiple and mask the softmax — the padding cost is dwarfed by the
saved HBM round-trips.  Use ``select_attention_fn``/``select_block_fn`` to
pick an implementation (``auto`` uses the attention kernel on TPU for
inference; training keeps XLA for autodiff).
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
        x.reshape(tb * lp, c), wqkv_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bqkv_ref[:]
    qkv = qkv.reshape(tb, lp, 3 * c)  # leading-dims reshape only (Mosaic-safe)

    scale = head_dim ** -0.5
    # per-head python loop: Mosaic supports 3D matmuls with a SINGLE batch
    # dim and static minor-dim slices, but not rank>3 batched matmuls or
    # minor-dim splits into (head, d).
    col = jax.lax.broadcasted_iota(jnp.int32, (tb, lp, lp), 2)
    head_outs = []
    for h in range(num_heads):
        q = qkv[:, :, h * head_dim:(h + 1) * head_dim]
        k = qkv[:, :, c + h * head_dim: c + (h + 1) * head_dim]
        v = qkv[:, :, 2 * c + h * head_dim: 2 * c + (h + 1) * head_dim]
        attn = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale   # (TB, Lp, Lp)
        attn = jnp.where(col < seq_len, attn, -1e30)
        attn = jax.nn.softmax(attn, axis=-1)
        head_outs.append(jax.lax.dot_general(
            attn, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))          # (TB, Lp, d)
    out = jnp.concatenate(head_outs, axis=-1)             # (TB, Lp, C)
    out = jax.lax.dot_general(
        out.reshape(tb * lp, c), wproj_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bproj_ref[:]
    out_ref[:] = out.reshape(tb, lp, c).astype(out_ref.dtype)


def pallas_attention(p, x, num_heads: int, compute_dtype,
                     batch_tile: int = 32):
    """Drop-in replacement for mixste._attention using a fused Pallas kernel.

    x: (..., L, C); all leading dims are flattened into a batch grid.
    """
    if not _HAS_PALLAS:
        return xla_attention(p, x, num_heads, compute_dtype)
    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover
        backend = "cpu"
    if backend == "cpu":
        # Mosaic kernels don't run on the CPU backend; keep the call safe
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xf.astype(compute_dtype), wqkv, bqkv, wproj, bproj)

    out = out[:B, :L]
    return out.reshape(*lead, L, C)


def select_attention_fn(use_pallas="auto", *, train: bool = False):
    """Pick the attention implementation per config (``tpu.use_pallas``).

    ``auto`` (honest-timing A/B, round 2): the fused Pallas kernel wins
    decisively at the model level — 729 vs 1709 ms per flagship denoiser
    pass at the P=20,T=10 batch (B_eff=320, bf16) — because the XLA path
    materializes per-head transposed q/k/v and lane-padded logits in HBM
    while the kernel keeps the whole attention in VMEM.  (Round 1 had
    concluded the opposite from timings inflated by the tunnel's broken
    ``block_until_ready``.)  Pallas applies to INFERENCE only: the kernel
    defines no custom VJP, so training (``train=True``) keeps the XLA path
    for autodiff.  On CPU backends ``pallas_attention`` self-falls-back to
    XLA.
    """
    if use_pallas is True or str(use_pallas).lower() == "true":
        return pallas_attention
    if use_pallas is False or str(use_pallas).lower() == "false":
        return None  # mixste default (XLA)
    return None if train else pallas_attention


# ---------------------------------------------------------------------------
# Full-block fused kernel: LN1 -> attention -> +res -> LN2 -> MLP -> +res ->
# outer LN, one VMEM-resident pass per batch tile.  Removes the MLP/LN HBM
# round-trips that remain after fusing attention alone.
# ---------------------------------------------------------------------------

def _erf_as(x):
    """erf via Abramowitz-Stegun 7.1.26 (|error| <= 1.5e-7) — Mosaic has no
    erf/erfc lowering; exp it does."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _ln_f32(x, scale_ref, bias_ref, eps=1e-6):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale_ref[:] + bias_ref[:]


def _block_kernel(x_ref, n1s_ref, n1b_ref, wqkv_ref, bqkv_ref, wproj_ref,
                  bproj_ref, n2s_ref, n2b_ref, wfc1_ref, bfc1_ref, wfc2_ref,
                  bfc2_ref, nos_ref, nob_ref, out_ref, *, num_heads: int,
                  seq_len: int, head_dim: int):
    """Matmuls run in the compute dtype of ``x_ref`` (bf16 at the bench
    op-point — single-pass MXU; f32 mode keeps exact math) with f32
    accumulation; LayerNorm statistics, softmax and GELU in f32 — the same
    numeric contract as the XLA path."""
    xin = x_ref[:]                                         # (TB, Lp, C)
    cd = xin.dtype
    tb, lp, c = xin.shape
    f32 = jnp.float32

    def dot2d(a, w_ref, b_ref):
        y = jax.lax.dot_general(
            a.reshape(tb * lp, c) if a.ndim == 3 else a,
            w_ref[:].astype(cd),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32) + b_ref[:]
        return y

    h = _ln_f32(xin.astype(f32), n1s_ref, n1b_ref).astype(cd)
    qkv = dot2d(h, wqkv_ref, bqkv_ref).astype(cd).reshape(tb, lp, 3 * c)

    scale = head_dim ** -0.5
    col = jax.lax.broadcasted_iota(jnp.int32, (tb, lp, lp), 2)
    head_outs = []
    for hh in range(num_heads):
        q = qkv[:, :, hh * head_dim:(hh + 1) * head_dim]
        k = qkv[:, :, c + hh * head_dim: c + (hh + 1) * head_dim]
        v = qkv[:, :, 2 * c + hh * head_dim: 2 * c + (hh + 1) * head_dim]
        attn = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=f32) * scale
        attn = jnp.where(col < seq_len, attn, -1e30)
        attn = jax.nn.softmax(attn, axis=-1).astype(cd)
        head_outs.append(jax.lax.dot_general(
            attn, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32).astype(cd))
    ao = jnp.concatenate(head_outs, axis=-1)               # (TB, Lp, C) cd
    ao = dot2d(ao, wproj_ref, bproj_ref).astype(cd)
    x = xin + ao.reshape(tb, lp, c)

    h = _ln_f32(x.astype(f32), n2s_ref, n2b_ref).astype(cd)
    hdn = dot2d(h, wfc1_ref, bfc1_ref)                     # f32
    # exact-GELU via the A&S erf approximation (<=1.5e-7 vs true erf)
    hdn = (0.5 * hdn * (1.0 + _erf_as(hdn * 0.7071067811865476))).astype(cd)
    mo = jax.lax.dot_general(
        hdn, wfc2_ref[:].astype(cd),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32) + bfc2_ref[:]
    x = x + mo.astype(cd).reshape(tb, lp, c)

    x = _ln_f32(x.astype(f32), nos_ref, nob_ref)           # outer S/T norm
    out_ref[:] = x.astype(out_ref.dtype)


def pallas_block(block_params, outer_norm, x, num_heads: int, compute_dtype,
                 batch_tile: int = 32):
    """Fused transformer block + outer LayerNorm.

    Replaces ``_layernorm(outer, _block(params, x, ...))`` on the eval path
    (no stochastic depth).  x: (..., L, C).
    """
    if not _HAS_PALLAS:
        return None  # caller falls back
    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover
        backend = "cpu"
    if backend == "cpu":
        return None

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

    f32 = jnp.float32
    args = [
        xf.astype(compute_dtype),
        block_params["norm1"]["scale"].astype(f32),
        block_params["norm1"]["bias"].astype(f32),
        block_params["attn"]["qkv"]["kernel"].astype(f32),
        block_params["attn"]["qkv"]["bias"].astype(f32),
        block_params["attn"]["proj"]["kernel"].astype(f32),
        block_params["attn"]["proj"]["bias"].astype(f32),
        block_params["norm2"]["scale"].astype(f32),
        block_params["norm2"]["bias"].astype(f32),
        block_params["mlp"]["fc1"]["kernel"].astype(f32),
        block_params["mlp"]["fc1"]["bias"].astype(f32),
        block_params["mlp"]["fc2"]["kernel"].astype(f32),
        block_params["mlp"]["fc2"]["bias"].astype(f32),
        outer_norm["scale"].astype(f32),
        outer_norm["bias"].astype(f32),
    ]
    hidden = block_params["mlp"]["fc1"]["kernel"].shape[1]
    vec = lambda n: pl.BlockSpec((n,), lambda i: (0,),
                                 memory_space=pltpu.VMEM)
    mat = lambda m, n: pl.BlockSpec((m, n), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((TB, Lp, C), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        vec(C), vec(C), mat(C, 3 * C), vec(3 * C), mat(C, C), vec(C),
        vec(C), vec(C), mat(C, hidden), vec(hidden), mat(hidden, C), vec(C),
        vec(C), vec(C),
    ]
    kernel = functools.partial(_block_kernel, num_heads=num_heads,
                               seq_len=L, head_dim=head_dim)
    out = pl.pallas_call(
        kernel,
        grid=(Bp // TB,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TB, Lp, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, Lp, C), compute_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(*args)
    return out[:B, :L].reshape(*lead, L, C)


def select_block_fn(use_pallas="auto", *, train: bool = False):
    """Fused whole-block kernel selection (eval only; training has no kernel
    VJP).  ``auto`` selects it: honest back-to-back bench at P=20,T=10 is
    40.2 f/s (block kernel) vs 29.9 (attention kernel) vs 14.0 (XLA)."""
    if train:
        return None
    return (pallas_block
            if str(use_pallas).lower() in ("block", "auto") else None)
