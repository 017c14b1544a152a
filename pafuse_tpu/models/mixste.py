"""MixSTE2 spatio-temporal transformer denoiser — functional JAX.

Re-design of the reference backbone (``/root/reference/common/mixste.py:141-298``)
for TPU:

* **Pure functions + explicit param pytrees.**  ``init_mixste`` builds the
  parameter tree, ``mixste_forward`` applies it.  The tree's key structure
  mirrors the torch module names (``STEblocks.3.attn.qkv`` ...), making the
  torch->JAX checkpoint converter (:mod:`pafuse_tpu.checkpoints`) a
  mechanical rename + transpose.
* **Rank-4 core.**  The torch code branches on train/eval rank and folds the
  hypothesis axis into the batch with einops rearranges
  (mixste.py:213-245, 278-298).  Here the core always consumes
  ``(B, F, N, C)``; the diffusion wrapper folds ``(B, H)`` into ``B``.
  Attention operates on the last two axes directly (batched over all leading
  dims) so the spatial/temporal alternation is a transpose, not a reshape —
  XLA fuses these away.
* **MXU-friendly compute.**  All matmuls carry
  ``preferred_element_type=float32`` and the whole block can run in bfloat16
  activations via ``compute_dtype``; an optional fused Pallas attention
  kernel is plugged in through :mod:`pafuse_tpu.ops.attention`.

Architecture parity notes (checked against the reference):
  - pre-LN blocks, LayerNorm eps=1e-6 for block/Spatial/Temporal norms
    (mixste.py:163), but the regression head's LayerNorm uses torch's
    default eps=1e-5 (mixste.py:207-210);
  - qkv packed as one Linear(dim, 3*dim, bias=True), scale=head_dim**-0.5;
  - learned spatial+temporal position embeddings initialized to zeros;
  - sinusoidal timestep embedding -> Linear -> GELU -> Linear
    (mixste.py:127-139, 179-184), added per token;
  - stochastic depth with per-block rates linspace(0, drop_path_rate, depth).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class MixSTEConfig:
    num_frames: int = 27
    num_joints: int = 24
    in_chans: int = 5
    embed_dim: int = 384
    depth: int = 8
    num_heads: int = 8
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    out_dim: int = 3

    @property
    def has_dropout(self) -> bool:
        return self.drop_rate > 0.0 or self.attn_drop_rate > 0.0

    @property
    def drop_path_rates(self) -> np.ndarray:
        return np.linspace(0.0, self.drop_path_rate, self.depth)


# ---------------------------------------------------------------------------
# Initialization (torch nn.Linear / nn.LayerNorm defaults)
# ---------------------------------------------------------------------------

def _linear_init(key, fan_in: int, fan_out: int, bias: bool = True) -> Params:
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    p: Params = {"kernel": jax.random.uniform(
        kw, (fan_in, fan_out), jnp.float32, -bound, bound)}
    if bias:
        p["bias"] = jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound)
    return p


def _layernorm_init(dim: int) -> Params:
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def _block_init(key, dim: int, mlp_ratio: float) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    hidden = int(dim * mlp_ratio)
    return {
        "norm1": _layernorm_init(dim),
        "attn": {
            "qkv": _linear_init(k1, dim, dim * 3),
            "proj": _linear_init(k2, dim, dim),
        },
        "norm2": _layernorm_init(dim),
        "mlp": {
            "fc1": _linear_init(k3, dim, hidden),
            "fc2": _linear_init(k4, hidden, dim),
        },
    }


def init_mixste(key, cfg: MixSTEConfig) -> Params:
    keys = jax.random.split(key, 4 + 2 * cfg.depth)
    params: Params = {
        "Spatial_patch_to_embedding": _linear_init(keys[0], cfg.in_chans, cfg.embed_dim),
        "Spatial_pos_embed": jnp.zeros((1, cfg.num_joints, cfg.embed_dim), jnp.float32),
        "Temporal_pos_embed": jnp.zeros((1, cfg.num_frames, cfg.embed_dim), jnp.float32),
        "time_mlp": {
            "fc1": _linear_init(keys[1], cfg.embed_dim, cfg.embed_dim * 2),
            "fc2": _linear_init(keys[2], cfg.embed_dim * 2, cfg.embed_dim),
        },
        "STEblocks": [
            _block_init(keys[4 + i], cfg.embed_dim, cfg.mlp_ratio)
            for i in range(cfg.depth)
        ],
        "TTEblocks": [
            _block_init(keys[4 + cfg.depth + i], cfg.embed_dim, cfg.mlp_ratio)
            for i in range(cfg.depth)
        ],
        "Spatial_norm": _layernorm_init(cfg.embed_dim),
        "Temporal_norm": _layernorm_init(cfg.embed_dim),
        "head": {
            "norm": _layernorm_init(cfg.embed_dim),
            "fc": _linear_init(keys[3], cfg.embed_dim, cfg.out_dim),
        },
    }
    return params


def param_count(params: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


# ---------------------------------------------------------------------------
# Forward building blocks
# ---------------------------------------------------------------------------

def _linear(p: Params, x, compute_dtype):
    kernel = p["kernel"].astype(compute_dtype)
    y = jnp.dot(x, kernel, preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(compute_dtype)


def _layernorm(p: Params, x, eps: float = 1e-6):
    # LayerNorm statistics in float32 for stability regardless of compute dtype.
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"] + p["bias"]
    return y.astype(x.dtype)


def _dropout(x, rate: float, rng):
    """Inverted dropout (train-mode only; matches torch nn.Dropout)."""
    if rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / jnp.asarray(keep, x.dtype),
                     jnp.zeros((), x.dtype))


def _attention(p: Params, x, num_heads: int, compute_dtype, *,
               attn_drop: float = 0.0, proj_drop: float = 0.0, rng=None):
    """Multi-head self-attention over the -2 axis of ``(..., L, C)``."""
    *lead, L, C = x.shape
    head_dim = C // num_heads
    scale = head_dim ** -0.5

    qkv = _linear(p["qkv"], x, compute_dtype)                  # (..., L, 3C)
    qkv = qkv.reshape(*lead, L, 3, num_heads, head_dim)
    q = jnp.moveaxis(qkv[..., 0, :, :], -2, -3)                 # (..., H, L, d)
    k = jnp.moveaxis(qkv[..., 1, :, :], -2, -3)
    v = jnp.moveaxis(qkv[..., 2, :, :], -2, -3)

    attn = jnp.einsum("...ld,...md->...lm", q, k,
                      preferred_element_type=jnp.float32) * scale
    # Store the (..., L, L) logits in the compute dtype: at the P=20 eval
    # op-point this tensor (L lane-padded to 128) dominates HBM; keeping it
    # bf16 halves peak memory.  The softmax itself still runs in f32 (XLA
    # fuses the up/down casts into the surrounding loops), and in f32 mode
    # these casts are no-ops so strict-parity numerics are unchanged.
    attn = attn.astype(compute_dtype)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(compute_dtype)
    if rng is not None and (attn_drop > 0.0 or proj_drop > 0.0):
        r_attn, r_proj = jax.random.split(rng)
    else:
        r_attn = r_proj = None
    attn = _dropout(attn, attn_drop, r_attn)   # mixste.py:73 attn_drop
    out = jnp.einsum("...lm,...md->...ld", attn, v,
                     preferred_element_type=jnp.float32).astype(compute_dtype)
    out = jnp.moveaxis(out, -3, -2).reshape(*lead, L, C)
    out = _linear(p["proj"], out, compute_dtype)
    return _dropout(out, proj_drop, r_proj)    # mixste.py:59 proj_drop


def _mlp(p: Params, x, compute_dtype, *, drop: float = 0.0, rng=None):
    r1, r2 = (jax.random.split(rng)
              if (rng is not None and drop > 0.0) else (None, None))
    h = _linear(p["fc1"], x, compute_dtype)
    h = jax.nn.gelu(h, approximate=False)
    h = _dropout(h, drop, r1)                  # mixste.py:39-43 Mlp.drop x2
    h = _linear(p["fc2"], h, compute_dtype)
    return _dropout(h, drop, r2)


def _drop_path(x, rate: float, rng, batch_ndim: int):
    """Stochastic depth: drop the residual branch per leading-batch sample."""
    if rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    shape = x.shape[:batch_ndim] + (1,) * (x.ndim - batch_ndim)
    mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
    return x * mask / keep


def _block(p: Params, x, num_heads: int, compute_dtype,
           drop_path_rate: float = 0.0, rng=None, batch_ndim: int = 1,
           attention_fn=None, drop_rate: float = 0.0,
           attn_drop_rate: float = 0.0, drop_rng=None):
    attn_fn = attention_fn or _attention
    r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
    d1, d2 = (jax.random.split(drop_rng)
              if drop_rng is not None else (None, None))
    xn = _layernorm(p["norm1"], x)
    if drop_rng is not None and (drop_rate > 0.0 or attn_drop_rate > 0.0):
        # dropout lives only in the reference _attention/_mlp bodies; a
        # custom attention_fn (fused kernel) has no dropout hook, so the
        # caller disables kernels whenever dropout is active
        h = _attention(p["attn"], xn, num_heads, compute_dtype,
                       attn_drop=attn_drop_rate, proj_drop=drop_rate, rng=d1)
    else:
        h = attn_fn(p["attn"], xn, num_heads, compute_dtype)
    x = x + _drop_path(h, drop_path_rate, r1, batch_ndim)
    h = _mlp(p["mlp"], _layernorm(p["norm2"], x), compute_dtype,
             drop=drop_rate, rng=d2)
    x = x + _drop_path(h, drop_path_rate, r2, batch_ndim)
    return x


def sinusoidal_time_embedding(t, dim: int):
    """mixste.py:127-139 — sin/cos positional embedding of diffusion step."""
    half = dim // 2
    freq = math.log(10000.0) / (half - 1)
    emb = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -freq)
    emb = t.astype(jnp.float32)[:, None] * emb[None, :]
    return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


# ---------------------------------------------------------------------------
# Full forward
# ---------------------------------------------------------------------------

def _branch_masks(rng, rate: float, batch: int, reps: int):
    """Per-sample stochastic-depth scale factors for the two residual
    branches, repeated over the second leading dim (frames or joints) to
    match the flattened tile layout of the fused train kernel.  Bit-
    identical to :func:`_drop_path`'s draws (same key split, same element
    count)."""
    if rate <= 0.0 or rng is None:
        m = jnp.ones((batch * reps,), jnp.float32)
        return m, m
    r1, r2 = jax.random.split(rng)
    keep = 1.0 - rate
    m1 = jax.random.bernoulli(r1, keep, (batch,)).astype(jnp.float32) / keep
    m2 = jax.random.bernoulli(r2, keep, (batch,)).astype(jnp.float32) / keep
    return jnp.repeat(m1, reps), jnp.repeat(m2, reps)


def mixste_forward(params: Params, cfg: MixSTEConfig, x2d, x3d, t, *,
                   train: bool = False, rng=None,
                   compute_dtype=jnp.float32, attention_fn=None,
                   block_fn=None, train_block_fn=None, layer_fn=None,
                   block_t_fn=None, remat: bool = False):
    """Denoise one window.

    Args:
      x2d: (B, F, N, 2) conditioning 2D keypoints.
      x3d: (B, F, N, 3) noisy 3D pose.
      t:   (B,) integer diffusion timestep.
    Returns:
      (B, F, N, 3) predicted x0.
    """
    B, F, N, _ = x2d.shape
    x = jnp.concatenate([x2d, x3d], axis=-1).astype(compute_dtype)

    # Spatial embedding + positional + timestep embeddings (mixste.py:213-235).
    x = _linear(params["Spatial_patch_to_embedding"], x, compute_dtype)
    x = x + params["Spatial_pos_embed"][None].astype(compute_dtype)

    te = sinusoidal_time_embedding(t, cfg.embed_dim)
    te = _linear(params["time_mlp"]["fc1"], te.astype(compute_dtype), compute_dtype)
    te = jax.nn.gelu(te, approximate=False)
    te = _linear(params["time_mlp"]["fc2"], te, compute_dtype)
    x = x + te[:, None, None, :]

    dprs = cfg.drop_path_rates if train else np.zeros(cfg.depth)
    rngs = (list(jax.random.split(rng, 2 * cfg.depth))
            if (train and rng is not None) else [None] * (2 * cfg.depth))
    # Dropout (model.dropout / attn_drop, reference mixste.py:35,56-59,73):
    # a SEPARATE key stream (fold_in) so the stochastic-depth draws above are
    # bit-identical to the dropout-free path when rates are zero.
    use_dropout = train and rng is not None and cfg.has_dropout
    if use_dropout:
        dkeys = list(jax.random.split(jax.random.fold_in(rng, 0x0d0d),
                                      2 * cfg.depth + 2))
        drop_rngs, pos_keys = dkeys[:2 * cfg.depth], dkeys[2 * cfg.depth:]
        # pos_drop after the spatial/time embeddings (mixste.py:237)
        x = _dropout(x, cfg.drop_rate, pos_keys[0])
    else:
        drop_rngs, pos_keys = [None] * (2 * cfg.depth), [None, None]

    # block_fn: optional fused whole-block kernel (LN1+attn+LN2+MLP+outer
    # LN in one pass, ops/attention.pallas_block); eval-only (no stochastic
    # depth) and may return None to decline (e.g. CPU backend).
    # train_block_fn: the trainable variant (custom Pallas VJP,
    # ops/block_grad) with stochastic depth via per-sample branch masks.
    use_block = block_fn is not None and not train
    # the fused train kernel has no dropout hook — fall back to XLA when
    # dropout is active (stochastic depth IS supported via branch masks)
    use_train_block = (train_block_fn is not None and train
                       and not use_dropout)
    # layer_fn: optional fused whole-layer kernel (spatial block -> temporal
    # pos embed -> temporal block in one VMEM pass, ops/attention.pallas_layer);
    # eval-only, may return None to decline (e.g. CPU backend).
    use_layer = layer_fn is not None and not train
    # block_t_fn: optional axis-aware temporal block kernel
    # (ops/attention.pallas_block_temporal) consuming the native (B, F, N, C)
    # layout — kills both HBM swapaxes copies around every temporal block.
    use_block_t = block_t_fn is not None and not train

    def ste(i, x_bfnc):
        # spatial attention: tokens = joints
        if use_block:
            y = block_fn(params["STEblocks"][i], params["Spatial_norm"],
                         x_bfnc, cfg.num_heads, compute_dtype)
            if y is not None:
                return y
        if use_train_block:
            m1, m2 = _branch_masks(rngs[2 * i], float(dprs[i]),
                                   x_bfnc.shape[0], x_bfnc.shape[1])
            y = train_block_fn(params["STEblocks"][i],
                               params["Spatial_norm"],
                               x_bfnc.astype(compute_dtype), m1, m2,
                               cfg.num_heads)
            if y is not None:
                return y
        return _layernorm(
            params["Spatial_norm"],
            _block(params["STEblocks"][i], x_bfnc, cfg.num_heads, compute_dtype,
                   float(dprs[i]), rngs[2 * i], batch_ndim=1,
                   attention_fn=attention_fn, drop_rate=cfg.drop_rate,
                   attn_drop_rate=cfg.attn_drop_rate,
                   drop_rng=drop_rngs[2 * i]))

    def tte(i, x_bfnc):
        # temporal attention: tokens = frames; transpose instead of reshape.
        if use_block_t:
            y = block_t_fn(params["TTEblocks"][i], params["Temporal_norm"],
                           x_bfnc, cfg.num_heads, compute_dtype)
            if y is not None:
                return y
        x_bnfc = jnp.swapaxes(x_bfnc, 1, 2)
        if use_block:
            y = block_fn(params["TTEblocks"][i], params["Temporal_norm"],
                         x_bnfc, cfg.num_heads, compute_dtype)
            if y is not None:
                return jnp.swapaxes(y, 1, 2)
        if use_train_block:
            m1, m2 = _branch_masks(rngs[2 * i + 1], float(dprs[i]),
                                   x_bnfc.shape[0], x_bnfc.shape[1])
            y = train_block_fn(params["TTEblocks"][i],
                               params["Temporal_norm"],
                               x_bnfc.astype(compute_dtype), m1, m2,
                               cfg.num_heads)
            if y is not None:
                return jnp.swapaxes(y, 1, 2)
        y = _block(params["TTEblocks"][i], x_bnfc, cfg.num_heads, compute_dtype,
                   float(dprs[i]), rngs[2 * i + 1], batch_ndim=1,
                   attention_fn=attention_fn, drop_rate=cfg.drop_rate,
                   attn_drop_rate=cfg.attn_drop_rate,
                   drop_rng=drop_rngs[2 * i + 1])
        y = _layernorm(params["Temporal_norm"], y)
        return jnp.swapaxes(y, 1, 2)

    def layer(i, x):
        if use_layer:
            y = layer_fn(params["STEblocks"][i], params["Spatial_norm"],
                         params["TTEblocks"][i], params["Temporal_norm"],
                         x.astype(compute_dtype), cfg.num_heads,
                         compute_dtype,
                         tpe=(params["Temporal_pos_embed"][0]
                              if i == 0 else None))
            if y is not None:
                return y
        x = ste(i, x)
        if i == 0:
            # (1, F, C) -> broadcast over batch and joints in (B, F, N, C)
            x = x + params["Temporal_pos_embed"][:, :, None, :].astype(compute_dtype)
            # (reference adds the temporal pos embed inside TTE_foward before
            #  the first temporal block only, then pos_drop, mixste.py:247-251)
            x = _dropout(x, cfg.drop_rate, pos_keys[1])
        return tte(i, x)

    # the trainable kernel's backward already recomputes in VMEM, so remat
    # on top would only add a redundant forward pass
    layer_impl = (jax.checkpoint(layer, static_argnums=(0,))
                  if remat and not use_train_block else layer)
    for i in range(cfg.depth):
        x = layer_impl(i, x)

    # Regression head (LayerNorm eps=1e-5 — torch default — then Linear->3).
    x = _layernorm(params["head"]["norm"], x, eps=1e-5)
    x = _linear(params["head"]["fc"], x, jnp.float32)
    return x.astype(jnp.float32)
