"""Packed-parts execution: the three part networks as ONE batched call.

The reference runs its part-specific MixSTE2 networks sequentially
(``/root/reference/common/diffusionpose.py:163-172``); our default unpacked
path runs them as three subgraphs inside one jit (models/parts.py).  This
module implements the third option named in SURVEY §7 ("pad joints to a
common width and mask — benchmark both"): pad every part to a common
``(J_max, C_max)`` = (68, 384), stack parameters on a leading part axis and
``vmap`` one forward over it, so each layer is a single batched matmul for
all parts.

Exactness (matches the unpacked path bit-for-close, <=1e-5 in f32):

* **channel padding** — weights/biases/LN params are zero-padded, so padded
  channels stay exactly zero through linears, GELU and residuals;
* **masked LayerNorm** — statistics must cover only the real ``C_p``
  channels.  Because padded stream channels are exactly zero, the masked
  moments have a closed form from full-width sums:
  ``mean = S1/C_p``, ``var = (sum((x-mean)^2) - (C_max-C_p)*mean^2)/C_p``;
  LN scale/bias are zero-padded so padded channels re-zero after LN;
* **per-head qkv packing** — head boundaries differ per part
  (d = C_p/heads), so qkv columns are packed per (section, head) slot via
  reshape->pad->reshape, never mixing two real heads into one padded head;
  the softmax scale ``d_p**-0.5`` is folded into the packed q columns;
* **masked softmax** — padded joint tokens acquire nonzero k/v from the qkv
  bias, so spatial-attention logits add ``-1e30`` at padded key columns
  (temporal attention needs no mask: frames are never padded);
* **per-part sinusoidal time embedding** — the frequency table depends on
  ``C_p``; each part keeps its own (zero-padded) table and the time-MLP's
  first kernel is packed per sin/cos half.

Padded-token outputs are garbage by construction and are dropped by the
final whole-body gather.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from pafuse_tpu.models.parts import PartSpec


# ---------------------------------------------------------------------------
# Static packing plan
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class PackPlan:
    names: tuple                 # part order
    j_max: int
    c_max: int
    num_heads: int
    depth: int
    num_frames: int
    in_chans: int
    c_real: np.ndarray           # (P,) real channel widths
    j_real: np.ndarray           # (P,) real joint counts
    joint_gather: np.ndarray     # (P, j_max) whole-body indices (clamped)
    out_gather: np.ndarray       # (num_joints,) indices into (P*j_max)
    freqs: np.ndarray            # (P, c_max//2) sinusoidal freq tables
    key_mask: np.ndarray         # (P, 1, j_max) additive logits mask


def make_pack_plan(specs: List[PartSpec]) -> PackPlan:
    P = len(specs)
    j_max = max(len(s.joint_indices) for s in specs)
    c_max = max(s.config.embed_dim for s in specs)
    heads = specs[0].config.num_heads
    assert all(s.config.num_heads == heads for s in specs)
    assert all(s.config.mlp_ratio == specs[0].config.mlp_ratio == 2.0
               for s in specs)

    c_real = np.array([s.config.embed_dim for s in specs], np.int32)
    j_real = np.array([len(s.joint_indices) for s in specs], np.int32)

    joint_gather = np.zeros((P, j_max), np.int32)
    for p, s in enumerate(specs):
        idx = np.asarray(s.joint_indices)
        joint_gather[p, : len(idx)] = idx          # padded slots read joint 0

    num_joints = int(max(s.joint_indices.max() for s in specs)) + 1
    out_gather = np.zeros((num_joints,), np.int32)
    for p, s in enumerate(specs):
        for i, g in enumerate(np.asarray(s.joint_indices)):
            out_gather[g] = p * j_max + i

    half_max = c_max // 2
    freqs = np.zeros((P, half_max), np.float32)
    for p, s in enumerate(specs):
        half = s.config.embed_dim // 2
        f = math.log(10000.0) / (half - 1)
        freqs[p, :half] = np.exp(np.arange(half, dtype=np.float32) * -f)

    key_mask = np.zeros((P, 1, j_max), np.float32)
    for p, s in enumerate(specs):
        key_mask[p, 0, len(s.joint_indices):] = -1e30

    return PackPlan(names=tuple(s.name for s in specs), j_max=j_max,
                    c_max=c_max, num_heads=heads,
                    depth=specs[0].config.depth,
                    num_frames=specs[0].config.num_frames,
                    in_chans=specs[0].config.in_chans,
                    c_real=c_real, j_real=j_real, joint_gather=joint_gather,
                    out_gather=out_gather, freqs=freqs, key_mask=key_mask)


# ---------------------------------------------------------------------------
# Parameter packing (runs inside jit; reshape/pad only)
# ---------------------------------------------------------------------------

def _pad_to(x, shape):
    pads = [(0, t - s) for s, t in zip(x.shape, shape)]
    return jnp.pad(x, pads) if any(p[1] for p in pads) else x


def _pack_qkv(kernel, bias, c_p: int, heads: int, c_max: int, scale_q: float):
    """(C_p, 3C_p) -> (C_max, 3C_max) with per-(section, head) placement;
    the softmax scale is folded into the q columns."""
    d_p, d_max = c_p // heads, c_max // heads
    k4 = kernel.reshape(c_p, 3, heads, d_p)
    k4 = k4 * jnp.array([scale_q, 1.0, 1.0], kernel.dtype)[None, :, None, None]
    k4 = _pad_to(k4, (c_max, 3, heads, d_max))
    b4 = bias.reshape(3, heads, d_p)
    b4 = b4 * jnp.array([scale_q, 1.0, 1.0], bias.dtype)[:, None, None]
    b4 = _pad_to(b4, (3, heads, d_max))
    return k4.reshape(c_max, 3 * c_max), b4.reshape(3 * c_max)


def _pack_proj(kernel, bias, c_p: int, heads: int, c_max: int):
    """(C_p, C_p) with per-head input rows -> (C_max, C_max)."""
    d_p, d_max = c_p // heads, c_max // heads
    k3 = kernel.reshape(heads, d_p, c_p)
    k3 = _pad_to(k3, (heads, d_max, c_max))
    return k3.reshape(c_max, c_max), _pad_to(bias, (c_max,))


def _pack_block(bp, c_p: int, heads: int, c_max: int):
    d_p = c_p // heads
    scale_q = d_p ** -0.5
    qkv_k, qkv_b = _pack_qkv(bp["attn"]["qkv"]["kernel"],
                             bp["attn"]["qkv"]["bias"], c_p, heads, c_max,
                             scale_q)
    proj_k, proj_b = _pack_proj(bp["attn"]["proj"]["kernel"],
                                bp["attn"]["proj"]["bias"], c_p, heads, c_max)
    hidden_p, hidden_max = 2 * c_p, 2 * c_max
    return {
        "norm1": {k: _pad_to(v, (c_max,)) for k, v in bp["norm1"].items()},
        "attn": {"qkv": {"kernel": qkv_k, "bias": qkv_b},
                 "proj": {"kernel": proj_k, "bias": proj_b}},
        "norm2": {k: _pad_to(v, (c_max,)) for k, v in bp["norm2"].items()},
        "mlp": {
            "fc1": {"kernel": _pad_to(bp["mlp"]["fc1"]["kernel"],
                                      (c_max, hidden_max)),
                    "bias": _pad_to(bp["mlp"]["fc1"]["bias"], (hidden_max,))},
            "fc2": {"kernel": _pad_to(bp["mlp"]["fc2"]["kernel"],
                                      (hidden_max, c_max)),
                    "bias": _pad_to(bp["mlp"]["fc2"]["bias"], (c_max,))},
        },
    }


def _pack_time_mlp(tp, c_p: int, c_max: int):
    half_p, half_max = c_p // 2, c_max // 2
    k1 = tp["fc1"]["kernel"].reshape(2, half_p, 2 * c_p)
    k1 = _pad_to(k1, (2, half_max, 2 * c_max)).reshape(c_max, 2 * c_max)
    return {
        "fc1": {"kernel": k1, "bias": _pad_to(tp["fc1"]["bias"], (2 * c_max,))},
        "fc2": {"kernel": _pad_to(tp["fc2"]["kernel"], (2 * c_max, c_max)),
                "bias": _pad_to(tp["fc2"]["bias"], (c_max,))},
    }


def _pack_one(params_p, j_p: int, c_p: int, plan: PackPlan):
    c_max, j_max, heads = plan.c_max, plan.j_max, plan.num_heads
    return {
        "Spatial_patch_to_embedding": {
            "kernel": _pad_to(params_p["Spatial_patch_to_embedding"]["kernel"],
                              (plan.in_chans, c_max)),
            "bias": _pad_to(params_p["Spatial_patch_to_embedding"]["bias"],
                            (c_max,))},
        "Spatial_pos_embed": _pad_to(params_p["Spatial_pos_embed"],
                                     (1, j_max, c_max)),
        "Temporal_pos_embed": _pad_to(params_p["Temporal_pos_embed"],
                                      (1, plan.num_frames, c_max)),
        "time_mlp": _pack_time_mlp(params_p["time_mlp"], c_p, c_max),
        "STEblocks": [_pack_block(b, c_p, heads, c_max)
                      for b in params_p["STEblocks"]],
        "TTEblocks": [_pack_block(b, c_p, heads, c_max)
                      for b in params_p["TTEblocks"]],
        "Spatial_norm": {k: _pad_to(v, (c_max,))
                         for k, v in params_p["Spatial_norm"].items()},
        "Temporal_norm": {k: _pad_to(v, (c_max,))
                          for k, v in params_p["Temporal_norm"].items()},
        "head": {
            "norm": {k: _pad_to(v, (c_max,))
                     for k, v in params_p["head"]["norm"].items()},
            "fc": {"kernel": _pad_to(params_p["head"]["fc"]["kernel"],
                                     (c_max, 3)),
                   "bias": params_p["head"]["fc"]["bias"]},
        },
    }


def pack_params(params: Dict[str, Any], specs: List[PartSpec],
                plan: PackPlan):
    """Per-part trees -> one tree with a leading part axis on every leaf."""
    packed = [_pack_one(params[s.name], len(s.joint_indices),
                        s.config.embed_dim, plan) for s in specs]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, 0), *packed)


# ---------------------------------------------------------------------------
# Packed forward (one part; vmapped over the part axis)
# ---------------------------------------------------------------------------

def _linear(p, x, compute_dtype):
    y = jnp.dot(x.astype(compute_dtype), p["kernel"].astype(compute_dtype),
                preferred_element_type=jnp.float32)
    return (y + p["bias"].astype(jnp.float32)).astype(compute_dtype)


def _masked_layernorm(p, x, c_p, c_max: int, eps: float = 1e-6):
    """LN over the REAL channels only; padded stream channels are zero on
    entry and re-zeroed by the zero-padded scale/bias."""
    xf = x.astype(jnp.float32)
    cp = c_p.astype(jnp.float32)
    mean = jnp.sum(xf, axis=-1, keepdims=True) / cp
    sq = jnp.sum(jnp.square(xf - mean), axis=-1, keepdims=True)
    var = (sq - (c_max - cp) * jnp.square(mean)) / cp
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"] + p["bias"]
    return y.astype(x.dtype)


def _packed_attention(p, x, heads: int, compute_dtype, key_mask=None):
    """Scale folded into packed q; optional additive key mask (1, L)."""
    *lead, L, C = x.shape
    d = C // heads
    qkv = _linear(p["qkv"], x, compute_dtype)
    qkv = qkv.reshape(*lead, L, 3, heads, d)
    q = jnp.moveaxis(qkv[..., 0, :, :], -2, -3)
    k = jnp.moveaxis(qkv[..., 1, :, :], -2, -3)
    v = jnp.moveaxis(qkv[..., 2, :, :], -2, -3)
    attn = jnp.einsum("...ld,...md->...lm", q, k,
                      preferred_element_type=jnp.float32)
    if key_mask is not None:
        attn = attn + key_mask
    attn = attn.astype(compute_dtype)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(compute_dtype)
    out = jnp.einsum("...lm,...md->...ld", attn, v,
                     preferred_element_type=jnp.float32).astype(compute_dtype)
    out = jnp.moveaxis(out, -3, -2).reshape(*lead, L, C)
    return _linear(p["proj"], out, compute_dtype)


def _packed_block(p, x, heads, compute_dtype, c_p, c_max, key_mask=None):
    h = _packed_attention(p["attn"],
                          _masked_layernorm(p["norm1"], x, c_p, c_max),
                          heads, compute_dtype, key_mask)
    x = x + h
    h = _linear(p["mlp"]["fc2"],
                jax.nn.gelu(_linear(
                    p["mlp"]["fc1"],
                    _masked_layernorm(p["norm2"], x, c_p, c_max),
                    compute_dtype), approximate=False), compute_dtype)
    return x + h


def _forward_one_part(pp, x2d, x3d, t, c_p, freqs, key_mask, plan: PackPlan,
                      compute_dtype):
    """One part's forward on padded shapes (B, F, j_max, ...)."""
    c_max, heads = plan.c_max, plan.num_heads
    x = jnp.concatenate([x2d, x3d], axis=-1).astype(compute_dtype)
    x = _linear(pp["Spatial_patch_to_embedding"], x, compute_dtype)
    x = x + pp["Spatial_pos_embed"][None].astype(compute_dtype)

    ang = t.astype(jnp.float32)[:, None] * freqs[None, :]
    te = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    te = _linear(pp["time_mlp"]["fc1"], te.astype(compute_dtype), compute_dtype)
    te = jax.nn.gelu(te, approximate=False)
    te = _linear(pp["time_mlp"]["fc2"], te, compute_dtype)
    x = x + te[:, None, None, :]

    for i in range(plan.depth):
        x = _packed_block(pp["STEblocks"][i], x, heads, compute_dtype,
                          c_p, c_max, key_mask)
        x = _masked_layernorm(pp["Spatial_norm"], x, c_p, c_max)
        if i == 0:
            x = x + pp["Temporal_pos_embed"][:, :, None, :].astype(compute_dtype)
        x = jnp.swapaxes(x, 1, 2)
        x = _packed_block(pp["TTEblocks"][i], x, heads, compute_dtype,
                          c_p, c_max, key_mask=None)  # frames never padded
        x = _masked_layernorm(pp["Temporal_norm"], x, c_p, c_max)
        x = jnp.swapaxes(x, 1, 2)

    x = _masked_layernorm(pp["head"]["norm"], x, c_p, c_max, eps=1e-5)
    return _linear(pp["head"]["fc"], x, jnp.float32).astype(jnp.float32)


def packed_forward(packed_params, plan: PackPlan, x2d, x3d, t, *,
                   compute_dtype=jnp.float32):
    """All parts in one vmapped call.

    x2d: (B, F, N, 2) whole-body; returns (B, F, N, 3).
    """
    gather = jnp.asarray(plan.joint_gather)              # (P, j_max)
    x2d_p = jnp.take(x2d, gather, axis=-2)               # (B, F, P, j_max, 2)
    x3d_p = jnp.take(x3d, gather, axis=-2)
    x2d_p = jnp.moveaxis(x2d_p, -3, 0)                   # (P, B, F, j_max, 2)
    x3d_p = jnp.moveaxis(x3d_p, -3, 0)

    run = jax.vmap(
        lambda pp, a, b, cp, fr, km: _forward_one_part(
            pp, a, b, t, cp, fr, km, plan, compute_dtype),
        in_axes=(0, 0, 0, 0, 0, 0))
    outs = run(packed_params, x2d_p, x3d_p,
               jnp.asarray(plan.c_real), jnp.asarray(plan.freqs),
               jnp.asarray(plan.key_mask))               # (P, B, F, j_max, 3)

    outs = jnp.moveaxis(outs, 0, -3)                     # (B, F, P, j_max, 3)
    B, F = outs.shape[0], outs.shape[1]
    flat = outs.reshape(B, F, -1, 3)                     # (B, F, P*j_max, 3)
    return jnp.take(flat, jnp.asarray(plan.out_gather), axis=-2)
