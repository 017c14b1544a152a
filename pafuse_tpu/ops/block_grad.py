"""Trainable fused transformer block: Pallas forward + Pallas backward.

The inference block kernel (ops/attention.pallas_block) has no VJP, so
training falls back to XLA + rematerialization (~0.63 s/step at the
flagship batch).  This module provides ``block_train_apply``: the same
fused block with a ``jax.custom_vjp`` whose backward is ONE Pallas kernel
that recomputes the forward in VMEM (no saved intermediates beyond the
block input) and backpropagates through outer-LN -> MLP -> LN2 ->
attention -> LN1, accumulating parameter gradients across batch tiles in
constant-index output accumulators (the TPU grid is sequential, so
revisited output blocks act as accumulators).

Stochastic depth stays OUTSIDE the kernel: the two residual branches are
scaled by per-sample mask vectors (0 or 1/keep) drawn with jax.random, so
training semantics match the reference exactly (drop_path on each
attention/MLP branch).

Backward math (per tile; masks m1, m2 broadcast per row):

    x1 = x0 + m1*Attn(LN1(x0));  x2 = x1 + m2*MLP(LN2(x1));  y = LNo(x2)

    LN(x) = xhat*s + b, xhat = (x-mu)*inv:
      dx = inv*(dy*s - mean_C(dy*s) - xhat*mean_C(dy*s*xhat))
      ds = sum_rows(dy*xhat);  db = sum_rows(dy)
    softmax P = softmax(S): dS = P*(dP - sum_cols(dP*P))
    exact-GELU'(u) = Phi(u) + u*phi(u), Phi via the A&S erf approximation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pafuse_tpu.ops.attention import (_HAS_PALLAS, _erf_as, _round_up)

if _HAS_PALLAS:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

_INV_SQRT2 = 0.7071067811865476
_INV_SQRT2PI = 0.3989422804014327


def _ln_fwd(x, s, b, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (x - mu) * inv
    return xhat * s + b, xhat, inv


def _ln_bwd(dy, xhat, inv, s):
    """Returns (dx, ds, db); reductions over the channel axis / rows."""
    g = dy * s
    dx = inv * (g - jnp.mean(g, axis=-1, keepdims=True)
                - xhat * jnp.mean(g * xhat, axis=-1, keepdims=True))
    ds = jnp.sum(dy * xhat, axis=tuple(range(dy.ndim - 1)))
    db = jnp.sum(dy, axis=tuple(range(dy.ndim - 1)))
    return dx, ds, db


def _gelu_exact(u):
    return 0.5 * u * (1.0 + _erf_as(u * _INV_SQRT2))


def _gelu_grad(u):
    phi = _INV_SQRT2PI * jnp.exp(-0.5 * u * u)
    return 0.5 * (1.0 + _erf_as(u * _INV_SQRT2)) + u * phi


def _fwd_core(x0, m1, m2, n1s, n1b, wqkv, bqkv, wproj, bproj, n2s, n2b,
              wfc1, bfc1, wfc2, bfc2, nos, nob, *, num_heads, seq_len,
              head_dim, want_residuals=False):
    """Shared forward math on f32 tiles.  x0: (TB, Lp, C)."""
    tb, lp, c = x0.shape
    scale = head_dim ** -0.5
    col = jax.lax.broadcasted_iota(jnp.int32, (tb, lp, lp), 2)

    h1, xhat1, inv1 = _ln_fwd(x0, n1s, n1b)
    qkv = jax.lax.dot_general(
        h1.reshape(tb * lp, c), wqkv,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bqkv
    qkv = qkv.reshape(tb, lp, 3 * c)
    Ps, os_ = [], []
    for hh in range(num_heads):
        q = qkv[:, :, hh * head_dim:(hh + 1) * head_dim]
        k = qkv[:, :, c + hh * head_dim: c + (hh + 1) * head_dim]
        v = qkv[:, :, 2 * c + hh * head_dim: 2 * c + (hh + 1) * head_dim]
        S = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        S = jnp.where(col < seq_len, S, -1e30)
        P = jax.nn.softmax(S, axis=-1)
        Ps.append(P)
        os_.append(jax.lax.dot_general(
            P, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))
    o = jnp.concatenate(os_, axis=-1)
    a = jax.lax.dot_general(
        o.reshape(tb * lp, c), wproj,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bproj
    x1 = x0 + m1 * a.reshape(tb, lp, c)

    h2, xhat2, inv2 = _ln_fwd(x1, n2s, n2b)
    u = jax.lax.dot_general(
        h2.reshape(tb * lp, c), wfc1,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bfc1
    gu = _gelu_exact(u)
    mo = jax.lax.dot_general(
        gu, wfc2, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bfc2
    x2 = x1 + m2 * mo.reshape(tb, lp, c)

    y, xhato, invo = _ln_fwd(x2, nos, nob)
    if not want_residuals:
        return y
    return (y, h1, xhat1, inv1, qkv, Ps, o, x1, h2, xhat2, inv2, u, gu,
            xhato, invo)


def _train_fwd_kernel(x_ref, m1_ref, m2_ref, n1s, n1b, wqkv, bqkv, wproj,
                      bproj, n2s, n2b, wfc1, bfc1, wfc2, bfc2, nos, nob,
                      out_ref, *, num_heads, seq_len, head_dim):
    x0 = x_ref[:].astype(jnp.float32)
    m1 = m1_ref[:].astype(jnp.float32)          # (TB, 1, 1)
    m2 = m2_ref[:].astype(jnp.float32)
    y = _fwd_core(x0, m1, m2, *(r[:].astype(jnp.float32) for r in (
        n1s, n1b, wqkv, bqkv, wproj, bproj, n2s, n2b, wfc1, bfc1, wfc2,
        bfc2, nos, nob)), num_heads=num_heads, seq_len=seq_len,
        head_dim=head_dim)
    out_ref[:] = y.astype(out_ref.dtype)


def _train_bwd_kernel(x_ref, g_ref, m1_ref, m2_ref, n1s, n1b, wqkv, bqkv,
                      wproj, bproj, n2s, n2b, wfc1, bfc1, wfc2, bfc2, nos,
                      nob,
                      dx_ref, dn1s_ref, dn1b_ref, dwqkv_ref, dbqkv_ref,
                      dwproj_ref, dbproj_ref, dn2s_ref, dn2b_ref, dwfc1_ref,
                      dbfc1_ref, dwfc2_ref, dbfc2_ref, dnos_ref, dnob_ref,
                      *, num_heads, seq_len, head_dim):
    x0 = x_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    m1 = m1_ref[:].astype(jnp.float32)          # (TB, 1, 1)
    m2 = m2_ref[:].astype(jnp.float32)
    tb, lp, c = x0.shape
    scale = head_dim ** -0.5
    params = [r[:].astype(jnp.float32) for r in (
        n1s, n1b, wqkv, bqkv, wproj, bproj, n2s, n2b, wfc1, bfc1, wfc2,
        bfc2, nos, nob)]
    (pn1s, pn1b, pwqkv, pbqkv, pwproj, pbproj, pn2s, pn2b, pwfc1, pbfc1,
     pwfc2, pbfc2, pnos, pnob) = params

    # recompute forward with residuals in VMEM
    (_, h1, xhat1, inv1, qkv, Ps, o, x1, h2, xhat2, inv2, u, gu, xhato,
     invo) = _fwd_core(x0, m1, m2, *params, num_heads=num_heads,
                       seq_len=seq_len, head_dim=head_dim,
                       want_residuals=True)

    # outer LN
    dx2, dnos, dnob = _ln_bwd(g, xhato, invo, pnos)

    # MLP branch (grad matmuls contract on the shared dim directly — no
    # explicit weight transposes in VMEM)
    dm = (m2 * dx2).reshape(tb * lp, c)
    dgu = jax.lax.dot_general(dm, pwfc2,
                              dimension_numbers=(((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dwfc2 = jax.lax.dot_general(gu, dm,
                                dimension_numbers=(((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dbfc2 = jnp.sum(dm, axis=0)
    du = dgu * _gelu_grad(u)
    h2f = h2.reshape(tb * lp, c)
    dwfc1 = jax.lax.dot_general(h2f, du,
                                dimension_numbers=(((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dbfc1 = jnp.sum(du, axis=0)
    dh2 = jax.lax.dot_general(du, pwfc1,
                              dimension_numbers=(((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dh2 = dh2.reshape(tb, lp, c)
    dx1_ln2, dn2s, dn2b = _ln_bwd(dh2, xhat2, inv2, pn2s)
    dx1 = dx2 + dx1_ln2

    # attention branch
    da = (m1 * dx1).reshape(tb * lp, c)
    do = jax.lax.dot_general(da, pwproj,
                             dimension_numbers=(((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    of = o.reshape(tb * lp, c)
    dwproj = jax.lax.dot_general(of, da,
                                 dimension_numbers=(((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    dbproj = jnp.sum(da, axis=0)
    do3 = do.reshape(tb, lp, c)

    dqkv_heads_q, dqkv_heads_k, dqkv_heads_v = [], [], []
    for hh in range(num_heads):
        q = qkv[:, :, hh * head_dim:(hh + 1) * head_dim]
        k = qkv[:, :, c + hh * head_dim: c + (hh + 1) * head_dim]
        v = qkv[:, :, 2 * c + hh * head_dim: 2 * c + (hh + 1) * head_dim]
        P = Ps[hh]
        doh = do3[:, :, hh * head_dim:(hh + 1) * head_dim]
        dP = jax.lax.dot_general(
            doh, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # (TB, Lp, Lp)
        dv = jax.lax.dot_general(
            P, doh, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # (TB, Lp, d)
        dS = P * (dP - jnp.sum(dP * P, axis=-1, keepdims=True))
        dq = jax.lax.dot_general(
            dS, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(
            dS, q, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        dqkv_heads_q.append(dq)
        dqkv_heads_k.append(dk)
        dqkv_heads_v.append(dv)
    dqkv = jnp.concatenate(dqkv_heads_q + dqkv_heads_k + dqkv_heads_v,
                           axis=-1).reshape(tb * lp, 3 * c)
    h1f = h1.reshape(tb * lp, c)
    dwqkv = jax.lax.dot_general(h1f, dqkv,
                                dimension_numbers=(((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dbqkv = jnp.sum(dqkv, axis=0)
    dh1 = jax.lax.dot_general(dqkv, pwqkv,
                              dimension_numbers=(((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dh1 = dh1.reshape(tb, lp, c)
    dx0_ln1, dn1s, dn1b = _ln_bwd(dh1, xhat1, inv1, pn1s)
    dx0 = dx1 + dx0_ln1

    dx_ref[:] = dx0.astype(dx_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in (dn1s_ref, dn1b_ref, dwqkv_ref, dbqkv_ref, dwproj_ref,
                  dbproj_ref, dn2s_ref, dn2b_ref, dwfc1_ref, dbfc1_ref,
                  dwfc2_ref, dbfc2_ref, dnos_ref, dnob_ref):
            r[:] = jnp.zeros_like(r)

    dn1s_ref[:] += dn1s
    dn1b_ref[:] += dn1b
    dwqkv_ref[:] += dwqkv
    dbqkv_ref[:] += dbqkv
    dwproj_ref[:] += dwproj
    dbproj_ref[:] += dbproj
    dn2s_ref[:] += dn2s
    dn2b_ref[:] += dn2b
    dwfc1_ref[:] += dwfc1
    dbfc1_ref[:] += dbfc1
    dwfc2_ref[:] += dwfc2
    dbfc2_ref[:] += dbfc2
    dnos_ref[:] += dnos
    dnob_ref[:] += dnob


def _flat_params(block_params, outer_norm):
    return (block_params["norm1"]["scale"], block_params["norm1"]["bias"],
            block_params["attn"]["qkv"]["kernel"],
            block_params["attn"]["qkv"]["bias"],
            block_params["attn"]["proj"]["kernel"],
            block_params["attn"]["proj"]["bias"],
            block_params["norm2"]["scale"], block_params["norm2"]["bias"],
            block_params["mlp"]["fc1"]["kernel"],
            block_params["mlp"]["fc1"]["bias"],
            block_params["mlp"]["fc2"]["kernel"],
            block_params["mlp"]["fc2"]["bias"],
            outer_norm["scale"], outer_norm["bias"])


def _pad_tiles(x, batch_tile):
    *lead, L, C = x.shape
    B = int(np.prod(lead)) if lead else 1
    Lp = _round_up(L, 8)
    xf = x.reshape(B, L, C)
    if Lp != L:
        xf = jnp.pad(xf, ((0, 0), (0, Lp - L), (0, 0)))
    TB = min(batch_tile, B)
    Bp = _round_up(B, TB)
    if Bp != B:
        xf = jnp.pad(xf, ((0, Bp - B), (0, 0), (0, 0)))
    return xf, B, Bp, TB, L, Lp, C, tuple(lead)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def block_train_apply(block_params, outer_norm, x, mask_attn, mask_mlp,
                      num_heads, batch_tile=32):
    """Fused block + outer LN with stochastic-depth branch masks.

    x: (B, L, C); mask_attn/mask_mlp: (B,) scale factors (0 or 1/keep).
    Differentiable w.r.t. params and x (custom Pallas VJP).
    """
    out, _ = _block_fwd(block_params, outer_norm, x, mask_attn, mask_mlp,
                        num_heads, batch_tile)
    return out


def _block_fwd(block_params, outer_norm, x, mask_attn, mask_mlp, num_heads,
               batch_tile):
    flat = _flat_params(block_params, outer_norm)
    xf, B, Bp, TB, L, Lp, C, lead = _pad_tiles(x, batch_tile)
    m1 = jnp.pad(mask_attn.reshape(-1), (0, Bp - B)).astype(
        jnp.float32).reshape(Bp, 1, 1)
    m2 = jnp.pad(mask_mlp.reshape(-1), (0, Bp - B)).astype(
        jnp.float32).reshape(Bp, 1, 1)
    hidden = flat[8].shape[1]
    head_dim = C // num_heads

    vec = lambda n: pl.BlockSpec((n,), lambda i: (0,),
                                 memory_space=pltpu.VMEM)
    mat = lambda m, n: pl.BlockSpec((m, n), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((TB, Lp, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((TB, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    pspecs = [vec(C), vec(C), mat(C, 3 * C), vec(3 * C), mat(C, C), vec(C),
              vec(C), vec(C), mat(C, hidden), vec(hidden), mat(hidden, C),
              vec(C), vec(C), vec(C)]

    kernel = functools.partial(_train_fwd_kernel, num_heads=num_heads,
                               seq_len=L, head_dim=head_dim)
    out = pl.pallas_call(
        kernel, grid=(Bp // TB,),
        in_specs=[xspec, mspec, mspec] + pspecs,
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((Bp, Lp, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )(xf, m1, m2, *[p.astype(jnp.float32) for p in flat])
    out = out[:B, :L].reshape(*lead, L, C) if lead else out[:B, :L]
    residuals = (block_params, outer_norm, x, mask_attn, mask_mlp)
    return out, residuals


def _block_bwd(num_heads, batch_tile, residuals, g):
    block_params, outer_norm, x, mask_attn, mask_mlp = residuals
    flat = _flat_params(block_params, outer_norm)
    xf, B, Bp, TB, L, Lp, C, lead = _pad_tiles(x, batch_tile)
    gf, *_ = _pad_tiles(g, batch_tile)
    m1 = jnp.pad(mask_attn.reshape(-1), (0, Bp - B)).astype(
        jnp.float32).reshape(Bp, 1, 1)
    m2 = jnp.pad(mask_mlp.reshape(-1), (0, Bp - B)).astype(
        jnp.float32).reshape(Bp, 1, 1)
    hidden = flat[8].shape[1]
    head_dim = C // num_heads

    vec = lambda n: pl.BlockSpec((n,), lambda i: (0,),
                                 memory_space=pltpu.VMEM)
    mat = lambda m, n: pl.BlockSpec((m, n), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((TB, Lp, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((TB, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    pspecs = [vec(C), vec(C), mat(C, 3 * C), vec(3 * C), mat(C, C), vec(C),
              vec(C), vec(C), mat(C, hidden), vec(hidden), mat(hidden, C),
              vec(C), vec(C), vec(C)]
    f32 = jnp.float32
    out_shapes = [jax.ShapeDtypeStruct((Bp, Lp, C), x.dtype),
                  jax.ShapeDtypeStruct((C,), f32),
                  jax.ShapeDtypeStruct((C,), f32),
                  jax.ShapeDtypeStruct((C, 3 * C), f32),
                  jax.ShapeDtypeStruct((3 * C,), f32),
                  jax.ShapeDtypeStruct((C, C), f32),
                  jax.ShapeDtypeStruct((C,), f32),
                  jax.ShapeDtypeStruct((C,), f32),
                  jax.ShapeDtypeStruct((C,), f32),
                  jax.ShapeDtypeStruct((C, hidden), f32),
                  jax.ShapeDtypeStruct((hidden,), f32),
                  jax.ShapeDtypeStruct((hidden, C), f32),
                  jax.ShapeDtypeStruct((C,), f32),
                  jax.ShapeDtypeStruct((C,), f32),
                  jax.ShapeDtypeStruct((C,), f32)]
    out_specs = [xspec] + pspecs

    kernel = functools.partial(_train_bwd_kernel, num_heads=num_heads,
                               seq_len=L, head_dim=head_dim)
    outs = pl.pallas_call(
        kernel, grid=(Bp // TB,),
        in_specs=[xspec, xspec, mspec, mspec] + pspecs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )(xf, gf, m1, m2, *[p.astype(jnp.float32) for p in flat])

    (dx, dn1s, dn1b, dwqkv, dbqkv, dwproj, dbproj, dn2s, dn2b, dwfc1,
     dbfc1, dwfc2, dbfc2, dnos, dnob) = outs
    dx = dx[:B, :L].reshape(*lead, L, C) if lead else dx[:B, :L]

    def _cast(gp, ref):
        return gp.astype(ref.dtype)

    d_block = {
        "norm1": {"scale": _cast(dn1s, flat[0]), "bias": _cast(dn1b, flat[1])},
        "attn": {"qkv": {"kernel": _cast(dwqkv, flat[2]),
                         "bias": _cast(dbqkv, flat[3])},
                 "proj": {"kernel": _cast(dwproj, flat[4]),
                          "bias": _cast(dbproj, flat[5])}},
        "norm2": {"scale": _cast(dn2s, flat[6]), "bias": _cast(dn2b, flat[7])},
        "mlp": {"fc1": {"kernel": _cast(dwfc1, flat[8]),
                        "bias": _cast(dbfc1, flat[9])},
                "fc2": {"kernel": _cast(dwfc2, flat[10]),
                        "bias": _cast(dbfc2, flat[11])}},
    }
    d_outer = {"scale": _cast(dnos, flat[12]), "bias": _cast(dnob, flat[13])}
    return (d_block, d_outer, dx, jnp.zeros_like(mask_attn),
            jnp.zeros_like(mask_mlp))


block_train_apply.defvjp(_block_fwd, _block_bwd)


def train_block_available() -> bool:
    if not _HAS_PALLAS:
        return False
    try:
        return jax.default_backend() != "cpu"
    except Exception:  # pragma: no cover
        return False


def pallas_train_block(block_params, outer_norm, x, mask_attn, mask_mlp,
                       num_heads: int):
    """Selection-safe wrapper: returns None off-TPU so callers fall back to
    the XLA block (same convention as ops.attention.pallas_block)."""
    if not train_block_available():
        return None
    return block_train_apply(block_params, outer_norm, x, mask_attn,
                             mask_mlp, num_heads)


def select_train_block_fn(train_kernel="auto", *, train: bool = True):
    """``tpu.train_kernel``: auto|true -> fused block with custom Pallas VJP
    for training; false -> XLA autodiff path."""
    if not train:
        return None
    if str(train_kernel).lower() in ("auto", "true"):
        return pallas_train_block
    return None
