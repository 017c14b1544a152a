"""MixSTE2 denoiser: shapes, invariances, and numerical parity against the
reference PyTorch implementation (loaded read-only via tools/torch_oracle)."""

import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pafuse_tpu import checkpoints
from pafuse_tpu.models import mixste
from pafuse_tpu.models.mixste import MixSTEConfig

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

CFG = MixSTEConfig(num_frames=9, num_joints=7, in_chans=5, embed_dim=64,
                   depth=3, num_heads=8, mlp_ratio=2.0)


@pytest.fixture(scope="module")
def params():
    return mixste.init_mixste(jax.random.PRNGKey(0), CFG)


def test_forward_shape(params, rng):
    x2d = jnp.asarray(rng.randn(2, 9, 7, 2), jnp.float32)
    x3d = jnp.asarray(rng.randn(2, 9, 7, 3), jnp.float32)
    t = jnp.asarray([0, 999])
    out = mixste.mixste_forward(params, CFG, x2d, x3d, t)
    assert out.shape == (2, 9, 7, 3)
    assert out.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(out)))


def test_timestep_changes_output(params, rng):
    x2d = jnp.asarray(rng.randn(1, 9, 7, 2), jnp.float32)
    x3d = jnp.asarray(rng.randn(1, 9, 7, 3), jnp.float32)
    o1 = mixste.mixste_forward(params, CFG, x2d, x3d, jnp.asarray([0]))
    o2 = mixste.mixste_forward(params, CFG, x2d, x3d, jnp.asarray([500]))
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_batch_independence(params, rng):
    """Each batch row is processed independently (no cross-sample leakage)."""
    x2d = jnp.asarray(rng.randn(3, 9, 7, 2), jnp.float32)
    x3d = jnp.asarray(rng.randn(3, 9, 7, 3), jnp.float32)
    t = jnp.asarray([1, 2, 3])
    full = np.asarray(mixste.mixste_forward(params, CFG, x2d, x3d, t))
    row = np.asarray(mixste.mixste_forward(
        params, CFG, x2d[1:2], x3d[1:2], t[1:2]))
    np.testing.assert_allclose(full[1:2], row, atol=1e-5)


def test_sinusoidal_embedding_matches_reference_formula():
    import math
    dim = 64
    t = jnp.asarray([0.0, 1.0, 500.0])
    emb = np.asarray(mixste.sinusoidal_time_embedding(t, dim))
    half = dim // 2
    freq = np.exp(np.arange(half) * -(math.log(10000.0) / (half - 1)))
    args = (np.asarray(t)[:, None] * freq).astype(np.float32)
    expected = np.concatenate([np.sin(args), np.cos(args)], axis=-1)
    np.testing.assert_allclose(emb, expected, atol=5e-5)


def test_param_count_matches_analytic():
    n = mixste.param_count(mixste.init_mixste(jax.random.PRNGKey(0), CFG))
    C, D, J, F = 64, 3, 7, 9
    expected = (
        (5 * C + C)                    # patch embed
        + J * C + F * C                # pos embeds
        + (C * 2 * C + 2 * C) + (2 * C * C + C)  # time mlp
        + 2 * D * (                    # STE+TTE blocks
            2 * (C + C)                # norm1, norm2
            + (C * 3 * C + 3 * C)      # qkv
            + (C * C + C)              # proj
            + (C * 2 * C + 2 * C) + (2 * C * C + C))  # mlp (ratio 2)
        + 2 * (C + C)                  # Spatial/Temporal norm
        + (C + C) + (C * 3 + 3)        # head
    )
    assert n == expected


# ---------------------------------------------------------------------------
# Golden parity vs the reference torch implementation
# ---------------------------------------------------------------------------

def _load_oracle():
    from torch_oracle import load_reference_mixste
    return load_reference_mixste()


@pytest.mark.parametrize("train_mode", [True, False])
def test_parity_vs_reference_torch(params, rng, train_mode):
    ref = _load_oracle()
    if ref is None:
        pytest.skip("reference torch implementation unavailable")
    import torch

    model = ref.MixSTE2(num_frame=9, num_joints=7, in_chans=5,
                        embed_dim_ratio=64, depth=3, num_heads=8,
                        mlp_ratio=2.0, qkv_bias=True, drop_path_rate=0.0,
                        is_train=train_mode)
    state = checkpoints.export_torch_state_dict({"p": params})
    torch_state = {k[len("pose_estimator.p."):]: torch.from_numpy(v)
                   for k, v in state.items()}
    missing, unexpected = model.load_state_dict(torch_state, strict=True), None
    model.eval()

    if train_mode:
        x2d = rng.randn(2, 9, 7, 2).astype(np.float32)
        x3d = rng.randn(2, 9, 7, 3).astype(np.float32)
        t = np.array([17, 803])
        with torch.no_grad():
            ref_out = model(torch.from_numpy(x2d), torch.from_numpy(x3d),
                            torch.from_numpy(t)).numpy()
        ours = np.asarray(mixste.mixste_forward(
            params, CFG, jnp.asarray(x2d), jnp.asarray(x3d), jnp.asarray(t)))
    else:
        # eval rank: x3d has a hypothesis axis folded into batch by the
        # wrapper; reference does it internally (mixste.py:227-235)
        B, H = 2, 3
        x2d = rng.randn(B, 9, 7, 2).astype(np.float32)
        x3d = rng.randn(B, H, 9, 7, 3).astype(np.float32)
        t = np.array([10, 600])
        with torch.no_grad():
            ref_out = model(torch.from_numpy(x2d), torch.from_numpy(x3d),
                            torch.from_numpy(t)).numpy()
        x2d_tiled = np.repeat(x2d, H, axis=0)
        x3d_flat = x3d.reshape(B * H, 9, 7, 3)
        t_tiled = np.repeat(t, H)
        ours = np.asarray(mixste.mixste_forward(
            params, CFG, jnp.asarray(x2d_tiled), jnp.asarray(x3d_flat),
            jnp.asarray(t_tiled))).reshape(B, H, 9, 7, 3)

    np.testing.assert_allclose(ours, ref_out, atol=2e-5, rtol=1e-4)


def test_kernel_fns_decline_on_cpu(params, rng):
    """The Pallas kernel hooks (attention/block/layer) must decline on the
    CPU backend and fall through to the identical plain path, so CLI configs
    with tpu.use_pallas set run unchanged off-TPU."""
    from pafuse_tpu.ops import attention as att

    x2d = jnp.asarray(rng.randn(2, 9, 7, 2), jnp.float32)
    x3d = jnp.asarray(rng.randn(2, 9, 7, 3), jnp.float32)
    t = jnp.asarray([3, 500])
    base = mixste.mixste_forward(params, CFG, x2d, x3d, t)
    import os
    os.environ["PAFUSE_EXPERIMENTAL_KERNELS"] = "1"  # unlock layer/block_t
    try:
        for kwargs in ({"attention_fn": att.select_attention_fn("true")},
                       {"block_fn": att.select_block_fn("block")},
                       {"layer_fn": att.select_layer_fn("layer")},
                       {"block_t_fn": att.select_block_t_fn("block_t")}):
            out = mixste.mixste_forward(params, CFG, x2d, x3d, t, **kwargs)
            np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                                       rtol=0, atol=1e-6)
        # selection rules: layer kernel is opt-in, block kernel is the auto
        # default, training never gets an eval kernel
        assert att.select_layer_fn("auto") is None
        assert att.select_block_fn("auto") is att.pallas_block
        assert att.select_block_fn("auto", train=True) is None
        assert att.select_layer_fn("layer", train=True) is None
        # block_t is opt-in while under measurement; block_t mode keeps the
        # spatial block kernel alongside the temporal-axis-aware one
        assert att.select_block_t_fn("auto") is None
        assert att.select_block_t_fn("block_t") is att.pallas_block_temporal
        assert att.select_block_t_fn("block_t", train=True) is None
        assert att.select_block_fn("block_t") is att.pallas_block
    finally:
        del os.environ["PAFUSE_EXPERIMENTAL_KERNELS"]
    # without the experimental tier the negative-result paths refuse loudly
    # (round-4 support-tier contract, README "Support tiers")
    import pytest
    for bad in (lambda: att.select_layer_fn("layer"),
                lambda: att.select_block_t_fn("block_t")):
        with pytest.raises(ValueError, match="EXPERIMENTAL"):
            bad()
    os.environ["PAFUSE_ATTN_POLICY"] = "heads"
    try:
        with pytest.raises(ValueError, match="EXPERIMENTAL"):
            att.select_block_fn("auto")
    finally:
        del os.environ["PAFUSE_ATTN_POLICY"]


def test_experimental_gate_not_sticky():
    """The CLI gate is process-local and per-build: enabling it for one
    model build must not leak into a later build with the flag off (the
    round-4 env-var mutation was one-way); a user-exported env var still
    opts in when the override defers (None)."""
    import os
    import pytest
    from pafuse_tpu.ops import attention as att

    assert "PAFUSE_EXPERIMENTAL_KERNELS" not in os.environ
    try:
        att.set_experimental_kernels(True)      # build A: flag on
        assert att.experimental_kernels_enabled()
        att.set_experimental_kernels(None)      # build B: flag off -> defer
        assert not att.experimental_kernels_enabled()
        with pytest.raises(ValueError, match="EXPERIMENTAL"):
            att.select_layer_fn("layer")
        os.environ["PAFUSE_EXPERIMENTAL_KERNELS"] = "1"
        assert att.experimental_kernels_enabled()   # env opt-in still works
    finally:
        att.set_experimental_kernels(None)
        os.environ.pop("PAFUSE_EXPERIMENTAL_KERNELS", None)


# ---------------------------------------------------------------------------
# Dropout (model.dropout / attn_drop — reference mixste.py:35,56-59,73)
# ---------------------------------------------------------------------------

def test_dropout_inactive_paths_identical(params, rng):
    """drop_rate=0 must be bit-identical to the no-dropout config, and
    dropout must never fire in eval mode even with nonzero rates."""
    x2d = jnp.asarray(rng.randn(2, 9, 7, 2), jnp.float32)
    x3d = jnp.asarray(rng.randn(2, 9, 7, 3), jnp.float32)
    t = jnp.asarray([3, 7])
    base = np.asarray(mixste.mixste_forward(params, CFG, x2d, x3d, t))
    cfg_d = MixSTEConfig(**{**CFG.__dict__, "drop_rate": 0.3,
                            "attn_drop_rate": 0.1})
    # eval mode (train=False): rates ignored
    out_eval = np.asarray(mixste.mixste_forward(params, cfg_d, x2d, x3d, t))
    np.testing.assert_array_equal(base, out_eval)
    # train mode with rng but zero rates: identical draws to dropout-free path
    k = jax.random.PRNGKey(5)
    a = np.asarray(mixste.mixste_forward(params, CFG, x2d, x3d, t,
                                         train=True, rng=k))
    b = np.asarray(mixste.mixste_forward(
        params, MixSTEConfig(**{**CFG.__dict__, "drop_rate": 0.0}),
        x2d, x3d, t, train=True, rng=k))
    np.testing.assert_array_equal(a, b)


def test_dropout_active_in_train(params, rng):
    """Nonzero drop_rate changes the train-mode output, is rng-deterministic,
    and keeps magnitudes bounded (inverted dropout)."""
    x2d = jnp.asarray(rng.randn(4, 9, 7, 2), jnp.float32)
    x3d = jnp.asarray(rng.randn(4, 9, 7, 3), jnp.float32)
    t = jnp.asarray([3, 7, 11, 13])
    cfg_d = MixSTEConfig(**{**CFG.__dict__, "drop_rate": 0.5,
                            "attn_drop_rate": 0.25})
    k = jax.random.PRNGKey(5)
    out1 = np.asarray(mixste.mixste_forward(params, cfg_d, x2d, x3d, t,
                                            train=True, rng=k))
    out2 = np.asarray(mixste.mixste_forward(params, cfg_d, x2d, x3d, t,
                                            train=True, rng=k))
    np.testing.assert_array_equal(out1, out2)          # deterministic per key
    base = np.asarray(mixste.mixste_forward(params, CFG, x2d, x3d, t,
                                            train=True, rng=k))
    assert not np.allclose(out1, base)                 # dropout fired
    out3 = np.asarray(mixste.mixste_forward(params, cfg_d, x2d, x3d, t,
                                            train=True,
                                            rng=jax.random.PRNGKey(6)))
    assert not np.allclose(out1, out3)                 # key-dependent
    assert np.all(np.isfinite(out1))


def test_dropout_expectation_preserved(rng):
    """Inverted dropout preserves E[x] (torch nn.Dropout semantics)."""
    from pafuse_tpu.models.mixste import _dropout
    x = jnp.ones((200, 200), jnp.float32)
    y = np.asarray(_dropout(x, 0.3, jax.random.PRNGKey(0)))
    assert abs(y.mean() - 1.0) < 0.02
    kept = y[y != 0]
    np.testing.assert_allclose(kept, 1.0 / 0.7, rtol=1e-5)
