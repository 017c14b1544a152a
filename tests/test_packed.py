"""Packed-parts execution must match the unpacked path numerically.

The packed path pads body/face/hands to a common (J=68, C=384), runs one
vmapped network with masked LayerNorm/softmax, and gathers the whole-body
output — any masking mistake (LN statistics over padded channels, attention
to padded keys, head-boundary mixing) shows up as a numeric diff here.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pafuse_tpu import skeleton as sk
from pafuse_tpu.diffusion import D3DP, D3DPConfig
from pafuse_tpu.models import packed as pk
from pafuse_tpu.models.parts import PartModel, build_part_specs

B, F = 2, 9


@pytest.fixture(scope="module", autouse=True)
def _experimental_tier():
    """Packed execution is a retained negative result behind the
    experimental switch (README "Support tiers")."""
    import os
    os.environ["PAFUSE_EXPERIMENTAL_KERNELS"] = "1"
    yield
    del os.environ["PAFUSE_EXPERIMENTAL_KERNELS"]


def test_packed_requires_experimental_tier(monkeypatch):
    monkeypatch.delenv("PAFUSE_EXPERIMENTAL_KERNELS", raising=False)
    cfg = D3DPConfig(frames=F, timesteps=20, sampling_timesteps=2,
                     num_proposals=2, depth=2)
    with pytest.raises(ValueError, match="EXPERIMENTAL"):
        D3DP(cfg, packed_parts=True)


@pytest.fixture(scope="module", params=[True, False],
                ids=["merged_hands", "split_hands"])
def models(request, _experimental_tier):
    merge = request.param
    cfg = D3DPConfig(frames=F, timesteps=20, sampling_timesteps=2,
                     num_proposals=2, depth=2, merge_hands=merge)
    unpacked = D3DP(cfg)
    packed = D3DP(cfg, packed_parts=True)
    params = unpacked.init_params(jax.random.PRNGKey(0))
    return unpacked, packed, params


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    x2d = rng.randn(B, F, 134, 2).astype(np.float32)
    x3d = rng.randn(B, F, 134, 3).astype(np.float32)
    t = rng.randint(0, 20, (B,)).astype(np.int32)
    return jnp.asarray(x2d), jnp.asarray(x3d), jnp.asarray(t)


def test_packed_forward_matches_unpacked(models):
    unpacked, packed, params = models
    x2d, x3d, t = _inputs()
    ref = np.asarray(unpacked.model(params, x2d, x3d, t))
    out = np.asarray(packed.model(params, x2d, x3d, t))
    assert out.shape == ref.shape == (B, F, 134, 3)
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_packed_sampler_matches_unpacked(models):
    unpacked, packed, params = models
    rng = np.random.RandomState(1)
    x2d = jnp.asarray(rng.randn(B, F, 134, 2).astype(np.float32))
    x2d_flip = jnp.asarray(
        np.asarray(x2d)[:, :, sk.FLIP_PERMUTATION] * [-1, 1])
    H, S = 2, 2
    init_noise = rng.randn(B, H, F, 134, 3).astype(np.float32)
    step_noise = rng.randn(S, B, H, F, 134, 3).astype(np.float32)

    ref = np.asarray(unpacked.ddim_sample(
        params, jax.random.PRNGKey(2), x2d, x2d_flip,
        init_noise=init_noise, step_noise=step_noise))
    out = np.asarray(packed.ddim_sample(
        params, jax.random.PRNGKey(2), x2d, x2d_flip,
        init_noise=init_noise, step_noise=step_noise))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_padded_channels_stay_zero():
    """The packed residual stream must be exactly zero in padded channels
    (the invariant the masked-LN closed form relies on)."""
    specs = build_part_specs(sk.parts_table(True), F, 5, 1)
    plan = pk.make_pack_plan(specs)
    model = PartModel(specs, packed=True)
    params = model.init_params(jax.random.PRNGKey(3))
    packed_params = pk.pack_params(params, specs, plan)

    x2d, x3d, t = _inputs(4)
    gather = jnp.asarray(plan.joint_gather)
    x2d_p = jnp.moveaxis(jnp.take(x2d, gather, axis=-2), -3, 0)
    x3d_p = jnp.moveaxis(jnp.take(x3d, gather, axis=-2), -3, 0)

    # run the embedding stage only, for the face part (C_p=224 < 384)
    p_face = plan.names.index("face")
    pp = jax.tree_util.tree_map(lambda a: a[p_face], packed_params)
    x = jnp.concatenate([x2d_p[p_face], x3d_p[p_face]], axis=-1)
    emb = pk._linear(pp["Spatial_patch_to_embedding"], x, jnp.float32)
    c_p = int(plan.c_real[p_face])
    assert c_p == 224
    np.testing.assert_array_equal(np.asarray(emb[..., c_p:]), 0.0)

    # masked LN keeps them zero and matches plain LN on the real slice
    ln = pk._masked_layernorm(pp["STEblocks"][0]["norm1"], emb,
                              jnp.float32(c_p), plan.c_max)
    np.testing.assert_array_equal(np.asarray(ln[..., c_p:]), 0.0)
    from pafuse_tpu.models.mixste import _layernorm
    ln_ref = _layernorm(
        {k: v[:c_p] for k, v in params["face"]["STEblocks"][0]["norm1"].items()},
        emb[..., :c_p])
    np.testing.assert_allclose(np.asarray(ln[..., :c_p]),
                               np.asarray(ln_ref), atol=1e-5)
