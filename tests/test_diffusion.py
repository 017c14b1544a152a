"""Diffusion: schedule golden values, q_sample, DDIM sampler structure,
part routing, flip TTA."""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pafuse_tpu import diffusion as diff, geometry, skeleton as sk
from pafuse_tpu.diffusion import D3DP, D3DPConfig

TINY = D3DPConfig(frames=9, num_kps=134, timesteps=50, sampling_timesteps=2,
                  num_proposals=2, depth=2)


@pytest.fixture(scope="module")
def tiny_model():
    model = D3DP(TINY)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def test_cosine_schedule_golden():
    """Closed-form check of the cosine schedule (diffusionpose.py:41-51)."""
    T = 1000
    betas = diff.cosine_beta_schedule(T)
    s = 0.008
    x = np.linspace(0, T, T + 1)
    ac = np.cos((x / T + s) / (1 + s) * math.pi / 2) ** 2
    ac = ac / ac[0]
    expected = np.clip(1 - ac[1:] / ac[:-1], 0, 0.999)
    np.testing.assert_allclose(betas, expected, atol=1e-12)
    assert betas.shape == (T,)
    assert betas[0] < 1e-4 and betas[-1] == 0.999


def test_schedule_identities():
    sched = diff.make_schedule(100)
    ac = np.cumprod(1 - diff.cosine_beta_schedule(100))
    np.testing.assert_allclose(sched.alphas_cumprod, ac, rtol=1e-6)
    np.testing.assert_allclose(sched.sqrt_alphas_cumprod ** 2,
                               sched.alphas_cumprod, rtol=1e-5)
    np.testing.assert_allclose(
        sched.sqrt_one_minus_alphas_cumprod ** 2 + sched.sqrt_alphas_cumprod ** 2,
        np.ones(100), rtol=1e-5)
    assert sched.alphas_cumprod_prev[0] == 1.0


def test_ddim_time_pairs():
    pairs = diff.ddim_time_pairs(1000, 5)
    assert len(pairs) == 5
    assert pairs[0][0] == 999
    assert pairs[-1][1] == -1
    # consecutive: each pair's second element is the next pair's first
    for (a, b), (c, d) in zip(pairs[:-1], pairs[1:]):
        assert b == c
    # full-length sampling covers every step
    pairs_full = diff.ddim_time_pairs(10, 10)
    assert pairs_full == [(9, 8), (8, 7), (7, 6), (6, 5), (5, 4), (4, 3),
                          (3, 2), (2, 1), (1, 0), (0, -1)]


def test_q_sample_endpoints(tiny_model):
    model, _ = tiny_model
    x0 = jnp.ones((4, 9, 134, 3))
    noise = jnp.full_like(x0, 2.0)
    # t=0: mostly signal
    out0 = np.asarray(model.q_sample(x0, jnp.zeros(4, jnp.int32), noise))
    s = model.schedule
    expected0 = s.sqrt_alphas_cumprod[0] * 1 + s.sqrt_one_minus_alphas_cumprod[0] * 2
    np.testing.assert_allclose(out0, expected0, rtol=1e-5)
    # t=T-1: mostly noise
    tmax = jnp.full(4, TINY.timesteps - 1, jnp.int32)
    outT = np.asarray(model.q_sample(x0, tmax, noise))
    expectedT = (s.sqrt_alphas_cumprod[-1] * 1
                 + s.sqrt_one_minus_alphas_cumprod[-1] * 2)
    np.testing.assert_allclose(outT, expectedT, rtol=1e-5)


def test_predict_noise_inverts_q_sample(tiny_model):
    """pred_noise(q_sample(x0, t, eps), t, x0) == eps."""
    model, _ = tiny_model
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(3, 9, 134, 3), jnp.float32)
    eps = jnp.asarray(rng.randn(3, 9, 134, 3), jnp.float32)
    t = jnp.asarray([0, 10, 49])
    x_t = model.q_sample(x0, t, eps)
    rec = np.asarray(model.predict_noise_from_start(x_t, t, x0))
    np.testing.assert_allclose(rec, np.asarray(eps), atol=1e-3)


def test_prepare_targets_vectorized(tiny_model):
    model, _ = tiny_model
    rng = jax.random.PRNGKey(1)
    x3d = jnp.asarray(np.random.RandomState(0).randn(8, 9, 134, 3), jnp.float32)
    x, noise, t = model.prepare_targets(rng, x3d)
    assert x.shape == x3d.shape and t.shape == (8,)
    assert np.all(np.asarray(t) >= 0) and np.all(np.asarray(t) < TINY.timesteps)
    # clamped to +-1.1*scale
    assert np.abs(np.asarray(x)).max() <= 1.1 * TINY.scale + 1e-6


def test_train_forward_shape(tiny_model):
    model, params = tiny_model
    rng = jax.random.PRNGKey(2)
    r = np.random.RandomState(0)
    x2d = jnp.asarray(r.randn(2, 9, 134, 2), jnp.float32)
    x3d = jnp.asarray(r.randn(2, 9, 134, 3) * 0.1, jnp.float32)
    out = model.train_forward(params, rng, x2d, x3d)
    assert out.shape == (2, 9, 134, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_ddim_sample_shapes(tiny_model):
    model, params = tiny_model
    r = np.random.RandomState(0)
    x2d = jnp.asarray(r.randn(2, 9, 134, 2), jnp.float32)
    out = model.ddim_sample(params, jax.random.PRNGKey(0), x2d)
    # (B, S, H, F, N, 3)
    assert out.shape == (2, 2, 2, 9, 134, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_ddim_sample_flip_tta(tiny_model):
    model, params = tiny_model
    r = np.random.RandomState(0)
    x2d = r.randn(2, 9, 134, 2).astype(np.float32)
    x2d_flip = geometry.flip_pose_np(x2d)
    out = model.ddim_sample(params, jax.random.PRNGKey(0), jnp.asarray(x2d),
                            jnp.asarray(x2d_flip))
    assert out.shape == (2, 2, 2, 9, 134, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_flip_tta_equivariance(tiny_model):
    """With flip TTA, feeding the mirrored conditioning must give the
    mirrored output (the averaged prediction is flip-symmetrized)."""
    model, params = tiny_model
    r = np.random.RandomState(3)
    x2d = r.randn(1, 9, 134, 2).astype(np.float32)
    x2d_flip = geometry.flip_pose_np(x2d)
    rng = jax.random.PRNGKey(7)

    out_a = np.asarray(model.ddim_sample(
        params, rng, jnp.asarray(x2d), jnp.asarray(x2d_flip),
        sampling_timesteps=1, num_proposals=1))
    # feed the flipped pair, and flip the initial noise the same way: the
    # symmetrized denoiser output must mirror exactly.
    # We verify the weaker end-to-end property: x0 prediction of the flipped
    # condition equals flip of the original x0 prediction when the initial
    # noise is also mirrored.  With S=1 the sampler output is exactly the
    # symmetrized x0(f(noise)) so we check symmetrization directly:
    x_t = jax.random.normal(jax.random.PRNGKey(11), (1, 1, 9, 134, 3))
    pn1, xs1 = model._model_predictions(
        params, x_t, jnp.asarray(x2d), 5, jnp.asarray(x2d_flip))
    x_t_f = geometry.flip_pose(x_t)
    pn2, xs2 = model._model_predictions(
        params, x_t_f, jnp.asarray(x2d_flip), 5, jnp.asarray(x2d))
    np.testing.assert_allclose(
        np.asarray(xs2), np.asarray(geometry.flip_pose(xs1)), atol=2e-4)


def test_part_routing_matches_manual(tiny_model):
    """PartModel concat must reproduce per-part forward + reassembly."""
    from pafuse_tpu.models import mixste
    model, params = tiny_model
    r = np.random.RandomState(1)
    x2d = jnp.asarray(r.randn(2, 9, 134, 2), jnp.float32)
    x3d = jnp.asarray(r.randn(2, 9, 134, 3), jnp.float32)
    t = jnp.asarray([3, 7])
    full = np.asarray(model.model(params, x2d, x3d, t))
    for spec in model.model.specs:
        idx = spec.joint_indices
        part_out = np.asarray(mixste.mixste_forward(
            params[spec.name], spec.config,
            jnp.take(x2d, jnp.asarray(idx), axis=-2),
            jnp.take(x3d, jnp.asarray(idx), axis=-2), t))
        np.testing.assert_allclose(full[..., idx, :], part_out, atol=1e-6)


def test_monolithic_model():
    cfg = D3DPConfig(frames=9, num_kps=134, timesteps=20, sampling_timesteps=1,
                     num_proposals=1, depth=2, part_based=False, cs=64)
    model = D3DP(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    assert set(params.keys()) == {"whole_body"}
    r = np.random.RandomState(0)
    x2d = jnp.asarray(r.randn(1, 9, 134, 2), jnp.float32)
    out = model.ddim_sample(params, jax.random.PRNGKey(0), x2d)
    assert out.shape == (1, 1, 1, 9, 134, 3)


def test_param_count_flagship():
    """Flagship part-based model ~35M params (SURVEY §3.5 / BASELINE.md)."""
    cfg = D3DPConfig()  # 27 frames, depth 8, body384/face224/hands256
    model = D3DP(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    n = model.model.param_count(params)
    assert 30e6 < n < 40e6, n


def test_num_kps_flip_permutation_gate():
    """num_kps=133 gets a correct (root-less) permutation; unknown layouts
    hard-error instead of silently flipping with an identity table
    (VERDICT round 1, missing #5)."""
    cfg133 = D3DPConfig(frames=9, num_kps=133, timesteps=50, depth=1,
                        part_based=False)
    m = D3DP(cfg133)
    np.testing.assert_array_equal(m.flip_permutation,
                                  sk.FLIP_PERMUTATION_NO_ROOT)
    # an involution with no fixed points among paired joints
    p = m.flip_permutation
    np.testing.assert_array_equal(p[p], np.arange(133))

    with pytest.raises(ValueError, match="flip permutation"):
        D3DP(D3DPConfig(frames=9, num_kps=50, timesteps=50, depth=1,
                        part_based=False))

    # explicit table still wins
    custom = np.arange(50, dtype=np.int32)
    m2 = D3DP(D3DPConfig(frames=9, num_kps=50, timesteps=50, depth=1,
                         part_based=False), flip_permutation=custom)
    np.testing.assert_array_equal(m2.flip_permutation, custom)

    with pytest.raises(ValueError, match="shape"):
        D3DP(D3DPConfig(frames=9, num_kps=50, timesteps=50, depth=1,
                        part_based=False),
             flip_permutation=np.arange(49, dtype=np.int32))
