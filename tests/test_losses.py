"""Loss/metric functions vs brute-force NumPy references."""

import numpy as np
import pytest
import jax.numpy as jnp

from pafuse_tpu import geometry as geo, losses, skeleton as sk


@pytest.fixture(scope="module")
def hyp_data():
    """(B,S,H,F,N,C) predictions + (B,F,N,C) targets + 2D tensors."""
    rng = np.random.RandomState(0)
    B, S, H, F, N = 2, 3, 4, 5, 134
    pred = rng.randn(B, S, H, F, N, 3).astype(np.float32)
    tgt = rng.randn(B, F, N, 3).astype(np.float32)
    reproj = rng.randn(B, S, H, F, N, 2).astype(np.float32)
    t2d = rng.randn(B, F, N, 2).astype(np.float32)
    return pred, tgt, reproj, t2d


def test_mpjpe_simple():
    pred = np.zeros((2, 3, 4, 3), np.float32)
    tgt = np.ones((2, 3, 4, 3), np.float32)
    out = float(losses.mpjpe(jnp.asarray(pred), jnp.asarray(tgt)))
    assert abs(out - np.sqrt(3.0)) < 1e-6


def test_mpjpe_weights_and_mse():
    rng = np.random.RandomState(1)
    pred = rng.randn(2, 3, 4, 3).astype(np.float32)
    tgt = rng.randn(2, 3, 4, 3).astype(np.float32)
    w = np.array([1.0, 2.0, 0.5, 1.5], np.float32)
    d = np.linalg.norm(pred - tgt, axis=-1)
    np.testing.assert_allclose(
        float(losses.mpjpe(pred, tgt, weights=w)), (w * d).mean(), rtol=1e-6)
    np.testing.assert_allclose(
        float(losses.mpjpe(pred, tgt, weights=w, mse_loss=True)),
        ((w * d) ** 2).mean(), rtol=1e-6)


def test_j_best_bruteforce(hyp_data):
    pred, tgt, _, _ = hyp_data
    out = np.asarray(losses.mpjpe_diffusion_all_min(pred, tgt))
    errs = np.linalg.norm(pred - tgt[:, None, None], axis=-1)  # B,S,H,F,N
    expected = errs.min(axis=2).transpose(1, 0, 2, 3).reshape(3, -1).mean(-1)
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_p_agg_bruteforce(hyp_data):
    pred, tgt, _, _ = hyp_data
    out = np.asarray(losses.mpjpe_diffusion_all_min(pred, tgt, mean_pos=True))
    errs = np.linalg.norm(pred.mean(axis=2) - tgt[:, None], axis=-1)
    expected = errs.transpose(1, 0, 2, 3).reshape(3, -1).mean(-1)
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_p_best_bruteforce(hyp_data):
    pred, tgt, _, _ = hyp_data
    out, _ = losses.mpjpe_diffusion(pred, tgt)
    out = np.asarray(out)
    # reference centers both at root first (loss.py:131-132)
    predc = pred - pred[..., 0:1, :]
    tgtc = tgt - tgt[..., 0:1, :]
    errs = np.linalg.norm(predc - tgtc[:, None, None], axis=-1)
    per_h = errs.transpose(1, 2, 0, 3, 4).reshape(3, 4, -1).mean(-1)
    np.testing.assert_allclose(out, per_h.min(axis=1), rtol=1e-5)


def test_p_best_part_based_consistent(hyp_data):
    pred, tgt, _, _ = hyp_data
    out, parts = losses.mpjpe_diffusion(pred, tgt, part_based=True)
    assert set(parts) == set(sk.PARTS_JOINT_INDICES)
    predc = np.asarray(geo.center_pose_parts(pred))
    tgtc = np.asarray(geo.center_pose_parts(tgt))
    errs = np.linalg.norm(predc - tgtc[:, None, None], axis=-1)
    per_h = errs.transpose(1, 2, 0, 3, 4).reshape(3, 4, -1).mean(-1)
    np.testing.assert_allclose(np.asarray(out), per_h.min(axis=1), rtol=1e-5)
    # part errors are selected at the argmin-hypothesis of the global error
    min_inds = per_h.argmin(axis=1)
    for p, idx in sk.PARTS_JOINT_INDICES.items():
        pe = errs[..., idx].transpose(1, 2, 0, 3, 4).reshape(3, 4, -1).mean(-1)
        expected = pe[np.arange(3), min_inds]
        np.testing.assert_allclose(np.asarray(parts[p]), expected, rtol=1e-5)


def test_j_agg_selects_by_reprojection(hyp_data):
    pred, tgt, reproj, t2d = hyp_data
    out = np.asarray(losses.mpjpe_diffusion_reproj(pred, tgt, reproj, t2d))
    errs = np.linalg.norm(pred - tgt[:, None, None], axis=-1)
    errs2d = np.linalg.norm(reproj - t2d[:, None, None], axis=-1)
    sel = errs2d.argmin(axis=2)
    picked = np.take_along_axis(errs, sel[:, :, None], axis=2)
    expected = picked.transpose(1, 2, 0, 3, 4).reshape(3, -1).mean(-1)
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_j_agg_perfect_selection():
    """If one hypothesis reprojects perfectly, J_Agg must pick it."""
    rng = np.random.RandomState(2)
    B, S, H, F, N = 1, 1, 3, 2, 10
    tgt = rng.randn(B, F, N, 3).astype(np.float32)
    pred = np.repeat(tgt[:, None, None], H, axis=2) + 1.0  # all off by 1
    pred[:, :, 1] = tgt[:, None]                            # hyp 1 exact
    t2d = rng.randn(B, F, N, 2).astype(np.float32)
    reproj = np.repeat(t2d[:, None, None], H, axis=2) + 5.0
    reproj[:, :, 1] = t2d[:, None]
    out = np.asarray(losses.mpjpe_diffusion_reproj(
        pred.astype(np.float32), tgt, reproj.astype(np.float32), t2d))
    np.testing.assert_allclose(out, [0.0], atol=1e-6)


def test_3dhp_valid_mask():
    rng = np.random.RandomState(3)
    B, S, H, F, N = 2, 2, 3, 4, 17
    pred = rng.randn(B, S, H, F, N, 3).astype(np.float32)
    tgt = rng.randn(B, F, N, 3).astype(np.float32)
    valid = np.zeros((B, F), bool)
    valid[0, :2] = True
    valid[1, 1:] = True
    out = np.asarray(losses.mpjpe_diffusion_3dhp(pred, tgt, valid))
    # brute force: collect valid (b,f), per (s,h) mean then min over h
    errs = np.linalg.norm(pred - tgt[:, None, None], axis=-1)  # B,S,H,F,N
    sel = errs[valid.nonzero()[0], :, :, valid.nonzero()[1]]   # M,S,H,N
    per_h = sel.transpose(1, 2, 0, 3).reshape(S, H, -1).mean(-1)
    np.testing.assert_allclose(out, per_h.min(axis=1), rtol=1e-5)


def test_p2_procrustes_invariance():
    """P2 must be ~0 for a rigidly transformed prediction."""
    rng = np.random.RandomState(4)
    tgt = rng.randn(6, 17, 3)
    # random rotation
    q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    pred = 1.7 * tgt @ q.T + rng.randn(1, 1, 3)
    assert losses.p_mpjpe(pred, tgt) < 1e-8


def test_p2_diffusion_shapes(hyp_data):
    pred, tgt, reproj, t2d = hyp_data
    out = losses.p_mpjpe_diffusion_all_min(pred, tgt)
    assert out.shape == (3,)
    out = losses.p_mpjpe_diffusion(pred, tgt)
    assert out.shape == (3,)
    out = losses.p_mpjpe_diffusion_all_min(pred, tgt, mean_pos=True)
    assert out.shape == (3,)
    out = losses.p_mpjpe_diffusion_reproj(pred, tgt, reproj, t2d)
    assert out.shape == (3,)
    assert np.all(np.isfinite(out))


def test_n_mpjpe_scale_invariance():
    rng = np.random.RandomState(5)
    tgt = rng.randn(2, 3, 17, 3).astype(np.float32)
    pred = 2.0 * tgt
    assert float(losses.n_mpjpe(jnp.asarray(pred), jnp.asarray(tgt))) < 1e-5


def test_velocity_error():
    t = np.linspace(0, 1, 5, dtype=np.float32)
    tgt = np.zeros((1, 5, 2, 3), np.float32)
    tgt[..., 0] = t[None, :, None]
    pred = tgt * 2  # velocity differs by t-step
    out = float(losses.mean_velocity_error_train(
        jnp.asarray(pred), jnp.asarray(tgt)))
    assert abs(out - 0.25) < 1e-5
