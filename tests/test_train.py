"""Training step, sharded execution, checkpoint round trips."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pafuse_tpu import checkpoints, train as tr
from pafuse_tpu.diffusion import D3DP, D3DPConfig

TINY = D3DPConfig(frames=9, num_kps=134, timesteps=50, sampling_timesteps=1,
                  num_proposals=1, depth=2, drop_path_rate=0.1)


@pytest.fixture(scope="module")
def model_state():
    model = D3DP(TINY)
    state, tx = tr.create_train_state(model, seed=0)
    return model, state, tx


def _batch(rng, b=4):
    x2d = jnp.asarray(rng.randn(b, 9, 134, 2), jnp.float32)
    x3d = jnp.asarray(rng.randn(b, 9, 134, 3) * 0.1, jnp.float32)
    return x2d, x3d


def test_train_step_runs_and_loss_finite(model_state):
    model, state, tx = model_state
    step = tr.build_train_step(model, tx, donate=False)
    rng = np.random.RandomState(0)
    x2d, x3d = _batch(rng)
    state2, loss = step(state, jnp.float32(1e-4), x2d, x3d)
    assert np.isfinite(float(loss))
    # params actually changed
    leaf0 = jax.tree_util.tree_leaves(state.params)[0]
    leaf1 = jax.tree_util.tree_leaves(state2.params)[0]
    assert not np.allclose(np.asarray(leaf0), np.asarray(leaf1))


def test_overfit_tiny_batch(model_state):
    """Loss must decrease when repeatedly training on one batch."""
    model, state, tx = model_state
    step = tr.build_train_step(model, tx, donate=False)
    rng = np.random.RandomState(1)
    x2d, x3d = _batch(rng, b=2)
    losses = []
    for i in range(12):
        state, loss = step(state, jnp.float32(3e-4), x2d, x3d)
        losses.append(float(loss))
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses


def test_sharded_step_matches_single_device(model_state):
    """8-device data-parallel step must equal the unsharded step."""
    model, state, tx = model_state
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = tr.make_mesh((8,), ("data",))
    step_sharded = tr.build_train_step(model, tx, mesh=mesh, donate=False)
    step_single = tr.build_train_step(model, tx, donate=False)
    rng = np.random.RandomState(2)
    x2d, x3d = _batch(rng, b=8)
    s1, l1 = step_single(state, jnp.float32(1e-4), x2d, x3d)
    s2, l2 = step_sharded(state, jnp.float32(1e-4), x2d, x3d)
    assert abs(float(l1) - float(l2)) < 1e-5
    p1 = jax.tree_util.tree_leaves(s1.params)
    p2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_lr_injection_no_recompile(model_state):
    """Different lr values must reuse the compiled step (traced scalar)."""
    model, state, tx = model_state
    step = tr.build_train_step(model, tx, donate=False)
    rng = np.random.RandomState(3)
    x2d, x3d = _batch(rng, b=2)
    state, _ = step(state, jnp.float32(1e-4), x2d, x3d)
    compiles_before = step._cache_size()
    state, _ = step(state, jnp.float32(0.993e-4), x2d, x3d)
    assert step._cache_size() == compiles_before


def test_pad_batch():
    x = np.arange(12, dtype=np.float32).reshape(3, 4)
    padded, n = tr.pad_batch(x, 5)
    assert n == 3 and padded.shape == (5, 4)
    np.testing.assert_array_equal(padded[3], x[-1])
    same, n = tr.pad_batch(x, 3)
    assert n == 3 and same is x


def test_weight_table():
    w = tr.mixste_weight_table(134)
    assert w.shape == (134,)
    assert w[8] == 4 and w[117] == 1.0


# ---------------------------------------------------------------------------
# Checkpoints
# ---------------------------------------------------------------------------

def test_native_checkpoint_roundtrip(model_state, tmp_path):
    model, state, tx = model_state
    rs = np.random.RandomState(5)
    path = checkpoints.save_state(
        str(tmp_path), "epoch_3", params=state.params,
        opt_state=state.opt_state, epoch=3, lr=5e-5, random_state=rs)
    restored = checkpoints.load_state(path, state.params, state.opt_state)
    assert restored["epoch"] == 3 and abs(restored["lr"] - 5e-5) < 1e-12
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state restored too
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(restored["opt_state"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # RNG state round-trips
    r2 = restored["random_state"]
    np.testing.assert_array_equal(rs.permutation(10), r2.permutation(10))


def test_torch_converter_roundtrip(model_state):
    """export -> convert must be the identity on our param trees."""
    model, state, tx = model_state
    sd = checkpoints.export_torch_state_dict(state.params)
    assert any(k.startswith("pose_estimator.body.STEblocks.0.attn.qkv")
               for k in sd)
    converted, matched, skipped = checkpoints.convert_torch_state_dict(
        sd, state.params)
    assert not skipped
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(converted)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_torch_converter_strips_module_prefix(model_state):
    model, state, tx = model_state
    sd = checkpoints.export_torch_state_dict(state.params)
    sd = {f"module.{k}": v for k, v in sd.items()}
    converted, matched, skipped = checkpoints.convert_torch_state_dict(
        sd, state.params)
    assert not skipped and len(matched) == len(sd)


def test_remat_matches_plain(model_state):
    """jax.checkpoint'd denoiser must be numerically identical (it only
    changes what gets rematerialized in the backward pass)."""
    from pafuse_tpu.diffusion import D3DP
    model_plain, state, tx = model_state
    model_remat = D3DP(TINY, remat=True)
    step_p = tr.build_train_step(model_plain, tx, donate=False)
    step_r = tr.build_train_step(model_remat, tx, donate=False)
    rng = np.random.RandomState(7)
    x2d, x3d = _batch(rng, b=2)
    s1, l1 = step_p(state, jnp.float32(1e-4), x2d, x3d)
    s2, l2 = step_r(state, jnp.float32(1e-4), x2d, x3d)
    assert abs(float(l1) - float(l2)) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_training_determinism():
    """Same seed => identical loss sequence (replaces the reference's
    cudnn-determinism story, main_h3wb.py:591-601)."""
    losses_by_run = []
    for _ in range(2):
        model = D3DP(TINY)
        state, tx = tr.create_train_state(model, seed=42)
        step = tr.build_train_step(model, tx, donate=False)
        rng = np.random.RandomState(9)
        x2d, x3d = _batch(rng, b=2)
        run = []
        for i in range(3):
            state, loss = step(state, jnp.float32(1e-4), x2d, x3d)
            run.append(float(loss))
        losses_by_run.append(run)
    assert losses_by_run[0] == losses_by_run[1]
