"""Deterministic-noise evaluation (``evaluate_sequences(noise_table=...)``)
— the mechanism behind the bit-aligned cross-framework pipeline comparison
in tools/check_parity.py --inject-noise / tools/rehearse_parity.py."""

import os
import sys

import numpy as np
import pytest
import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from pafuse_tpu import evaluate as ev
from pafuse_tpu.diffusion import D3DP, D3DPConfig
from check_parity import action_noise_tables, window_count

F, N, P, S = 9, 134, 2, 2


@pytest.fixture(scope="module")
def model_and_seqs():
    cfg = D3DPConfig(frames=F, timesteps=20, depth=1,
                     num_proposals=P, sampling_timesteps=S)
    model = D3DP(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(3)
    cam = np.array([2.3, 2.3, 0.0, 0.0, -0.2, 0.2, 0.0, 0.0, 0.0],
                   np.float32)
    # ragged sequence lengths: 2, 3, 1 windows
    seqs = [(cam, (0.1 * rng.randn(f, N, 3) + [0, 0, 4]).astype(np.float32),
             rng.randn(f, N, 2).astype(np.float32))
            for f in (2 * F, 3 * F - 2, F - 4)]
    n_win = sum(window_count(s[2].shape[0], F) for s in seqs)
    assert n_win == 6
    table = action_noise_tables(0, n_win, P, S, F, N)
    return model, params, seqs, table


def _means(model, params, seqs, table, window_batch, key=0,
           sequence_batches=False):
    acc, _ = ev.evaluate_sequences(
        model, params, list(seqs), None, rng=jax.random.PRNGKey(key),
        receptive_field=F, num_proposals=P, sampling_timesteps=S,
        window_batch=window_batch, noise_table=table,
        sequence_batches=sequence_batches)
    return acc.means_mm()


def test_injected_noise_is_deterministic(model_and_seqs):
    model, params, seqs, table = model_and_seqs
    a = _means(model, params, seqs, table, window_batch=8, key=1)
    b = _means(model, params, seqs, table, window_batch=8, key=2)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])
    # without the table, different keys give different metrics
    c = _means(model, params, seqs, None, window_batch=8, key=1)
    d = _means(model, params, seqs, None, window_batch=8, key=2)
    assert abs(float(np.atleast_1d(c["J_Best"])[-1])
               - float(np.atleast_1d(d["J_Best"])[-1])) > 1e-6


def test_injected_noise_batching_invariance(model_and_seqs):
    """Pooled batches mix sequences and the tail batch is partial; per-window
    noise must follow its window across any batch split.  P_Best is excluded:
    its argmin hypothesis is selected by BATCH-mean error (like the
    reference, loss.py:114-168), so it legitimately depends on batch
    composition — that is why strict-parity runs use sequence_batches."""
    model, params, seqs, table = model_and_seqs
    one = _means(model, params, seqs, table, window_batch=8)   # single batch
    split = _means(model, params, seqs, table, window_batch=4)  # 4+2(masked)
    # f32 accumulation order differs across splits; anything beyond the
    # 1e-3 mm class would indicate a window<->noise misalignment
    for k in one:
        if k.startswith("P_Best"):
            continue
        np.testing.assert_allclose(split[k], one[k], atol=2e-3,
                                   err_msg=k)


def test_sequence_batches_alignment(model_and_seqs):
    """With sequence_batches, every metric (incl. P_Best) is invariant to
    the padded batch size as long as each sequence fits one batch — the
    selection granularity is pinned to the sequence, matching the
    reference's per-sequence sub-batching."""
    model, params, seqs, table = model_and_seqs
    a = _means(model, params, seqs, table, window_batch=8,
               sequence_batches=True)
    b = _means(model, params, seqs, table, window_batch=4,
               sequence_batches=True)
    for k in a:
        np.testing.assert_allclose(b[k], a[k], atol=2e-3, err_msg=k)
    # and it differs from pooled mode on P_Best (different batch makeup)
    pooled = _means(model, params, seqs, table, window_batch=8)
    assert not np.allclose(pooled["P_Best"], a["P_Best"], atol=1e-6)


def test_wrong_table_size_asserts(model_and_seqs):
    model, params, seqs, table = model_and_seqs
    bad = (table[0][:-1], table[1][:-1])
    with pytest.raises(AssertionError):
        _means(model, params, seqs, bad, window_batch=8)
