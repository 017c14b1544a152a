"""Data layer: synthetic dataset structure, prep, fetch, samplers, windows."""

import numpy as np
import pytest

from pafuse_tpu import geometry as geo, skeleton as sk
from pafuse_tpu.data import h3wb, sampling, windows


@pytest.fixture(scope="module")
def prepared():
    ds = h3wb.make_synthetic(subjects=("S1", "S8"), actions_per_subject=2,
                             frames_per_action=70, seed=3)
    kps = h3wb.prepare_data(ds)
    return ds, kps


def test_synthetic_structure(prepared):
    ds, kps = prepared
    assert set(ds.subjects()) == {"S1", "S8"}
    for subject in ds.subjects():
        assert len(ds.cameras()[subject]) == 4
        for action, anim in ds[subject].items():
            assert anim["positions"].shape[1:] == (134, 3)
            assert len(anim["positions_3d"]) == 4
            for p3, p2 in zip(anim["positions_3d"], anim["pose_2d"]):
                assert p3.shape == (70, 134, 3)
                assert p2.shape == (70, 134, 2)


def test_prepared_units(prepared):
    ds, kps = prepared
    anim = ds["S1"][next(iter(ds["S1"].keys()))]
    # meters: plausible camera distance 1..10 m
    z = anim["positions_3d"][0][..., 2]
    assert 0.5 < np.abs(z).mean() < 20
    # normalized 2D roughly in [-2, 2]
    k = kps["S1"][next(iter(kps["S1"].keys()))][0]
    assert np.abs(k).max() < 5


def test_projection_consistency(prepared):
    """Synthetic pose_2d must equal projecting the camera-space 3D."""
    ds, kps = prepared
    subject = "S1"
    action = next(iter(ds[subject].keys()))
    cam = ds.cameras()[subject][0]
    p3 = ds[subject][action]["positions_3d"][0]  # meters after prep
    k2 = kps[subject][action][0]
    reproj = np.asarray(geo.project_to_2d(p3[None], cam["intrinsic"][None])[0])
    np.testing.assert_allclose(reproj, k2, atol=1e-3)


def test_fetch(prepared):
    ds, kps = prepared
    cams, p3, p2 = h3wb.fetch(["S1"], kps, ds, stride=1)
    assert len(p2) == len(p3) == len(cams) == 2 * 4
    cams, p3, p2 = h3wb.fetch(["S1"], kps, ds, stride=2)
    assert p2[0].shape[0] == 35


def test_fetch_subset(prepared):
    ds, kps = prepared
    _, p3, p2 = h3wb.fetch(["S1"], kps, ds, stride=1, subset=0.5)
    assert p2[0].shape[0] == 35
    assert p3[0].shape[0] == 35


# ---------------------------------------------------------------------------
# ChunkedSampler vs reference semantics
# ---------------------------------------------------------------------------

def _reference_chunk_pairs(lengths, chunk_length, augment):
    """Chunk pairing exactly as generators.py:40-49."""
    pairs = []
    for i, n in enumerate(lengths):
        n_chunks = (n + chunk_length - 1) // chunk_length
        offset = (n_chunks * chunk_length - n) // 2
        bounds = np.arange(n_chunks + 1) * chunk_length - offset
        for s, e in zip(bounds[:-1], bounds[1:]):
            pairs.append((i, s, e, False))
        if augment:
            for s, e in zip(bounds[:-1], bounds[1:]):
                pairs.append((i, s, e, True))
    return pairs


def test_chunk_pair_count(prepared):
    ds, kps = prepared
    cams, p3, p2 = h3wb.fetch(["S1"], kps, ds)
    gen = sampling.ChunkedSampler(4, cams, p3, p2, chunk_length=27,
                                  augment=True, shuffle=False)
    ref = _reference_chunk_pairs([x.shape[0] for x in p2], 27, True)
    assert len(gen.pairs) == len(ref)
    for (a, b, c), (ri, rs, re_, rf) in zip(gen.pairs, ref):
        assert (a, b, bool(c)) == (ri, rs, rf)


def test_chunked_batch_matches_reference_assembly(prepared):
    """Vectorized gather must reproduce the reference's per-row np.pad
    assembly (generators.py:103-155), including flip."""
    ds, kps = prepared
    cams, p3, p2 = h3wb.fetch(["S1"], kps, ds)
    gen = sampling.ChunkedSampler(6, cams, p3, p2, chunk_length=27,
                                  augment=True, shuffle=False)
    got = next(gen.next_epoch())
    cam_b, b3d, b2d = got

    for row in range(6):
        seq_i, start, flip = gen.pairs[row]
        seq2d = p2[seq_i]
        lo, hi = max(start, 0), min(start + 27, seq2d.shape[0])
        expect = np.pad(seq2d[lo:hi],
                        ((lo - start, start + 27 - hi), (0, 0), (0, 0)), "edge")
        if flip:
            expect = expect.copy()
            expect[..., 0] *= -1
            expect = expect[:, sk.FLIP_PERMUTATION]
        np.testing.assert_allclose(b2d[row], expect, atol=1e-6)

        seq3d = p3[seq_i]
        expect3 = np.pad(seq3d[lo:hi],
                         ((lo - start, start + 27 - hi), (0, 0), (0, 0)), "edge")
        if flip:
            expect3 = expect3.copy()
            expect3[..., 0] *= -1
            expect3 = expect3[:, sk.FLIP_PERMUTATION]
        np.testing.assert_allclose(b3d[row], expect3, atol=1e-6)

        expect_cam = np.asarray(cams[seq_i]).copy()
        if flip:
            expect_cam[2] *= -1
            expect_cam[7] *= -1
        np.testing.assert_allclose(cam_b[row], expect_cam, atol=1e-6)


def test_chunked_determinism(prepared):
    ds, kps = prepared
    cams, p3, p2 = h3wb.fetch(["S1"], kps, ds)
    g1 = sampling.ChunkedSampler(4, cams, p3, p2, 27, random_seed=7)
    g2 = sampling.ChunkedSampler(4, cams, p3, p2, 27, random_seed=7)
    b1 = next(g1.next_epoch())
    b2 = next(g2.next_epoch())
    np.testing.assert_array_equal(b1[2], b2[2])


def test_chunked_rng_state_roundtrip(prepared):
    """Generator RNG state is checkpointable (generators.py:84-88)."""
    ds, kps = prepared
    cams, p3, p2 = h3wb.fetch(["S1"], kps, ds)
    import copy
    g1 = sampling.ChunkedSampler(4, cams, p3, p2, 27, random_seed=7)
    list(g1.next_epoch())
    # checkpointing serializes a snapshot of the RandomState
    state = copy.deepcopy(g1.random_state())
    g2 = sampling.ChunkedSampler(4, cams, p3, p2, 27, random_seed=99)
    g2.set_random_state(state)
    b1 = next(g1.next_epoch())
    b2 = next(g2.next_epoch())
    np.testing.assert_array_equal(b1[2], b2[2])


# ---------------------------------------------------------------------------
# eval_data_prepare windowing (main_h3wb.py:122-154)
# ---------------------------------------------------------------------------

def test_windows_exact_multiple():
    x = np.arange(54, dtype=np.float32).reshape(54, 1, 1).repeat(3, axis=1).repeat(2, axis=2)
    w2d, _ = windows.eval_data_prepare(27, x)
    assert w2d.shape == (2, 27, 3, 2)
    np.testing.assert_array_equal(w2d[0, :, 0, 0], np.arange(27))
    np.testing.assert_array_equal(w2d[1, :, 0, 0], np.arange(27, 54))


def test_windows_overlapping_tail():
    x = np.arange(40, dtype=np.float32).reshape(40, 1, 1).repeat(3, axis=1).repeat(2, axis=2)
    w2d, _ = windows.eval_data_prepare(27, x)
    assert w2d.shape == (2, 27, 3, 2)
    # last window = final 27 frames (overlaps the first)
    np.testing.assert_array_equal(w2d[1, :, 0, 0], np.arange(13, 40))


def test_windows_short_sequence_replicate_pad():
    x = np.arange(10, dtype=np.float32).reshape(10, 1, 1).repeat(3, axis=1).repeat(2, axis=2)
    w2d, _ = windows.eval_data_prepare(27, x)
    assert w2d.shape == (1, 27, 3, 2)
    np.testing.assert_array_equal(w2d[0, :10, 0, 0], np.arange(10))
    np.testing.assert_array_equal(w2d[0, 10:, 0, 0], np.full(17, 9))


def test_stitch_inverse():
    frames = 61
    x = np.random.RandomState(0).randn(frames, 4, 3).astype(np.float32)
    w, _ = windows.eval_data_prepare(27, x)
    back = windows.stitch_windows(w, frames, 27)
    np.testing.assert_allclose(back, x, atol=1e-6)


def test_stitch_inverse_short():
    frames = 9
    x = np.random.RandomState(1).randn(frames, 4, 3).astype(np.float32)
    w, _ = windows.eval_data_prepare(27, x)
    back = windows.stitch_windows(w, frames, 27)
    np.testing.assert_allclose(back, x, atol=1e-6)
