"""Native runtime: C++ batch assembly parity + prefetching loader."""

import numpy as np
import pytest

from pafuse_tpu import runtime, skeleton as sk
from pafuse_tpu.data import h3wb, sampling


def test_native_library_builds():
    lib = runtime.get_library()
    assert lib is not None, "g++ is available in this image; build must work"


def test_assemble_matches_numpy(rng):
    src = rng.randn(100, 134, 3).astype(np.float32)
    idx = rng.randint(0, 100, size=(16, 9)).astype(np.int64)
    flip = (rng.rand(16) < 0.5)
    perm = sk.FLIP_PERMUTATION

    native = runtime.assemble_batch(src, idx, flip, perm)

    expected = src[idx].copy()
    fl = expected[flip]
    fl[..., 0] *= -1
    expected[flip] = fl[:, :, perm]
    np.testing.assert_allclose(native, expected, atol=0)


def test_assemble_no_flip(rng):
    src = rng.randn(50, 17, 2).astype(np.float32)
    idx = rng.randint(0, 50, size=(4, 27)).astype(np.int64)
    out = runtime.assemble_batch(src, idx, None, None)
    np.testing.assert_allclose(out, src[idx], atol=0)


def test_sampler_native_equals_numpy():
    ds = h3wb.make_synthetic(subjects=("S1",), actions_per_subject=1,
                             frames_per_action=50, seed=5)
    kps = h3wb.prepare_data(ds)
    cams, p3, p2 = h3wb.fetch(["S1"], kps, ds)
    kw = dict(chunk_length=27, augment=True, shuffle=True, random_seed=11)
    g_native = sampling.ChunkedSampler(6, cams, p3, p2, use_native=True, **kw)
    g_numpy = sampling.ChunkedSampler(6, cams, p3, p2, use_native=False, **kw)
    assert g_native._native is not None
    assert g_numpy._native is None
    for (c1, b31, b21), (c2, b32, b22) in zip(g_native.next_epoch(),
                                              g_numpy.next_epoch()):
        np.testing.assert_allclose(b21, b22, atol=0)
        np.testing.assert_allclose(b31, b32, atol=0)
        np.testing.assert_allclose(c1, c2, atol=0)


def test_prefetching_loader_order():
    ds = h3wb.make_synthetic(subjects=("S1",), actions_per_subject=1,
                             frames_per_action=50, seed=6)
    kps = h3wb.prepare_data(ds)
    cams, p3, p2 = h3wb.fetch(["S1"], kps, ds)
    gen = sampling.ChunkedSampler(6, cams, p3, p2, 27, shuffle=False,
                                  augment=False)
    direct = [b2.copy() for _, _, b2 in gen.next_epoch()]
    gen2 = sampling.ChunkedSampler(6, cams, p3, p2, 27, shuffle=False,
                                   augment=False)
    loader = runtime.PrefetchingLoader(gen2, depth=2)
    prefetched = [b2.copy() for _, _, b2 in loader.next_epoch()]
    assert len(direct) == len(prefetched)
    for a, b in zip(direct, prefetched):
        np.testing.assert_allclose(a, b, atol=0)
    # attribute passthrough
    assert loader.batch_num() == gen2.batch_num()


def test_prefetching_loader_propagates_errors():
    class Boom:
        def next_epoch(self):
            yield 1
            raise ValueError("boom")

    loader = runtime.PrefetchingLoader(Boom())
    it = loader.next_epoch()
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        list(it)


def test_prefetching_loader_abandoned_epoch_stops_producer():
    """Abandoning an epoch mid-way (the quick-debug pattern) must not leak
    the producer thread blocked in q.put — it should exit once the consumer
    closes the generator."""
    import threading
    import time

    class Endless:
        def next_epoch(self):
            i = 0
            while True:
                yield i
                i += 1

    before = threading.active_count()
    loader = runtime.PrefetchingLoader(Endless(), depth=2)
    it = loader.next_epoch()
    assert next(it) == 0
    it.close()  # GeneratorExit at the yield -> finally signals the producer
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before
