"""Native host runtime: C++ batch assembly + prefetching input pipeline.

The reference's input pipeline is a per-row python loop with ``np.pad``
(generators.py:103-155).  Here the hot loop (frame gather + flip
augmentation) is a multithreaded C++ kernel (``batcher.cpp``) bound via
ctypes, and :class:`PrefetchingLoader` runs any sampler on a background
thread so host batch assembly overlaps with device compute.

The C++ library compiles on first use (g++, cached under the package dir);
when no compiler is available everything falls back to the NumPy
vectorized path in :mod:`pafuse_tpu.data.sampling`.
"""

from __future__ import annotations

import ctypes
import os
import queue
import subprocess
import threading
from typing import Iterator, Optional

import numpy as np

_LIB = None
_LIB_TRIED = False


def _build_library() -> Optional[str]:
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "batcher.cpp")
    out = os.path.join(here, "_batcher.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", src, "-o", out]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return out
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        import warnings
        warnings.warn(f"native batcher unavailable ({e}); using NumPy path")
        return None


def get_library():
    """Load (building if needed) the native batcher; None when unavailable."""
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = _build_library()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.assemble_batch.argtypes = [
        ctypes.POINTER(ctypes.c_float),   # src
        ctypes.POINTER(ctypes.c_int64),   # frame_idx
        ctypes.POINTER(ctypes.c_uint8),   # flip_mask
        ctypes.POINTER(ctypes.c_int32),   # perm
        ctypes.POINTER(ctypes.c_float),   # out
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64,
    ]
    lib.assemble_batch.restype = None
    _LIB = lib
    return _LIB


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def assemble_batch(src: np.ndarray, frame_idx: np.ndarray,
                   flip_mask: Optional[np.ndarray],
                   perm: Optional[np.ndarray],
                   out: Optional[np.ndarray] = None,
                   n_threads: int = 0) -> np.ndarray:
    """Gather (batch, chunk) windows from ``src`` with optional flip.

    src: (total_frames, J, C) float32; frame_idx: (batch, chunk) int64;
    flip_mask: (batch,) bool/uint8 or None; perm: (J,) int32 or None.
    """
    lib = get_library()
    src = np.ascontiguousarray(src, dtype=np.float32)
    frame_idx = np.ascontiguousarray(frame_idx, dtype=np.int64)
    batch, chunk = frame_idx.shape
    _, joints, chans = src.shape
    if out is None:
        out = np.empty((batch, chunk, joints, chans), dtype=np.float32)

    if lib is None:
        # NumPy fallback (same semantics)
        out[:] = src[frame_idx]
        if flip_mask is not None and np.any(flip_mask):
            fl = out[flip_mask.astype(bool)]
            fl[..., 0] *= -1
            out[flip_mask.astype(bool)] = fl[:, :, perm]
        return out

    fm = (np.ascontiguousarray(flip_mask, dtype=np.uint8)
          if flip_mask is not None else np.zeros(batch, dtype=np.uint8))
    pm = (np.ascontiguousarray(perm, dtype=np.int32) if perm is not None
          else np.arange(joints, dtype=np.int32))
    lib.assemble_batch(
        _ptr(src, ctypes.c_float), _ptr(frame_idx, ctypes.c_int64),
        _ptr(fm, ctypes.c_uint8), _ptr(pm, ctypes.c_int32),
        _ptr(out, ctypes.c_float), batch, chunk, joints, chans, n_threads)
    return out


class PrefetchingLoader:
    """Runs a sampler's ``next_epoch`` on a background thread.

    Keeps up to ``depth`` assembled batches queued so host-side assembly and
    host->device transfer overlap with the device step (the TPU-native
    replacement for a DataLoader worker pool).
    """

    _SENTINEL = object()

    def __init__(self, sampler, depth: int = 2):
        self.sampler = sampler
        self.depth = depth

    def next_epoch(self) -> Iterator:
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        stop = threading.Event()
        error = []

        def put(item) -> bool:
            # bounded put that gives up when the consumer abandons the epoch
            # (e.g. quick-debug breaks after one batch) — an unconditional
            # q.put would leave this thread blocked forever on a full queue
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for item in self.sampler.next_epoch():
                    if not put(item):
                        return
            except BaseException as e:  # surface in consumer
                error.append(e)
            finally:
                put(self._SENTINEL)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is self._SENTINEL:
                    break
                yield item
        finally:
            stop.set()
            t.join()
        if error:
            raise error[0]

    def __getattr__(self, name):
        return getattr(self.sampler, name)
