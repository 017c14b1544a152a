"""Training batch sampler — vectorized re-design of ChunkedGenerator_Seq.

Reference behavior: ``/root/reference/common/generators.py:12-171``.

The reference assembles every batch row-by-row in a python loop with
``np.pad`` per chunk.  Here we:

* concatenate all sequences into one contiguous buffer per modality,
* precompute, per chunk, the *global frame index matrix* (with edge-clamping
  implementing the reference's 'edge' padding) — so a batch is a single
  NumPy fancy-gather,
* apply flip augmentation vectorized over the flipped rows via the
  precomputed joint permutation (:data:`pafuse_tpu.skeleton.FLIP_PERMUTATION`).

Chunk pairing, per-epoch shuffling (``np.random.RandomState``) and
augmentation semantics match the reference exactly, including the
checkpointable RNG state (generators.py:84-88).
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Tuple

import numpy as np

from pafuse_tpu import skeleton as sk


class ChunkedSampler:
    """Yields (cameras, batch_3d, batch_2d) NumPy batches for training."""

    def __init__(self, batch_size: int, cameras, poses_3d, poses_2d,
                 chunk_length: int, shuffle: bool = True,
                 random_seed: int = 1234, augment: bool = False,
                 flip_permutation: Optional[np.ndarray] = None,
                 endless: bool = False, use_native: str | bool = "auto"):
        assert poses_3d is None or len(poses_3d) == len(poses_2d)
        assert cameras is None or len(cameras) == len(poses_2d)

        self.batch_size = batch_size
        self.chunk_length = chunk_length
        self.shuffle = shuffle
        self.augment = augment
        self.endless = endless
        self.random = np.random.RandomState(random_seed)
        self.state = None
        self.flip_perm = (flip_permutation if flip_permutation is not None
                          else sk.FLIP_PERMUTATION)

        # --- contiguous buffers + per-sequence offsets --------------------
        lengths = np.array([p.shape[0] for p in poses_2d], dtype=np.int64)
        offsets = np.concatenate([[0], np.cumsum(lengths)])
        self._offsets = offsets
        self._buf_2d = np.concatenate(poses_2d, axis=0).astype(np.float32)
        self._buf_3d = (np.concatenate(poses_3d, axis=0).astype(np.float32)
                        if poses_3d is not None else None)
        self._cams = (np.stack(cameras).astype(np.float32)
                      if cameras is not None else None)

        # --- chunk table (generators.py:40-49; same per-sequence ordering:
        # all normal chunks of sequence i, then its flipped twins) ----------
        seq_parts: List[np.ndarray] = []
        start_parts: List[np.ndarray] = []
        flip_parts: List[np.ndarray] = []
        for i, n in enumerate(lengths):
            n_chunks = (int(n) + chunk_length - 1) // chunk_length
            offset = (n_chunks * chunk_length - int(n)) // 2
            bounds = np.arange(n_chunks + 1) * chunk_length - offset
            reps = 2 if augment else 1
            seq_parts.append(np.full(n_chunks * reps, i, dtype=np.int64))
            start_parts.append(np.tile(bounds[:-1], reps))
            fl = np.zeros(n_chunks, dtype=bool)
            flip_parts.append(np.concatenate([fl, ~fl]) if augment else fl)
        seq_idx = np.concatenate(seq_parts)
        starts = np.concatenate(start_parts)
        flip = np.concatenate(flip_parts)
        # pairs[i] = (seq, start, flip)
        self.pairs = np.stack(
            [seq_idx, starts, flip.astype(np.int64)], axis=1)

        # precompute per-chunk global frame indices with edge clamping
        rel = np.arange(chunk_length)
        frame = starts[:, None] + rel[None, :]
        frame = np.clip(frame, 0, (lengths[seq_idx] - 1)[:, None])
        self._global_index = (offsets[seq_idx][:, None] + frame).astype(np.int64)
        # duplicate rows for the flip copies share the same index matrix

        self.num_batches = (len(self.pairs) + batch_size - 1) // batch_size

        # optional native (C++) assembly path — see pafuse_tpu.runtime
        self._native = None
        if use_native is True or str(use_native) == "auto":
            try:
                from pafuse_tpu import runtime
                if runtime.get_library() is not None:
                    self._native = runtime.assemble_batch
            except Exception:
                self._native = None

    # --- reference API parity (generators.py:78-101) ----------------------
    def num_frames(self) -> int:
        return self.num_batches * self.batch_size

    def batch_num(self) -> int:
        return self.num_batches

    def random_state(self):
        return self.random

    def set_random_state(self, random_state):
        self.random = random_state

    def augment_enabled(self) -> bool:
        return self.augment

    def next_pairs(self):
        if self.state is None:
            order = (self.random.permutation(len(self.pairs))
                     if self.shuffle else np.arange(len(self.pairs)))
            return 0, order
        return self.state

    # --- iteration ---------------------------------------------------------
    def next_epoch(self) -> Iterator[Tuple[Optional[np.ndarray],
                                           Optional[np.ndarray], np.ndarray]]:
        enabled = True
        while enabled:
            start_idx, order = self.next_pairs()
            for b_i in range(start_idx, self.num_batches):
                rows = order[b_i * self.batch_size:(b_i + 1) * self.batch_size]
                idx = self._global_index[rows]                    # (b, L)
                flip_mask = self.pairs[rows, 2].astype(bool)

                if self._native is not None:
                    batch_2d = self._native(self._buf_2d, idx, flip_mask,
                                            self.flip_perm)
                    batch_3d = (self._native(self._buf_3d, idx, flip_mask,
                                             self.flip_perm)
                                if self._buf_3d is not None else None)
                else:
                    batch_2d = self._buf_2d[idx]                  # (b, L, J, 2)
                    if np.any(flip_mask):
                        fl = batch_2d[flip_mask]
                        fl[..., 0] *= -1
                        batch_2d[flip_mask] = fl[:, :, self.flip_perm]

                    batch_3d = None
                    if self._buf_3d is not None:
                        batch_3d = self._buf_3d[idx]
                        if np.any(flip_mask):
                            fl = batch_3d[flip_mask]
                            fl[..., 0] *= -1
                            batch_3d[flip_mask] = fl[:, :, self.flip_perm]

                batch_cam = None
                if self._cams is not None:
                    batch_cam = self._cams[self.pairs[rows, 0]].copy()
                    if np.any(flip_mask):
                        batch_cam[flip_mask, 2] *= -1
                        batch_cam[flip_mask, 7] *= -1

                if self.endless:
                    self.state = (b_i + 1, order)
                yield batch_cam, batch_3d, batch_2d
            if self.endless:
                self.state = None
            else:
                enabled = False


# NOTE: the reference's UnchunkedGenerator_Seq (generators.py:174-249) has no
# separate class here: evaluation builds the flipped twin inline per sequence
# (evaluate.evaluate_sequences, cli/in_the_wild.py) — the one-sequence-at-a-
# time generator shim added nothing on top of that.
