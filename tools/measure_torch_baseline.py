"""Measure the PyTorch-CPU reference's inference throughput.

Runs the *reference implementation in place* (/root/reference, read-only) on
CPU — this creates the missing baseline denominator (BASELINE.md: "First
build milestone therefore includes producing these numbers ourselves by
running the PyTorch reference on CPU").  We stub its unavailable imports
(timm) and no-op its bare .cuda() calls; no reference code is copied.
"""

from __future__ import annotations

import sys
import time
import types

sys.path.insert(0, "/root/reference")


class _Cfg:
    """Duck-typed stand-in for the hydra config object D3DP reads."""

    def __init__(self, num_proposals, sampling_timesteps):
        g = types.SimpleNamespace(part_based_model=True)
        m = types.SimpleNamespace(number_of_frames=27,
                                  test_time_augmentation=True,
                                  diff_model="MixSTE2", input_size=5,
                                  dep=8, cs=288)
        d = types.SimpleNamespace(num_kps=134, merge_hands=True)
        f = types.SimpleNamespace(timestep=1000, scale=1.0,
                                  sampling_timesteps=sampling_timesteps,
                                  num_proposals=num_proposals)
        self.general, self.model, self.data, self.ft2d = g, m, d, f


class _DatasetStub:
    """Part metadata only (mirrors pafuse_tpu.skeleton constants)."""

    def __init__(self):
        from pafuse_tpu import skeleton as sk
        self.metadata = {}
        self.root_indices = dict(sk.ROOT_INDICES)
        self.parts_joint_indices = {k: list(v)
                                    for k, v in sk.PARTS_JOINT_INDICES.items()}


def measure(num_proposals=20, sampling_timesteps=10, windows=2, iters=1,
            frames=27, warmup=True) -> float:
    from torch_oracle import _install_timm_stub, patch_cuda_to_cpu
    _install_timm_stub()
    patch_cuda_to_cpu()
    import numpy as np
    import torch
    torch.set_num_threads(max(1, torch.get_num_threads()))

    from common.diffusionpose import D3DP  # reference, in place
    from pafuse_tpu import skeleton as sk

    args = _Cfg(num_proposals, sampling_timesteps)
    model = D3DP(args, list(sk.JOINTS_LEFT), list(sk.JOINTS_RIGHT),
                 _DatasetStub(), is_train=False,
                 num_proposals=num_proposals,
                 sampling_timesteps=sampling_timesteps)
    model.device = "cpu"
    model.eval()

    rng = np.random.RandomState(0)
    x2d = torch.from_numpy(rng.randn(windows, frames, 134, 2).astype("float32"))
    x2d_flip = torch.from_numpy(
        rng.randn(windows, frames, 134, 2).astype("float32"))

    with torch.no_grad():
        if warmup:
            model(x2d, None, input_2d_flip=x2d_flip)
        t0 = time.perf_counter()
        for _ in range(iters):
            model(x2d, None, input_2d_flip=x2d_flip)
        dt = time.perf_counter() - t0
    return windows * frames * iters / dt


if __name__ == "__main__":
    import json
    # Direct (not extrapolated) measurement at the headline op-point.
    # One P=20,T=10 flip-TTA call is minutes on CPU; we still warm up with a
    # full-op-point call so allocator/threadpool effects favor the reference
    # (a faster denominator is the conservative direction for our speedup).
    fps = measure(windows=1, iters=1, warmup=True)
    print(json.dumps({"torch_cpu_fps": fps,
                      "op_point": "P=20,T=10, flip-TTA, 1 window of 27 frames",
                      "method": "direct"}))
