"""Training-step throughput benchmark (frames/sec) for the flagship model.

Not part of the driver's headline bench (which measures the BASELINE.json
inference op-point); this quantifies the training path: full part-based
model, batch = `model.batch_size` frames of 27-frame windows, AdamW update
included, data-parallel over all local devices.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(batch_frames: int = 1024, iters: int = 10, remat: int = 0,
         donate: int = 1, use_kernel: int = 0):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pafuse_tpu import train as tr
    from pafuse_tpu.diffusion import D3DP, D3DPConfig
    from pafuse_tpu.ops.block_grad import select_train_block_fn
    from pafuse_tpu.utils.backend import enable_compilation_cache, ensure_backend

    enable_compilation_cache()
    devices = ensure_backend()
    frames = 27
    seqs = max(1, batch_frames // frames)

    cfg = D3DPConfig(drop_path_rate=0.1)
    dtype = jnp.bfloat16 if devices[0].platform != "cpu" else jnp.float32
    model = D3DP(cfg, compute_dtype=dtype, remat=bool(remat),
                 train_block_fn=select_train_block_fn(bool(use_kernel)))
    state, tx = tr.create_train_state(model, seed=0)
    mesh = tr.make_mesh((-1,), ("data",))
    step = tr.build_train_step(model, tx, mesh=mesh, donate=bool(donate))

    rng = np.random.RandomState(0)
    x2d = jnp.asarray(rng.randn(seqs, frames, 134, 2), jnp.float32)
    x3d = jnp.asarray(rng.randn(seqs, frames, 134, 3) * 0.1, jnp.float32)

    t0 = time.perf_counter()
    state, loss = step(state, jnp.float32(6e-5), x2d, x3d)
    float(loss)
    # second warmup step: with donated buffers the first repeat call
    # recompiles for the aliased-input layout
    state, loss = step(state, jnp.float32(6e-5), x2d, x3d)
    float(loss)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = step(state, jnp.float32(6e-5), x2d, x3d)
        # per-step host readback, like the production loop: honest timing
        # (deep async enqueue chains behave pathologically through tunneled
        # backends) and the loss is consumed every step in training anyway
        float(loss)
    dt = time.perf_counter() - t0
    fps = iters * seqs * frames / dt
    print({"train_frames_per_sec": round(fps, 1),
           "seqs_per_batch": seqs, "remat": bool(remat),
           "train_kernel": bool(use_kernel),
           "compile_s": round(compile_s, 1),
           "steps_per_sec": round(iters / dt, 3)})


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
