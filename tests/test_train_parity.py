"""Golden training-path parity: our vectorized ``prepare_targets`` +
``train_forward`` vs the reference torch D3DP's per-sample host loop
(``prepare_diffusion_concat`` + train forward, diffusionpose.py:346-388),
with identical weights and injected per-sample (t, noise).

Closes VERDICT round-2 weak #3: the eval sampler was golden-tested end to
end but the training noising path was only self-tested.
"""

import os
import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pafuse_tpu import checkpoints, skeleton as sk
from pafuse_tpu.diffusion import D3DP, D3DPConfig

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def _reference_train_d3dp(frames, depth, timesteps):
    """Reference torch D3DP in TRAIN routing (is_train=True) but module-eval
    mode, so DropPath/dropout are inert and the forward is deterministic."""
    if not os.path.isdir("/root/reference"):
        return None
    from torch_oracle import _install_timm_stub, patch_cuda_to_cpu
    _install_timm_stub()
    patch_cuda_to_cpu()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from common.diffusionpose import D3DP as RefD3DP

    class Cfg:
        general = types.SimpleNamespace(part_based_model=True)
        model = types.SimpleNamespace(number_of_frames=frames,
                                      test_time_augmentation=True,
                                      diff_model="MixSTE2", input_size=5,
                                      dep=depth, cs=64)
        data = types.SimpleNamespace(num_kps=134, merge_hands=True)
        ft2d = types.SimpleNamespace(timestep=timesteps, scale=1.0,
                                     sampling_timesteps=2, num_proposals=1)

    class Ds:
        metadata = {}
        root_indices = dict(sk.ROOT_INDICES)
        parts_joint_indices = {k: list(v)
                               for k, v in sk.PARTS_JOINT_INDICES.items()}

    model = RefD3DP(Cfg(), list(sk.JOINTS_LEFT), list(sk.JOINTS_RIGHT), Ds(),
                    is_train=True, num_proposals=1, sampling_timesteps=2)
    model.device = "cpu"
    model.eval()   # is_train routing is a flag, not the nn.Module mode
    return model


def _run_parity(frames, depth, timesteps, batch, atol_mm):
    ref = _reference_train_d3dp(frames, depth, timesteps)
    if ref is None:
        pytest.skip("reference unavailable")
    import torch

    cfg = D3DPConfig(frames=frames, num_kps=134, timesteps=timesteps,
                     depth=depth, drop_path_rate=0.0)
    ours = D3DP(cfg)
    params = ours.init_params(jax.random.PRNGKey(0))
    # STRICT load: with schedule_timesteps the export carries the reference's
    # registered schedule buffers too, i.e. a complete reference checkpoint
    sd = checkpoints.export_torch_state_dict(
        params, schedule_timesteps=timesteps)
    ref.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=True)

    rng = np.random.RandomState(1)
    x2d = rng.randn(batch, frames, 134, 2).astype(np.float32)
    x3d = (0.1 * rng.randn(batch, frames, 134, 3)).astype(np.float32)
    t_inj = rng.randint(0, timesteps, size=batch).astype(np.int64)
    noise_inj = rng.randn(batch, frames, 134, 3).astype(np.float32)

    # inject the same per-sample draws into the reference's host loop
    # (prepare_diffusion_concat draws t=randint(...,(1,)) then
    # noise=randn(F,N,3) once per sample, diffusionpose.py:358-361)
    consumed = {"t": 0, "n": 0}

    def fake_randint(low, high, size, **kw):
        i = consumed["t"]
        consumed["t"] += 1
        return torch.from_numpy(t_inj[i:i + 1])

    def fake_randn(*shape, **kw):
        if len(shape) == 1 and isinstance(shape[0], (tuple, torch.Size)):
            shape = tuple(shape[0])
        i = consumed["n"]
        consumed["n"] += 1
        return torch.from_numpy(noise_inj[i].reshape(shape))

    orig_randint, orig_randn = torch.randint, torch.randn
    torch.randint = fake_randint
    torch.randn = fake_randn
    try:
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x2d),
                          torch.from_numpy(x3d)).numpy()
    finally:
        torch.randint, torch.randn = orig_randint, orig_randn
    assert consumed["t"] == consumed["n"] == batch

    out = np.asarray(ours.train_forward(
        params, jax.random.PRNGKey(3), jnp.asarray(x2d), jnp.asarray(x3d),
        t=jnp.asarray(t_inj, jnp.int32), noise=jnp.asarray(noise_inj)))

    assert out.shape == ref_out.shape == (batch, frames, 134, 3)
    max_mm = float(np.abs(out - ref_out).max()) * 1000.0
    print(f"train-path parity max |delta| = {max_mm:.5f} mm")
    assert max_mm < atol_mm


def test_train_path_parity_tiny():
    _run_parity(frames=9, depth=1, timesteps=40, batch=4, atol_mm=0.05)


@pytest.mark.slow
def test_train_path_parity_flagship():
    """One full-scale shot: depth 8, flagship part widths, T=1000."""
    _run_parity(frames=27, depth=8, timesteps=1000, batch=1, atol_mm=0.5)
