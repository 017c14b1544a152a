"""Full-sampler golden parity: our DDIM (lax.scan + flip-TTA) vs the
reference torch D3DP, with identical weights and injected noise.

Together with the MixSTE parity test this closes the checkpoint-parity
chain: same weights + same noise => same multi-hypothesis predictions.
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

B, S, F = 1, 3, 9
TIMESTEPS = 40


def _reference_d3dp(H):
    """Build the reference torch D3DP (read-only import) or None."""
    if not os.path.isdir("/root/reference"):
        return None
    from torch_oracle import _install_timm_stub, patch_cuda_to_cpu
    _install_timm_stub()
    patch_cuda_to_cpu()
    sys.path.insert(0, "/root/reference")
    from common.diffusionpose import D3DP as RefD3DP

    class Cfg:
        general = types.SimpleNamespace(part_based_model=True)
        model = types.SimpleNamespace(number_of_frames=F,
                                      test_time_augmentation=True,
                                      diff_model="MixSTE2", input_size=5,
                                      dep=1, cs=64)
        data = types.SimpleNamespace(num_kps=134, merge_hands=True)
        ft2d = types.SimpleNamespace(timestep=TIMESTEPS, scale=1.0,
                                     sampling_timesteps=S, num_proposals=H)

    class Ds:
        metadata = {}
        root_indices = dict(sk.ROOT_INDICES)
        parts_joint_indices = {k: list(v)
                               for k, v in sk.PARTS_JOINT_INDICES.items()}

    model = RefD3DP(Cfg(), list(sk.JOINTS_LEFT), list(sk.JOINTS_RIGHT), Ds(),
                    is_train=False, num_proposals=H, sampling_timesteps=S)
    model.device = "cpu"
    model.eval()
    return model


# NOTE: the reference's non-flip ddim_sample is BROKEN for num_proposals>1
# with MixSTE2 (model_predictions applies a rank-4 einops rearrange to the
# already rank-5 output, diffusionpose.py:187 — it only ever runs with flip
# TTA enabled).  We therefore check the non-flip path at H=1, where the
# reference works, and the flip path at H=2.
@pytest.mark.parametrize("flip,H", [(False, 1), (True, 2)])
def test_full_sampler_parity(flip, H):
    ref = _reference_d3dp(H)
    if ref is None:
        pytest.skip("reference unavailable")
    import torch

    cfg = D3DPConfig(frames=F, num_kps=134, timesteps=TIMESTEPS,
                     sampling_timesteps=S, num_proposals=H, depth=1)
    ours = D3DP(cfg)
    params = ours.init_params(jax.random.PRNGKey(0))

    # identical weights on both sides
    sd = checkpoints.export_torch_state_dict(params)
    # strict=False: the reference module also registers schedule buffers
    # (betas, alphas_cumprod, ...) that are not parameters we export
    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=False)
    assert not unexpected, unexpected
    assert all("alphas" in k or "betas" in k or "posterior" in k
               or "log_one_minus" in k for k in missing), missing

    rng = np.random.RandomState(0)
    x2d = rng.randn(B, F, 134, 2).astype(np.float32)
    x2d_flip = x2d.copy()
    x2d_flip[..., 0] *= -1
    x2d_flip = x2d_flip[:, :, sk.FLIP_PERMUTATION]

    init_noise = rng.randn(B, H, F, 134, 3).astype(np.float32)
    step_noise = rng.randn(S, B, H, F, 134, 3).astype(np.float32)

    # inject the same noise sequence into the reference sampler
    consumed = {"i": -1}

    def fake_randn(*shape, **kwargs):
        if "device" in kwargs or isinstance(shape[0], tuple):
            pass
        if len(shape) == 1 and isinstance(shape[0], (tuple, torch.Size)):
            shape = tuple(shape[0])
        if consumed["i"] == -1:
            consumed["i"] = 0
            return torch.from_numpy(init_noise.reshape(shape))
        i = consumed["i"]
        consumed["i"] += 1
        return torch.from_numpy(step_noise[i].reshape(shape))

    import common.diffusionpose as ref_mod
    orig_randn, orig_like = torch.randn, torch.randn_like
    torch.randn = fake_randn
    torch.randn_like = lambda t: fake_randn(tuple(t.shape))
    try:
        with torch.no_grad():
            if flip:
                ref_out = ref(torch.from_numpy(x2d), None,
                              input_2d_flip=torch.from_numpy(x2d_flip))
            else:
                ref.flip = False
                ref_out = ref(torch.from_numpy(x2d), None)
        ref_out = ref_out.numpy()
    finally:
        torch.randn, torch.randn_like = orig_randn, orig_like

    out = np.asarray(ours.ddim_sample(
        params, jax.random.PRNGKey(1), jnp.asarray(x2d),
        jnp.asarray(x2d_flip) if flip else None,
        init_noise=init_noise, step_noise=step_noise))

    assert out.shape == ref_out.shape == (B, S, H, F, 134, 3)
    np.testing.assert_allclose(out, ref_out, atol=5e-4, rtol=1e-3)
