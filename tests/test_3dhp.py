"""MPI-INF-3DHP 17-joint variant: data, mm scaling, masked eval, CLI."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pafuse_tpu import skeleton as sk
from pafuse_tpu.data import dhp3


def test_synthetic_structure():
    train, test = dhp3.make_synthetic(frames=30)
    assert len(train) == 3 and len(test) == 2
    for v in train.values():
        assert v["data_2d"].shape == (30, 17, 2)
        assert v["data_3d"].shape == (30, 17, 3)
    for v in test.values():
        assert v["valid"].shape == (30,)
        assert v["valid"].dtype == bool
    # root-relative mm data
    v = next(iter(train.values()))
    np.testing.assert_allclose(v["data_3d"][:, 0], 0.0, atol=1e-5)


def test_flip_permutation_3dhp():
    perm = sk.FLIP_PERMUTATION_3DHP
    assert np.array_equal(perm[perm], np.arange(17))


def test_mm_scale_model():
    from pafuse_tpu.diffusion import D3DP, D3DPConfig
    cfg = D3DPConfig(frames=9, num_kps=17, timesteps=20, sampling_timesteps=2,
                     num_proposals=2, depth=1, part_based=False, cs=32,
                     mm_scale=True)
    model = D3DP(cfg, flip_permutation=sk.FLIP_PERMUTATION_3DHP)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    x2d = jnp.asarray(rng.randn(2, 9, 17, 2), jnp.float32)
    x3d_mm = jnp.asarray(rng.randn(2, 9, 17, 3) * 100, jnp.float32)
    pred = model.train_forward(params, jax.random.PRNGKey(1), x2d, x3d_mm)
    # model clamps its (meter-scale) output to +-1.1*scale; mm output is that
    # scaled by 1000
    assert np.abs(np.asarray(pred)).max() <= 1100 * cfg.scale + 1e-3
    out = model.ddim_sample(params, jax.random.PRNGKey(2), x2d)
    assert out.shape == (2, 2, 2, 9, 17, 3)
    assert np.abs(np.asarray(out)).max() <= 1100 * cfg.scale + 1e-3


def test_3dhp_cli_debug(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from pafuse_tpu.cli import main_3dhp
    main_3dhp.main([
        "data.synthetic=true", "model.epochs=1", "model.number_of_frames=9",
        "model.batch_size=18", "model.dep=1", "model.cs=32",
        "ft2d.timestep=20", "ft2d.sampling_timesteps=1",
        "ft2d.num_proposals=1", "ft2d.debug=true", "general.nolog=true",
        f"general.checkpoint={tmp_path}/ckpt3dhp",
    ])
    # eval txt report mirroring the H3WB regression record
    import os
    log = os.path.join(tmp_path, "ckpt3dhp", "3dhp_test_log_H1_K1.txt")
    assert os.path.exists(log)
    text = open(log).read()
    assert "3DHP MPJPE P_Best" in text and "3DHP MPJPE P_Agg" in text
