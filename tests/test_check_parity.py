"""End-to-end test of the real-checkpoint parity harness
(tools/check_parity.py) with a tiny fabricated dataset + .bin checkpoint."""

import os
import sys

import numpy as np
import pytest
import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from pafuse_tpu import checkpoints
from pafuse_tpu.diffusion import D3DP, D3DPConfig
from test_real_format import _make_reference_npz


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("parity")
    data_dir = tmp / "data"
    data_dir.mkdir()
    _make_reference_npz(data_dir, frames=20)

    import torch
    cfg = D3DPConfig(frames=9, timesteps=20, depth=1)
    model = D3DP(cfg)
    params = model.init_params(jax.random.PRNGKey(7))
    sd = checkpoints.export_torch_state_dict(params)
    bin_path = tmp / "pafuse_model.bin"
    torch.save({"model_pos": {k: torch.from_numpy(v) for k, v in sd.items()},
                "epoch": 1, "lr": 1e-5}, str(bin_path))
    return tmp, data_dir, bin_path


def test_missing_artifacts_exit_code(tmp_path):
    import check_parity
    rc = check_parity.main(["--data-dir", str(tmp_path / "nope"),
                            "--checkpoint", str(tmp_path / "nope.bin")])
    assert rc == 2


def test_harness_end_to_end(artifacts):
    import check_parity
    tmp, data_dir, bin_path = artifacts
    out = tmp / "PARITY_REAL.md"
    rc = check_parity.main([
        "--data-dir", str(data_dir), "--checkpoint", str(bin_path),
        "--frames", "9", "--dep", "1", "--timestep", "20",
        "--op-points", "2x1", "--impl-windows", "2",
        "--out", str(out)])
    assert rc == 0
    text = out.read_text()
    assert "Implementation parity" in text
    assert "Op-point P=2, T=1" in text
    assert "PASS" in text
    # implementation check: same weights + same noise -> sub-budget delta
    import re
    m = re.search(r"max \|ours - reference\| = \*\*([0-9.]+) mm", text)
    assert m and float(m.group(1)) < 0.5


def test_harness_reference_log_diff(artifacts):
    """Feeding our own numbers back as the 'reference log' must give zero
    deltas and a PASS; corrupting one metric must FAIL with exit 3."""
    import check_parity
    tmp, data_dir, bin_path = artifacts
    out1 = tmp / "first.md"
    rc = check_parity.main([
        "--data-dir", str(data_dir), "--checkpoint", str(bin_path),
        "--frames", "9", "--dep", "1", "--timestep", "20",
        "--op-points", "2x1", "--impl-windows", "0", "--out", str(out1)])
    assert rc == 0
    import re
    vals = dict(re.findall(r"\| (\w+) \| ([0-9.]+) \|", out1.read_text()))

    ref_log = tmp / "h36m_test_log_H2_K1.txt"
    ref_log.write_text("\n".join(
        f"step 0 Protocol #1   (MPJPE) action-wise average {k}: {v} mm"
        for k, v in vals.items()) + "\n")
    out2 = tmp / "second.md"
    rc = check_parity.main([
        "--data-dir", str(data_dir), "--checkpoint", str(bin_path),
        "--frames", "9", "--dep", "1", "--timestep", "20",
        "--op-points", "2x1", "--impl-windows", "0",
        "--reference-log", str(ref_log), "--out", str(out2)])
    assert rc == 0
    assert "PASS" in out2.read_text()

    bad_log = tmp / "h36m_test_log_H2_K1_bad.txt"
    bad_vals = dict(vals)
    bad_vals["J_Best"] = str(float(vals["J_Best"]) + 5.0)
    bad_log.write_text("\n".join(
        f"step 0 Protocol #1   (MPJPE) action-wise average {k}: {v} mm"
        for k, v in bad_vals.items()) + "\n")
    out3 = tmp / "third.md"
    rc = check_parity.main([
        "--data-dir", str(data_dir), "--checkpoint", str(bin_path),
        "--frames", "9", "--dep", "1", "--timestep", "20",
        "--op-points", "2x1", "--impl-windows", "0",
        "--reference-log", str(bad_log), "--out", str(out3)])
    assert rc == 3
    assert "**NO**" in out3.read_text()


def test_trials_envelope_and_widened_budget(artifacts):
    """--trials N writes a per-metric sampling-variance envelope and the
    verdict widens each budget by 2*sqrt(2)*sigma (round-4 pre-registered
    decision rule for real-data runs whose torch init noise can't be
    matched)."""
    import json
    import check_parity
    tmp, data_dir, bin_path = artifacts
    env_path = tmp / "envelope.json"
    out1 = tmp / "env_run.md"
    rc = check_parity.main([
        "--data-dir", str(data_dir), "--checkpoint", str(bin_path),
        "--frames", "9", "--dep", "1", "--timestep", "20",
        "--op-points", "2x1", "--impl-windows", "0",
        "--trials", "3", "--envelope-out", str(env_path),
        "--out", str(out1)])
    assert rc == 0
    env = json.loads(env_path.read_text())
    assert "P2T1" in env
    ent = env["P2T1"]["J_Best"]
    assert ent["n"] == 3 and ent["std"] >= 0.0
    assert "Sampling-variance envelope" in out1.read_text()

    # a reference log offset by (0.5 + sqrt(2)*sigma) per metric: outside
    # the bare budget but inside the widened one -> must PASS with envelope
    import re
    vals = dict(re.findall(r"\| (\w+) \| ([0-9.]+) \|", out1.read_text()))
    sig = {k: env["P2T1"][k]["std"] for k in env["P2T1"]}
    ref_log = tmp / "h36m_test_log_H2_K1.txt"
    ref_log.write_text("\n".join(
        "step 0 Protocol #1   (MPJPE) action-wise average "
        f"{k}: {float(v) + 0.5 + 2 ** 0.5 * sig.get(k, 0.0):.6f} mm"
        for k, v in vals.items() if k in sig) + "\n")
    out2 = tmp / "env_diff.md"
    rc = check_parity.main([
        "--data-dir", str(data_dir), "--checkpoint", str(bin_path),
        "--frames", "9", "--dep", "1", "--timestep", "20",
        "--op-points", "2x1", "--impl-windows", "0",
        "--envelope-out", str(env_path),
        "--reference-log", str(ref_log), "--out", str(out2)])
    text = out2.read_text()
    # metrics with nonzero sigma sit inside the widened budget; with the
    # bare rule the +0.5+eps offsets would all FAIL
    if all(s > 1e-6 for s in sig.values()):
        assert rc == 0 and "PASS" in text
    assert "budget (mm)" in text
