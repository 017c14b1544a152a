"""End-to-end: synthetic-data smoke of the full train + eval pipeline, the
CLI driver in debug mode, and the in-the-wild path."""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pafuse_tpu import evaluate as ev, train as tr
from pafuse_tpu.data import h3wb
from pafuse_tpu.diffusion import D3DP, D3DPConfig

TINY = D3DPConfig(frames=9, num_kps=134, timesteps=20, sampling_timesteps=2,
                  num_proposals=2, depth=1)


@pytest.fixture(scope="module")
def tiny_setup():
    model = D3DP(TINY)
    state, tx = tr.create_train_state(model, seed=0)
    ds = h3wb.make_synthetic(subjects=("S1", "S8"), actions_per_subject=1,
                             frames_per_action=40, seed=1)
    kps = h3wb.prepare_data(ds)
    return model, state, tx, ds, kps


def test_eval_pipeline_metrics_finite(tiny_setup):
    model, state, tx, ds, kps = tiny_setup
    cams, p3, p2 = h3wb.fetch(["S8"], kps, ds)
    seqs = list(zip(cams, p3, p2))[:2]
    acc, _ = ev.evaluate_sequences(
        model, state.params, seqs, None, receptive_field=9,
        num_proposals=2, sampling_timesteps=2, sub_batch=4)
    means = acc.means_mm()
    for k in ("J_Best", "P_Best", "P_Agg", "J_Agg", "P_Best_PB", "P_Agg_PB"):
        v = np.atleast_1d(means[k])
        assert v.shape == (2,), k
        assert np.all(np.isfinite(v)), (k, v)
        assert np.all(v > 0), (k, v)
    # J_Best <= P_Best (per-joint min is at most the per-pose-min error)
    assert np.all(np.atleast_1d(means["J_Best"])
                  <= np.atleast_1d(means["P_Best"]) + 1e-6)


def test_eval_padding_invariance(tiny_setup):
    """Metrics must not depend on the sub-batch size (padding correctness)."""
    model, state, tx, ds, kps = tiny_setup
    cams, p3, p2 = h3wb.fetch(["S8"], kps, ds)
    seqs = list(zip(cams, p3, p2))[:1]
    acc_a, _ = ev.evaluate_sequences(
        model, state.params, list(seqs), None, receptive_field=9,
        num_proposals=2, sampling_timesteps=2, sub_batch=3,
        rng=jax.random.PRNGKey(42))
    acc_b, _ = ev.evaluate_sequences(
        model, state.params, list(seqs), None, receptive_field=9,
        num_proposals=2, sampling_timesteps=2, sub_batch=5,
        rng=jax.random.PRNGKey(42))
    # same total weight
    assert acc_a.n == acc_b.n
    # note: RNG folding differs per sub-batch split, so metric values differ
    # slightly; with identical splits they must match exactly:
    acc_c, _ = ev.evaluate_sequences(
        model, state.params, list(seqs), None, receptive_field=9,
        num_proposals=2, sampling_timesteps=2, sub_batch=3,
        rng=jax.random.PRNGKey(42))
    for k in acc_a.means_mm():
        np.testing.assert_allclose(acc_a.means_mm()[k], acc_c.means_mm()[k],
                                   rtol=1e-6)


def test_eval_tail_bucket_invariance(tiny_setup):
    """The power-of-two tail bucket (final partial batch dispatched at a
    smaller shape) must leave every metric mask-invariant UP TO FLOAT
    ROUNDING: padded rows are masked to zero and the mean is rescaled by
    the real-row count, so batch COMPOSITION cannot leak into the numbers —
    but the smaller XLA batch shape may legitimately reassociate
    reductions, hence rtol=1e-5 rather than exact equality."""
    model, state, tx, ds, kps = tiny_setup
    cams, p3, p2 = h3wb.fetch(["S8"], kps, ds)
    seqs = list(zip(cams, p3, p2))[:2]  # 10 windows -> batches [8, 2] at bs=8
    kw = dict(receptive_field=9, num_proposals=2, sampling_timesteps=2,
              window_batch=8, rng=jax.random.PRNGKey(7))
    t_on, t_off = {}, {}
    acc_on, _ = ev.evaluate_sequences(model, state.params, list(seqs), None,
                                      tail_bucket=True, timings=t_on, **kw)
    acc_off, _ = ev.evaluate_sequences(model, state.params, list(seqs), None,
                                       tail_bucket=False, timings=t_off, **kw)
    assert t_on.get("tail_rows_saved", 0) > 0
    assert "tail_rows_saved" not in t_off
    assert acc_on.n == acc_off.n
    for k in acc_on.means_mm():
        np.testing.assert_allclose(acc_on.means_mm()[k],
                                   acc_off.means_mm()[k], rtol=1e-5,
                                   err_msg=k)


def test_p2_metrics(tiny_setup):
    model, state, tx, ds, kps = tiny_setup
    cams, p3, p2 = h3wb.fetch(["S8"], kps, ds)
    seqs = list(zip(cams, p3, p2))[:1]
    acc, p2acc = ev.evaluate_sequences(
        model, state.params, seqs, None, receptive_field=9,
        num_proposals=2, sampling_timesteps=2, sub_batch=4, collect_p2=True)
    means = p2acc.means_mm()
    for k in ("P2_J_Best", "P2_P_Best", "P2_P_Agg", "P2_J_Agg"):
        assert np.all(np.isfinite(np.atleast_1d(means[k]))), k


def test_report_format(tiny_setup, tmp_path):
    model, state, tx, ds, kps = tiny_setup
    cams, p3, p2 = h3wb.fetch(["S8"], kps, ds)
    seqs = list(zip(cams, p3, p2))[:1]
    acc, _ = ev.evaluate_sequences(
        model, state.params, seqs, None, receptive_field=9,
        num_proposals=2, sampling_timesteps=2, sub_batch=4)
    text = ev.format_report(acc.means_mm(), "Walking")
    assert "----Walking----" in text
    assert "Protocol #1 Error (MPJPE) J_Best:" in text
    assert "P_Best Part-Based HANDS:" in text
    assert "P_Agg Part-Based RIGHT HAND:" in text
    path = ev.write_report(str(tmp_path), 2, 2, text)
    assert os.path.basename(path) == "h36m_test_log_H2_K2.txt"
    assert os.path.exists(path)


def test_training_then_eval_improves(tiny_setup):
    """A few steps of training on synthetic data must reduce eval MPJPE
    relative to the untrained model (coarse sanity, not convergence)."""
    model, state, tx, ds, kps = tiny_setup
    cams, p3, p2 = h3wb.fetch(["S1"], kps, ds)
    from pafuse_tpu.data import sampling
    gen = sampling.ChunkedSampler(8, cams, p3, p2, 9, augment=True,
                                  random_seed=0)
    step = tr.build_train_step(model, tx, donate=False)
    seqs = list(zip(*h3wb.fetch(["S8"], kps, ds)))[:1]

    acc0, _ = ev.evaluate_sequences(
        model, state.params, list(seqs), None, receptive_field=9,
        num_proposals=1, sampling_timesteps=1, rng=jax.random.PRNGKey(3))
    before = float(np.atleast_1d(acc0.means_mm()["P_Best"])[0])

    for epoch in range(10):
        for camb, b3d, b2d in gen.next_epoch():
            b2d, _ = tr.pad_batch(b2d, 8)
            b3d, _ = tr.pad_batch(b3d, 8)
            state, loss = step(state, jnp.float32(1e-3),
                               jnp.asarray(b2d), jnp.asarray(b3d))
    acc1, _ = ev.evaluate_sequences(
        model, state.params, list(seqs), None, receptive_field=9,
        num_proposals=1, sampling_timesteps=1, rng=jax.random.PRNGKey(3))
    after = float(np.atleast_1d(acc1.means_mm()["P_Best"])[0])
    assert np.isfinite(before) and np.isfinite(after)
    assert after < before, (before, after)


def test_cli_debug_mode(tmp_path, monkeypatch):
    """Full CLI driver in quick-debug mode on synthetic data."""
    monkeypatch.chdir(tmp_path)
    from pafuse_tpu.cli import main_h3wb
    main_h3wb.main([
        "data.synthetic=true", "model.epochs=1", "model.number_of_frames=9",
        "model.batch_size=36", "model.dep=1", "ft2d.timestep=20",
        "ft2d.sampling_timesteps=1", "ft2d.num_proposals=1",
        "ft2d.debug=true", "general.nolog=true",
        f"general.checkpoint={tmp_path}/ckpt", "general.log={0}/log".format(tmp_path),
    ])
    # eval report written
    assert os.path.exists(os.path.join(tmp_path, "ckpt",
                                       "h36m_test_log_H1_K1.txt"))


def test_in_the_wild_keypoint_loading(tmp_path):
    from pafuse_tpu.cli.in_the_wild import load_openpifpaf_keypoints
    rng = np.random.RandomState(0)
    lines = []
    for _ in range(3):
        kps = rng.rand(133 * 3).tolist()
        lines.append(json.dumps({"predictions": [{"keypoints": kps}]}))
    path = tmp_path / "vid.mp4.openpifpaf.json"
    path.write_text("\n".join(lines) + "\n")
    out = load_openpifpaf_keypoints(str(path))
    assert out.shape == (3, 134, 2)
    np.testing.assert_allclose(out[:, 0], 0.5 * (out[:, 12] + out[:, 13]),
                               atol=1e-6)


def test_in_the_wild_lift(tiny_setup, tmp_path):
    """lift_video produces a stitched (S,H,T,J,3) timeline."""
    from pafuse_tpu.cli.in_the_wild import lift_video
    from pafuse_tpu import config as cfg_mod
    model, state, tx, ds, kps = tiny_setup
    args = cfg_mod.load_config(overrides=[
        "model.number_of_frames=9", "model.batch_size=36"])
    kp = np.random.RandomState(0).randn(23, 134, 2).astype(np.float32)
    out = lift_video(args, kp, state.params, model)
    assert out.shape == (2, 2, 23, 134, 3)
    assert np.all(np.isfinite(out))


def test_in_the_wild_cli_full(tmp_path, monkeypatch):
    """Full in-the-wild CLI: OpenPifPaf JSON -> lifting -> npy outputs ->
    per-frame renders -> animated gif (no video file: keypoints-only
    backdrop branch)."""
    import json
    rng = np.random.RandomState(0)
    lines = []
    for _ in range(12):
        kp = np.column_stack([rng.uniform(100, 900, 133),
                              rng.uniform(100, 900, 133),
                              np.full(133, 0.9)]).ravel().tolist()
        lines.append(json.dumps({"predictions": [{"keypoints": kp}]}))
    (tmp_path / "vid.mp4.openpifpaf.json").write_text("\n".join(lines))

    monkeypatch.chdir(tmp_path)
    from pafuse_tpu.cli import in_the_wild
    in_the_wild.main([
        f"in_the_wild.video_path={tmp_path}/vid.mp4",
        "model.number_of_frames=9", "model.dep=1", "model.batch_size=36",
        "ft2d.timestep=20", "ft2d.sampling_timesteps=1",
        "ft2d.num_proposals=2", "viz.viz_limit=2",
        "viz.viz_output=anim.gif", "viz.viz_downsample=2",
    ])
    out = tmp_path / "outputs" / "vid"
    assert (out / "test_3d_vid_output.npy").exists()
    assert (out / "test_3d_output_vid_postprocess.npy").exists()
    assert list(out.glob("frame*_t*.png"))
    assert (out / "anim.gif").exists() and (out / "anim.gif").stat().st_size > 0


def test_warmup_override_hard_errors():
    """experiment.warmup is unimplemented in the reference's hydra path;
    non-default values must raise instead of silently no-op."""
    import pytest
    from pafuse_tpu.cli import main_h3wb
    with pytest.raises(ValueError, match="warmup"):
        main_h3wb.main(["experiment.warmup=5", "general.nolog=true"])


def test_unknown_diff_model_hard_errors():
    """The reference raises for model.diff_model != MixSTE2
    (diffusionpose.py:150-155); running MixSTE2 anyway would mask it."""
    import pytest
    from pafuse_tpu import config as cfg_mod
    from pafuse_tpu.cli.main_h3wb import build_model
    args = cfg_mod.load_config(overrides=["model.diff_model=MixSTE3"])
    with pytest.raises(ValueError, match="MixSTE3"):
        build_model(args, is_train=False)


def test_viz_compare_hard_errors():
    """viz.compare drives a broken legacy path in the reference (missing
    common/model_poseformer); must raise instead of silently ignoring."""
    import pytest
    from pafuse_tpu.cli import draw_h3wb
    with pytest.raises(ValueError, match="compare"):
        draw_h3wb.main(["viz.compare=true"])


def test_actionwise_average_format_matches_reference():
    """The averaged block must reproduce the reference's printf vocabulary
    line for line (main_h3wb.py:1253-1340), incl. part-based breakdowns and
    P2 averages; tools/check_parity.py's parser must round-trip it."""
    from pafuse_tpu import evaluate as ev
    rng = np.random.RandomState(3)
    vals = {}
    keys = ["J_Best", "P_Best", "P_Agg", "J_Agg", "P_Best_PB",
            "P_Best_PB_body", "P_Best_PB_face", "P_Best_PB_left_hand",
            "P_Best_PB_right_hand", "P_Agg_PB", "P_Agg_PB_body",
            "P_Agg_PB_face", "P_Agg_PB_left_hand", "P_Agg_PB_right_hand"]
    for k in keys:
        vals[k] = rng.rand(2) * 100          # two DDIM steps
    p2 = {k: rng.rand(2) * 100 for k in
          ("P2_J_Best", "P2_P_Best", "P2_P_Agg", "P2_J_Agg")}
    text = ev.format_actionwise_average(vals, p2)

    # expected built with the REFERENCE's exact % format strings
    expected = []
    for ii in range(2):
        expected.append('step %d Protocol #1   (MPJPE) action-wise average J_Best: %f mm' % (ii, vals["J_Best"][ii]))
        expected.append('step %d Protocol #1   (MPJPE) action-wise average P_Best: %f mm' % (ii, vals["P_Best"][ii]))
        expected.append('step %d Protocol #1   (MPJPE) action-wise average P_Agg: %f mm' % (ii, vals["P_Agg"][ii]))
        expected.append('step %d Protocol #1   (MPJPE) action-wise average J_Agg: %f mm' % (ii, vals["J_Agg"][ii]))
        expected.append('-----------------> Part-Based Evaluation <-----------------')
        expected.append('step %d Protocol #1   (MPJPE) action-wise average P_Best (Part-Based): %f mm' % (ii, vals["P_Best_PB"][ii]))
        expected.append('step %d Protocol #1   (MPJPE) action-wise average P_Best (Part-Based) BODY: %f mm' % (ii, vals["P_Best_PB_body"][ii]))
        expected.append('step %d Protocol #1   (MPJPE) action-wise average P_Best (Part-Based) FACE: %f mm' % (ii, vals["P_Best_PB_face"][ii]))
        expected.append('step %d Protocol #1   (MPJPE) action-wise average P_Best (Part-Based) HANDS: %f mm' % (ii, (vals["P_Best_PB_left_hand"][ii] + vals["P_Best_PB_right_hand"][ii]) / 2.))
        expected.append('step %d Protocol #1   (MPJPE) action-wise average P_Best (Part-Based) LEFT HAND: %f mm' % (ii, vals["P_Best_PB_left_hand"][ii]))
        expected.append('step %d Protocol #1   (MPJPE) action-wise average P_Best (Part-Based) RIGHT HAND: %f mm' % (ii, vals["P_Best_PB_right_hand"][ii]))
        expected.append('-----------------> Part-Based Agg Evaluation <-----------------')
        expected.append('step %d Protocol #1   (MPJPE) action-wise average P_Agg (Part-Based): %f mm' % (ii, vals["P_Agg_PB"][ii]))
        expected.append('step %d Protocol #1   (MPJPE) action-wise average P_Agg (Part-Based) BODY: %f mm' % (ii, vals["P_Agg_PB_body"][ii]))
        expected.append('step %d Protocol #1   (MPJPE) action-wise average P_Agg (Part-Based) FACE: %f mm' % (ii, vals["P_Agg_PB_face"][ii]))
        expected.append('step %d Protocol #1   (MPJPE) action-wise average P_Agg (Part-Based) HANDS: %f mm' % (ii, (vals["P_Agg_PB_left_hand"][ii] + vals["P_Agg_PB_right_hand"][ii]) / 2.))
        expected.append('step %d Protocol #1   (MPJPE) action-wise average P_Agg (Part-Based) LEFT HAND: %f mm' % (ii, vals["P_Agg_PB_left_hand"][ii]))
        expected.append('step %d Protocol #1   (MPJPE) action-wise average P_Agg (Part-Based) RIGHT HAND: %f mm' % (ii, vals["P_Agg_PB_right_hand"][ii]))
        expected.append(' ')
        expected.append(' ')
        expected.append('step %d Protocol #2   (MPJPE) action-wise average J_Best: %f mm' % (ii, p2["P2_J_Best"][ii]))
        expected.append('step %d Protocol #2   (MPJPE) action-wise average P_Best: %f mm' % (ii, p2["P2_P_Best"][ii]))
        expected.append('step %d Protocol #2   (MPJPE) action-wise average P_Agg: %f mm' % (ii, p2["P2_P_Agg"][ii]))
        expected.append('step %d Protocol #2   (MPJPE) action-wise average J_Agg: %f mm' % (ii, p2["P2_J_Agg"][ii]))
    assert text == "\n".join(expected) + "\n"

    # the parity harness parses every averaged metric back out (last step)
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "check_parity", os.path.join(os.path.dirname(__file__), "..",
                                     "tools", "check_parity.py"))
    cp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cp)
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write(text)
        path = f.name
    parsed = cp.parse_reference_log(path)
    os.unlink(path)
    assert abs(parsed["J_Best"] - vals["J_Best"][1]) < 5e-7 * vals["J_Best"][1] + 1e-6
    assert abs(parsed["P_Best_PB_body"] - vals["P_Best_PB_body"][1]) < 1e-4
    assert abs(parsed["P_Agg_PB_right_hand"] - vals["P_Agg_PB_right_hand"][1]) < 1e-4
    assert abs(parsed["P2_J_Agg"] - p2["P2_J_Agg"][1]) < 1e-4
    expected_hands = (vals["P_Best_PB_left_hand"][1]
                      + vals["P_Best_PB_right_hand"][1]) / 2.
    assert abs(parsed["P_Best_PB_hands"] - expected_hands) < 1e-4


def test_in_the_wild_cli_with_checkpoint(tmp_path, monkeypatch):
    """The checkpoint-loading branch must run the full pipeline from a
    saved .npz — and route the host-numpy restored params through
    commit_params (jax.Array leaves), the round-5 resident-params fix."""
    import json
    import jax
    from pafuse_tpu import checkpoints, config as cfg_mod
    from pafuse_tpu.cli.main_h3wb import build_model

    overrides = [
        "model.number_of_frames=9", "model.dep=1", "model.batch_size=36",
        "ft2d.timestep=20", "ft2d.sampling_timesteps=1",
        "ft2d.num_proposals=2", "viz.viz_limit=0",
    ]
    args = cfg_mod.parse_cli(overrides)
    model = build_model(args, is_train=False, num_proposals=2,
                        sampling_timesteps=1)
    params = model.init_params(jax.random.PRNGKey(1))
    checkpoints.save_state(str(tmp_path / "ckpt"), "tiny", params=params)

    rng = np.random.RandomState(0)
    lines = []
    for _ in range(12):
        kp = np.column_stack([rng.uniform(100, 900, 133),
                              rng.uniform(100, 900, 133),
                              np.full(133, 0.9)]).ravel().tolist()
        lines.append(json.dumps({"predictions": [{"keypoints": kp}]}))
    (tmp_path / "vid.mp4.openpifpaf.json").write_text("\n".join(lines))

    monkeypatch.chdir(tmp_path)
    from pafuse_tpu.cli import in_the_wild
    in_the_wild.main([
        f"in_the_wild.video_path={tmp_path}/vid.mp4",
        f"general.checkpoint={tmp_path}/ckpt",
        "general.evaluate=tiny.npz",
    ] + overrides)
    out = tmp_path / "outputs" / "vid"
    assert (out / "test_3d_vid_output.npy").exists()
