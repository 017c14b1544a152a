"""Observability utilities: throughput harness, MLflow guards, writers."""

import os

import numpy as np
import jax.numpy as jnp

from pafuse_tpu import config as cfg_mod
from pafuse_tpu.utils import observability as obs
from pafuse_tpu.utils.misc import Logger, Timer, deterministic_random


def test_measure_throughput():
    import jax

    @jax.jit
    def f(x):
        return x * 2.0

    stats = obs.measure_throughput(f, jnp.ones((8, 8)), iters=3,
                                   items_per_call=8)
    assert stats["seconds_per_call"] > 0
    assert stats["items_per_second"] > 0


def test_mlflow_helpers_noop_when_off():
    cfg = cfg_mod.load_config()
    # must not raise with mlflow off/unavailable
    obs.log_params_from_config(cfg, mlflow_on=False)
    obs.log_metrics_to_mlflow({"x": 1.0}, step=0, mlflow_on=False)
    with obs.mlflow_run(cfg) as on:
        assert on is False


def test_summary_writer(tmp_path):
    w = obs.make_summary_writer(str(tmp_path))
    if w is None:  # tensorboardX unavailable
        return
    w.add_scalar("loss", 1.0, 1)
    w.add_text("note", "hello")
    w.close()
    assert any(tmp_path.iterdir())


def test_logger_tee(tmp_path, capsys):
    log = tmp_path / "log.txt"
    lg = Logger(str(log))
    lg.write("hello\n")
    lg.flush()
    assert "hello" in log.read_text()


def test_timer():
    with Timer("op", show=False) as t:
        sum(range(1000))
    assert t.elapsed > 0


def test_deterministic_random():
    a = deterministic_random(0, 100, "seq_1")
    b = deterministic_random(0, 100, "seq_1")
    c = deterministic_random(0, 100, "seq_2")
    assert a == b
    assert 0 <= a < 100
    assert isinstance(c, int)


def test_backend_ensure(tmp_path, monkeypatch):
    from pafuse_tpu.utils import backend
    devs = backend.ensure_backend()
    assert len(devs) >= 1


class _FakeMlflow:
    """In-memory stand-in for the mlflow module (not installed here)."""

    def __init__(self):
        self.params, self.metrics, self.artifacts = {}, [], []
        self.tracking_uri = self.experiment = None
        self.run_active = False

    def set_tracking_uri(self, uri):
        self.tracking_uri = uri

    def set_experiment(self, name):
        self.experiment = name

    def log_param(self, k, v):
        self.params[k] = v

    def log_metric(self, k, v, step=None):
        self.metrics.append((k, v, step))

    def log_artifact(self, path):
        self.artifacts.append(path)

    def start_run(self):
        import contextlib

        @contextlib.contextmanager
        def cm():
            self.run_active = True
            yield self
            self.run_active = False
        return cm()


def test_mlflow_wired_through_training_cli(tmp_path, monkeypatch):
    """The training driver logs params, per-epoch metrics and checkpoint
    artifacts to MLflow when mlflow.mlflow_on=true (reference:
    main_h3wb.py:732-744, 1060-1071; logging.py:101-115)."""
    import sys
    fake = _FakeMlflow()
    monkeypatch.setitem(sys.modules, "mlflow", fake)
    monkeypatch.chdir(tmp_path)
    from pafuse_tpu.cli import main_h3wb
    main_h3wb.main([
        "data.synthetic=true", "model.epochs=1", "model.number_of_frames=9",
        "model.batch_size=18", "model.dep=1", "model.cs=32",
        "ft2d.timestep=20", "ft2d.sampling_timesteps=1",
        "ft2d.num_proposals=1", "ft2d.debug=true", "general.nolog=true",
        "general.checkpoint_frequency=1",
        "mlflow.mlflow_on=true", "mlflow.experiment=smoke",
        f"mlflow.mlflow_uri=file://{tmp_path}/mlruns",
        f"general.checkpoint={tmp_path}/ckpt",
    ])
    assert fake.experiment == "smoke"
    assert fake.params.get("model.dep") == 1          # config flattened
    keys = {k for k, _, _ in fake.metrics}
    assert {"tr_loss", "val_mpjpe", "val_pb_mpjpe"} <= keys
    assert any(p.endswith("epoch_1.npz") for p in fake.artifacts)


def test_profile_flag_writes_trace(tmp_path, monkeypatch):
    """tpu.profile=true captures a jax.profiler trace of the first epoch."""
    monkeypatch.chdir(tmp_path)
    from pafuse_tpu.cli import main_h3wb
    main_h3wb.main([
        "data.synthetic=true", "model.epochs=1", "model.number_of_frames=9",
        "model.batch_size=18", "model.dep=1", "model.cs=32",
        "ft2d.timestep=20", "ft2d.sampling_timesteps=1",
        "ft2d.num_proposals=1", "ft2d.debug=true", "general.nolog=true",
        "experiment.no_eval=true", "tpu.profile=true",
        f"general.checkpoint={tmp_path}/ckpt",
    ])
    prof_dir = tmp_path / "ckpt" / "profile"
    assert prof_dir.exists() and any(prof_dir.rglob("*"))
