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
