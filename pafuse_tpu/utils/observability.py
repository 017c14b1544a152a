"""Observability: metric sinks (TensorBoard / MLflow / txt) and profiling.

Reference behavior: ``/root/reference/common/logging.py:24-80`` (MLflow
helpers, flag-guarded) and the TensorBoard usage in main_h3wb.py:579-581,
1002-1016.  Profiling is new capability (SURVEY §5 'tracing/profiling:
none beyond wall-clock timers'): a ``jax.profiler`` trace context and a
``block_until_ready`` throughput harness.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict


# ---------------------------------------------------------------------------
# MLflow (lazy, flag-guarded like logging.py:24-80)
# ---------------------------------------------------------------------------

def mlflow_available() -> bool:
    try:
        import mlflow  # noqa: F401
        return True
    except ImportError:
        return False


def log_params_from_config(cfg, mlflow_on: bool = False) -> None:
    """Flatten the config tree into MLflow params (logging.py:30-42)."""
    if not mlflow_on or not mlflow_available():
        return
    import mlflow
    from pafuse_tpu.config import flatten
    for key, value in flatten(cfg).items():
        mlflow.log_param(key, value)


def log_metrics_to_mlflow(metrics: Dict[str, float], step: int,
                          mlflow_on: bool = False) -> None:
    """logging.py:70-80."""
    if not mlflow_on or not mlflow_available():
        return
    import mlflow
    for k, v in metrics.items():
        mlflow.log_metric(k, float(v), step=step)


@contextlib.contextmanager
def mlflow_run(cfg):
    """`with mlflow_run(cfg):` — starts a run iff mlflow.mlflow_on."""
    on = bool(cfg.mlflow.mlflow_on) and mlflow_available()
    if not on:
        yield False
        return
    import mlflow
    if cfg.mlflow.mlflow_uri:
        mlflow.set_tracking_uri(cfg.mlflow.mlflow_uri)
    mlflow.set_experiment(cfg.mlflow.experiment)
    with mlflow.start_run():
        log_params_from_config(cfg, mlflow_on=True)
        yield True


# ---------------------------------------------------------------------------
# TensorBoard
# ---------------------------------------------------------------------------

def make_summary_writer(logdir: str):
    """tensorboardX writer, or None when unavailable."""
    try:
        from tensorboardX import SummaryWriter
        return SummaryWriter(logdir)
    except ImportError:
        return None


# ---------------------------------------------------------------------------
# Profiling (new TPU-side capability)
# ---------------------------------------------------------------------------

@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def measure_throughput(fn: Callable, *args, iters: int = 5,
                       warmup: int = 1, items_per_call: int = 1,
                       **kwargs) -> Dict[str, float]:
    """Wall-clock throughput of a jitted callable with HONEST device sync.

    ``block_until_ready`` does not reliably synchronize through tunneled
    PJRT backends, so every iteration ends in a host readback that
    data-depends on the result (utils.backend.sync).
    """
    from pafuse_tpu.utils.backend import sync
    for _ in range(warmup):
        sync(fn(*args, **kwargs))
    t0 = time.perf_counter()
    for _ in range(iters):
        sync(fn(*args, **kwargs))
    dt = time.perf_counter() - t0
    return {"seconds_per_call": dt / iters,
            "items_per_second": items_per_call * iters / dt}
