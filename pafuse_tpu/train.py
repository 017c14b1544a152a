"""Training: optax AdamW + exponential decay, SPMD data parallelism over a
device mesh.

Reference behavior: the training loop of ``/root/reference/main_h3wb.py``
(optimizer 760-763, lr decay 1017-1020, loss 859, loop 807-895).

TPU redesign:

* the per-step computation (noise draw -> denoise -> MPJPE -> grad -> adamw
  update) is a single jitted function with donated state buffers;
* data parallelism is expressed with ``jax.sharding``: batch axis sharded
  over a 1-D ``data`` mesh, parameters/optimizer state replicated; XLA SPMD
  inserts the gradient all-reduce over ICI (replacing nn.DataParallel's
  scatter/gather, main_h3wb.py:698-705);
* the learning rate is a traced scalar input so per-epoch exponential decay
  (lr *= 0.993) requires no recompilation.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh

from pafuse_tpu import geometry
from pafuse_tpu.diffusion import D3DP


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    rng: jax.Array


def make_optimizer(weight_decay: float = 0.1) -> optax.GradientTransformation:
    """AdamW(wd=0.1) with injectable lr (main_h3wb.py:761)."""
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=0.0, weight_decay=weight_decay)


def create_train_state(model: D3DP, seed: int = 1,
                       weight_decay: float = 0.1) -> Tuple[TrainState, optax.GradientTransformation]:
    key = jax.random.PRNGKey(seed)
    kp, kr = jax.random.split(key)
    params = model.init_params(kp)
    tx = make_optimizer(weight_decay)
    opt_state = tx.init(params)
    return TrainState(params, opt_state, kr), tx


# ---------------------------------------------------------------------------
# Mesh / sharding — single implementation in pafuse_tpu.parallel.mesh,
# re-exported here for the training-facing surface.
# ---------------------------------------------------------------------------

from pafuse_tpu.parallel.mesh import (  # noqa: E402  (re-export)
    make_mesh,
    data_sharding as shard_batch_spec,
    replicated as replicated_spec,
    shard_batch,
)


# ---------------------------------------------------------------------------
# Train step
# ---------------------------------------------------------------------------

def build_train_step(model: D3DP, tx: optax.GradientTransformation, *,
                     weights: Optional[np.ndarray] = None,
                     mse_loss: bool = False, wb_loss: bool = False,
                     part_based: bool = True,
                     mesh: Optional[Mesh] = None,
                     donate: bool = True):
    """Returns jitted ``step(state, lr, x2d, x3d) -> (state, loss)``.

    ``x3d`` is the raw (uncentered) camera-space GT; part/root centering
    (main_h3wb.py:840-845) happens on device inside the step.
    """
    from pafuse_tpu import losses

    w = jnp.asarray(weights) if weights is not None else None

    def loss_fn(params, rng, x2d, x3d_centered):
        pred = model.train_forward(params, rng, x2d, x3d_centered)
        target = x3d_centered
        if part_based and wb_loss:
            pred = geometry.wb_pose_from_parts(pred)
            target = geometry.wb_pose_from_parts(target)
        return losses.mpjpe(pred, target, weights=w, mse_loss=mse_loss)

    def step(state: TrainState, lr, x2d, x3d):
        rng, step_rng = jax.random.split(state.rng)
        if part_based:
            x3d_c = geometry.center_pose_parts(x3d)
        else:
            x3d_c = geometry.center_pose_at_root(x3d)
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, step_rng, x2d, x3d_c)
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = lr  # type: ignore[attr-defined]
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, rng), loss

    if mesh is not None:
        repl = replicated_spec(mesh)
        data = shard_batch_spec(mesh)
        jit_kwargs = dict(
            in_shardings=(repl, repl, data, data),
            out_shardings=(repl, repl),
        )
    else:
        jit_kwargs = {}
    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums, **jit_kwargs)


def pad_batch(arr: np.ndarray, batch_size: int) -> Tuple[np.ndarray, int]:
    """Pad a partial batch up to ``batch_size`` by repeating the last row
    (keeps jit shapes static); returns (padded, real_count)."""
    n = arr.shape[0]
    if n == batch_size:
        return arr, n
    pad = np.repeat(arr[-1:], batch_size - n, axis=0)
    return np.concatenate([arr, pad], axis=0), n


def mixste_weight_table(num_kps: int = 134) -> np.ndarray:
    """Per-joint loss weights (main_h3wb.py:724-729): 18 MixSTE-derived
    values extended with 1.0 for the remaining whole-body joints."""
    weight = [1, 1, 1, 1, 1, 1, 1.5, 1.5, 4, 4, 4, 4, 1, 1, 2.5, 2.5, 2.5, 2.5]
    weight.extend((num_kps - len(weight)) * [1.0])
    return np.asarray(weight, dtype=np.float32)
