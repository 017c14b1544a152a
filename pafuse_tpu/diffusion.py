"""D3DP-style conditional diffusion for 3D pose — JAX/TPU native.

Reference behavior: ``/root/reference/common/diffusionpose.py`` (class D3DP).

TPU redesign decisions:

* **Schedules as precomputed tables.**  The cosine beta schedule and every
  derived coefficient (diffusionpose.py:41-51, 90-132) are computed once in
  float64 NumPy and stored as device constants.
* **Vectorized forward noising.**  The reference draws per-sample timesteps
  in a host python loop (``prepare_targets``, diffusionpose.py:376-388); here
  one ``jax.random.randint``/``normal`` pair covers the whole batch.
* **DDIM as ``lax.scan``.**  The python sampling loop
  (diffusionpose.py:272-316) becomes a scan over precomputed per-step
  coefficient vectors; the per-step x0 predictions are the scan outputs,
  giving the reference's ``(B, T_steps, H, F, J, 3)`` stacked tensor.
* **Hypotheses ride the batch.**  The H proposals are folded into the batch
  axis for the denoiser call (as in mixste.py:227-235) so all proposals hit
  the MXU in a single pass.
* **Flip TTA in one call.**  ``model_predictions_fliping``
  (diffusionpose.py:192-225) runs the backbone twice; here the flipped copy
  is concatenated on the batch axis and both orientations are denoised in a
  single forward, then un-flipped and averaged.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pafuse_tpu import geometry, skeleton as sk
from pafuse_tpu.models.parts import (PartModel, build_part_specs,
                                     monolithic_spec)


# ---------------------------------------------------------------------------
# Schedules (diffusionpose.py:41-51, 90-132)
# ---------------------------------------------------------------------------

def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    steps = timesteps + 1
    x = np.linspace(0, timesteps, steps, dtype=np.float64)
    alphas_cumprod = np.cos(((x / timesteps) + s) / (1 + s) * math.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


@dataclasses.dataclass(frozen=True)
class Schedule:
    betas: np.ndarray
    alphas_cumprod: np.ndarray
    alphas_cumprod_prev: np.ndarray
    sqrt_alphas_cumprod: np.ndarray
    sqrt_one_minus_alphas_cumprod: np.ndarray
    sqrt_recip_alphas_cumprod: np.ndarray
    sqrt_recipm1_alphas_cumprod: np.ndarray
    posterior_variance: np.ndarray
    posterior_log_variance_clipped: np.ndarray
    posterior_mean_coef1: np.ndarray
    posterior_mean_coef2: np.ndarray


def make_schedule(timesteps: int) -> Schedule:
    betas = cosine_beta_schedule(timesteps)
    alphas = 1.0 - betas
    ac = np.cumprod(alphas)
    ac_prev = np.concatenate([[1.0], ac[:-1]])
    post_var = betas * (1.0 - ac_prev) / (1.0 - ac)
    return Schedule(
        betas=betas.astype(np.float32),
        alphas_cumprod=ac.astype(np.float32),
        alphas_cumprod_prev=ac_prev.astype(np.float32),
        sqrt_alphas_cumprod=np.sqrt(ac).astype(np.float32),
        sqrt_one_minus_alphas_cumprod=np.sqrt(1.0 - ac).astype(np.float32),
        sqrt_recip_alphas_cumprod=np.sqrt(1.0 / ac).astype(np.float32),
        sqrt_recipm1_alphas_cumprod=np.sqrt(1.0 / ac - 1.0).astype(np.float32),
        posterior_variance=post_var.astype(np.float32),
        posterior_log_variance_clipped=np.log(
            np.clip(post_var, 1e-20, None)).astype(np.float32),
        posterior_mean_coef1=(betas * np.sqrt(ac_prev) / (1.0 - ac)).astype(np.float32),
        posterior_mean_coef2=((1.0 - ac_prev) * np.sqrt(alphas)
                              / (1.0 - ac)).astype(np.float32),
    )


def ddim_time_pairs(total_timesteps: int, sampling_timesteps: int
                    ) -> List[Tuple[int, int]]:
    """[(T-1, t_{S-1}), ..., (t_1, -1)] — diffusionpose.py:233-236."""
    times = np.linspace(-1, total_timesteps - 1, sampling_timesteps + 1)
    times = list(reversed(times.astype(int).tolist()))
    return list(zip(times[:-1], times[1:]))


# ---------------------------------------------------------------------------
# Model wrapper
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class D3DPConfig:
    frames: int = 27
    num_kps: int = 134
    timesteps: int = 1000
    sampling_timesteps: int = 5
    num_proposals: int = 10
    scale: float = 1.0
    eta: float = 1.0
    depth: int = 8
    input_size: int = 5
    cs: int = 288                   # monolithic channel size
    part_based: bool = True
    merge_hands: bool = True
    drop_path_rate: float = 0.0     # 0.1 for training (diffusionpose.py:136-138)
    dropout: float = 0.0            # model.dropout -> MLP/proj/pos drop (mixste.py:35)
    attn_dropout: float = 0.0       # attn_drop on softmax weights (mixste.py:73)
    test_time_augmentation: bool = True
    mm_scale: bool = False          # 3DHP variant: model operates in mm/1000


class D3DP:
    """Functional D3DP: owns configs, schedule tables and the part router."""

    def __init__(self, cfg: D3DPConfig,
                 parts_joint_indices: Optional[Dict[str, List[int]]] = None,
                 flip_permutation: Optional[np.ndarray] = None,
                 compute_dtype=jnp.float32, attention_fn=None,
                 block_fn=None, train_block_fn=None, layer_fn=None,
                 block_t_fn=None, remat: bool = False,
                 packed_parts: bool = False):
        self.cfg = cfg
        self.schedule = make_schedule(cfg.timesteps)
        self.compute_dtype = compute_dtype
        self.attention_fn = attention_fn
        self.block_fn = block_fn
        self.train_block_fn = train_block_fn
        self.layer_fn = layer_fn
        self.block_t_fn = block_t_fn
        self.remat = remat
        if cfg.part_based:
            tables = parts_joint_indices or sk.parts_table(cfg.merge_hands)
            specs = build_part_specs(tables, cfg.frames, cfg.input_size,
                                     cfg.depth, cfg.drop_path_rate,
                                     drop_rate=cfg.dropout,
                                     attn_drop_rate=cfg.attn_dropout)
        else:
            specs = monolithic_spec(cfg.num_kps, cfg.frames, cfg.input_size,
                                    cfg.cs, cfg.depth, cfg.drop_path_rate,
                                    drop_rate=cfg.dropout,
                                    attn_drop_rate=cfg.attn_dropout)
        if packed_parts and cfg.part_based:
            # packed execution is a measured negative result (8.3 vs 13.4
            # f/s at W=4, PARITY.md) retained as A/B evidence only
            from pafuse_tpu.ops.attention import require_experimental
            require_experimental("D3DP(packed_parts=True)")
        self.model = PartModel(specs, packed=packed_parts and cfg.part_based)
        if flip_permutation is not None:
            self.flip_permutation = np.asarray(flip_permutation, np.int32)
        elif cfg.num_kps == sk.NUM_JOINTS:
            self.flip_permutation = sk.FLIP_PERMUTATION
        elif cfg.num_kps == sk.NUM_JOINTS - 1:
            self.flip_permutation = sk.FLIP_PERMUTATION_NO_ROOT
        else:
            # An identity table here would silently corrupt flip augmentation
            # and flip-TTA (reference builds it from dataset metadata,
            # h3wb_dataset.py:27-38) — refuse instead.
            raise ValueError(
                f"No flip permutation known for num_kps={cfg.num_kps}; pass "
                "flip_permutation= explicitly")
        if self.flip_permutation.shape != (cfg.num_kps,):
            raise ValueError(
                f"flip_permutation has shape {self.flip_permutation.shape}, "
                f"expected ({cfg.num_kps},)")

    # -- params --------------------------------------------------------------
    def init_params(self, key) -> Dict[str, Any]:
        return self.model.init_params(key)

    # -- internals -----------------------------------------------------------
    def _denoise(self, params, x2d, x_t, t, *, train=False, rng=None):
        return self.model(params, x2d, x_t, t, train=train, rng=rng,
                          compute_dtype=self.compute_dtype,
                          attention_fn=self.attention_fn,
                          block_fn=self.block_fn,
                          train_block_fn=self.train_block_fn,
                          layer_fn=self.layer_fn,
                          block_t_fn=self.block_t_fn,
                          remat=self.remat)

    def _clamp_scaled(self, x):
        s = self.cfg.scale
        return jnp.clip(x, -1.1 * s, 1.1 * s)

    def predict_noise_from_start(self, x_t, t, x0):
        """(sqrt(1/ac_t) * x_t - x0) / sqrt(1/ac_t - 1) — diffusionpose.py:157-161."""
        sched = self.schedule
        r = jnp.asarray(sched.sqrt_recip_alphas_cumprod)[t]
        rm1 = jnp.asarray(sched.sqrt_recipm1_alphas_cumprod)[t]
        shape = (-1,) + (1,) * (x_t.ndim - 1)
        return (r.reshape(shape) * x_t - x0) / rm1.reshape(shape)

    # -- training (diffusionpose.py:318-388, vectorized) ---------------------
    def q_sample(self, x_start, t, noise):
        sched = self.schedule
        shape = (-1,) + (1,) * (x_start.ndim - 1)
        a = jnp.asarray(sched.sqrt_alphas_cumprod)[t].reshape(shape)
        b = jnp.asarray(sched.sqrt_one_minus_alphas_cumprod)[t].reshape(shape)
        return a * x_start + b * noise

    def prepare_targets(self, rng, x3d_gt, *, t=None, noise=None):
        """Batch-vectorized prepare_diffusion_concat (diffusionpose.py:358-388).

        ``t``/``noise`` may be injected (golden parity tests vs the torch
        reference, which draws them per sample on the host).
        """
        B = x3d_gt.shape[0]
        rt, rn = jax.random.split(rng)
        if t is None:
            t = jax.random.randint(rt, (B,), 0, self.cfg.timesteps)
        if noise is None:
            noise = jax.random.normal(rn, x3d_gt.shape, jnp.float32)
        x = self.q_sample(x3d_gt * self.cfg.scale, t, noise)
        x = self._clamp_scaled(x) / self.cfg.scale
        return x, noise, t

    def train_forward(self, params, rng, x2d, x3d_gt, *, t=None, noise=None):
        """Training pass: noise GT, denoise, return x0 prediction (B,F,N,3).

        With ``mm_scale`` (the 3DHP variant, diffusionpose_3dhp.py:281-287)
        the GT arrives in millimeters: the model operates in meters
        internally and the prediction is scaled back to mm.
        """
        if self.cfg.mm_scale:
            x3d_gt = x3d_gt / 1000.0
        r_targets, r_drop = jax.random.split(rng)
        x_t, _, t = self.prepare_targets(r_targets, x3d_gt, t=t, noise=noise)
        pred = self._denoise(params, x2d, x_t, t, train=True, rng=r_drop)
        return pred * 1000.0 if self.cfg.mm_scale else pred

    # -- sampling (diffusionpose.py:227-316, as lax.scan) --------------------
    def _model_predictions(self, params, x, x2d_tiled, t_scalar, x2d_flip_tiled):
        """x: (B,H,F,N,3) noisy; returns (pred_noise, x_start) same rank.

        Folds (B,H) into the batch; when flip-TTA is on, also folds the
        flipped orientation into the batch (single denoiser call).
        """
        cfg = self.cfg
        B, H, F, N, C = x.shape
        x_t = self._clamp_scaled(x) / cfg.scale
        xt_flat = x_t.reshape(B * H, F, N, C)
        t_cond = jnp.full((B * H,), t_scalar, dtype=jnp.int32)

        if x2d_flip_tiled is not None:
            perm = jnp.asarray(self.flip_permutation)
            xt_flip = geometry.flip_pose(xt_flat, perm)
            x2d_all = jnp.concatenate([x2d_tiled, x2d_flip_tiled], axis=0)
            xt_all = jnp.concatenate([xt_flat, xt_flip], axis=0)
            t_all = jnp.concatenate([t_cond, t_cond], axis=0)
            pred = self._denoise(params, x2d_all, xt_all, t_all)
            pred_n, pred_f = pred[: B * H], pred[B * H:]
            pred_f = geometry.flip_pose(pred_f, perm)
            pred = 0.5 * (pred_n + pred_f)
        else:
            pred = self._denoise(params, x2d_tiled, xt_flat, t_cond)

        x_start = self._clamp_scaled(pred.reshape(B, H, F, N, C) * cfg.scale)
        t_b = jnp.full((B,), t_scalar, dtype=jnp.int32)
        pred_noise = self.predict_noise_from_start(x, t_b, x_start)
        return pred_noise, x_start

    def ddim_sample(self, params, rng, x2d, x2d_flip=None,
                    num_proposals: Optional[int] = None,
                    sampling_timesteps: Optional[int] = None,
                    init_noise=None, step_noise=None):
        """Multi-hypothesis DDIM sampling.

        Args:
          x2d: (B, F, N, 2) conditioning; x2d_flip: optional flipped twin.
          init_noise: optional (B, H, F, N, 3) initial x_T (for deterministic
            golden tests against the reference sampler).
          step_noise: optional (S, B, H, F, N, 3) per-step DDIM noise.
        Returns:
          (B, S, H, F, N, 3) x0 predictions stacked over the S DDIM steps.
        """
        cfg = self.cfg
        H = cfg.num_proposals if num_proposals is None else num_proposals
        S = (cfg.sampling_timesteps if sampling_timesteps is None
             else sampling_timesteps)
        if H < 1 or S < 1:
            raise ValueError(f"num_proposals/sampling_timesteps must be >=1, "
                             f"got {H}/{S}")
        B, F, N, _ = x2d.shape
        sched = self.schedule

        pairs = ddim_time_pairs(cfg.timesteps, S)
        times = np.array([p[0] for p in pairs], dtype=np.int32)
        times_next = np.array([p[1] for p in pairs], dtype=np.int32)
        alpha = sched.alphas_cumprod[times]
        # alpha_next=1 for the final (time_next=-1) step; masked out anyway.
        alpha_next = np.where(times_next >= 0,
                              sched.alphas_cumprod[np.maximum(times_next, 0)], 1.0)
        sigma = cfg.eta * np.sqrt(np.clip(
            (1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha), 0, None))
        coef_c = np.sqrt(np.clip(1 - alpha_next - sigma ** 2, 0, None))
        is_last = (times_next < 0)

        x2d_tiled = jnp.repeat(x2d, H, axis=0)  # (B*H, F, N, 2)
        x2d_flip_tiled = (jnp.repeat(x2d_flip, H, axis=0)
                          if x2d_flip is not None else None)

        # pack the part networks ONCE, outside the scan (no-op when the
        # unpacked execution strategy is active)
        params = self.model.prepare(params, train=False)

        rng, r_init = jax.random.split(rng)
        img0 = (jnp.asarray(init_noise, jnp.float32) if init_noise is not None
                else jax.random.normal(r_init, (B, H, F, N, 3), jnp.float32))

        xs = {
            "t": jnp.asarray(times),
            "alpha_next_sqrt": jnp.asarray(np.sqrt(alpha_next), dtype=jnp.float32),
            "sigma": jnp.asarray(sigma, dtype=jnp.float32),
            "c": jnp.asarray(coef_c, dtype=jnp.float32),
            "is_last": jnp.asarray(is_last),
        }
        if step_noise is not None:
            xs["noise"] = jnp.asarray(step_noise, jnp.float32)

        def step(carry, x):
            img, key = carry
            key, knoise = jax.random.split(key)
            pred_noise, x_start = self._model_predictions(
                params, img, x2d_tiled, x["t"], x2d_flip_tiled)
            noise = (x["noise"] if step_noise is not None
                     else jax.random.normal(knoise, img.shape, jnp.float32))
            img_next = (x_start * x["alpha_next_sqrt"]
                        + x["c"] * pred_noise + x["sigma"] * noise)
            img_next = jnp.where(x["is_last"], x_start, img_next)
            return (img_next, key), x_start

        (_, _), preds = jax.lax.scan(step, (img0, rng), xs)
        # (S, B, H, F, N, 3) -> (B, S, H, F, N, 3), reference stacks on dim=1
        preds = jnp.moveaxis(preds, 0, 1)
        # 3DHP variant reports in millimeters (diffusionpose_3dhp.py:212,256)
        return preds * 1000.0 if cfg.mm_scale else preds

    def eval_forward(self, params, rng, x2d, x2d_flip=None, **kw):
        """Mirror of D3DP.forward in eval mode (diffusionpose.py:337-344)."""
        if self.cfg.test_time_augmentation and x2d_flip is not None:
            return self.ddim_sample(params, rng, x2d, x2d_flip, **kw)
        return self.ddim_sample(params, rng, x2d, None, **kw)
