"""MPJPE loss family and multi-hypothesis diffusion metrics.

Reference behavior: ``/root/reference/common/loss.py``.

All metric functions are pure ``jnp`` (jit/vmap-safe) and follow the
reference's aggregation orders exactly.  Hypothesis tensors have shape
``(B, S, H, F, N, C)``: batch, DDIM step, hypothesis, frame, joint, coord.
Metrics return per-DDIM-step vectors of shape ``(S,)``.

The Procrustes (protocol #2) family stays in NumPy + SVD like the reference
(loss.py:209-457) — it is a host-side reporting path, not a training op.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from pafuse_tpu import geometry, skeleton as sk


# ---------------------------------------------------------------------------
# Training loss (loss.py:9-34)
# ---------------------------------------------------------------------------

def mpjpe(predicted, target, weights=None, mse_loss: bool = False):
    """Mean per-joint position error (protocol #1), optional per-joint
    weights and squared-error mode."""
    assert predicted.shape == target.shape
    dist = jnp.linalg.norm(predicted - target, axis=-1)
    if weights is not None:
        w = jnp.asarray(weights)
        assert w.shape[0] == target.shape[-2]
        dist = w * dist
    if mse_loss:
        return jnp.mean(jnp.square(dist))
    return jnp.mean(dist)


def mpjpe_per_joint(predicted, target):
    """Per-joint mean errors (loss.py:28-34 return_joints_err branch), in mm."""
    errors = jnp.linalg.norm(predicted - target, axis=-1)
    per_joint = jnp.mean(errors.reshape(-1, errors.shape[-1]), axis=0) * 1000
    return jnp.mean(errors), per_joint


# ---------------------------------------------------------------------------
# Multi-hypothesis metrics over (B, S, H, F, N, C)
# ---------------------------------------------------------------------------

def _center_parts(x):
    return geometry.center_pose_parts(x)


def mpjpe_diffusion_all_min(predicted, target, mean_pos: bool = False,
                            part_based: bool = False,
                            parts_joint_indices=None):
    """J_Best (per-joint min over hypotheses) or, with ``mean_pos=True``,
    P_Agg (error of the hypothesis-mean pose).  loss.py:36-88."""
    if part_based:
        predicted = _center_parts(predicted)
        target = _center_parts(target)

    if not mean_pos:
        # target: (B,F,N,C) -> broadcast against (B,S,H,F,N,C)
        errors = jnp.linalg.norm(
            predicted - target[:, None, None], axis=-1)        # (B,S,H,F,N)
        min_err = jnp.min(errors, axis=2)                       # (B,S,F,N)
        return jnp.mean(min_err, axis=(0, 2, 3))                # (S,)

    mean_pose = jnp.mean(predicted, axis=2)                     # (B,S,F,N,C)
    errors = jnp.linalg.norm(mean_pose - target[:, None], axis=-1)  # (B,S,F,N)
    agg = jnp.mean(errors, axis=(0, 2, 3))                      # (S,)
    if part_based:
        tables = parts_joint_indices or sk.PARTS_JOINT_INDICES
        part_err = {p: jnp.mean(errors[..., jnp.asarray(idx)], axis=(0, 2, 3))
                    for p, idx in tables.items()}
        return agg, part_err
    return agg


def mpjpe_diffusion(predicted, target, mean_pos: bool = False,
                    part_based: bool = False, parts_joint_indices=None):
    """P_Best (min-over-hypotheses of per-pose mean error).  loss.py:114-168.

    Returns ``(errors_S, part_errors_dict)`` matching the reference's tuple
    (the dict is empty unless ``part_based``); with ``mean_pos=True`` returns
    just the (S,) P_Agg vector.
    """
    if part_based:
        predicted = _center_parts(predicted)
        target = _center_parts(target)
    else:
        predicted = geometry.center_pose_at_root(predicted)
        target = geometry.center_pose_at_root(target)

    if mean_pos:
        mean_pose = jnp.mean(predicted, axis=2)
        errors = jnp.linalg.norm(mean_pose - target[:, None], axis=-1)
        return jnp.mean(errors, axis=(0, 2, 3))

    errors = jnp.linalg.norm(predicted - target[:, None, None], axis=-1)
    # (B,S,H,F,N) -> per-(S,H) mean over (B,F,N) jointly, then min over H
    per_h = jnp.mean(jnp.moveaxis(errors, (1, 2), (0, 1)).reshape(
        errors.shape[1], errors.shape[2], -1), axis=-1)         # (S,H)
    min_errors = jnp.min(per_h, axis=1)                         # (S,)

    part_errors: Dict[str, jnp.ndarray] = {}
    if part_based:
        min_inds = jnp.argmin(per_h, axis=1)                    # (S,)
        tables = parts_joint_indices or sk.PARTS_JOINT_INDICES
        for p, idx in tables.items():
            pe = jnp.mean(
                jnp.moveaxis(errors[..., jnp.asarray(idx)], (1, 2), (0, 1)).reshape(
                    errors.shape[1], errors.shape[2], -1), axis=-1)   # (S,H)
            part_errors[p] = jnp.take_along_axis(
                pe, min_inds[:, None], axis=1)[:, 0]
    return min_errors, part_errors


def mpjpe_diffusion_reproj(predicted, target, reproj_2d, target_2d):
    """J_Agg: per-joint hypothesis selected by min 2D reprojection error.
    loss.py:90-112."""
    errors = jnp.linalg.norm(predicted - target[:, None, None], axis=-1)
    errors_2d = jnp.linalg.norm(reproj_2d - target_2d[:, None, None], axis=-1)
    sel = jnp.argmin(errors_2d, axis=2, keepdims=True)          # (B,S,1,F,N)
    picked = jnp.take_along_axis(errors, sel, axis=2)           # (B,S,1,F,N)
    return jnp.mean(picked, axis=(0, 2, 3, 4))                  # (S,)


def mpjpe_diffusion_3dhp(predicted, target, valid_frame, mean_pos: bool = False):
    """3DHP variant with a per-frame validity mask (loss.py:170-206).

    predicted: (B,S,H,F,N,C); target: (B,F,N,C); valid_frame: (B,F) bool.
    """
    mask = valid_frame.astype(jnp.float32)                      # (B,F)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    if not mean_pos:
        errors = jnp.linalg.norm(predicted - target[:, None, None], axis=-1)
        # Reference masks frames *before* averaging; replicate exactly:
        w = mask[:, None, None, :, None]
        per_h = jnp.sum(errors * w, axis=(0, 3, 4)) / (denom * errors.shape[4])
        return jnp.min(per_h, axis=-1)
    mean_pose = jnp.mean(predicted, axis=2)
    errors = jnp.linalg.norm(mean_pose - target[:, None], axis=-1)  # (B,S,F,N)
    w = mask[:, None, :, None]
    return jnp.sum(errors * w, axis=(0, 2, 3)) / (denom * errors.shape[-1])


# ---------------------------------------------------------------------------
# Protocol #2 (Procrustes-aligned), NumPy host-side (loss.py:209-457)
# ---------------------------------------------------------------------------

def _procrustes_align(predicted: np.ndarray, target: np.ndarray) -> np.ndarray:
    """Rigid-align predicted to target per item ((M, N, C) arrays)."""
    muX = np.mean(target, axis=1, keepdims=True)
    muY = np.mean(predicted, axis=1, keepdims=True)
    X0, Y0 = target - muX, predicted - muY
    normX = np.sqrt(np.sum(X0 ** 2, axis=(1, 2), keepdims=True))
    normY = np.sqrt(np.sum(Y0 ** 2, axis=(1, 2), keepdims=True))
    X0, Y0 = X0 / normX, Y0 / normY
    H = np.matmul(X0.transpose(0, 2, 1), Y0)
    U, s, Vt = np.linalg.svd(H)
    V = Vt.transpose(0, 2, 1)
    R = np.matmul(V, U.transpose(0, 2, 1))
    sign_detR = np.sign(np.expand_dims(np.linalg.det(R), axis=1))
    V[:, :, -1] *= sign_detR
    s[:, -1] *= sign_detR.flatten()
    R = np.matmul(V, U.transpose(0, 2, 1))
    tr = np.expand_dims(np.sum(s, axis=1, keepdims=True), axis=2)
    a = tr * normX / normY
    t = muX - a * np.matmul(muY, R)
    return a * np.matmul(predicted, R) + t


def p_mpjpe(predicted: np.ndarray, target: np.ndarray) -> float:
    aligned = _procrustes_align(predicted, target)
    return float(np.mean(np.linalg.norm(aligned - target, axis=-1)))


def p_mpjpe_diffusion_all_min(predicted, target, mean_pos: bool = False):
    """P2 J_Best / P_Agg (loss.py:251-321)."""
    predicted = np.asarray(predicted)
    target = np.asarray(target)
    b, s, h, f, j, c = predicted.shape
    if mean_pos:
        predicted = predicted.mean(axis=2)
        tgt = np.broadcast_to(target[:, None], (b, s, f, j, c))
    else:
        tgt = np.broadcast_to(target[:, None, None], (b, s, h, f, j, c))
    aligned = _procrustes_align(predicted.reshape(-1, j, c), tgt.reshape(-1, j, c))
    errors = np.linalg.norm(aligned - tgt.reshape(-1, j, c), axis=-1)
    if mean_pos:
        errors = errors.reshape(b, s, f, j)
        return errors.transpose(1, 0, 2, 3).reshape(s, -1).mean(axis=1)
    errors = errors.reshape(b, s, h, f, j).transpose(1, 2, 0, 3, 4)  # s,h,b,f,j
    return errors.min(axis=1).reshape(s, -1).mean(axis=1)


def p_mpjpe_diffusion(predicted, target, mean_pos: bool = False):
    """P2 P_Best (loss.py:323-392): per-hypothesis mean then min."""
    predicted = np.asarray(predicted)
    target = np.asarray(target)
    b, s, h, f, j, c = predicted.shape
    if mean_pos:
        return p_mpjpe_diffusion_all_min(predicted, target, mean_pos=True)
    tgt = np.broadcast_to(target[:, None, None], (b, s, h, f, j, c))
    aligned = _procrustes_align(predicted.reshape(-1, j, c), tgt.reshape(-1, j, c))
    errors = np.linalg.norm(aligned - tgt.reshape(-1, j, c), axis=-1)
    errors = errors.reshape(b, s, h, f, j).transpose(1, 2, 0, 3, 4)
    return errors.reshape(s, h, -1).mean(axis=2).min(axis=1)


def p_mpjpe_diffusion_reproj(predicted, target, reproj_2d, target_2d):
    """P2 J_Agg (loss.py:395-457)."""
    predicted = np.asarray(predicted)
    target = np.asarray(target)
    reproj_2d = np.asarray(reproj_2d)
    target_2d = np.asarray(target_2d)
    b, s, h, f, j, c = predicted.shape
    errors_2d = np.linalg.norm(
        reproj_2d - target_2d[:, None, None], axis=-1)          # (b,s,h,f,j)
    sel = np.argmin(errors_2d, axis=2)[:, :, None]              # (b,s,1,f,j)
    tgt = np.broadcast_to(target[:, None, None], (b, s, h, f, j, c))
    aligned = _procrustes_align(predicted.reshape(-1, j, c), tgt.reshape(-1, j, c))
    errors = np.linalg.norm(aligned - tgt.reshape(-1, j, c), axis=-1)
    errors = errors.reshape(b, s, h, f, j)
    picked = np.take_along_axis(errors, sel, axis=2)            # (b,s,1,f,j)
    return picked.transpose(1, 2, 0, 3, 4).reshape(s, -1).mean(axis=1)


# ---------------------------------------------------------------------------
# Misc metrics (loss.py:460-497)
# ---------------------------------------------------------------------------

def n_mpjpe(predicted, target):
    """Normalized MPJPE (scale-aligned)."""
    assert predicted.shape == target.shape
    norm_p = jnp.mean(jnp.sum(predicted ** 2, axis=3, keepdims=True),
                      axis=2, keepdims=True)
    norm_t = jnp.mean(jnp.sum(target * predicted, axis=3, keepdims=True),
                      axis=2, keepdims=True)
    return mpjpe(norm_t / norm_p * predicted, target)


def mean_velocity_error_train(predicted, target):
    """Frame-difference velocity error over axis 1 (loss.py:473-485)."""
    assert predicted.shape == target.shape
    vp = predicted[:, 1:] - predicted[:, :-1]
    vt = target[:, 1:] - target[:, :-1]
    return jnp.mean(jnp.linalg.norm(vp - vt, axis=-1))


def mean_velocity_error(predicted: np.ndarray, target: np.ndarray,
                        axis: int = 0) -> float:
    vp = np.diff(predicted, axis=axis)
    vt = np.diff(target, axis=axis)
    return float(np.mean(np.linalg.norm(vp - vt, axis=-1)))
