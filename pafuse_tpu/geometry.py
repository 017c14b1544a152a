"""Geometry & math kernels: screen normalization, camera transforms,
quaternion rotation, full H36M projection, part centering/assembly.

Reference behavior: ``/root/reference/common/camera.py``,
``common/quaternion.py`` and ``common/utils.py:79-126``.

Everything here is pure ``jax.numpy`` and works under ``jit``/``vmap``/
``grad``; the part routines use single-gather formulations (see
:mod:`pafuse_tpu.skeleton`) instead of python loops over parts so they fuse
into one XLA op.  All functions also accept plain NumPy arrays (they will be
promoted to device arrays).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pafuse_tpu import skeleton as sk


# ---------------------------------------------------------------------------
# Screen-space normalization (camera.py:7-18)
# ---------------------------------------------------------------------------

def normalize_screen_coordinates(x, w, h):
    """Map pixel coords so that [0, w] -> [-1, 1], preserving aspect ratio."""
    assert x.shape[-1] == 2
    if isinstance(x, np.ndarray):
        return x / w * 2 - np.array([1, h / w], dtype=x.dtype)
    return x / w * 2 - jnp.asarray([1.0, h / w], dtype=x.dtype)


def image_coordinates(x, w, h):
    """Inverse of :func:`normalize_screen_coordinates`."""
    assert x.shape[-1] == 2
    if isinstance(x, np.ndarray):
        return (x + np.array([1, h / w], dtype=x.dtype)) * w / 2
    return (x + jnp.asarray([1.0, h / w], dtype=x.dtype)) * w / 2


# ---------------------------------------------------------------------------
# Quaternions (quaternion.py:3-28).  Layout: (w, x, y, z), assumed normalized.
# ---------------------------------------------------------------------------

def qrot(q, v):
    """Rotate vectors ``v`` (..., 3) by quaternions ``q`` (..., 4).

    Broadcasting over leading dims is supported (unlike the reference, which
    requires pre-tiled ``q``).
    """
    q = jnp.asarray(q)
    v = jnp.asarray(v)
    assert q.shape[-1] == 4 and v.shape[-1] == 3
    qvec = q[..., 1:]
    uv = jnp.cross(qvec, v)
    uuv = jnp.cross(qvec, uv)
    return v + 2.0 * (q[..., :1] * uv + uuv)


def qinverse(q):
    """Conjugate of a normalized quaternion."""
    q = jnp.asarray(q)
    return jnp.concatenate([q[..., :1], -q[..., 1:]], axis=-1)


def world_to_camera(x, rotation, translation):
    """World -> camera frame (camera.py:21-23)."""
    return qrot(qinverse(jnp.asarray(rotation)), jnp.asarray(x) - jnp.asarray(translation))


def camera_to_world(x, rotation, translation):
    """Camera -> world frame (camera.py:26-27)."""
    return qrot(jnp.asarray(rotation), jnp.asarray(x)) + jnp.asarray(translation)


# ---------------------------------------------------------------------------
# H36M projection with radial+tangential distortion (camera.py:30-60)
# ---------------------------------------------------------------------------

def project_to_2d(x, camera_params):
    """Project camera-space 3D points to 2D with the full distortion model.

    Args:
      x: (N, ..., 3) points in camera space.
      camera_params: (N, 9) intrinsics [fx fy cx cy k1 k2 k3 p1 p2].
    Returns:
      (N, ..., 2) pixel coordinates in normalized screen space.
    """
    x = jnp.asarray(x)
    camera_params = jnp.asarray(camera_params)
    assert x.shape[-1] == 3
    assert camera_params.shape[-1] == 9
    while camera_params.ndim < x.ndim:
        camera_params = camera_params[:, None]

    f = camera_params[..., :2]
    c = camera_params[..., 2:4]
    k = camera_params[..., 4:7]
    p = camera_params[..., 7:]

    xx = jnp.clip(x[..., :2] / x[..., 2:], -1.0, 1.0)
    r2 = jnp.sum(xx ** 2, axis=-1, keepdims=True)
    radial = 1 + jnp.sum(
        k * jnp.concatenate([r2, r2 ** 2, r2 ** 3], axis=-1), axis=-1, keepdims=True)
    tan = jnp.sum(p * xx, axis=-1, keepdims=True)
    xxx = xx * (radial + tan) + p * r2
    return f * xxx + c


def project_to_2d_linear(x, camera_params):
    """Pinhole-only projection (camera.py:62-83)."""
    x = jnp.asarray(x)
    camera_params = jnp.asarray(camera_params)
    assert x.shape[-1] == 3 and camera_params.shape[-1] == 9
    while camera_params.ndim < x.ndim:
        camera_params = camera_params[:, None]
    f = camera_params[..., :2]
    c = camera_params[..., 2:4]
    xx = jnp.clip(x[..., :2] / x[..., 2:], -1.0, 1.0)
    return f * xx + c


def uvd2xyz(uvd, gt_3d, cam):
    """Lift (u, v, depth) predictions to root-relative camera-space XYZ
    using the pinhole intrinsics (camera.py:85-113; unused by the reference
    pipelines but part of the geometry surface).

    uvd: (N, T, V, 3); gt_3d: (N, T, V, 3) with V=0 carrying the absolute
    root depth; cam: (..., >=4) intrinsics [fx fy cx cy ...].
    Returns root-relative xyz (N, T, V, 3).
    """
    uvd = jnp.asarray(uvd)
    gt_3d = jnp.asarray(gt_3d)
    cam = jnp.asarray(cam)
    n, t, v, _ = uvd.shape
    f = cam[..., :2].reshape(-1, 1, 1, 2)
    c = cam[..., 2:4].reshape(-1, 1, 1, 2)
    root_z = gt_3d[:, :, 0:1, 2]                                  # (N,T,1)
    z_global = jnp.concatenate(
        [root_z, uvd[:, :, 1:, 2] + root_z], axis=2)[..., None]   # (N,T,V,1)
    uv = uvd[..., :2] - c
    xy = uv * z_global / f
    xyz = jnp.concatenate([xy, z_global], axis=-1)
    return xyz - xyz[:, :, 0:1, :]


# ---------------------------------------------------------------------------
# Pose centering / part assembly (utils.py:79-126)
# ---------------------------------------------------------------------------

def center_pose_at_root(pose_3d, root_idx: int = 0, revert: bool = False):
    """Translate poses so the root joint sits at the origin (joint axis = -2)."""
    pose_3d = jnp.asarray(pose_3d)
    offset = pose_3d[..., root_idx: root_idx + 1, :]
    if revert:
        return pose_3d + offset
    return pose_3d - offset


def center_pose_parts(pose_3d, part_root_of_joint=None):
    """Center each part (body/face/hands) at its own root.

    Single-gather formulation of common/utils.py:95-110:
    ``out[..., j, :] = pose[..., j, :] - pose[..., root_of(j), :]``.
    """
    pose_3d = jnp.asarray(pose_3d)
    table = sk.PART_ROOT_OF_JOINT if part_root_of_joint is None else part_root_of_joint
    roots = jnp.take(pose_3d, jnp.asarray(table), axis=-2)
    return pose_3d - roots


def wb_pose_from_parts(part_pose, connection_of_joint=None):
    """Re-attach part-centered poses to the body (inverse of
    :func:`center_pose_parts` up to the global root translation).

    Single-gather formulation of common/utils.py:113-126:
    ``out[..., j, :] = pose[..., j, :] + pose[..., connection_of(j), :]``,
    except self-connected joints (the body root, connection 0 == itself)
    which come out EXACTLY zero.

    The zero-root exception replicates a subtle reference behavior:
    ``center_pose_at_root(..., revert=True)`` negates the selected root row
    through a torch VIEW (utils.py:87-90 ``offset *= -1``), mutating the
    input in place, so the body root becomes ``-r - (-r) = 0`` rather than
    ``r + r``.  On part-centered GT (root already 0) both forms agree —
    which is why round-trip tests never caught it — but on real model
    predictions (root ≈ ε ≠ 0) the reference's assembled root is 0 while
    the naive gather gives 2ε, shifting every downstream root-centered
    metric.  Found by the flagship rehearsal (tools/rehearse_parity.py).

    NOTE: like the reference, the anchor positions are read from the *input*
    (face/hands attach to the centered body's nose/wrists).
    """
    part_pose = jnp.asarray(part_pose)
    table = np.asarray(sk.CONNECTION_OF_JOINT if connection_of_joint is None
                       else connection_of_joint)
    anchors = jnp.take(part_pose, jnp.asarray(table), axis=-2)
    out = part_pose + anchors
    self_connected = table == np.arange(table.shape[0])
    if np.any(self_connected):
        mask = jnp.asarray(~self_connected, out.dtype)[..., :, None]
        out = out * mask
    return out


def flip_pose(pose, flip_permutation=None):
    """Mirror a pose: negate x and swap left/right joints (single gather).

    Matches the flip used in generators.py:126-147 and
    diffusionpose.py:192-214 (x *= -1 then left<->right swap).
    Works for both 2D and 3D poses; joint axis = -2.
    """
    pose = jnp.asarray(pose)
    perm = sk.FLIP_PERMUTATION if flip_permutation is None else flip_permutation
    flipped = pose * jnp.asarray([-1.0] + [1.0] * (pose.shape[-1] - 1), dtype=pose.dtype)
    return jnp.take(flipped, jnp.asarray(perm), axis=-2)


def flip_pose_np(pose: np.ndarray, flip_permutation=None) -> np.ndarray:
    """NumPy twin of :func:`flip_pose` for host-side data prep."""
    perm = sk.FLIP_PERMUTATION if flip_permutation is None else flip_permutation
    out = pose.copy()
    out[..., 0] *= -1
    return out[..., perm, :]


def flip_intrinsics_np(cam: np.ndarray) -> np.ndarray:
    """Flip horizontal center & tangential distortion (generators.py:153-155)."""
    out = cam.copy()
    out[..., 2] *= -1
    out[..., 7] *= -1
    return out
