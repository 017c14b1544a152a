"""Geometry kernels: round trips, quaternion identities, projection,
part centering/assembly (promotes the reference's inline test_funcs,
common/utils.py:129-157, into real unit tests)."""

import numpy as np
import pytest

from pafuse_tpu import geometry as geo, skeleton as sk


def test_screen_normalization_roundtrip(rng):
    x = rng.rand(10, 5, 2).astype(np.float32) * 1000
    n = geo.normalize_screen_coordinates(x, w=1000, h=1002)
    back = geo.image_coordinates(np.asarray(n), w=1000, h=1002)
    np.testing.assert_allclose(back, x, atol=1e-3)


def test_normalize_maps_bounds():
    x = np.array([[0.0, 0.0], [1000.0, 1002.0]], dtype=np.float32)
    n = geo.normalize_screen_coordinates(x, w=1000, h=1002)
    np.testing.assert_allclose(n[0], [-1.0, -1.002], atol=1e-6)
    np.testing.assert_allclose(n[1], [1.0, 1.002], atol=1e-6)


def _random_unit_quat(rng, shape=()):
    q = rng.randn(*shape, 4)
    return (q / np.linalg.norm(q, axis=-1, keepdims=True)).astype(np.float32)


def test_qrot_identity(rng):
    v = rng.randn(7, 3).astype(np.float32)
    q = np.tile(np.array([1.0, 0, 0, 0], np.float32), (7, 1))
    np.testing.assert_allclose(np.asarray(geo.qrot(q, v)), v, atol=1e-6)


def test_qrot_inverse_roundtrip(rng):
    q = _random_unit_quat(rng, (11,))
    v = rng.randn(11, 3).astype(np.float32)
    rotated = geo.qrot(q, v)
    back = geo.qrot(geo.qinverse(q), np.asarray(rotated))
    np.testing.assert_allclose(np.asarray(back), v, atol=1e-5)


def test_qrot_preserves_norm(rng):
    q = _random_unit_quat(rng, (5,))
    v = rng.randn(5, 3).astype(np.float32)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(geo.qrot(q, v)), axis=-1),
        np.linalg.norm(v, axis=-1), atol=1e-5)


def test_world_camera_roundtrip(rng):
    q = _random_unit_quat(rng)
    t = rng.randn(3).astype(np.float32)
    x = rng.randn(4, 6, 3).astype(np.float32)
    cam = geo.world_to_camera(x, q, t)
    back = geo.camera_to_world(np.asarray(cam), q, t)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-5)


def test_project_to_2d_matches_closed_form(rng):
    """Golden test against an independent NumPy evaluation of the H36M
    distortion model (camera.py:30-60)."""
    x = rng.randn(3, 8, 3).astype(np.float32)
    x[..., 2] = np.abs(x[..., 2]) + 3.0
    cam = rng.randn(3, 9).astype(np.float32)
    out = np.asarray(geo.project_to_2d(x, cam))

    f, c, k, p = cam[:, None, :2], cam[:, None, 2:4], cam[:, None, 4:7], cam[:, None, 7:]
    xx = np.clip(x[..., :2] / x[..., 2:], -1, 1)
    r2 = np.sum(xx ** 2, axis=-1, keepdims=True)
    radial = 1 + np.sum(k * np.concatenate([r2, r2 ** 2, r2 ** 3], axis=-1),
                        axis=-1, keepdims=True)
    tan = np.sum(p * xx, axis=-1, keepdims=True)
    expected = f * (xx * (radial + tan) + p * r2) + c
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_project_linear_is_pinhole(rng):
    x = rng.randn(2, 5, 3).astype(np.float32)
    x[..., 2] = np.abs(x[..., 2]) + 2.0
    cam = np.zeros((2, 9), np.float32)
    cam[:, :2] = 2.0
    cam[:, 2:4] = 0.1
    out = np.asarray(geo.project_to_2d_linear(x, cam))
    np.testing.assert_allclose(out, 2.0 * (x[..., :2] / x[..., 2:]) + 0.1,
                               atol=1e-6)


# -------------------------------------------------------------------------
# Part centering / whole-body assembly — the reference's test_funcs
# (common/utils.py:129-157), plus property tests.
# -------------------------------------------------------------------------

def test_center_parts_reference_golden():
    """Runtime semantics of center_pose_parts (common/utils.py:95-110 with
    dataset.root_indices = {body:0, face:54, left_hand:92, right_hand:113}).

    NOTE: the reference's inline test_funcs (utils.py:129-157) encodes *stale*
    expectations (part roots at the body connection joints 1/10/11); the
    shipped runtime centers each part at its own in-part root.  We test the
    runtime behavior.
    """
    pose = np.ones((1, 1, 134, 3), dtype=np.float32)
    pose[:, :, 1] = 2.0
    pose[:, :, 10] = 5.0
    pose[:, :, 11] = 13.0
    pose[:, :, 54] = 3.0    # face root
    pose[:, :, 92] = 7.0    # left-hand root
    pose[:, :, 113] = 9.0   # right-hand root

    expected = np.zeros_like(pose)
    # body centered at joint 0 (value 1)
    expected[:, :, sk.PARTS_JOINT_INDICES["body"]] = 0.0
    expected[:, :, 1] = 1.0
    expected[:, :, 10] = 4.0
    expected[:, :, 11] = 12.0
    # face centered at joint 54 (value 3): generic face joints 1-3=-2
    expected[:, :, sk.PARTS_JOINT_INDICES["face"]] = -2.0
    expected[:, :, 54] = 0.0
    # hands centered at their wrists
    expected[:, :, sk.PARTS_JOINT_INDICES["left_hand"]] = 1.0 - 7.0
    expected[:, :, 92] = 0.0
    expected[:, :, sk.PARTS_JOINT_INDICES["right_hand"]] = 1.0 - 9.0
    expected[:, :, 113] = 0.0

    centered = np.asarray(geo.center_pose_parts(pose))
    np.testing.assert_allclose(centered, expected, atol=1e-6)


def _coincident_pose(rng, shape):
    """Random pose satisfying the H3WB physical constraint that each part
    root coincides with its body connection joint (nose tip == nose,
    hand wrist == body wrist) — required for exact part round-trips."""
    pose = rng.randn(*shape, 134, 3).astype(np.float32)
    pose[..., 54, :] = pose[..., 1, :]
    pose[..., 92, :] = pose[..., 10, :]
    pose[..., 113, :] = pose[..., 11, :]
    return pose


def test_part_roundtrip(rng):
    """wb_pose_from_parts(center_pose_parts(x)) == center_pose_at_root(x)
    whenever part roots coincide with their body anchors (true for H3WB)."""
    pose = _coincident_pose(rng, (2, 3))
    centered = geo.center_pose_parts(pose)
    wb = np.asarray(geo.wb_pose_from_parts(np.asarray(centered)))
    np.testing.assert_allclose(
        wb, np.asarray(geo.center_pose_at_root(pose)), atol=1e-5)


def test_center_at_root_revert(rng):
    pose = rng.randn(4, 134, 3).astype(np.float32)
    centered = np.asarray(geo.center_pose_at_root(pose))
    np.testing.assert_allclose(centered[..., 0, :], 0.0, atol=1e-6)


def test_flip_pose_involution(rng):
    pose = rng.randn(2, 27, 134, 3).astype(np.float32)
    twice = np.asarray(geo.flip_pose(np.asarray(geo.flip_pose(pose))))
    np.testing.assert_allclose(twice, pose, atol=1e-6)
    # numpy twin agrees with jnp version
    np.testing.assert_allclose(
        geo.flip_pose_np(pose), np.asarray(geo.flip_pose(pose)), atol=1e-6)


def test_flip_negates_x_of_midline(rng):
    pose = rng.randn(1, 1, 134, 3).astype(np.float32)
    flipped = np.asarray(geo.flip_pose(pose))
    # nose (midline, index 1): same joint, x negated
    np.testing.assert_allclose(flipped[..., 1, 0], -pose[..., 1, 0], atol=1e-6)
    np.testing.assert_allclose(flipped[..., 1, 1:], pose[..., 1, 1:], atol=1e-6)


def test_uvd2xyz_pinhole_inverse(rng):
    """uvd2xyz must invert the pinhole projection for root-relative poses."""
    import jax.numpy as jnp
    n, t, v = 2, 3, 5
    xyz = rng.randn(n, t, v, 3).astype(np.float32)
    xyz[..., 2] += 5.0  # positive depth
    f = np.array([2.0, 2.2], np.float32)
    c = np.array([0.1, -0.05], np.float32)
    uv = f * (xyz[..., :2] / xyz[..., 2:]) + c
    # depth channel: root absolute, others relative to root
    d = xyz[..., 2:].copy()
    d[:, :, 1:, 0] -= d[:, :, 0:1, 0]
    uvd = np.concatenate([uv, d], axis=-1)
    cam = np.tile(np.concatenate([f, c, np.zeros(5, np.float32)]), (n, 1))
    out = np.asarray(geo.uvd2xyz(uvd, xyz, cam))
    expected = xyz - xyz[:, :, 0:1]
    np.testing.assert_allclose(out, expected, atol=1e-4)


def test_wb_pose_from_parts_nonzero_root_matches_reference():
    """Assembly parity on data whose body root is NOT zero (real model
    predictions).  The reference's revert-centering negates the root row
    through a torch view, so the assembled body root is exactly 0 — on
    part-centered GT (root already 0) the naive gather agrees, which hid
    this; found by the flagship rehearsal."""
    import os
    import sys
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference unavailable")
    import torch
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from common.utils import wb_pose_from_parts as ref_wb

    class Ds:
        parts_joint_indices = {k: list(v)
                               for k, v in sk.PARTS_JOINT_INDICES.items()}
        root_indices = dict(sk.ROOT_INDICES)
        parts_connection_indices = dict(sk.PARTS_CONNECTION_INDICES)

    rng = np.random.RandomState(3)
    x = rng.randn(2, 5, 134, 3).astype(np.float32)  # roots nonzero
    ref_out = ref_wb(torch.from_numpy(x.copy()), dataset=Ds()).numpy()
    ours = np.asarray(geo.wb_pose_from_parts(x))
    np.testing.assert_allclose(ours, ref_out, atol=1e-6)
    # the assembled body root is exactly zero in the reference semantics
    np.testing.assert_array_equal(ours[..., 0, :], 0.0)
