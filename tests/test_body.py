"""Unit tests for skeleton/kinematics math (hosnerf_tpu.core.body)."""

import jax.numpy as jnp
import numpy as np

from hosnerf_tpu.core import body


def _random_rotations(rng, n):
    # QR-based random rotations
    q, _ = np.linalg.qr(rng.normal(size=(n, 3, 3)))
    det = np.linalg.det(q)
    q[:, :, 0] *= np.sign(det)[:, None]
    return q.astype(np.float32)


def test_rodrigues_identity_and_known_axis():
    R = body.rodrigues(jnp.zeros((1, 3)))
    np.testing.assert_allclose(R[0], np.eye(3), atol=3e-3)  # eps-regularized
    # 90 deg about z
    R = body.rodrigues(jnp.array([[0.0, 0.0, np.pi / 2]]))
    want = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
    np.testing.assert_allclose(R[0], want, atol=1e-3)


def test_rodrigues_matches_cv2_convention(rng_np):
    import cv2
    rvecs = rng_np.normal(size=(8, 3)).astype(np.float32)
    ours = np.asarray(body.rodrigues(jnp.asarray(rvecs)))
    for i in range(8):
        want, _ = cv2.Rodrigues(rvecs[i])
        np.testing.assert_allclose(ours[i], want, atol=2e-3)


def test_rigid_inverse_matches_linalg(rng_np):
    R = _random_rotations(rng_np, 10)
    t = rng_np.normal(size=(10, 3)).astype(np.float32)
    G = np.asarray(body.construct_G(jnp.asarray(R), jnp.asarray(t)))
    inv = np.asarray(body.rigid_inverse(jnp.asarray(G)))
    np.testing.assert_allclose(inv, np.linalg.inv(G), atol=1e-5)


def test_affine_inverse_matches_linalg_nonorthonormal(rng_np):
    """motion_bases must invert the reference's ~1e-4 NON-orthonormal
    Rodrigues rotations exactly (ref body_util.py normalizes the axis as
    rvec/(theta+1e-5)); `affine_inverse` handles a general invertible
    3x3 block."""
    R = _random_rotations(rng_np, 10)
    R = R * (1.0 + 1e-4 * rng_np.normal(size=(10, 1, 1))).astype(np.float32)
    R += 1e-4 * rng_np.normal(size=R.shape).astype(np.float32)
    t = rng_np.normal(size=(10, 3)).astype(np.float32)
    G = np.asarray(body.construct_G(jnp.asarray(R), jnp.asarray(t)))
    inv = np.asarray(body.affine_inverse(jnp.asarray(G)))
    np.testing.assert_allclose(inv, np.linalg.inv(G.astype(np.float64)),
                               atol=1e-6)
    # rigid_inverse on these is ~1e-4 off — the regression this guards
    rinv = np.asarray(body.rigid_inverse(jnp.asarray(G)))
    assert np.abs(rinv - np.linalg.inv(G.astype(np.float64))).max() > 2e-5


def test_forward_kinematics_translation_chain():
    # a pure-translation chain reproduces cumulative joint positions
    joints = np.cumsum(np.ones((body.TOTAL_BONES, 3), np.float32) * 0.1, 0)
    gtfms = body.get_canonical_global_tfms(joints)
    np.testing.assert_allclose(gtfms[:, :3, 3], joints, atol=1e-5)
    np.testing.assert_allclose(
        gtfms[:, :3, :3], np.broadcast_to(np.eye(3), (body.TOTAL_BONES, 3, 3)),
        atol=1e-6)

    # jnp FK on the same local transforms agrees
    parents = body.parent_index_array()
    local = np.zeros((body.TOTAL_BONES, 4, 4), np.float32)
    local[:, :3, :3] = np.eye(3)
    local[:, 3, 3] = 1
    local[0, :3, 3] = joints[0]
    local[1:, :3, 3] = joints[1:] - joints[parents[1:]]
    got = np.asarray(body.forward_kinematics(jnp.asarray(local)))
    np.testing.assert_allclose(got, gtfms, atol=1e-5)


def test_motion_bases_roundtrip(rng_np):
    """backward base maps observed points to canonical; forward undoes it."""
    B = body.TOTAL_BONES
    tpose = rng_np.normal(size=(B, 3)).astype(np.float32) * 0.3
    cnl = body.get_canonical_global_tfms(tpose)

    angles = (rng_np.normal(size=(B * 3,)) * 0.2).astype(np.float32)
    Rs, Ts = body.body_pose_to_body_RTs(angles, tpose)

    sR, T, sRf, Tf = body.motion_bases(
        jnp.asarray(Rs), jnp.asarray(Ts), jnp.asarray(cnl))
    # for each bone, forward(backward(x)) == x
    x = jnp.asarray(rng_np.normal(size=(B, 3)).astype(np.float32))
    bwd = jnp.einsum("bij,bj->bi", sR, x) + T
    fwd = jnp.einsum("bij,bj->bi", sRf, bwd) + Tf
    np.testing.assert_allclose(np.asarray(fwd), np.asarray(x), atol=1e-3)


def test_motion_bases_identity_pose(rng_np):
    """when the observed pose equals the canonical pose, bases are identity."""
    B = body.TOTAL_BONES
    tpose = rng_np.normal(size=(B, 3)).astype(np.float32) * 0.3
    cnl = body.get_canonical_global_tfms(tpose)
    Rs, Ts = body.body_pose_to_body_RTs(np.zeros(B * 3, np.float32), tpose)
    sR, T, _, _ = body.motion_bases(
        jnp.asarray(Rs), jnp.asarray(Ts), jnp.asarray(cnl))
    np.testing.assert_allclose(
        np.asarray(sR), np.broadcast_to(np.eye(3), (B, 3, 3)), atol=5e-3)
    np.testing.assert_allclose(np.asarray(T), np.zeros((B, 3)), atol=5e-3)


def test_gaussian_bone_volumes_normalized():
    joints = np.zeros((body.TOTAL_BONES, 3), np.float32)
    # simple vertical stack of joints
    joints[:, 1] = np.linspace(-0.6, 0.6, body.TOTAL_BONES)
    vols = body.approx_gaussian_bone_volumes(
        joints, np.array([-1, -1, -1.0]), np.array([1, 1, 1.0]), grid_size=16)
    assert vols.shape == (body.TOTAL_BONES + 1, 16, 16, 16)
    sums = vols.sum(axis=0)
    np.testing.assert_allclose(sums, np.ones_like(sums), atol=1e-4)
    assert np.all(vols >= 0)
