"""Skeleton / kinematics math for the human-object model.

26-joint skeleton = 24 SMPL joints + two object joints
(ref: 2nd_State_Conditional_Human-Object/core/utils/body_util.py:14-58).

Device-side pieces (jnp):
  * batched Rodrigues formula (ref: core/utils/network_util.py:66-92)
  * forward kinematics over the (topologically ordered) parent chain and the
    backward/forward motion bases (ref: network_util.py:106-174). The 4x4
    inverses use the closed-form rigid inverse [R|t]^-1 = [R^T | -R^T t]
    instead of a general LU solve — all transforms here are rigid.

Host-side pieces (numpy, data pipeline):
  * pose -> per-bone local (R, T) (ref: body_util.py:233-259)
  * canonical global transforms (ref: body_util.py:262-282)
  * approximate gaussian bone volumes (ref: body_util.py:285-368), vectorized
    over the voxel grid instead of per-bone python loops.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

SMPL_JOINT_IDX = {
    "pelvis_root": 0, "left_hip": 1, "right_hip": 2, "belly_button": 3,
    "left_knee": 4, "right_knee": 5, "lower_chest": 6, "left_ankle": 7,
    "right_ankle": 8, "upper_chest": 9, "left_toe": 10, "right_toe": 11,
    "neck": 12, "left_clavicle": 13, "right_clavicle": 14, "head": 15,
    "left_shoulder": 16, "right_shoulder": 17, "left_elbow": 18,
    "right_elbow": 19, "left_wrist": 20, "right_wrist": 21,
    "left_thumb": 22, "right_thumb": 23, "object_right": 24, "object_left": 25,
}

# parent[i] for joint i >= 1; joint 0 is the root. Topologically ordered for
# human joints; note the object joints hang off the thumbs (24<-23, 25<-22).
SMPL_PARENT = {
    1: 0, 2: 0, 3: 0, 4: 1, 5: 2, 6: 3, 7: 4, 8: 5, 9: 6, 10: 7,
    11: 8, 12: 9, 13: 9, 14: 9, 15: 12, 16: 13, 17: 14, 18: 16, 19: 17,
    20: 18, 21: 19, 22: 20, 23: 21, 24: 23, 25: 22,
}
TOTAL_BONES = 26

TORSO_JOINTS = [
    SMPL_JOINT_IDX[n] for n in
    ["pelvis_root", "belly_button", "lower_chest", "upper_chest",
     "left_clavicle", "right_clavicle"]
]
BONE_STDS = np.array([0.03, 0.06, 0.03])
HEAD_STDS = np.array([0.06, 0.06, 0.06])
RIGHT_OBJECT_STDS = np.array([0.06, 0.06, 0.06])
LEFT_OBJECT_STDS = np.array([0.06, 0.06, 0.06])
JOINT_STDS = np.array([0.02, 0.02, 0.02])


def parent_index_array(total_bones: int = TOTAL_BONES) -> np.ndarray:
    """parents[i] = parent of joint i (parents[0] = 0)."""
    parents = np.zeros(total_bones, dtype=np.int32)
    for child, parent in SMPL_PARENT.items():
        if child < total_bones:
            parents[child] = parent
    return parents


# ---------------------------------------------------------------------------
# Device-side (jnp)
# ---------------------------------------------------------------------------

def rodrigues(rvec: jnp.ndarray) -> jnp.ndarray:
    """Batched Rodrigues formula: [..., 3] axis-angle -> [..., 3, 3].

    Matches the reference's epsilon-regularized form
    (ref: network_util.py:66-92: theta = sqrt(1e-5 + |rvec|^2)).
    """
    theta = jnp.sqrt(1e-5 + jnp.sum(rvec**2, axis=-1))
    r = rvec / theta[..., None]
    cos = jnp.cos(theta)
    sin = jnp.sin(theta)
    rx, ry, rz = r[..., 0], r[..., 1], r[..., 2]
    one_c = 1.0 - cos
    rows = [
        rx * rx + (1.0 - rx * rx) * cos,
        rx * ry * one_c - rz * sin,
        rx * rz * one_c + ry * sin,
        rx * ry * one_c + rz * sin,
        ry * ry + (1.0 - ry * ry) * cos,
        ry * rz * one_c - rx * sin,
        rx * rz * one_c - ry * sin,
        ry * rz * one_c + rx * sin,
        rz * rz + (1.0 - rz * rz) * cos,
    ]
    return jnp.stack(rows, axis=-1).reshape(rvec.shape[:-1] + (3, 3))


# Small 3x3/4x4 geometry matmuls must not run at TPU-default bf16 precision:
# FK chains compound the error over ~9 links. HIGHEST costs nothing at this
# size.
_PREC = jax.lax.Precision.HIGHEST


def rigid_inverse(G: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of rigid 4x4 transforms [..., 4, 4].

    Assumes the rotation block is orthonormal — use `affine_inverse` when
    it may not be (see motion_bases)."""
    R = G[..., :3, :3]
    t = G[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    new_t = -jnp.einsum("...ij,...j->...i", Rt, t, precision=_PREC)
    top = jnp.concatenate([Rt, new_t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], G.dtype), G.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def affine_inverse(G: jnp.ndarray) -> jnp.ndarray:
    """Exact closed-form inverse of affine 4x4 transforms [..., 4, 4]
    (general invertible 3x3 block, via the adjugate — no LU, batches and
    vectorizes trivially on TPU).

    Why not `rigid_inverse`: the reference's Rodrigues
    (body_util.py:210-228, mirrored in `_rvec_to_rmtx_np`) normalizes the
    axis as rvec/(theta + 1e-5), so its "rotations" are systematically
    ~1e-4 NON-orthonormal at small angles. The reference inverts the FK
    chain with torch.inverse (network_util.py:160), which is exact for
    those; transposing instead inherits the 1e-4 error into the bone
    transforms, which the canonical MLP's 2^9 positional-encoding band
    amplifies to ~1e-2 density drift (measured via the end-to-end golden,
    tests/test_human_golden_weights.py)."""
    R = G[..., :3, :3]
    t = G[..., :3, 3]
    # adjugate^T rows = cross products of R's columns
    c0, c1, c2 = R[..., :, 0], R[..., :, 1], R[..., :, 2]
    adj = jnp.stack([jnp.cross(c1, c2), jnp.cross(c2, c0),
                     jnp.cross(c0, c1)], axis=-2)      # [..., 3, 3]
    det = jnp.sum(c0 * jnp.cross(c1, c2), axis=-1)[..., None, None]
    Rinv = adj / det
    new_t = -jnp.einsum("...ij,...j->...i", Rinv, t, precision=_PREC)
    top = jnp.concatenate([Rinv, new_t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], G.dtype), G.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def construct_G(R: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """Assemble [..., 4, 4] from rotation [..., 3, 3] and translation [..., 3]."""
    top = jnp.concatenate([R, T[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], R.dtype), R.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def forward_kinematics(local_Gs: jnp.ndarray,
                       total_bones: int = TOTAL_BONES) -> jnp.ndarray:
    """Compose local per-bone transforms along the parent chain.

    local_Gs: [..., total_bones, 4, 4] -> global transforms, same shape.
    The parent table is static, so the chain unrolls into `total_bones - 1`
    tiny matmuls at trace time (no dynamic gather needed).
    ref: network_util.py:145-152.
    """
    parents = parent_index_array(total_bones)
    gtfms = [local_Gs[..., 0, :, :]]
    for i in range(1, total_bones):
        gtfms.append(jnp.matmul(gtfms[parents[i]], local_Gs[..., i, :, :],
                                precision=_PREC))
    return jnp.stack(gtfms, axis=-3)


def motion_bases(dst_Rs: jnp.ndarray, dst_Ts: jnp.ndarray,
                 cnl_gtfms: jnp.ndarray):
    """Backward (canonical <- observation) and forward (observation <-
    canonical) per-bone affine bases.

    dst_Rs: [..., B, 3, 3]; dst_Ts: [..., B, 3]; cnl_gtfms: [..., B, 4, 4].
    Returns (scale_Rs, Ts, scale_Rs_fwd, Ts_fwd).
    ref: network_util.py:134-174 (torch.inverse replaced by the closed-form
    adjugate affine inverse — exact for the reference's ~1e-4
    non-orthonormal Rodrigues rotations, see `affine_inverse`).
    """
    local_Gs = construct_G(dst_Rs, dst_Ts)
    dst_gtfms = forward_kinematics(local_Gs, local_Gs.shape[-3])

    f_mtx = jnp.matmul(cnl_gtfms, affine_inverse(dst_gtfms), precision=_PREC)
    scale_Rs = f_mtx[..., :3, :3]
    Ts = f_mtx[..., :3, 3]

    f_fwd = jnp.matmul(dst_gtfms, affine_inverse(cnl_gtfms), precision=_PREC)
    scale_Rs_fwd = f_fwd[..., :3, :3]
    Ts_fwd = f_fwd[..., :3, 3]
    return scale_Rs, Ts, scale_Rs_fwd, Ts_fwd


# ---------------------------------------------------------------------------
# Host-side (numpy) — data-pipeline helpers
# ---------------------------------------------------------------------------

def _rvec_to_rmtx_np(rvec: np.ndarray) -> np.ndarray:
    """Rodrigues on a single (3,) vector, numpy. ref: body_util.py:210-228."""
    theta = np.linalg.norm(rvec)
    r = (rvec / (theta + 1e-5)).reshape(3)
    K = np.array([[0, -r[2], r[1]], [r[2], 0, -r[0]], [-r[1], r[0], 0]])
    return (np.cos(theta) * np.eye(3) + np.sin(theta) * K
            + (1 - np.cos(theta)) * np.outer(r, r)).astype(np.float32)


def body_pose_to_body_RTs(jangles: np.ndarray, tpose_joints: np.ndarray):
    """Joint angles [(J*3,)] + tpose joints [J, 3] -> per-bone local (R, T).

    ref: body_util.py:233-259.
    """
    jangles = jangles.reshape(-1, 3)
    total = jangles.shape[0]
    parents = parent_index_array(total)
    Rs = np.stack([_rvec_to_rmtx_np(jangles[i]) for i in range(total)], 0)
    Ts = tpose_joints - tpose_joints[parents]
    Ts[0] = tpose_joints[0]
    return Rs.astype(np.float32), Ts.astype(np.float32)


def get_canonical_global_tfms(canonical_joints: np.ndarray) -> np.ndarray:
    """Canonical joints [J, 3] -> global 4x4 transforms [J, 4, 4].

    ref: body_util.py:262-282.
    """
    total = canonical_joints.shape[0]
    parents = parent_index_array(total)
    gtfms = np.zeros((total, 4, 4), dtype=np.float32)
    gtfms[:, :3, :3] = np.eye(3)
    gtfms[:, 3, 3] = 1.0
    gtfms[0, :3, 3] = canonical_joints[0]
    for i in range(1, total):
        local = np.eye(4, dtype=np.float32)
        local[:3, 3] = canonical_joints[i] - canonical_joints[parents[i]]
        gtfms[i] = gtfms[parents[i]] @ local
    return gtfms


def _rotation_between_np(v1: np.ndarray, v2: np.ndarray) -> np.ndarray:
    """Rotation matrix sending direction v1 to v2. ref: body_util.py:96-126."""
    v1 = v1 / max(np.linalg.norm(v1), 1e-5)
    v2 = v2 / max(np.linalg.norm(v2), 1e-5)
    n = np.cross(v1, v2)
    c = float(v1 @ v2)
    K = np.array([[0, -n[2], n[1]], [n[2], 0, -n[0]], [-n[1], n[0], 0]])
    return (np.eye(3) + K + K @ K * (1.0 / (1.0 + c))).astype(np.float32)


def approx_gaussian_bone_volumes(tpose_joints: np.ndarray,
                                 bbox_min_xyz: np.ndarray,
                                 bbox_max_xyz: np.ndarray,
                                 grid_size: int = 32) -> np.ndarray:
    """Analytic per-bone gaussian prior volumes, [J+1, G, G, G].

    Volume axes are (z, y, x) to match the trilinear lookup convention used
    by the LBS weight sampling (the reference feeds F.grid_sample with
    xyz-order coordinates over a zyx-layout volume).
    ref: body_util.py:285-368.
    """
    total_joints = tpose_joints.shape[0]
    tpose_joints = tpose_joints.astype(np.float32)
    parents = parent_index_array(total_joints)

    # Voxel center grid, shaped [G, G, G, 3] with axes (z, y, x) and
    # channels (x, y, z).
    zs = np.linspace(bbox_min_xyz[2], bbox_max_xyz[2], grid_size)
    ys = np.linspace(bbox_min_xyz[1], bbox_max_xyz[1], grid_size)
    xs = np.linspace(bbox_min_xyz[0], bbox_max_xyz[0], grid_size)
    zg, yg, xg = np.meshgrid(zs, ys, xs, indexing="ij")
    grid = np.stack([xg, yg, zg], axis=-1)  # [G,G,G,3] xyz channels

    def gaussian(center, S, R):
        sigma = R @ S @ S @ R.T
        d = grid - center
        dist = np.einsum("abci,ij,abcj->abc", d, sigma, d)
        return np.exp(-dist)

    calibrated = np.array([0.0, 1.0, 0.0], dtype=np.float32)
    children_of = {j: [c for c in range(1, total_joints) if parents[c] == j]
                   for j in range(total_joints)}

    g_volumes = []
    for j in range(total_joints):
        vol = np.zeros((grid_size,) * 3, dtype=np.float32)
        children = children_of[j]
        if children:
            for child in children:
                stds = BONE_STDS * 2.0
                S = np.diag(1.0 / stds).astype(np.float32)
                if j in TORSO_JOINTS:
                    S[0, 0] /= 1.5
                    S[2, 2] /= 1.5
                start, end = tpose_joints[j], tpose_joints[child]
                R = _rotation_between_np(calibrated, end - start)
                vol = vol + gaussian((start + end) / 2.0, S, R)
        else:
            if j == SMPL_JOINT_IDX["head"]:
                stds = HEAD_STDS
            elif j == SMPL_JOINT_IDX["object_right"]:
                stds = RIGHT_OBJECT_STDS
            elif j == SMPL_JOINT_IDX["object_left"]:
                stds = LEFT_OBJECT_STDS
            else:
                stds = JOINT_STDS
            S = np.diag(1.0 / (stds * 2.0)).astype(np.float32)
            vol = gaussian(tpose_joints[j], S, np.eye(3, dtype=np.float32))
        g_volumes.append(vol.astype(np.float32))

    g_volumes = np.stack(g_volumes, axis=0)
    bg = 1.0 - np.clip(np.sum(g_volumes, axis=0, keepdims=True), 0.0, 1.0)
    g_volumes = np.concatenate([g_volumes, bg], axis=0)
    return g_volumes / np.clip(np.sum(g_volumes, axis=0, keepdims=True),
                               0.001, None)
