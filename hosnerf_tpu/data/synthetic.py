"""Synthetic mini-scenes for tests, smoke training and benchmarking.

The reference has no test fixtures at all (SURVEY.md §4); these provide the
'fabricated mini-dataset' the rebuild uses to exercise every stage without
the real capture data.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _color_field(pts: np.ndarray) -> np.ndarray:
    """A smooth analytic RGB field: position-dependent sinusoids."""
    return 0.5 + 0.5 * np.sin(pts * np.array([1.3, 2.1, 0.7]) +
                              np.array([0.0, 1.0, 2.0]))


def human_batch(n_patches: int = 2, patch_size: int = 8, seed: int = 0,
                time: float = 0.5, grid_size: int = 16,
                total_bones: int = 26) -> Dict[str, np.ndarray]:
    """A fabricated stage-2 training item: synthetic skeleton, bone-volume
    priors, camera rays around the subject, dense target patches.

    Key layout follows the reference per-frame train item
    (ref: 2nd_State_Conditional_Human-Object/core/data/human_nerf/
    train.py:460-660), with dense static-shape patches.
    """
    from hosnerf_tpu.core import body

    rng = np.random.default_rng(seed)
    R = n_patches * patch_size * patch_size

    # synthetic standing skeleton roughly inside [-0.5, 0.5]^3
    tpose = np.zeros((total_bones, 3), np.float32)
    parents = body.parent_index_array(total_bones)
    for j in range(1, total_bones):
        tpose[j] = tpose[parents[j]] + rng.normal(scale=0.08, size=3)
    tpose = np.clip(tpose, -0.45, 0.45).astype(np.float32)

    bbox_offset = 0.3
    bbox_min = tpose.min(0) - bbox_offset
    bbox_max = tpose.max(0) + bbox_offset
    bbox_scale = 2.0 / (bbox_max - bbox_min)

    cnl_gtfms = body.get_canonical_global_tfms(tpose)
    priors = body.approx_gaussian_bone_volumes(
        tpose, bbox_min, bbox_max, grid_size=grid_size)

    def pose_arrays(scale):
        angles = (rng.normal(scale=scale, size=(total_bones * 3,))
                  .astype(np.float32))
        Rs, Ts = body.body_pose_to_body_RTs(angles, tpose)
        posevec = angles[3:]  # non-root joints, 75-d
        return Rs, Ts, posevec

    dst_Rs, dst_Ts, posevec = pose_arrays(0.1)
    dst_Rs_p, dst_Ts_p, posevec_p = pose_arrays(0.1)

    # camera at z=-3 looking toward +z
    cam = np.array([0.0, 0.0, -3.0], np.float32)
    px = rng.uniform(-0.3, 0.3, size=(R, 2)).astype(np.float32)
    d = np.concatenate([px, np.ones((R, 1), np.float32)], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    return {
        "rays_o": np.broadcast_to(cam, (R, 3)).copy(),
        "rays_d": d,
        "near": np.full((R, 1), 2.2, np.float32),
        "far": np.full((R, 1), 3.8, np.float32),
        "dst_Rs": dst_Rs, "dst_Ts": dst_Ts,
        "dst_posevec": posevec,
        "dst_Rs_prev": dst_Rs_p, "dst_Ts_prev": dst_Ts_p,
        "dst_posevec_prev": posevec_p,
        "cnl_gtfms": cnl_gtfms,
        "motion_weights_priors": priors,
        "cnl_bbox_min_xyz": bbox_min.astype(np.float32),
        "cnl_bbox_scale_xyz": bbox_scale.astype(np.float32),
        "bgcolor": np.array([255.0, 255.0, 255.0], np.float32),
        "time": np.float32(time),
        "target_patches": rng.uniform(
            0, 1, (n_patches, patch_size, patch_size, 3)).astype(np.float32),
        "patch_masks": np.ones((n_patches, patch_size, patch_size),
                               np.float32),
        "ray_grid": np.concatenate([
            rng.uniform(0, 64, (R, 2)),
            rng.normal(scale=1.0, size=(R, 2)),
            np.ones((R, 1))], -1).astype(np.float32),
        "newsmpl_to_camera_prev": np.eye(4, dtype=np.float32),
        "intrinsics_prev": np.array(
            [[64.0, 0, 32], [0, 64.0, 32], [0, 0, 1]], np.float32),
    }


def composed_batch(n_patches: int = 2, patch_size: int = 8, seed: int = 0,
                   time: float = 0.5, grid_size: int = 16) -> Dict[str, np.ndarray]:
    """A fabricated stage-3 training item: the human item plus background
    rays for the same pixels in scaled-world coordinates
    (ref: 3rd_Complete_HOSNeRF/core/data/human_nerf/train.py:511-548)."""
    b = human_batch(n_patches, patch_size, seed=seed, time=time,
                    grid_size=grid_size)
    R = b["rays_o"].shape[0]
    # identity smpl->scale-world keeps the two coordinate systems aligned,
    # so background rays reuse the human rays
    b["newsmpl_to_scale_world"] = np.eye(4, dtype=np.float32)
    b["rays_o_bkg"] = b["rays_o"].copy()
    b["rays_d_bkg"] = b["rays_d"].copy()
    b["viewdirs_bkg"] = b["rays_d"].copy()
    b["radii"] = np.full((R, 1), 0.002, np.float32)
    return b


def scene_ray_batch(n_rays: int, seed: int = 0,
                    time: float = 0.0) -> Dict[str, np.ndarray]:
    """Random rays through a synthetic blob scene, with targets rendered
    analytically (two solid-color gaussian blobs over a white background).

    Batch layout matches the stage-1 loader output
    (ref: 1st_State-Conditional_Scene/src/data/interface.py:407-453):
    rays_o/rays_d/viewdirs [N,3], radii [N,1], times [N], target [N,3].
    """
    rng = np.random.default_rng(seed)
    # cameras on a ring looking at the origin
    theta = rng.uniform(0, 2 * np.pi, n_rays)
    cam = np.stack([3.0 * np.cos(theta), 3.0 * np.sin(theta),
                    rng.uniform(-0.5, 0.5, n_rays)], -1)
    # rays aimed near the origin with jitter
    aim = rng.normal(scale=0.4, size=(n_rays, 3))
    d = aim - cam
    viewdirs = d / np.linalg.norm(d, axis=-1, keepdims=True)

    blobs = np.array([[0.5, 0.0, 0.0], [-0.4, 0.3, 0.1]])
    blob_rgb = np.array([[0.9, 0.2, 0.1], [0.1, 0.3, 0.8]])
    sigma = 0.25

    # analytic-ish target: march a fine fixed grid (ground truth render)
    ts = np.linspace(0.5, 6.0, 96)
    pts = cam[:, None, :] + viewdirs[:, None, :] * ts[None, :, None]
    dens = np.zeros(pts.shape[:2])
    rgb = np.zeros(pts.shape)
    for b, c in zip(blobs, blob_rgb):
        g = np.exp(-np.sum((pts - b) ** 2, -1) / (2 * sigma**2)) * 8.0
        dens += g
        rgb += g[..., None] * c
    rgb = rgb / np.maximum(dens[..., None], 1e-8)
    dt = ts[1] - ts[0]
    alpha = 1.0 - np.exp(-dens * dt)
    trans = np.cumprod(np.concatenate(
        [np.ones((n_rays, 1)), 1.0 - alpha + 1e-10], -1), -1)[:, :-1]
    w = alpha * trans
    target = (w[..., None] * rgb).sum(1) + (1 - w.sum(1))[:, None]  # white bg

    return {
        "rays_o": cam.astype(np.float32),
        "rays_d": viewdirs.astype(np.float32),
        "viewdirs": viewdirs.astype(np.float32),
        "radii": np.full((n_rays, 1), 0.002, np.float32),
        "times": np.full((n_rays,), time, np.float32),
        "target": target.astype(np.float32),
    }
