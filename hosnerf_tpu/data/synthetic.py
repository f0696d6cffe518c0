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


def write_mini_dataset(path: str, n_frames: int = 8, res: int = 48,
                       n_transitions: int = 1, seed: int = 0) -> str:
    """Fabricate an on-disk mini-dataset with the reference's exact layout
    (images/, masks/, images_flow/, canonical_joints.pkl, mesh_infos.pkl,
    cameras.pkl, poses_bounds.npy, transitions_times.json) so the real
    loaders and all three training stages can be exercised end-to-end
    without capture data (SURVEY.md §4 test strategy)."""
    import json
    import os
    import pickle

    import cv2

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(path, "images"), exist_ok=True)
    os.makedirs(os.path.join(path, "masks"), exist_ok=True)
    os.makedirs(os.path.join(path, "images_flow"), exist_ok=True)

    # --- skeleton: 24 SMPL joints in a rough standing pose. The x/z
    # spread must roughly match the painted subject blob's world extent
    # (~0.5 units at the orbit radius): with a near-degenerate "stick"
    # skeleton, rays through most subject pixels miss every bone volume,
    # the fg-likelihood mask is ~0, and stage-2 training has no gradient
    # path to the images (measured: loss flat to 5 decimal places even
    # at 100x LR) ---
    joints = np.zeros((24, 3), np.float32)
    joints[:, 1] = np.linspace(-0.8, 0.6, 24)
    joints[:, 0] = rng.normal(scale=0.25, size=24)
    joints[:, 2] = rng.normal(scale=0.25, size=24)

    with open(os.path.join(path, "canonical_joints.pkl"), "wb") as f:
        pickle.dump({"joints": joints}, f)

    focal = 1.2 * res
    K = np.array([[focal, 0, res / 2], [0, focal, res / 2], [0, 0, 1]],
                 np.float64)

    mesh_infos, cameras = {}, {}
    poses_bounds = np.zeros((n_frames, 17), np.float64)
    frame_names = [f"frame_{i:06d}" for i in range(n_frames)]
    from hosnerf_tpu.data.cameras import get_camrot
    parents24 = np.array(
        [0, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16,
         17, 18, 19, 20, 21])
    for i, fn in enumerate(frame_names):
        # camera orbiting the subject
        th = 2 * np.pi * i / n_frames * 0.2
        campos = np.array([2.5 * np.sin(th), 0.0, -2.5 * np.cos(th)])
        Rm = get_camrot(campos.astype(np.float32),
                        np.zeros(3, np.float32)).astype(np.float64)
        E = np.eye(4)
        E[:3, :3] = Rm
        E[:3, 3] = -Rm @ campos

        # image: colored gradient background + a solid-color subject
        # painted ALONG THE PROJECTED SKELETON, so subject pixels are
        # exactly where rays pass near bone volumes and the human model
        # can actually fit the data (a centered blob unrelated to the
        # skeleton gives a no-gradient loss floor — see the joints
        # comment above); mask = painted subject
        yy, xx = np.mgrid[0:res, 0:res]
        img = np.stack([xx / res, yy / res, np.full_like(xx, 0.5,
                                                         dtype=float)], -1)
        blob = np.zeros((res, res), bool)
        rad = max(2, res // 14)
        for j in range(24):
            for t in np.linspace(0.0, 1.0, 6):
                p3 = joints[j] * (1 - t) + joints[parents24[j]] * t
                cam = Rm @ p3 + E[:3, 3]
                if cam[2] <= 1e-3:
                    continue
                pix = K @ (cam / cam[2])
                cx, cy = int(round(pix[0])), int(round(pix[1]))
                blob |= ((xx - cx) ** 2 + (yy - cy) ** 2) < rad ** 2
        img[blob] = [0.9, 0.3, 0.2]
        cv2.imwrite(os.path.join(path, "images", fn + ".png"),
                    cv2.cvtColor((img * 255).astype(np.uint8),
                                 cv2.COLOR_RGB2BGR))
        cv2.imwrite(os.path.join(path, "masks", fn + ".png"),
                    (blob * 255).astype(np.uint8))
        np.savez(os.path.join(path, "images_flow", fn + "_bwd.npz"),
                 flow=rng.normal(scale=0.5, size=(res, res, 2)).astype(
                     np.float32),
                 mask=np.ones((res, res), bool))
        cameras[fn] = {
            "intrinsics": K.astype(np.float32),
            "smpl_to_camera": E.astype(np.float32),
            "smpl_to_world": np.eye(4, dtype=np.float32),
        }
        mesh_infos[fn] = {
            "poses": rng.normal(scale=0.05, size=72).astype(np.float32),
            "tpose_joints": joints,
            "joints": joints + rng.normal(scale=0.01, size=joints.shape
                                          ).astype(np.float32),
            "Rh": rng.normal(scale=0.02, size=3).astype(np.float32),
            "Th": rng.normal(scale=0.02, size=3).astype(np.float32),
        }
        # poses_bounds row: 3x5 [R|t|hwf] + near/far in LLFF layout. The
        # loader maps stored cols [s0 s1 s2] -> opencv cols [s1, s0, -s2]
        # (two column shuffles, nerf_360_v2.py:385-388), so store the
        # inverse mapping: [cv1, cv0, -cv2].
        c2w = np.linalg.inv(E)
        stored = np.stack(
            [c2w[:3, 1], c2w[:3, 0], -c2w[:3, 2], c2w[:3, 3]], axis=1)
        hwf = np.array([[res], [res], [focal]])
        poses_bounds[i, :15] = np.concatenate([stored, hwf], 1).reshape(-1)
        poses_bounds[i, 15:] = [0.5, 10.0]

    np.save(os.path.join(path, "poses_bounds.npy"), poses_bounds)
    with open(os.path.join(path, "mesh_infos.pkl"), "wb") as f:
        pickle.dump(mesh_infos, f)
    with open(os.path.join(path, "cameras.pkl"), "wb") as f:
        pickle.dump(cameras, f)
    if n_transitions > 0:
        tt = {frame_names[(k + 1) * n_frames // (n_transitions + 1)]:
              {"time": float((k + 1) / (n_transitions + 1))}
              for k in range(n_transitions)}
        with open(os.path.join(path, "transitions_times.json"), "w") as f:
            json.dump(tt, f)
    return path


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
