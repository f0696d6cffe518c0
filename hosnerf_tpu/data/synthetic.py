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
