"""Volumetric rendering / alpha-compositing primitives.

Covers both the scene-side compositing
(ref: 1st_State-Conditional_Scene/src/model/mipnerf360/helper.py:198-238)
and the human-side masked compositing
(ref: 2nd_State_Conditional_Human-Object/core/nets/human_nerf/network.py:273-299,
 3rd_Complete_HOSNeRF/src/model/mipnerf360/model.py:73-99).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_alpha_weights(density, tdist, dirs, opaque_background=False):
    """Convert densities over intervals to compositing weights.

    ref: helper.py:198-224. Returns (weights, alpha, trans).
    """
    t_delta = tdist[..., 1:] - tdist[..., :-1]
    delta = t_delta * jnp.linalg.norm(dirs[..., None, :], axis=-1)
    density_delta = density * delta

    if opaque_background:
        density_delta = jnp.concatenate(
            [density_delta[..., :-1],
             jnp.full_like(density_delta[..., -1:], 1e10)], axis=-1)

    alpha = 1.0 - jnp.exp(-density_delta)
    trans = jnp.exp(-jnp.concatenate(
        [jnp.zeros_like(density_delta[..., :1]),
         jnp.cumsum(density_delta[..., :-1], axis=-1)], axis=-1))
    weights = alpha * trans
    return weights, alpha, trans


def volumetric_rendering(rgbs, weights, bg_rgbs):
    """Composite per-sample rgbs with weights over a background color.

    ref: helper.py:228-238 (only 'rgb' is produced there too).
    """
    acc = jnp.sum(weights, axis=-1)
    bg_w = jnp.maximum(1.0 - acc[..., None], 0.0)
    rgb = jnp.sum(weights[..., None] * rgbs, axis=-2) + bg_w * bg_rgbs
    return {"rgb": rgb, "acc": acc}


def raw2outputs(raw, raw_mask, z_vals, rays_d, bgcolor,
                rgb_activation=jax.nn.sigmoid, density_activation=jax.nn.relu):
    """HumanNeRF-style compositing of raw (rgb, sigma) masked by fg likelihood.

    `raw` is [..., S, 4]; `raw_mask` [..., S, 1]; `z_vals` [..., S];
    `bgcolor` is an rgb triple in [0, 255].
    ref: 2nd.../core/nets/human_nerf/network.py:273-299.
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1)
    dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)

    rgb = rgb_activation(raw[..., :3])
    alpha = 1.0 - jnp.exp(-density_activation(raw[..., 3]) * dists)
    alpha = alpha * raw_mask[..., 0]

    trans = jnp.cumprod(
        jnp.concatenate(
            [jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], axis=-1),
        axis=-1)[..., :-1]
    weights = alpha * trans
    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    rgb_map = rgb_map + (1.0 - acc_map[..., None]) * bgcolor / 255.0
    return rgb_map, acc_map, weights, depth_map


def raw2outputs_joint(raw, z_vals, rays_d, pts_mask=None, bgcolor=None):
    """Stage-3 joint compositing over pre-activated (rgb, sigma) samples.

    Unlike :func:`raw2outputs`, rgb and density in `raw` are already
    activated (sigmoid rgb / relu density from each source model).
    ref: 3rd.../src/model/mipnerf360/model.py:73-99.
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1)
    dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)

    rgb = raw[..., :3]
    alpha = 1.0 - jnp.exp(-raw[..., 3] * dists)
    if pts_mask is not None:
        alpha = alpha * pts_mask[..., 0]

    trans = jnp.cumprod(
        jnp.concatenate(
            [jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], axis=-1),
        axis=-1)[..., :-1]
    weights = alpha * trans
    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    if bgcolor is not None:
        rgb_map = rgb_map + (1.0 - acc_map[..., None]) * bgcolor / 255.0
    return rgb_map, acc_map, weights, depth_map
