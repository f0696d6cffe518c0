"""Inverse / forward linear blend skinning against a motion weight volume.

TPU-first reformulation of the reference's per-bone python loops
(ref: 2nd_State_Conditional_Human-Object/core/nets/human_nerf/network.py:
302-396): the 26 per-bone affine transforms become one batched einsum
(MXU work), and the 26 sequential grid_sample calls become one fused
per-channel trilinear gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hosnerf_tpu.ops import grid_sample

_PREC = jax.lax.Precision.HIGHEST


def normalize_coords(pos: jnp.ndarray, cnl_bbox_min_xyz: jnp.ndarray,
                     cnl_bbox_scale_xyz: jnp.ndarray) -> jnp.ndarray:
    """World -> [-1, 1] volume coords (ref: network.py:319-320)."""
    return (pos - cnl_bbox_min_xyz) * cnl_bbox_scale_xyz - 1.0


def inverse_lbs(pts: jnp.ndarray, motion_scale_Rs: jnp.ndarray,
                motion_Ts: jnp.ndarray, motion_weights_vol: jnp.ndarray,
                cnl_bbox_min_xyz: jnp.ndarray,
                cnl_bbox_scale_xyz: jnp.ndarray):
    """Warp observation points to canonical space.

    Args:
      pts: [N, 3] observation-space sample points.
      motion_scale_Rs: [B, 3, 3]; motion_Ts: [B, 3] backward bases.
      motion_weights_vol: [B+1, D, H, W] (last channel = background,
        dropped here exactly as the reference drops it, network.py:314).
    Returns:
      x_skel [N, 3], fg_likelihood_mask [N, 1], backwarp_weights [N, B].
    ref: network.py:302-353.
    """
    motion_weights = motion_weights_vol[:-1]  # [B, D, H, W]
    # all bones at once: [B, N, 3]
    pos = jnp.einsum("bij,nj->bni", motion_scale_Rs, pts,
                     precision=_PREC) + motion_Ts[:, None, :]
    coords = normalize_coords(pos, cnl_bbox_min_xyz, cnl_bbox_scale_xyz)
    weights = grid_sample.trilinear_per_channel(motion_weights, coords)  # [B, N]

    wsum = jnp.sum(weights, axis=0)  # [N]
    x_skel = jnp.einsum("bn,bni->ni", weights, pos,
                        precision=_PREC) / jnp.maximum(wsum, 1e-4)[:, None]
    fg_likelihood = wsum[:, None]
    return x_skel, fg_likelihood, weights.T


def forward_lbs(cnl_pts: jnp.ndarray, motion_scale_Rs_fwd: jnp.ndarray,
                motion_Ts_fwd: jnp.ndarray, motion_weights_vol: jnp.ndarray,
                cnl_bbox_min_xyz: jnp.ndarray,
                cnl_bbox_scale_xyz: jnp.ndarray):
    """Warp canonical points to observation space (cycle/flow branches).

    Weights are sampled ONCE at the canonical position for all channels.
    Returns x_deform [N, 3], fg_likelihood_fwd [N, 1].
    ref: network.py:355-396.
    """
    motion_weights = motion_weights_vol[:-1]  # [B, D, H, W]
    coords = normalize_coords(cnl_pts, cnl_bbox_min_xyz, cnl_bbox_scale_xyz)
    weights = grid_sample.trilinear(motion_weights, coords)  # [N, B]

    pos = jnp.einsum("bij,nj->bni", motion_scale_Rs_fwd, cnl_pts,
                     precision=_PREC) + motion_Ts_fwd[:, None, :]  # [B, N, 3]
    wsum = jnp.sum(weights, axis=-1)  # [N]
    x_deform = jnp.einsum("nb,bni->ni", weights, pos,
                          precision=_PREC) / jnp.maximum(wsum, 1e-4)[:, None]
    return x_deform, wsum[:, None]
