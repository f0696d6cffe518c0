"""Trilinear 3D volume sampling (the TPU equivalent of torch's
``F.grid_sample(..., mode='bilinear', padding_mode='zeros',
align_corners=True)`` on 5D inputs).

The reference calls grid_sample 26x per ray batch for inverse LBS
(ref: 2nd_State_Conditional_Human-Object/core/nets/human_nerf/network.py:
321-324) and once with all channels for forward LBS (network.py:370-374).
Here sampling is one batched gather expression that XLA vectorizes; the
volumes are tiny (27 x 32^3 floats ~ 3.5 MB) so they live comfortably in
VMEM once Pallas fusion lands (ops/pallas).

Conventions (matching torch):
  * volume [C, D, H, W];
  * coords [..., 3] hold (x, y, z) in [-1, 1], where x indexes W (last
    axis), y indexes H, z indexes D;
  * align_corners=True: pixel center i sits at coord 2*i/(S-1) - 1;
  * zeros padding: out-of-range taps contribute 0.
"""

from __future__ import annotations

import jax.numpy as jnp


def _gather_corners(vol: jnp.ndarray, iz, iy, ix):
    """vol [C, D, H, W]; integer index arrays [...]; returns [..., C]."""
    C, D, H, W = vol.shape
    flat = vol.reshape(C, -1)
    lin = (iz * H + iy) * W + ix
    return jnp.moveaxis(flat[:, lin], 0, -1)


def trilinear(vol: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample vol [C, D, H, W] at coords [..., 3] (xyz in [-1,1]) -> [..., C]."""
    C, D, H, W = vol.shape
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]

    # align_corners=True mapping to continuous voxel indices
    fx = (x + 1.0) * 0.5 * (W - 1)
    fy = (y + 1.0) * 0.5 * (H - 1)
    fz = (z + 1.0) * 0.5 * (D - 1)

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    z0 = jnp.floor(fz)
    tx = fx - x0
    ty = fy - y0
    tz = fz - z0

    out = None
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                cx = x0 + dx
                cy = y0 + dy
                cz = z0 + dz
                w = (jnp.where(dx, tx, 1.0 - tx)
                     * jnp.where(dy, ty, 1.0 - ty)
                     * jnp.where(dz, tz, 1.0 - tz))
                # zeros padding: taps outside the volume contribute 0
                valid = ((cx >= 0) & (cx <= W - 1) & (cy >= 0) & (cy <= H - 1)
                         & (cz >= 0) & (cz <= D - 1))
                ix = jnp.clip(cx, 0, W - 1).astype(jnp.int32)
                iy = jnp.clip(cy, 0, H - 1).astype(jnp.int32)
                iz = jnp.clip(cz, 0, D - 1).astype(jnp.int32)
                tap = _gather_corners(vol, iz, iy, ix)
                contrib = (w * valid)[..., None] * tap
                out = contrib if out is None else out + contrib
    return out


def trilinear_per_channel(vol: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample channel c of vol [C, D, H, W] at its OWN coords [C, ..., 3].

    Returns [C, ...]. This is the inverse-LBS access pattern: each bone has
    its own transformed position but reads only its own weight channel.
    Implemented as one fused gather over a flattened (channel, voxel) index
    space rather than a vmap of C separate samples.
    """
    C, D, H, W = vol.shape
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    fx = (x + 1.0) * 0.5 * (W - 1)
    fy = (y + 1.0) * 0.5 * (H - 1)
    fz = (z + 1.0) * 0.5 * (D - 1)
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    z0 = jnp.floor(fz)
    tx = fx - x0
    ty = fy - y0
    tz = fz - z0

    flat = vol.reshape(-1)  # [C*D*H*W]
    # per-channel base offset, broadcast over the coords' trailing dims
    cbase = (jnp.arange(C) * (D * H * W)).reshape(
        (C,) + (1,) * (coords.ndim - 2))

    out = None
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                cx = x0 + dx
                cy = y0 + dy
                cz = z0 + dz
                w = (jnp.where(dx, tx, 1.0 - tx)
                     * jnp.where(dy, ty, 1.0 - ty)
                     * jnp.where(dz, tz, 1.0 - tz))
                valid = ((cx >= 0) & (cx <= W - 1) & (cy >= 0) & (cy <= H - 1)
                         & (cz >= 0) & (cz <= D - 1))
                ix = jnp.clip(cx, 0, W - 1).astype(jnp.int32)
                iy = jnp.clip(cy, 0, H - 1).astype(jnp.int32)
                iz = jnp.clip(cz, 0, D - 1).astype(jnp.int32)
                lin = cbase + (iz * H + iy) * W + ix
                tap = flat[lin]
                contrib = w * valid * tap
                out = contrib if out is None else out + contrib
    return out
