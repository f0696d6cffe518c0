"""Stage-3 sample-stream merge: jointly order background and human samples
along each ray and composite them together.

TPU-first reformulation of the reference's concat + torch.sort + double
fancy-gather (ref: 3rd_Complete_HOSNeRF/src/model/mipnerf360/model.py:
1524-1588): one `argsort` over the static 160-sample axis, payload gathered
with take_along_axis, and the human weight re-extraction done with the
*inverse permutation* (exact, order-preserving) instead of boolean
masking + reshape.

The fg/bg ray partition (model.py:1547-1551 boolean indexing) is replaced
by masked compositing over all rays (static shapes; see composed model).
"""

from __future__ import annotations

import jax.numpy as jnp


def z_along_ray(points: jnp.ndarray, rays_o: jnp.ndarray,
                rays_d: jnp.ndarray, thresh: float = 1e-5):
    """Recover per-sample z of world points along rays o + z*d.

    points [R, S, 3]; rays_o/rays_d [R, 3] -> z [R, S].

    Per-ray rule: average (p-o)/d over the coordinates where |d| > thresh,
    falling back to all coordinates when none qualify. The reference
    (model.py:1526-1545) averages all three when no tiny component exists
    anywhere in the batch, else uses the first valid coordinate for every
    ray; the per-ray masked mean is equivalent on clean batches and strictly
    better conditioned on degenerate ones (and batch-shape independent,
    which jit requires).
    """
    ratio = (points - rays_o[:, None, :]) / (rays_d[:, None, :] + 1e-10)
    valid = (jnp.abs(rays_d) > thresh).astype(points.dtype)  # [R, 3]
    denom = jnp.sum(valid, axis=-1)  # [R]
    all_bad = denom == 0
    w = jnp.where(all_bad[:, None], jnp.ones_like(valid), valid)
    denom = jnp.where(all_bad, 3.0, denom)
    return jnp.einsum("rsc,rc->rs", ratio, w) / denom[:, None]


def merge_sorted_streams(z_bkg: jnp.ndarray, out_bkg: jnp.ndarray,
                         z_hum: jnp.ndarray, out_hum: jnp.ndarray,
                         mask_hum: jnp.ndarray):
    """Merge two per-ray sample streams by depth.

    Args:
      z_bkg [R, Nb], out_bkg [R, Nb, 4] (activated rgb+sigma),
      z_hum [R, Nh], out_hum [R, Nh, 4], mask_hum [R, Nh] fg likelihood.
    Returns dict with sorted z/out/mask plus `inv_order` ([R, Nb+Nh]) mapping
    concat order -> sorted position, for exact weight re-extraction.
    """
    z = jnp.concatenate([z_bkg, z_hum], axis=-1)
    out = jnp.concatenate([out_bkg, out_hum], axis=-2)
    mask = jnp.concatenate(
        [jnp.ones_like(z_bkg), mask_hum], axis=-1)

    order = jnp.argsort(z, axis=-1)
    inv_order = jnp.argsort(order, axis=-1)

    z_sorted = jnp.take_along_axis(z, order, axis=-1)
    out_sorted = jnp.take_along_axis(out, order[..., None], axis=-2)
    mask_sorted = jnp.take_along_axis(mask, order, axis=-1)
    return {
        "z": z_sorted,
        "out": out_sorted,
        "mask": mask_sorted[..., None],
        "inv_order": inv_order,
        "num_bkg": z_bkg.shape[-1],
    }


def extract_human_weights(weights_sorted: jnp.ndarray, merged: dict):
    """Map compositing weights (sorted order) back to the human samples'
    original order. ref: model.py:1575,1588 (`human_pts_idx` gather)."""
    w_concat = jnp.take_along_axis(weights_sorted, merged["inv_order"],
                                   axis=-1)
    return w_concat[..., merged["num_bkg"]:]
