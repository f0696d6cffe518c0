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


def sortless_composite(z_bkg, out_bkg, z_hum, out_hum, mask_hum, rays_d):
    """Jointly composite two per-ray sample streams WITHOUT sorting.

    Key identity: the transmittance before a sample in the merged order is
    the product of the (1 - alpha + 1e-10) factors of all earlier samples,
    and that product FACTORIZES into own-stream exclusive prefix x
    other-stream cross terms — both computable with comparisons + masked
    log-sums (MXU-able einsums), no argsort, no gathers. Replaces the
    reference's concat+sort+double-gather
    (ref: 3rd.../src/model/mipnerf360/model.py:1565-1588) with the exact
    same math (tie order: bkg before human, matching the stable concat
    order [bkg, hum]).

    Inputs as in merge_sorted_streams; `out_*` carry activated rgb+sigma.
    Returns (rgb [R,3], acc [R], weights per stream, depth [R]).
    """
    norm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)  # [R, 1]
    inf = jnp.float32(1e10)

    def stream_dists(z_own, z_other, other_ties_after):
        """Merged-order interval width for each own sample: distance to the
        nearest later sample across BOTH streams (1e10 beyond the last)."""
        next_own = jnp.concatenate(
            [z_own[..., 1:], jnp.full_like(z_own[..., :1], inf)], -1)
        if other_ties_after:
            ahead = z_other[..., None, :] >= z_own[..., :, None]
        else:
            ahead = z_other[..., None, :] > z_own[..., :, None]
        next_other = jnp.min(
            jnp.where(ahead, z_other[..., None, :], inf), -1)
        return jnp.minimum(jnp.minimum(next_own, next_other) - z_own, inf)

    # bkg stream: ties with human count as 'human after bkg'
    dist_b = stream_dists(z_bkg, z_hum, other_ties_after=True)
    dist_h = stream_dists(z_hum, z_bkg, other_ties_after=False)

    alpha_b = 1.0 - jnp.exp(-out_bkg[..., 3] * dist_b * norm)
    alpha_h = (1.0 - jnp.exp(-out_hum[..., 3] * dist_h * norm)) * mask_hum

    # NOT `log(1 - alpha + 1e-10)`: XLA reassociates that into
    # `(1 + 1e-10) - alpha` == 0 at alpha == 1 (fp32 can't represent
    # 1+1e-10), giving log(0) = -inf under jit. max() is reassociation-proof
    # and identical at the singular point (the reference's +1e-10 floor,
    # network.py:289-291).
    log_b = jnp.log(jnp.maximum(1.0 - alpha_b, 1e-10))
    log_h = jnp.log(jnp.maximum(1.0 - alpha_h, 1e-10))

    def excl_prefix(x):
        c = jnp.cumsum(x, -1)
        return jnp.concatenate([jnp.zeros_like(c[..., :1]), c[..., :-1]], -1)

    # cross terms: sum of the other stream's log factors strictly-before
    # (with the same tie rule)
    before_h_for_b = z_hum[..., None, :] < z_bkg[..., :, None]  # strict
    before_b_for_h = z_bkg[..., None, :] <= z_hum[..., :, None]  # ties incl.

    cross_b = jnp.einsum("rij,rj->ri", before_h_for_b.astype(log_h.dtype),
                         log_h)
    cross_h = jnp.einsum("rij,rj->ri", before_b_for_h.astype(log_b.dtype),
                         log_b)

    T_b = jnp.exp(excl_prefix(log_b) + cross_b)
    T_h = jnp.exp(excl_prefix(log_h) + cross_h)
    w_b = alpha_b * T_b
    w_h = alpha_h * T_h

    rgb = (jnp.einsum("ri,ric->rc", w_b, out_bkg[..., :3])
           + jnp.einsum("ri,ric->rc", w_h, out_hum[..., :3]))
    acc = jnp.sum(w_b, -1) + jnp.sum(w_h, -1)
    depth = jnp.sum(w_b * z_bkg, -1) + jnp.sum(w_h * z_hum, -1)
    return rgb, acc, w_b, w_h, depth


def extract_human_weights(weights_sorted: jnp.ndarray, merged: dict):
    """Map compositing weights (sorted order) back to the human samples'
    original order. ref: model.py:1575,1588 (`human_pts_idx` gather)."""
    w_concat = jnp.take_along_axis(weights_sorted, merged["inv_order"],
                                   axis=-1)
    return w_concat[..., merged["num_bkg"]:]
