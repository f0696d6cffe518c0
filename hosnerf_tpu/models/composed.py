"""Stage-3 composition: merge scene and human-object samples per ray and
composite jointly.

TPU-first redesign of the reference's stage-3 hot path
(ref: 3rd_Complete_HOSNeRF/src/model/mipnerf360/model.py:1501-1629):
the fg/bg boolean ray partition (model.py:1547-1551) becomes masked
compositing over ALL rays — both the merged composite and the bkg-only
composite are computed dense and selected per ray with `where`, keeping
shapes static under jit. The human-sample weights needed by the flow loss
are recovered through the merge's inverse permutation (exact).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from hosnerf_tpu.core import render
from hosnerf_tpu.ops import merge

FG_THRESHOLD = 5e-3  # ref: model.py:1547 (`thre_fg`)


def to_homogeneous(pts: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)


def compose(scene_last_level: Dict[str, Any], human_out: Dict[str, Any],
            batch: Dict[str, Any], sortless: bool = True) -> Dict[str, Any]:
    """Compose the scene's last-level raw samples with the human model's raw
    samples.

    scene_last_level: ray_history[-1] from SceneField — rgb [R,Nb,3],
      density [R,Nb], tdist [R,Nb+1] (all on background rays).
    human_out: HumanObjectField outputs — human_rgb [R,Nh,3], human_density
      [R,Nh], newsmpl_pts [R,Nh,3], pts_mask [R,Nh].
    batch: needs rays_o_bkg, rays_d_bkg, newsmpl_to_scale_world [4,4].

    Returns rgb [R,3], acc, depth, human_weights [R,Nh], idx_fg [R].
    """
    rays_o = batch["rays_o_bkg"]
    rays_d = batch["rays_d_bkg"]

    # human samples -> scaled world (ref: model.py:1524)
    sw_pts = jnp.einsum(
        "ji,rsi->rsj", batch["newsmpl_to_scale_world"],
        to_homogeneous(human_out["newsmpl_pts"]))[..., :3]
    z_hum = merge.z_along_ray(sw_pts, rays_o, rays_d)

    pts_mask = human_out["pts_mask"]  # [R, Nh]
    idx_fg = jnp.sum(pts_mask, axis=-1) > FG_THRESHOLD

    z_bkg = scene_last_level["tdist"][..., :-1]
    out_bkg = jnp.concatenate(
        [scene_last_level["rgb"], scene_last_level["density"][..., None]],
        axis=-1)
    out_hum = jnp.concatenate(
        [human_out["human_rgb"], human_out["human_density"][..., None]],
        axis=-1)

    if sortless:
        # sort-free factorized compositing (exact; see ops/merge.py)
        rgb_fg, acc_fg, _, human_weights, depth_fg = \
            merge.sortless_composite(z_bkg, out_bkg, z_hum, out_hum,
                                     pts_mask, rays_d)
    else:
        merged = merge.merge_sorted_streams(
            z_bkg, out_bkg, z_hum, out_hum, pts_mask)
        rgb_fg, acc_fg, w_sorted, depth_fg = render.raw2outputs_joint(
            merged["out"], merged["z"], rays_d, merged["mask"])
        human_weights = merge.extract_human_weights(w_sorted, merged)

    # bkg-only composite (ref: model.py:1592-1594)
    rgb_bg, acc_bg, _, depth_bg = render.raw2outputs_joint(
        out_bkg, z_bkg, rays_d, jnp.ones_like(z_bkg)[..., None])

    fg = idx_fg[:, None]
    return {
        "rgb": jnp.where(fg, rgb_fg, rgb_bg),
        "acc": jnp.where(idx_fg, acc_fg, acc_bg),
        "depth": jnp.where(idx_fg, depth_fg, depth_bg),
        "human_weights": human_weights * fg,
        "idx_fg": idx_fg,
    }
