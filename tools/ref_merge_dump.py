"""Run the REFERENCE stage-3 sample-merge + compositing on fabricated
per-ray streams and dump the results, for the stage-3 composition golden
(tests/test_stage3_merge_golden.py).

The merge statements mirror training_step verbatim
(ref: 3rd_Complete_HOSNeRF/src/model/mipnerf360/model.py:1524-1596) and
the compositing calls the reference module's OWN `_raw2outputs`
(model.py module level), imported in place. Subprocess for the same
sys.modules-stub reason as ref_human_dump.py.

Usage: python tools/ref_merge_dump.py <out.npz>
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

R, NB, NH = 24, 32, 128
SEED = 11


def fabricate():
    rng = np.random.default_rng(SEED)
    rays_o = rng.normal(size=(R, 3)).astype(np.float32)
    # keep every |d| component >= 1e-5 so both impls take the mean path
    rays_d = (rng.uniform(0.2, 1.0, (R, 3)) *
              rng.choice([-1.0, 1.0], (R, 3))).astype(np.float32)
    z_bkg = np.sort(rng.uniform(0.1, 8.0, (R, NB + 1)), -1).astype(
        np.float32)  # tdist incl. far edge
    bkg_rgb = rng.uniform(0, 1, (R, NB, 3)).astype(np.float32)
    bkg_density = rng.gamma(1.0, 1.0, (R, NB)).astype(np.float32)

    z_h = np.sort(rng.uniform(0.1, 8.0, (R, NH)), -1).astype(np.float32)
    # human points placed ON the bkg rays at depths z_h, in scale-world;
    # newsmpl_to_scale_world = identity keeps it simple and exact
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_h[..., None]
    hum_rgb = rng.uniform(0, 1, (R, NH, 3)).astype(np.float32)
    hum_density = np.maximum(
        rng.normal(1.0, 1.0, (R, NH)), 0.0).astype(np.float32)
    pts_mask = rng.uniform(0, 1, (R, NH)).astype(np.float32)
    pts_mask[R // 2:] *= 1e-6  # half the rays are background-only
    return dict(rays_o=rays_o, rays_d=rays_d, tdist=z_bkg,
                bkg_rgb=bkg_rgb, bkg_density=bkg_density,
                newsmpl_pts=pts.astype(np.float32), hum_rgb=hum_rgb,
                hum_density=hum_density, pts_mask=pts_mask)


def merge_mirror(torch, refmodel, d, M):
    """The reference stage-3 sample merge + compositing, differentiable
    (model.py:1524-1596 verbatim mirror; also reused by
    bench_ref_cpu.bench_reference_full for the full-step anchor).

    d: dict of torch tensors (rays_o/rays_d [R,3], tdist [R,NB+1],
    bkg_rgb/bkg_density, newsmpl_pts/hum_rgb/hum_density/pts_mask);
    M: newsmpl->scale-world [4,4]. Returns the merge outputs keyed as the
    golden test expects."""
    from src.model.mipnerf360.model import to_homogeneous
    R = d["rays_o"].shape[0]

    scaleworld_pts = torch.einsum(
        'ji, bni->bnj', M, to_homogeneous(d["newsmpl_pts"]))[..., :3]
    z_vals_human_ = ((scaleworld_pts - d["rays_o"][..., None, :])
                     / (d["rays_d"][..., None, :] + 1e-10))
    z_vals_human_all = torch.mean(z_vals_human_, dim=-1)

    thre_fg = 5e-3
    pts_mask_human_all = d["pts_mask"]
    val = torch.sum(pts_mask_human_all, dim=-1)
    idx_fg = val > thre_fg
    idx_bg = ~idx_fg

    rgb_batch = torch.full((R, 3), 0, dtype=torch.float32)
    z_vals_bkg = d["tdist"][..., :-1][idx_fg]
    z_vals_bkg_onlybg = d["tdist"][..., :-1][idx_bg]
    z_vals_human = z_vals_human_all[idx_fg]
    human_out = torch.cat(
        [d["hum_rgb"][idx_fg], d["hum_density"][..., None][idx_fg]], -1)
    bkg_out_all = torch.cat(
        [d["bkg_rgb"], d["bkg_density"][..., None]], -1)
    bkg_out = bkg_out_all[idx_fg]
    bkg_out_onlybg = bkg_out_all[idx_bg]

    total_zvals, total_order = torch.sort(
        torch.cat([z_vals_bkg, z_vals_human], -1), -1)
    total_out = torch.cat([bkg_out, human_out], 1)
    _b, _n, _c = total_out.shape
    total_out = total_out[
        torch.arange(_b).view(_b, 1, 1).repeat(1, _n, _c),
        total_order.view(_b, _n, 1).repeat(1, 1, _c),
        torch.arange(_c).view(1, 1, _c).repeat(_b, _n, 1)]
    human_pts_idx = total_order >= z_vals_bkg.shape[1]

    pts_mask_human = pts_mask_human_all[idx_fg]
    pts_mask_bkg = torch.ones_like(z_vals_bkg)
    pts_mask = torch.cat([pts_mask_bkg, pts_mask_human], -1)[..., None]
    _b, _n, _c = pts_mask.shape
    pts_mask = pts_mask[
        torch.arange(_b).view(_b, 1, 1).repeat(1, _n, _c),
        total_order.view(_b, _n, 1).repeat(1, 1, _c),
        torch.arange(_c).view(1, 1, _c).repeat(_b, _n, 1)]

    rgb_onlyfg, alpha_onlyfg, weights_onlyfg, depth_onlyfg = \
        refmodel._raw2outputs(total_out, total_zvals,
                              d["rays_d"][idx_fg], pts_mask)
    human_weights_onlyfg = weights_onlyfg[human_pts_idx].reshape(
        z_vals_human.shape)
    rgb_batch[idx_fg] = rgb_onlyfg

    pts_mask_bkg_onlybg = torch.ones_like(z_vals_bkg_onlybg)[..., None]
    rgb_onlybg, alpha_onlybg, _, depth_onlybg = refmodel._raw2outputs(
        bkg_out_onlybg, z_vals_bkg_onlybg, d["rays_d"][idx_bg],
        pts_mask_bkg_onlybg)
    rgb_batch = rgb_batch.index_put((idx_bg.nonzero().squeeze(-1),),
                                    rgb_onlybg)
    return dict(idx_fg=idx_fg, rgb=rgb_batch, alpha_fg=alpha_onlyfg,
                depth_fg=depth_onlyfg, alpha_bg=alpha_onlybg,
                depth_bg=depth_onlybg,
                human_weights_fg=human_weights_onlyfg,
                z_human=z_vals_human_all)


def main(out_npz):
    import torch

    import bench_ref_cpu as ab
    ab._load_reference_models()
    import src.model.mipnerf360.model as refmodel

    d = {k: torch.from_numpy(v) for k, v in fabricate().items()}
    out = merge_mirror(torch, refmodel, d, torch.eye(4))
    np.savez(out_npz, **{k: v.detach().numpy() for k, v in out.items()})
    print("dumped", out_npz)


if __name__ == "__main__":
    main(sys.argv[1])
