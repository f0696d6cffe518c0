"""Run the REFERENCE 3rd-stage human Network end-to-end on a fixed
synthetic batch and dump its outputs + state_dict, for the end-to-end
golden test (tests/test_human_golden_weights.py).

Runs as a subprocess because importing the reference requires sys.modules
stubs (imp/gin/skimage/...) that must not leak into the test process
(bench_ref_cpu._load_reference_models owns that machinery).

The composited outputs are produced with the reference's own _raw2outputs
math (ref: 2nd_State_Conditional_Human-Object/core/nets/human_nerf/
network.py:273-299), evaluated on the network's returned activated
rgb/density (sigmoid/relu are already applied in the 3rd-stage return;
relu is idempotent and rgb is returned post-sigmoid, so the composited
values are bit-identical to the 2nd-stage path).

Usage: python tools/ref_human_dump.py <out.npz> <ckpt.pt>
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TIME_TRAIN = 0.37
ITER_VAL = 1.0e7


def ref_composite(torch, human_rgb, human_density, pts_mask, z_vals,
                  rays_d, bgcolor):
    """network.py:273-299 on activated outputs."""
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    inf = torch.full_like(dists[..., :1], 1e10)
    dists = torch.cat([dists, inf], dim=-1)
    dists = dists * torch.norm(rays_d[..., None, :], dim=-1)
    alpha = 1.0 - torch.exp(-human_density * dists)
    alpha = alpha * pts_mask
    weights = alpha * torch.cumprod(
        torch.cat([torch.ones((alpha.shape[0], 1)), 1.0 - alpha + 1e-10],
                  dim=-1), dim=-1)[:, :-1]
    rgb_map = torch.sum(weights[..., None] * human_rgb, -2)
    depth_map = torch.sum(weights * z_vals, -1)
    acc_map = torch.sum(weights, -1)
    rgb_map = rgb_map + (1.0 - acc_map[..., None]) * bgcolor[None, :] / 255.0
    return rgb_map, acc_map, weights, depth_map


def main(out_npz, out_ckpt):
    import torch

    import bench_ref_cpu as ab
    from hosnerf_tpu.data import synthetic

    torch.manual_seed(0)
    _, human, _ = ab._load_reference_models()
    # deterministic z sampling for the golden (cfg.perturb is read at
    # _render_rays time; ref configs/default.yaml:150)
    human.cfg = human.cfg.merge_from({"perturb": 0.0})
    human.eval()

    np_batch = synthetic.composed_batch(1, 8, grid_size=32)
    b = ab._torch_batch(np_batch)

    common = dict(
        rays=b["rays"], dst_Rs=b["dst_Rs"], dst_Ts=b["dst_Ts"],
        cnl_gtfms=b["cnl_gtfms"],
        motion_weights_priors=b["motion_weights_priors"],
        dst_posevec=b["dst_posevec"], near=b["near"], far=b["far"],
        iter_val=ITER_VAL,
        dst_Rs_prev=b["dst_Rs_prev"], dst_Ts_prev=b["dst_Ts_prev"],
        dst_posevec_prev=b["dst_posevec_prev"],
        cnl_bbox_min_xyz=b["cnl_bbox_min_xyz"],
        cnl_bbox_scale_xyz=b["cnl_bbox_scale_xyz"],
        bgcolor=b["bgcolor"],
    )

    dump = {}
    with torch.no_grad():
        # ---- eval (time=0, is_train=False) ----
        out = human(**common, is_train=False, time=torch.tensor(0.0))
        for k in ("human_rgb", "human_density", "newsmpl_pts", "pts_mask",
                  "z_vals", "deform_pts_final", "observe_pts"):
            dump[f"eval_{k}"] = out[k].numpy()
        rgb, acc, w, depth = ref_composite(
            torch, out["human_rgb"], out["human_density"], out["pts_mask"],
            out["z_vals"], out["rays_d"], b["bgcolor"])
        dump["eval_rgb"] = rgb.numpy()
        dump["eval_alpha"] = acc.numpy()
        dump["eval_weights"] = w.numpy()
        dump["eval_depth"] = depth.numpy()

        # ---- train (time>0.005, is_train=True: cycle + prev-flow) ----
        out_t = human(**common, is_train=True,
                      time=torch.tensor(TIME_TRAIN))
        for k in ("human_rgb", "human_density", "newsmpl_pts", "pts_mask",
                  "deform_pts_final", "observe_pts",
                  "deform_pts_prev_final"):
            dump[f"train_{k}"] = out_t[k].numpy()

    np.savez(out_npz, **dump)
    sd = {"human." + k: v for k, v in human.state_dict().items()}
    torch.save({"state_dict": sd}, out_ckpt)
    print("dumped", out_npz, out_ckpt)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
