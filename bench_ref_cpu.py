"""CPU-to-CPU anchor for `vs_baseline`: time the REFERENCE's own stage-3
networks (torch, imported from the read-only tree at /root/reference) and
this framework's stage-3 train step at identical shapes on the same host
CPU.

Why: the reference never published throughput and no GPU is available
here, so bench.py's `vs_baseline` divisor is an estimate. This harness
replaces guesswork with a measured RATIO on shared hardware:

  * reference side: `MipNeRF360` scene forward + human `Network` forward
    (the real modules, instantiated via the reference's own factory) and
    a backward over all outputs. This EXCLUDES the reference's sort-merge
    compositing, loss computation, and optimizer step — i.e. it is a
    LOWER bound on the reference's true step cost (generous to the
    reference).
  * our side: the FULL stage-3 jitted train step (both models, merge,
    losses incl. LPIPS, optimizer) on the jax CPU backend.

No reference code is copied; modules are imported and executed in place
(the same pattern as tests/test_golden_vs_reference.py). Heavy
environment-only imports that py3.12 / this image lack (imp, gin,
pytorch_lightning, skimage, torchvision-lpips) are stubbed — none of
them participate in the computation being timed.

Prints one JSON line with both sec/step numbers and the ratio.
"""

import importlib.util
import json
import os
import sys
import time
import types

import numpy as np

REF3 = "/root/reference/3rd_Complete_HOSNeRF"
N_PATCHES = 2
# 2 x 8x8 = 128 rays keeps torch-CPU iters ~10-30 s; AB_PATCH=32 measures
# the production 2048-ray batch (several minutes per torch iter)
PATCH = int(os.environ.get("AB_PATCH", 8))
GRID = 32
ITERS = int(os.environ.get("AB_ITERS", 2))
REPO = os.path.dirname(os.path.abspath(__file__))


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _load_reference_models():
    import torch
    import torch.nn as nn

    # py3.12 removed `imp` (the reference's module factory uses it)
    imp_shim = types.ModuleType("imp")

    def load_source(name, path):
        if not os.path.isabs(path):
            path = os.path.join(REF3, path)
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    imp_shim.load_source = load_source
    sys.modules["imp"] = imp_shim

    # gin: decorator-only usage in model.py
    def configurable(*a, **k):
        if a and callable(a[0]):
            return a[0]
        return lambda f: f

    _stub("gin", configurable=configurable)
    _stub("skimage")
    _stub("third_parties.lpips", LPIPS=object)
    _stub("core.data", create_dataloader=lambda *a, **k: None)
    _stub("core.train", create_optimizer=lambda *a, **k: None)
    _stub("src.model.interface", LitModel=nn.Module)
    _stub("utils.store_image")

    # run on CPU: the reference hard-codes .cuda()
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    if REF3 not in sys.path:
        sys.path.insert(0, REF3)
    cwd = os.getcwd()
    os.chdir(REF3)  # the module factory resolves paths relative to cwd
    try:
        import src.model.mipnerf360.model as refmodel
        from core.nets import create_network

        from hosnerf_tpu.config import yamlcfg
        cfg = yamlcfg.make_cfg(
            default_cfg_path=os.path.join(REF3, "configs/default.yaml"))
        # keys whose defaults live in the reference run.py's _C (not in
        # default.yaml); values mirror run.py:44 and yacs defaults
        cfg = cfg.merge_from({"ignore_non_rigid_motions": False})
        human = create_network(cfg)
        scene = refmodel.MipNeRF360("/nonexistent-basedir")  # 1 state
    finally:
        os.chdir(cwd)
    return scene, human, cfg


def _torch_batch(np_batch):
    import torch
    t = {}
    for k, v in np_batch.items():
        t[k] = torch.from_numpy(np.asarray(v)).float()
    t["rays"] = torch.stack([t["rays_o"], t["rays_d"]], 0)
    t["iter_val"] = torch.full((1,), 100.0)
    t["time"] = t["time"].reshape(())
    return t


def bench_reference(np_batch) -> float:
    import torch
    torch.set_num_threads(os.cpu_count() or 1)
    scene, human, cfg = _load_reference_models()
    b = _torch_batch(np_batch)
    batch_bkg = {
        "rays_o": b["rays_o_bkg"], "rays_d": b["rays_d_bkg"],
        "viewdirs": b["viewdirs_bkg"], "radii": b["radii"],
        "times": b["time"].reshape(1),
    }
    human_kwargs = dict(
        rays=b["rays"], dst_Rs=b["dst_Rs"], dst_Ts=b["dst_Ts"],
        cnl_gtfms=b["cnl_gtfms"],
        motion_weights_priors=b["motion_weights_priors"],
        dst_posevec=b["dst_posevec"], near=b["near"], far=b["far"],
        iter_val=100.0, is_train=True, time=b["time"],
        dst_Rs_prev=b["dst_Rs_prev"], dst_Ts_prev=b["dst_Ts_prev"],
        dst_posevec_prev=b["dst_posevec_prev"],
        cnl_bbox_min_xyz=b["cnl_bbox_min_xyz"],
        cnl_bbox_scale_xyz=b["cnl_bbox_scale_xyz"],
        bgcolor=b["bgcolor"], ray_grid=b["ray_grid"],
        newsmpl_to_camera_prev=b["newsmpl_to_camera_prev"],
        intrinsics_prev=b["intrinsics_prev"],
        newsmpl_to_scale_world=b["newsmpl_to_scale_world"],
    )

    def one_step():
        _, ray_history = scene(batch_bkg, 1.0, True, True, 0.1, 1e6)
        out = human(**human_kwargs)
        # touch every level's raw outputs so backward covers the whole
        # scene stack (stage 3 composes from ray_history, model.py:1560)
        loss = sum(h["rgb"].mean() + h["density"].mean()
                   + h["weights"].mean() for h in ray_history)
        loss = loss + sum(
            v.float().mean() for k, v in out.items()
            if torch.is_tensor(v) and v.dtype.is_floating_point
            and v.requires_grad)
        scene.zero_grad(set_to_none=True)
        human.zero_grad(set_to_none=True)
        loss.backward()
        return float(loss.detach())

    one_step()  # warmup (allocator, autograd graph shapes)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        one_step()
    return (time.perf_counter() - t0) / ITERS


def _lpips_vgg16_random(torch):
    """A torch module with EXACTLY the reference LPIPS-VGG16 compute graph
    (third_parties/lpips/pretrained_networks.py: torchvision vgg16
    .features conv stack, taps after relu1_2/2_2/3_3/4_3/5_3; lpips.py:
    unit-normalize each tap, 1x1 lin heads, spatial average, sum) but
    RANDOM weights — torchvision's pretrained weights are unavailable in
    this zero-egress image and do not change the FLOP count being timed."""
    import torch.nn as nn

    cfgs = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512]
    taps_after = {1, 3, 6, 9, 12}  # conv indices of relu1_2..relu5_3
    chns = [64, 128, 256, 512, 512]

    class LPIPSRand(nn.Module):
        def __init__(self):
            super().__init__()
            layers, c_in, conv_i = [], 3, 0
            self.tap_layer_idx = []
            for v in cfgs:
                if v == "M":
                    layers.append(nn.MaxPool2d(2, 2, ceil_mode=True))
                else:
                    layers += [nn.Conv2d(c_in, v, 3, padding=1),
                               nn.ReLU(inplace=False)]
                    if conv_i in taps_after:
                        self.tap_layer_idx.append(len(layers) - 1)
                    c_in = v
                    conv_i += 1
            self.features = nn.Sequential(*layers)
            self.lins = nn.ModuleList(
                [nn.Conv2d(c, 1, 1, bias=False) for c in chns])

        def forward(self, x, y):
            outs = []
            for inp in (x, y):
                feats, h = [], inp
                for i, layer in enumerate(self.features):
                    h = layer(h)
                    if i in self.tap_layer_idx:
                        feats.append(h / (h.norm(dim=1, keepdim=True)
                                          + 1e-10))
                outs.append(feats)
            val = 0.0
            for lin, fx, fy in zip(self.lins, outs[0], outs[1]):
                val = val + lin((fx - fy) ** 2).mean(dim=(2, 3))
            return val

    return LPIPSRand()


def bench_reference_full(np_batch) -> float:
    """The reference's FULL stage-3 step: scene + human networks forward,
    the training_step sample merge (tools/ref_merge_dump.merge_mirror —
    verbatim statements), its losses (mse 0.2 + lpips 1.0 + cycle 0.01 +
    flow 0.01, model.py:1695-1740 + configs/default.yaml:98-102) with an
    identically-shaped random-weight LPIPS-VGG16, backward, and a torch
    Adam step over both models — symmetric with `bench_ours` (which is
    also a full step)."""
    import torch
    torch.set_num_threads(os.cpu_count() or 1)
    scene, human, cfg = _load_reference_models()
    import src.model.mipnerf360.model as refmodel
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from ref_merge_dump import merge_mirror

    b = _torch_batch(np_batch)
    batch_bkg = {
        "rays_o": b["rays_o_bkg"], "rays_d": b["rays_d_bkg"],
        "viewdirs": b["viewdirs_bkg"], "radii": b["radii"],
        "times": b["time"].reshape(1),
    }
    human_kwargs = dict(
        rays=b["rays"], dst_Rs=b["dst_Rs"], dst_Ts=b["dst_Ts"],
        cnl_gtfms=b["cnl_gtfms"],
        motion_weights_priors=b["motion_weights_priors"],
        dst_posevec=b["dst_posevec"], near=b["near"], far=b["far"],
        iter_val=100.0, is_train=True, time=b["time"],
        dst_Rs_prev=b["dst_Rs_prev"], dst_Ts_prev=b["dst_Ts_prev"],
        dst_posevec_prev=b["dst_posevec_prev"],
        cnl_bbox_min_xyz=b["cnl_bbox_min_xyz"],
        cnl_bbox_scale_xyz=b["cnl_bbox_scale_xyz"],
        bgcolor=b["bgcolor"], ray_grid=b["ray_grid"],
        newsmpl_to_camera_prev=b["newsmpl_to_camera_prev"],
        intrinsics_prev=b["intrinsics_prev"],
        newsmpl_to_scale_world=b["newsmpl_to_scale_world"],
    )
    lpips = _lpips_vgg16_random(torch)
    opt = torch.optim.Adam(
        list(scene.parameters()) + list(human.parameters())
        + list(lpips.lins.parameters()), lr=5e-4)
    w = cfg.train.lossweights
    n_patches, psz = b["patch_masks"].shape[0], b["patch_masks"].shape[1]
    targets = b["target_patches"]

    def one_step():
        _, ray_history = scene(batch_bkg, 1.0, True, True, 0.1, 1e6)
        out = human(**human_kwargs)
        d = {
            "rays_o": batch_bkg["rays_o"], "rays_d": batch_bkg["rays_d"],
            "tdist": ray_history[-1]["tdist"],
            "bkg_rgb": ray_history[-1]["rgb"],
            "bkg_density": ray_history[-1]["density"],
            "newsmpl_pts": out["newsmpl_pts"], "hum_rgb": out["human_rgb"],
            "hum_density": out["human_density"],
            "pts_mask": out["pts_mask"],
        }
        m = merge_mirror(torch, refmodel, d, b["newsmpl_to_scale_world"])
        rgb_patches = m["rgb"].reshape(n_patches, psz, psz, 3)
        mse = ((rgb_patches - targets) ** 2).mean()
        lp = lpips(rgb_patches.permute(0, 3, 1, 2) * 2 - 1,
                   targets.permute(0, 3, 1, 2) * 2 - 1).mean()
        dis = out["observe_pts"] - out["deform_pts_final"]
        cycle = torch.mean(torch.sum(dis ** 2, 1) / 2.0)
        # flow_func mirror (model.py:1723-1731)
        idx_fg = m["idx_fg"]
        from src.model.mipnerf360.model import img2mae, to_homogeneous
        dp = out["deform_pts_prev_final"][idx_fg]
        pts_prev_cam = torch.einsum(
            'ji, bni->bnj', b["newsmpl_to_camera_prev"],
            to_homogeneous(dp))[..., :3]
        p2_ = torch.einsum('ji, bni->bnj', b["intrinsics_prev"],
                           pts_prev_cam)
        p2 = p2_[..., :-1] / p2_[..., -1:]
        rg = b["ray_grid"][idx_fg].unsqueeze(1).repeat(1, p2.shape[1], 1)
        flow = img2mae(p2 - rg[..., :2], rg[..., 2:4],
                       m["human_weights_fg"],
                       rg[..., -1].unsqueeze(-1))
        loss = (w["mse"] * mse + w["lpips"] * lp + w["cycle"] * cycle
                + w["flow"] * flow)
        opt.zero_grad(set_to_none=True)
        loss.backward()
        opt.step()
        return float(loss.detach())

    one_step()  # warmup
    t0 = time.perf_counter()
    for _ in range(ITERS):
        one_step()
    return (time.perf_counter() - t0) / ITERS


def bench_ours(np_batch) -> float:
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from hosnerf_tpu.train import stage3

    cfg = stage3.Stage3Config(n_patches=N_PATCHES, patch_size=PATCH)
    batch = {k: jnp.asarray(v) for k, v in np_batch.items()}
    params, opt_state, sm, hm, opt = stage3.init_state(
        cfg, jax.random.key(0), batch)
    step = jax.jit(stage3.make_train_step(cfg, sm, hm, opt))
    rng = jax.random.key(1)
    out = step(params, opt_state, None, batch, jnp.float32(100.0), rng)
    jax.block_until_ready(out)  # CPU backend: block is trustworthy
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = step(params, opt_state, None, batch,
                   jnp.float32(100.0 + i), jax.random.fold_in(rng, i))
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS


def bench_reference_stage1(np_batch) -> float:
    """Reference stage-1 scene model (MipNeRF360, production sizes:
    2 PropMLP + 8x1024 NeRFMLP, 64/64/32 samples, functorch contraction
    jacobian) forward + backward — excludes its losses/optimizer."""
    import torch
    torch.set_num_threads(os.cpu_count() or 1)
    scene, _, _ = _load_reference_models()
    b = {k: torch.from_numpy(np.asarray(v)).float()
         for k, v in np_batch.items()}
    batch = {"rays_o": b["rays_o"], "rays_d": b["rays_d"],
             "viewdirs": b["viewdirs"], "radii": b["radii"],
             "times": b["times"]}

    def one_step():
        _, ray_history = scene(batch, 1.0, True, True, 0.5, 1e6)
        loss = sum(h["rgb"].mean() + h["density"].mean()
                   + h["weights"].mean() for h in ray_history)
        scene.zero_grad(set_to_none=True)
        loss.backward()
        return float(loss.detach())

    one_step()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        one_step()
    return (time.perf_counter() - t0) / ITERS


def bench_ours_stage1(np_batch) -> float:
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from hosnerf_tpu.train import stage1

    cfg = stage1.Stage1Config(max_steps=500_000, near=0.5, far=1e6)
    batch = {k: jnp.asarray(v) for k, v in np_batch.items()}
    params, opt_state, model = stage1.init_state(cfg, jax.random.key(0),
                                                 batch)
    opt = stage1.make_optimizer(cfg)
    step = jax.jit(stage1.make_train_step(cfg, model, opt))
    rng = jax.random.key(1)
    out = step(params, opt_state, batch, jnp.float32(100.0), rng)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = step(params, opt_state, batch, jnp.float32(100.0 + i),
                   jax.random.fold_in(rng, i))
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS


def main():
    sys.path.insert(0, REPO)
    from hosnerf_tpu.data import synthetic

    mode = os.environ.get("AB_STAGE", "3")
    if mode == "1":
        rays = N_PATCHES * PATCH * PATCH
        np_batch = synthetic.scene_ray_batch(rays)
        ours = bench_ours_stage1(np_batch)
        ref = bench_reference_stage1(np_batch)
        metric = "stage1_cpu_ab_sec_per_step"
        ref_key = "reference_networks_fwd_bwd_sec"
        note = ("reference side excludes merge/losses/optimizer (lower "
                "bound on its step); ours is the full train step")
    elif mode == "full":
        np_batch = synthetic.composed_batch(N_PATCHES, PATCH,
                                            grid_size=GRID)
        ours = bench_ours(np_batch)
        ref = bench_reference_full(np_batch)
        rays = N_PATCHES * PATCH * PATCH
        metric = "stage3_cpu_ab_full_sec_per_step"
        ref_key = "reference_full_step_sec"
        note = ("SYMMETRIC anchor: both sides are the full stage-3 step "
                "(networks + merge + mse/lpips/cycle/flow losses + "
                "backward + Adam) at identical shapes on this host CPU; "
                "reference LPIPS backbone is random-weight (same FLOPs)")
    else:
        np_batch = synthetic.composed_batch(N_PATCHES, PATCH,
                                            grid_size=GRID)
        ours = bench_ours(np_batch)
        ref = bench_reference(np_batch)
        rays = N_PATCHES * PATCH * PATCH
        metric = "stage3_cpu_ab_sec_per_step"
        ref_key = "reference_networks_fwd_bwd_sec"
        note = ("reference side excludes merge/losses/optimizer (lower "
                "bound on its step); ours is the full train step")
    print(json.dumps({
        "metric": metric,
        "rays": rays,
        ref_key: round(ref, 3),
        "ours_full_step_sec": round(ours, 3),
        "speedup_ours_vs_reference" + (
            "" if mode == "full" else "_lower_bound"): round(ref / ours, 3),
        "note": note,
    }))


if __name__ == "__main__":
    main()
