"""Unified CLI preserving the reference's per-stage command surface.

The reference ships three separate run.py entry points
(ref: {1st,2nd,3rd}/run.py); here one command with a --stage axis:

  python -m hosnerf_tpu.cli.run --stage scene  --ginc <gin> \
      --scene_name Backpack --logbase logs [--ginb k=v ...] [--seed N]
  python -m hosnerf_tpu.cli.run --stage human  --cfg <scene.yaml> ...
  python -m hosnerf_tpu.cli.run --stage hosnerf --ginc <gin> --cfg <yaml> \
      --bkgd_path <stage1 ckpt> --human_path <stage2 ckpt> ...

Flags --ginc/--ginb/--scene_name/--logbase/--seed/--resume_training/
--ckpt_path/--cfg match the reference argparse surface
(1st run.py:197-236, 2nd run.py:246-279). --run_mode {train,eval,render}
maps to trainer.fit / test / predict.
"""

from __future__ import annotations

import argparse
import functools
import os
from typing import Dict

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("hosnerf_tpu")
    p.add_argument("--stage", choices=["scene", "human", "hosnerf"],
                   required=True)
    p.add_argument("--ginc", action="append", default=[],
                   help="gin config file(s)")
    p.add_argument("--ginb", action="append", default=[],
                   help="gin binding override(s)")
    p.add_argument("--cfg", type=str, default=None,
                   help="per-scene yaml (stages human/hosnerf)")
    p.add_argument("--default_cfg", type=str, default=None,
                   help="default.yaml path (defaults to built-in values)")
    p.add_argument("--scene_name", type=str, default=None)
    p.add_argument("--logbase", type=str, default="logs")
    p.add_argument("--seed", type=int, default=220901)
    p.add_argument("--resume_training", type=lambda s: s.lower() == "true",
                   default=False)
    p.add_argument("--ckpt_path", type=str, default=None)
    p.add_argument("--bkgd_path", type=str, default=None)
    p.add_argument("--human_path", type=str, default=None)
    p.add_argument("--run_mode", choices=["train", "eval", "render"],
                   default="train")
    p.add_argument("--max_steps", type=int, default=None,
                   help="override gin/yaml step count")
    p.add_argument("--lpips_vgg_path", type=str,
                   default=os.environ.get("LPIPS_VGG_PATH"),
                   help="torchvision vgg16 state_dict (.pth) for "
                        "metric-grade LPIPS; falls back to fixed-seed "
                        "random VGG features without it")
    return p


def _make_lpips_metric(lp_model, lp_params):
    """Full-image LPIPS metric: (rgb01 [H,W,3], tgt01 [H,W,3]) -> scalar.
    Mirrors the reference's eval usage (2nd model.py:745-773: img*2-1).
    None model (patches below the 16x16 minimum) -> None metric."""
    import jax

    if lp_model is None:
        return None

    @jax.jit
    def metric(a, b):
        return lp_model.apply({"params": lp_params},
                              (a * 2.0 - 1.0)[None],
                              (b * 2.0 - 1.0)[None])[0]
    return metric


def _load_lpips(args, patch_size: int):
    """Build the jittable LPIPS (loss + metric) with whatever torch
    weights are available (lin heads always; vgg16 backbone when
    --lpips_vgg_path is supplied; KNOWN_GAPS #1). Returns
    (model, params, backbone_provenance); (None, None, None) below
    LPIPS's 16x16 spatial minimum (tiny smoke configs) — the
    training loss and eval then simply omit the lpips term."""
    import jax

    if patch_size < 16:
        print(f"[lpips] patches {patch_size}x{patch_size} < 16x16 "
              "minimum — lpips loss/metric disabled for this run")
        return None, None, None

    from hosnerf_tpu.models import lpips as lpips_mod
    lp_params = lpips_mod.load_torch_weights(
        jax.tree.map(np.asarray, lpips_mod.init_lpips_params(
            jax.random.key(7), (patch_size, patch_size))),
        vgg_path=args.lpips_vgg_path)
    lp_model = lpips_mod.LPIPS()
    return (lp_model, lp_params,
            lpips_mod.backbone_provenance(args.lpips_vgg_path))


def _logdir(args) -> str:
    name = args.scene_name or "scene"
    d = os.path.join(args.logbase, f"{args.stage}_{name}")
    os.makedirs(d, exist_ok=True)
    return d


def _capture_dir(basedir: str, scene_name) -> str:
    """The reference's yaml `basedir` points directly at the capture dir;
    accept the stage-1 convention too (<basedir>/<scene_name>) when that
    subdirectory is the actual capture (has mesh_infos.pkl)."""
    if scene_name:
        sub = os.path.join(basedir, scene_name)
        if (os.path.isfile(os.path.join(sub, "mesh_infos.pkl"))
                and not os.path.isfile(
                    os.path.join(basedir, "mesh_infos.pkl"))):
            return sub
    return basedir


def _resolve_cdt(spec) -> "str | None":
    """Config-surface compute dtype: 'auto' (default) -> bf16 MLP trunks
    on TPU (measured quality-neutral, ~7% faster steps), f32 elsewhere;
    'bf16'/'f32' force it."""
    import jax
    s = str(spec or "auto").lower()
    if s == "auto":
        return "bf16" if jax.default_backend() == "tpu" else None
    return None if s in ("f32", "float32", "none") else s


def run_scene(args) -> None:
    import jax
    import jax.numpy as jnp

    from hosnerf_tpu.config import ginlite
    from hosnerf_tpu.data import scene_loader, scene_pipeline
    from hosnerf_tpu.parallel import mesh as pmesh
    from hosnerf_tpu.train import loop, stage1

    gin = ginlite.parse_config_files_and_bindings(args.ginc, args.ginb)
    run_cfg = ginlite.scoped(gin, "run")
    logdir = _logdir(args)
    with open(os.path.join(logdir, "config.gin"), "w") as f:
        f.write(ginlite.dumps(gin))

    datadir = run_cfg.get("datadir", ".")
    scene = scene_loader.load_nerf_360_v2(
        datadir, args.scene_name,
        factor=int(gin.get("LitDataNeRF360V2.factor", 0) or 0),
        near=gin.get("LitDataNeRF360V2.near", 0.1),
        far=gin.get("LitDataNeRF360V2.far", 1e6))
    batch_size = int(gin.get("LitData.batch_size", 4096))
    pipe = scene_pipeline.ScenePipeline(
        scene, batch_size, seed=args.seed,
        batch_sampler=str(gin.get("LitData.batch_sampler", "single_image")),
        precrop=bool(gin.get("LitData.precrop", False)),
        precrop_steps=int(gin.get("LitData.precrop_steps", 0)))

    # transition times for state embeddings
    tt = os.path.join(datadir, args.scene_name, "transitions_times.json")
    transitions = None
    if os.path.exists(tt):
        import json
        with open(tt) as f:
            transitions = np.array(
                [v["time"] for v in json.load(f).values()], np.float32)

    max_steps = args.max_steps or int(run_cfg.get("max_steps", 500_000))
    cfg = stage1.Stage1Config(
        max_steps=max_steps, near=scene.near, far=scene.far,
        grad_max_norm=float(run_cfg.get("grad_max_norm", 0.001)),
        num_states=(len(transitions) + 1) if transitions is not None else 1,
        # size overrides via the reference's gin class-param surface
        nerf_netwidth=int(gin.get("NeRFMLP.netwidth", 1024)),
        prop_netwidth=int(gin.get("PropMLP.netwidth", 256)),
        num_prop_samples=int(gin.get("MipNeRF360.num_prop_samples", 64)),
        num_nerf_samples=int(gin.get("MipNeRF360.num_nerf_samples", 32)),
        compute_dtype=_resolve_cdt(gin.get("MipNeRF360.compute_dtype")))

    mesh = pmesh.make_mesh()
    example = pmesh.shard_batch(pipe.sample_train_batch(), mesh)
    params, opt_state, model = stage1.init_state(
        cfg, jax.random.key(args.seed), example, transitions)
    opt = stage1.make_optimizer(cfg)
    start_step, loop_rng = 0, jax.random.key(args.seed + 1)
    if args.ckpt_path and args.ckpt_path.endswith(".ckpt"):
        # torch Lightning checkpoint: params-only warm start
        from hosnerf_tpu.train import checkpoints as ck
        params = ck.overlay_params(params,
                                   ck.import_scene_params(args.ckpt_path))
    elif args.resume_training or args.ckpt_path:
        # true resume: LR schedule + Adam moments continue
        # (ref: 1st run.py:158-160 resumes <logdir>/last.ckpt)
        from hosnerf_tpu.train import checkpoints as ck
        params, opt_state, start_step, loop_rng = ck.restore_train_state(
            os.path.join(logdir, "ckpt"), args.ckpt_path or "last",
            params, opt_state, loop_rng)

    step_fn = jax.jit(stage1.make_train_step(cfg, model, opt, transitions))
    eval_step = pmesh.shard_eval_fn(
        jax.jit(stage1.make_eval_step(cfg, model, transitions)), mesh)

    if args.run_mode == "train":
        def val_fn(carry, step):
            from hosnerf_tpu.eval import renderers
            i = int(scene.i_split[1][0])
            rgb = renderers.render_scene_image(eval_step, carry[0], pipe, i)
            from hosnerf_tpu.eval import metrics as M
            return float(M.psnr(jnp.asarray(rgb),
                                jnp.asarray(scene.images[i])))

        from hosnerf_tpu.train.schedules import warmup_log_lerp
        loop.run_training(
            num_steps=max_steps,
            sample_batch=lambda: pmesh.shard_batch(
                pipe.sample_train_batch(), mesh),
            step_fn=step_fn, init_carry=(params, opt_state),
            logdir=logdir, rays_per_step=batch_size,
            log_every=int(run_cfg.get("log_every_n_steps", 100)),
            val_fn=val_fn, rng=loop_rng, start_step=start_step,
            lr_schedule=lambda s: warmup_log_lerp(
                s, cfg.max_steps, cfg.lr_init, cfg.lr_final,
                cfg.lr_delay_steps, cfg.lr_delay_mult))
    elif args.run_mode == "eval":
        from hosnerf_tpu.eval import renderers
        lp_model, lp_params, lp_backbone = _load_lpips(args, 32)
        results = renderers.evaluate_scene(
            eval_step, params, pipe, logdir,
            lpips_metric=_make_lpips_metric(lp_model, lp_params),
            lpips_backbone=lp_backbone)
        print(results)
    else:  # render: interpolated camera-path video (reference `predict`)
        from hosnerf_tpu.eval import renderers
        path = renderers.render_scene_path(eval_step, params, pipe, logdir)
        print(f"wrote {path}")


def run_human(args) -> None:
    import jax
    import jax.numpy as jnp

    from hosnerf_tpu.config import yamlcfg
    from hosnerf_tpu.data.human_dataset import HumanDataset
    from hosnerf_tpu.eval import renderers
    from hosnerf_tpu.models.state import state_index
    from hosnerf_tpu.parallel import mesh as pmesh
    from hosnerf_tpu.train import checkpoints as ck
    from hosnerf_tpu.train import loop, stage2

    cfg_yaml = yamlcfg.make_cfg(args.cfg, args.default_cfg)
    logdir = _logdir(args)
    datadir = _capture_dir(cfg_yaml.get("basedir", "."),
                           args.scene_name)

    # network-size keys from the reference's default.yaml schema
    # (ref: 2nd.../configs/default.yaml:23-59 canonical_mlp /
    # non_rigid_motion_mlp / mweight_volume blocks)
    vol_size = int(cfg_yaml.get("mweight_volume", {}).get(
        "volume_size", 32))
    ds = HumanDataset(datadir, mode="train",
                      n_patches=int(cfg_yaml.get("patch", {}).get(
                          "N_patches", 2)),
                      patch_size=int(cfg_yaml.get("patch", {}).get(
                          "size", 32)),
                      mweight_volume_size=vol_size,
                      seed=args.seed)
    num_states = (len(ds.transitions) + 1
                  if ds.transitions is not None else 1)
    train_y = cfg_yaml.get("train", {})
    max_steps = args.max_steps or int(train_y.get("maxiter", 400_000))
    netchunk = cfg_yaml.get("netchunk_per_gpu")
    cfg = stage2.Stage2Config(
        maxiter=max_steps,
        lr=float(train_y.get("lr", 0.0006667)),
        num_states=num_states,
        n_patches=ds.n_patches, patch_size=ds.patch_size,
        n_samples=int(cfg_yaml.get("N_samples", 128)),
        cnl_mlp_width=int(cfg_yaml.get("canonical_mlp", {}).get(
            "mlp_width", 256)),
        nr_mlp_width=int(cfg_yaml.get("non_rigid_motion_mlp", {}).get(
            "mlp_width", 128)),
        mweight_volume_size=vol_size,
        # reference uses netchunk_per_gpu*4 points per MLP call
        # (network.py:115); None (unset) = dense single pass
        mlp_chunk=int(netchunk) * 4 if netchunk else None,
        compute_dtype=_resolve_cdt(cfg_yaml.get("compute_dtype")))

    # batches are sharded over the data mesh exactly like stage 1 — the
    # TPU analog of the reference's 4-GPU DDP training (2nd run.py DDP;
    # SURVEY.md §2.6)
    mesh = pmesh.make_mesh()

    def make_batch(i=None):
        idx = (np.random.randint(len(ds)) if i is None else i)
        item = ds[idx]
        return pmesh.shard_batch(
            {k: v for k, v in item.items() if k != "frame_name"}, mesh)

    example = make_batch(0)
    params, opt_state, model, opt = stage2.init_state(
        cfg, jax.random.key(args.seed), example)

    lp_model, lp_params, lp_backbone = _load_lpips(args, cfg.patch_size)
    lp_apply = (None if lp_model is None else
                (lambda p, a, b: lp_model.apply({"params": p}, a, b)))

    start_step, loop_rng = 0, jax.random.key(args.seed + 1)
    if args.ckpt_path and args.ckpt_path.endswith(".ckpt"):
        params = ck.overlay_params(params,
                                   ck.import_human_params(args.ckpt_path))
    elif args.resume_training or args.ckpt_path:
        params, opt_state, start_step, loop_rng = ck.restore_train_state(
            os.path.join(logdir, "ckpt"), args.ckpt_path or "last",
            params, opt_state, loop_rng)

    step_fn = jax.jit(
        stage2.make_train_step(cfg, model, opt, ds.transitions, lp_apply))

    def wrapped_step(params, opt_state, batch, step, rng):
        return step_fn(params, opt_state, lp_params, batch, step, rng)

    trans = (jnp.asarray(ds.transitions) if ds.transitions is not None
             else None)

    @jax.jit
    def render_fn(p, b):
        s_idx = state_index(b["time"], trans) if "time" in b else 0
        return model.apply({"params": p}, b, 10**7, s_idx,
                           is_train=False)["rgb"]

    render_fn = pmesh.shard_eval_fn(render_fn, mesh)

    if args.run_mode == "train":
        # in-training progress eval + empty-render trap
        # (ref: 2nd model.py:495-564,600-603)
        prog_ds = HumanDataset(datadir, mode="progress",
                               mweight_volume_size=vol_size, seed=args.seed)
        lp_metric = _make_lpips_metric(lp_model, lp_params)

        def progress_fn(carry, step):
            return renderers.evaluate_human(
                render_fn, carry[0], prog_ds, logdir,
                f"prog_{step:06d}", lpips_metric=lp_metric, max_items=4)

        loop.run_training(
            num_steps=max_steps, sample_batch=make_batch,
            step_fn=wrapped_step, init_carry=(params, opt_state),
            logdir=logdir,
            rays_per_step=cfg.n_patches * cfg.patch_size**2,
            rng=loop_rng, start_step=start_step,
            progress_fn=progress_fn,
            progress_every=int(cfg_yaml.get("progress", {}).get(
                "dump_interval", 5000)))
    else:
        rnd_y = cfg_yaml.get("render", {})

        def factory(mode, **kw):
            if mode == "freeview":
                # ref yaml key freeview.frame_idx (default.yaml:115-119)
                kw.setdefault("freeview_frame_idx", int(
                    cfg_yaml.get("freeview", {}).get("frame_idx", 0)))
            return HumanDataset(datadir, mode=mode,
                                mweight_volume_size=vol_size,
                                bgcolor=[255.0, 255.0, 255.0], **kw)

        lp_metric = _make_lpips_metric(lp_model, lp_params)
        if args.run_mode == "eval":
            out = renderers.full_human_eval(
                render_fn, params, factory, logdir,
                transitions=ds.transitions, lpips_metric=lp_metric,
                lpips_backbone=lp_backbone,
                # ref 2nd tpose.py:29 renders 1024^2; the render block is
                # a framework extension for smoke-sized runs
                tpose_resolution=int(rnd_y.get("tpose_resolution", 1024)),
                freeview_frames=int(rnd_y.get("freeview_frames", 100)),
                tpose_views=rnd_y.get("tpose_views"))
        else:  # render: freeview orbit video only
            out = renderers.render_freeview(
                render_fn, params,
                factory(mode="freeview", render_frames=int(
                    rnd_y.get("freeview_frames", 100))), logdir)
        print(out if args.run_mode == "eval" else f"{len(out)} frames")


def run_hosnerf(args) -> None:
    import jax
    import jax.numpy as jnp

    from hosnerf_tpu.config import ginlite, yamlcfg
    from hosnerf_tpu.data.human_dataset import HumanDataset
    from hosnerf_tpu.train import checkpoints as ck
    from hosnerf_tpu.train import loop, stage3

    gin = ginlite.parse_config_files_and_bindings(args.ginc, args.ginb)
    cfg_yaml = yamlcfg.make_cfg(args.cfg, args.default_cfg)
    logdir = _logdir(args)
    datadir = _capture_dir(
        cfg_yaml.get("basedir", ginlite.scoped(gin, "run").get(
            "datadir", ".")), args.scene_name)

    patch_y = cfg_yaml.get("patch", {})
    vol_size = int(cfg_yaml.get("mweight_volume", {}).get(
        "volume_size", 32))
    ds = HumanDataset(datadir, mode="train", use_scaleworld=True,
                      n_patches=int(patch_y.get("N_patches", 2)),
                      patch_size=int(patch_y.get("size", 32)),
                      mweight_volume_size=vol_size,
                      seed=args.seed)
    num_states = (len(ds.transitions) + 1
                  if ds.transitions is not None else 1)
    train_y = cfg_yaml.get("train", {})
    max_steps = args.max_steps or int(train_y.get("maxiter", 200_000))
    cfg = stage3.Stage3Config(
        maxiter=max_steps, num_states=num_states,
        n_patches=ds.n_patches, patch_size=ds.patch_size,
        n_samples=int(cfg_yaml.get("N_samples", 128)),
        cnl_mlp_width=int(cfg_yaml.get("canonical_mlp", {}).get(
            "mlp_width", 256)),
        nr_mlp_width=int(cfg_yaml.get("non_rigid_motion_mlp", {}).get(
            "mlp_width", 128)),
        mweight_volume_size=vol_size,
        mlp_chunk=(int(cfg_yaml["netchunk_per_gpu"]) * 4
                   if cfg_yaml.get("netchunk_per_gpu") else None),
        near_bkg=float(gin.get("LitDataHumanObject.near_bkg", 0.1)),
        far_bkg=float(gin.get("LitDataHumanObject.far_bkg", 1e6)),
        nerf_netwidth=int(gin.get("NeRFMLP.netwidth", 1024)),
        prop_netwidth=int(gin.get("PropMLP.netwidth", 256)),
        num_prop_samples=int(gin.get("MipNeRF360.num_prop_samples", 64)),
        num_nerf_samples=int(gin.get("MipNeRF360.num_nerf_samples", 32)),
        compute_dtype=_resolve_cdt(
            cfg_yaml.get("compute_dtype",
                         gin.get("MipNeRF360.compute_dtype"))))

    # batches sharded over the data mesh, same as stages 1/2
    # (SURVEY.md §2.6: effective batch = N frames x 2 patches across ranks)
    from hosnerf_tpu.parallel import mesh as pmesh
    mesh = pmesh.make_mesh()

    def make_batch(i=None):
        idx = (np.random.randint(len(ds)) if i is None else i)
        item = ds[idx]
        return pmesh.shard_batch(
            {k: v for k, v in item.items() if k != "frame_name"}, mesh)

    example = make_batch(0)
    params, opt_state, scene_model, human_model, opt = stage3.init_state(
        cfg, jax.random.key(args.seed), example)

    # two-checkpoint warm start (ref: 3rd run.py:205-212); each path may
    # be a reference torch .ckpt or this framework's own Orbax ckpt dir
    if args.human_path:
        imported = ck.load_stage_params(args.human_path, "human")
        params["human"] = ck.overlay_params(params["human"], imported)
    if args.bkgd_path:
        imported = ck.load_stage_params(args.bkgd_path, "scene")
        params["scene"] = ck.overlay_params(params["scene"], imported)

    start_step, loop_rng = 0, jax.random.key(args.seed + 1)
    if args.resume_training or args.ckpt_path:
        params, opt_state, start_step, loop_rng = ck.restore_train_state(
            os.path.join(logdir, "ckpt"), args.ckpt_path or "last",
            params, opt_state, loop_rng)

    # the lpips patch loss is stage 3's largest term (w_lpips=1.0,
    # ref 3rd model.py:892-906) — wire it exactly as stage 2 does
    lp_model, lp_params, lp_backbone = _load_lpips(args, cfg.patch_size)
    lp_apply = (None if lp_model is None else
                (lambda p, a, b: lp_model.apply({"params": p}, a, b)))
    step_fn = jax.jit(stage3.make_train_step(
        cfg, scene_model, human_model, opt, ds.transitions, lp_apply))

    def wrapped_step(params, opt_state, batch, step, rng):
        return step_fn(params, opt_state, lp_params, batch, step, rng)

    from hosnerf_tpu.eval import renderers
    from hosnerf_tpu.models.state import state_index
    trans = (jnp.asarray(ds.transitions) if ds.transitions is not None
             else None)

    @jax.jit
    def render_fn(p, b):
        s_idx = (state_index(b["time"], trans) if "time" in b
                 else jnp.int32(0))
        comp, _ = stage3.composed_forward(
            cfg, scene_model, human_model, p, b, 10**7, s_idx)
        return comp["rgb"]

    render_fn = pmesh.shard_eval_fn(render_fn, mesh)

    if args.run_mode == "train":
        prog_ds = HumanDataset(datadir, mode="progress",
                               use_scaleworld=True,
                               mweight_volume_size=vol_size, seed=args.seed)
        lp_metric = _make_lpips_metric(lp_model, lp_params)

        def progress_fn(carry, step):
            return renderers.evaluate_human(
                render_fn, carry[0], prog_ds, logdir,
                f"prog_{step:06d}", lpips_metric=lp_metric, max_items=4,
                extra_keys=("newsmpl_to_scale_world",))

        loop.run_training(
            num_steps=max_steps, sample_batch=make_batch,
            step_fn=wrapped_step, init_carry=(params, opt_state),
            logdir=logdir,
            rays_per_step=cfg.n_patches * cfg.patch_size**2,
            rng=loop_rng, start_step=start_step,
            progress_fn=progress_fn,
            progress_every=int(cfg_yaml.get("progress", {}).get(
                "dump_interval", 5000)))
    else:
        rnd_y = cfg_yaml.get("render", {})

        def factory(mode, **kw):
            if mode == "freeview":
                kw.setdefault("freeview_frame_idx", int(
                    cfg_yaml.get("freeview", {}).get("frame_idx", 0)))
            return HumanDataset(datadir, mode=mode, use_scaleworld=True,
                                mweight_volume_size=vol_size,
                                bgcolor=[255.0, 255.0, 255.0], **kw)

        @jax.jit
        def tpose_render_fn(p, b):
            # human-only canonical render (ref: 3rd test_tpose)
            s_idx = (state_index(b["time"], trans) if "time" in b
                     else jnp.int32(0))
            return human_model.apply({"params": p["human"]}, b, 10**7,
                                     s_idx, is_train=False)["rgb"]

        tpose_render_fn = pmesh.shard_eval_fn(tpose_render_fn, mesh)

        if args.run_mode == "eval":
            out = renderers.full_human_eval(
                render_fn, params, factory, logdir,
                transitions=ds.transitions,
                lpips_metric=_make_lpips_metric(lp_model, lp_params),
                lpips_backbone=lp_backbone,
                extra_keys=("newsmpl_to_scale_world",),
                tpose_render_fn=tpose_render_fn,
                # ref 3rd tpose.py:29 renders 512^2
                tpose_resolution=int(rnd_y.get("tpose_resolution", 512)),
                freeview_frames=int(rnd_y.get("freeview_frames", 100)),
                tpose_views=rnd_y.get("tpose_views"))
        else:
            out = renderers.render_freeview(
                render_fn, params,
                factory(mode="freeview", render_frames=int(
                    rnd_y.get("freeview_frames", 100))), logdir,
                extra_keys=("newsmpl_to_scale_world",))
        print(out if args.run_mode == "eval" else f"{len(out)} frames")


def main(argv=None):
    # HOSNERF_PLATFORM pins the jax backend (e.g. 'cpu' for smoke runs):
    # the env var JAX_PLATFORMS alone can be overridden by site hooks,
    # so pin via jax.config before any device query
    if os.environ.get("HOSNERF_PLATFORM"):
        import jax
        jax.config.update("jax_platforms", os.environ["HOSNERF_PLATFORM"])
    args = build_parser().parse_args(argv)
    np.random.seed(args.seed)
    if args.stage == "scene":
        run_scene(args)
    elif args.stage == "human":
        run_human(args)
    else:
        run_hosnerf(args)


if __name__ == "__main__":
    main()
