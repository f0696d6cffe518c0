"""Stage-3 training: joint fine-tune of scene + human-object with sample
composition.

ref: 3rd_Complete_HOSNeRF/src/model/mipnerf360/model.py:1495-1629
(training_step) and core/train/optimizers/human_nerf/optimizer.py:19-60
(joint optimizer: per-name human LRs, all background params at lr_bkgd,
10x lower LRs than stage 2, same exp decay).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hosnerf_tpu.models import composed, scene as scene_mod
from hosnerf_tpu.models.human import HumanObjectField
from hosnerf_tpu.models.state import state_index
from hosnerf_tpu.train import stage2 as s2
from hosnerf_tpu.train.schedules import exp_decay


@dataclasses.dataclass(frozen=True)
class Stage3Config:
    maxiter: int = 200_000
    # ref: 3rd/configs/default.yaml:84-92
    lr_cnl_mlp: float = 0.00006667
    lr_human_stateembeds: float = 0.00006667
    lr_mweight_vol_decoder: float = 0.000006667
    lr_pose_decoder: float = 0.000006667
    lr_non_rigid_mlp: float = 0.000006667
    lr_non_rigid_forward_mlp: float = 0.000006667
    lr_bkgd: float = 0.00006667
    lrate_decay: int = 500
    w_lpips: float = 1.0
    w_mse: float = 0.2
    w_flow: float = 0.01
    w_cycle: float = 0.01
    n_patches: int = 2
    patch_size: int = 32
    n_samples: int = 128
    num_states: int = 1
    total_bones: int = 26
    perturb: float = 1.0
    mlp_chunk: "int | None" = None  # chunked human-MLP evaluation
    # rays per scene-MLP slab (the chunk_bkg analog inside jit,
    # ref 3rd default.yaml:154; None = dense)
    scene_mlp_chunk: "int | None" = None
    near_bkg: float = 0.1  # ref: 3rd gin LitDataHumanObject.near_bkg
    far_bkg: float = 1e6
    # scene model (opaque background in stage 3; ref: Backpack.gin)
    opaque_background: bool = True
    # size knobs
    cnl_mlp_width: int = 256
    nr_mlp_width: int = 128
    mweight_volume_size: int = 32
    # LBS implementation: 'auto' = fused Pallas kernels on TPU
    lbs_impl: str = "auto"
    # rematerialize MLP activations in backward (needed only for large
    # batches; measured ~1.2-1.5x step overhead at the 2-patch batch).
    # False/'none' | 'heavy' (only the memory-dominant trunks: scene
    # nerf 8x1024, human canonical 8x256) | True/'all'
    remat: "bool | str" = False
    # per-model overrides (None = inherit `remat`). The two trunks have
    # very different recompute prices at the same 4.3 GB bf16 residual
    # footprint: re-forwarding the scene nerf costs ~4.4 TFLOP at the
    # 8-patch batch vs ~1.1 TFLOP for the human canonical MLP — when HBM
    # allows keeping only ONE dense, keep the nerf dense.
    scene_remat: "bool | str | None" = None
    human_remat: "bool | str | None" = None
    num_prop_samples: int = 64
    num_nerf_samples: int = 32
    nerf_netwidth: int = 1024
    prop_netwidth: int = 256
    # MLP-trunk computation dtype for BOTH models: 'bf16' or None=f32
    # (params, output heads, LBS, sampling and compositing stay f32)
    compute_dtype: "str | None" = None


def make_models(cfg: Stage3Config):
    human = HumanObjectField(
        total_bones=cfg.total_bones, n_samples=cfg.n_samples,
        num_states=cfg.num_states, cnl_mlp_width=cfg.cnl_mlp_width,
        nr_mlp_width=cfg.nr_mlp_width,
        mweight_volume_size=cfg.mweight_volume_size,
        mlp_chunk=cfg.mlp_chunk, lbs_impl=cfg.lbs_impl,
        remat=(cfg.remat if cfg.human_remat is None else cfg.human_remat),
        compute_dtype=cfg.compute_dtype)
    scene = scene_mod.SceneField(
        num_states=cfg.num_states, num_prop_samples=cfg.num_prop_samples,
        num_nerf_samples=cfg.num_nerf_samples,
        nerf_netwidth=cfg.nerf_netwidth, prop_netwidth=cfg.prop_netwidth,
        opaque_background=cfg.opaque_background,
        mlp_chunk=cfg.scene_mlp_chunk,
        remat=(cfg.remat if cfg.scene_remat is None else cfg.scene_remat),
        compute_dtype=cfg.compute_dtype)
    return scene, human


def make_optimizer(cfg: Stage3Config, params) -> optax.GradientTransformation:
    """params is {'scene': ..., 'human': ...}; human modules get their
    per-name LRs, everything under 'scene' gets lr_bkgd."""

    def adam_for(base_lr):
        sched = functools.partial(exp_decay, base_lr=base_lr,
                                  lrate_decay=cfg.lrate_decay)
        return optax.adam(sched, b1=0.9, b2=0.999)

    group_lrs = {
        "base": cfg.lr_cnl_mlp,
        "human_stateembeds": cfg.lr_human_stateembeds,
        "mweight_vol_decoder": cfg.lr_mweight_vol_decoder,
        "pose_decoder": cfg.lr_pose_decoder,
        "non_rigid_mlp": cfg.lr_non_rigid_mlp,
        "non_rigid_forward_mlp": cfg.lr_non_rigid_forward_mlp,
        "bkgd": cfg.lr_bkgd,
    }

    def label(path, _):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if names and names[0] == "scene":
            return "bkgd"
        for part in names:
            if part in s2._GROUP_OF_MODULE:
                return s2._GROUP_OF_MODULE[part]
        return "base"

    labels = jax.tree_util.tree_map_with_path(label, params)
    return optax.multi_transform(
        {k: adam_for(v) for k, v in group_lrs.items()}, labels)


def composed_forward(cfg: Stage3Config, scene_model, human_model, params,
                     batch, iter_val, state_idx, rng=None, is_train=False):
    """Run both fields and compose (ref: model.py:1501-1594). `params` is
    {'scene': ..., 'human': ...}."""
    batch_bkg = {
        "rays_o": batch["rays_o_bkg"],
        "rays_d": batch["rays_d_bkg"],
        "viewdirs": batch["viewdirs_bkg"],
        "radii": batch["radii"],
    }
    scene_rng = human_rng = None
    if rng is not None:
        scene_rng, human_rng = jax.random.split(rng)
    # train_frac pinned to 1.0 in stage 3 (ref: model.py:1513)
    _, ray_history = scene_model.apply(
        {"params": params["scene"]}, batch_bkg, 1.0, is_train, state_idx,
        cfg.near_bkg, cfg.far_bkg, rng=scene_rng)

    human_out = human_model.apply(
        {"params": params["human"]}, batch, iter_val, state_idx,
        rng=human_rng, perturb=cfg.perturb if is_train else 0.0,
        is_train=is_train)

    comp = composed.compose(ray_history[-1], human_out, batch)
    return comp, human_out


def make_loss_fn(cfg: Stage3Config, scene_model, human_model,
                 lpips_apply=None):
    def loss_fn(params, lpips_params, batch, iter_val, state_idx, rng):
        comp, human_out = composed_forward(
            cfg, scene_model, human_model, params, batch, iter_val,
            state_idx, rng, is_train=True)

        pred = s2.unpack_patches(comp["rgb"], batch["patch_masks"],
                                 batch["bgcolor"], cfg.n_patches,
                                 cfg.patch_size)
        target = batch["target_patches"]

        losses = {}
        losses["mse"] = jnp.mean((pred - target) ** 2)
        if lpips_apply is not None:
            losses["lpips"] = jnp.mean(lpips_apply(
                lpips_params, pred * 2.0 - 1.0, target * 2.0 - 1.0))
        else:
            losses["lpips"] = jnp.float32(0.0)

        losses["cycle"] = s2.cycle_loss(
            human_out["observe_pts"], human_out["deform_pts_final"],
            human_out["cycle_mask"])

        flow_gate = (batch["time"] > 0.005).astype(jnp.float32)
        losses["flow"] = flow_gate * s2.flow_loss(
            batch["ray_grid"], batch["newsmpl_to_camera_prev"],
            batch["intrinsics_prev"], comp["human_weights"],
            human_out["deform_pts_prev_final"])

        total = (cfg.w_lpips * losses["lpips"] + cfg.w_mse * losses["mse"]
                 + cfg.w_flow * losses["flow"]
                 + cfg.w_cycle * losses["cycle"])
        return total, losses

    return loss_fn


def make_train_step(cfg: Stage3Config, scene_model, human_model, opt,
                    transitions: Optional[np.ndarray] = None,
                    lpips_apply=None):
    trans = (jnp.asarray(transitions, jnp.float32)
             if transitions is not None and len(transitions) else None)
    loss_fn = make_loss_fn(cfg, scene_model, human_model, lpips_apply)

    def train_step(params, opt_state, lpips_params, batch, iter_val, rng):
        s_idx = state_index(batch["time"], trans)
        (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, lpips_params, batch, iter_val, s_idx, rng)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        losses["loss"] = loss
        return params, opt_state, losses

    return train_step


def init_state(cfg: Stage3Config, rng: jax.Array,
               example_batch: Dict[str, Any]):
    """Initialize both fields (fresh; checkpoint warm-start loads the
    stage-1/2 trees over these — ref: 3rd run.py:205-212)."""
    scene_model, human_model = make_models(cfg)
    r1, r2 = jax.random.split(rng)

    batch_bkg = {
        "rays_o": example_batch["rays_o_bkg"],
        "rays_d": example_batch["rays_d_bkg"],
        "viewdirs": example_batch["viewdirs_bkg"],
        "radii": example_batch["radii"],
    }
    scene_init = jax.jit(lambda r, b: scene_model.init(
        {"params": r}, b, 1.0, False, jnp.int32(0), cfg.near_bkg,
        cfg.far_bkg)["params"])
    human_init = jax.jit(lambda r, b: human_model.init(
        {"params": r}, b, 0, jnp.int32(0), is_train=True)["params"])
    params = {
        "scene": scene_init(r1, batch_bkg),
        "human": human_init(r2, example_batch),
    }
    opt = make_optimizer(cfg, params)
    opt_state = opt.init(params)
    return params, opt_state, scene_model, human_model, opt
