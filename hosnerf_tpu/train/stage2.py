"""Stage-2 training: the dynamic human-object model.

Patch-based losses (ref: 2nd_State_Conditional_Human-Object/src/model/
mipnerf360/model.py:571-605,892-944):
    lpips * 1.0 + mse * 0.2 + flow * 0.01 + cycle * 0.01

TPU redesign notes:
* patches are DENSE 32x32 pixel grids (static shapes); the reference's
  variable-length in-bbox ray lists + `_unpack_imgs` scatter become a
  `where(patch_mask, rendered, bgcolor)` select;
* the `time > 0.005` flow gate is a traced multiplier, not a python branch;
* per-module learning rates (ref: core/train/optimizers/human_nerf/
  optimizer.py:19-50 + exp decay in optimizer_step model.py:607-634) are an
  optax.multi_transform keyed on param paths.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hosnerf_tpu.models import lpips as lpips_mod
from hosnerf_tpu.models.human import HumanObjectField
from hosnerf_tpu.models.state import state_index
from hosnerf_tpu.train.schedules import exp_decay


@dataclasses.dataclass(frozen=True)
class Stage2Config:
    maxiter: int = 400_000
    lr: float = 0.0006667
    lr_human_stateembeds: float = 0.0006667
    lr_mweight_vol_decoder: float = 0.00006667
    lr_pose_decoder: float = 0.00006667
    lr_non_rigid_mlp: float = 0.00006667
    lr_non_rigid_forward_mlp: float = 0.00006667
    lrate_decay: int = 500
    # loss weights (ref: configs/default.yaml:99-103)
    w_lpips: float = 1.0
    w_mse: float = 0.2
    w_flow: float = 0.01
    w_cycle: float = 0.01
    # patches (ref: configs/default.yaml:142-145)
    n_patches: int = 2
    patch_size: int = 32
    n_samples: int = 128
    num_states: int = 1
    total_bones: int = 26
    perturb: float = 1.0
    # chunked per-sample MLP evaluation (the reference's netchunk_per_gpu*4,
    # ref network.py:115); None = dense
    mlp_chunk: "int | None" = None
    # tiny-model knobs for tests
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
    # MLP-trunk computation dtype: 'bf16' or None=f32 (params, output
    # heads, LBS and compositing stay f32 either way)
    compute_dtype: "str | None" = None


def make_model(cfg: Stage2Config) -> HumanObjectField:
    return HumanObjectField(
        total_bones=cfg.total_bones, n_samples=cfg.n_samples,
        num_states=cfg.num_states, cnl_mlp_width=cfg.cnl_mlp_width,
        nr_mlp_width=cfg.nr_mlp_width,
        mweight_volume_size=cfg.mweight_volume_size,
        mlp_chunk=cfg.mlp_chunk, lbs_impl=cfg.lbs_impl,
        remat=cfg.remat, compute_dtype=cfg.compute_dtype)


# --------------------------------------------------------------------------
# optimizer: per-module LR groups, all with the same exp decay
# --------------------------------------------------------------------------

_GROUP_OF_MODULE = {
    "state_embeds": "human_stateembeds",
    "mweight_vol_decoder": "mweight_vol_decoder",
    "pose_decoder": "pose_decoder",
    "non_rigid_mlp": "non_rigid_mlp",
    "non_rigid_forward_mlp": "non_rigid_forward_mlp",
}


def _label_params(params) -> Any:
    def label(path, _):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        for part in names:
            if part in _GROUP_OF_MODULE:
                return _GROUP_OF_MODULE[part]
        return "base"

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(cfg: Stage2Config, params) -> optax.GradientTransformation:
    def adam_for(base_lr):
        sched = functools.partial(exp_decay, base_lr=base_lr,
                                  lrate_decay=cfg.lrate_decay)
        return optax.adam(sched, b1=0.9, b2=0.999)

    transforms = {
        "base": adam_for(cfg.lr),
        "human_stateembeds": adam_for(cfg.lr_human_stateembeds),
        "mweight_vol_decoder": adam_for(cfg.lr_mweight_vol_decoder),
        "pose_decoder": adam_for(cfg.lr_pose_decoder),
        "non_rigid_mlp": adam_for(cfg.lr_non_rigid_mlp),
        "non_rigid_forward_mlp": adam_for(cfg.lr_non_rigid_forward_mlp),
    }
    return optax.multi_transform(transforms, _label_params(params))


# --------------------------------------------------------------------------
# losses
# --------------------------------------------------------------------------

def unpack_patches(rgb_rays: jnp.ndarray, patch_masks: jnp.ndarray,
                   bgcolor: jnp.ndarray, n_patches: int, patch_size: int):
    """Rays (dense, patch-major) -> patch images, bg-filled outside the ray
    mask (static-shape version of the reference's `_unpack_imgs`,
    ref: model.py:41-50)."""
    imgs = rgb_rays.reshape(n_patches, patch_size, patch_size, 3)
    bg = bgcolor / 255.0
    return jnp.where(patch_masks[..., None] > 0, imgs, bg)


def flow_loss(ray_grid, newsmpl_to_camera_prev, intrinsics_prev, weights,
              deform_pts_prev):
    """Induced-flow MAE against RAFT flow, weighted by compositing weights
    and the flow-validity mask (ref: model.py:908-916, img2mae:62-71)."""
    hom = jnp.concatenate(
        [deform_pts_prev, jnp.ones_like(deform_pts_prev[..., :1])], -1)
    cam = jnp.einsum("ji,rsi->rsj", newsmpl_to_camera_prev, hom)[..., :3]
    pix = jnp.einsum("ji,rsi->rsj", intrinsics_prev, cam)
    # clamp |z| away from 0: samples with ~zero forward-LBS support land
    # at garbage positions (their wsum clamps at 1e-4) that can cross the
    # camera plane; their compositing weight is ~0, but inf * 0 = NaN —
    # so the division itself must stay finite
    z = pix[..., 2:3]
    zsafe = jnp.where(jnp.abs(z) < 1e-6,
                      jnp.where(z < 0, -1e-6, 1e-6), z)
    pix2d = pix[..., :2] / zsafe

    grid = jnp.broadcast_to(ray_grid[:, None, :],
                            (ray_grid.shape[0], pix2d.shape[1],
                             ray_grid.shape[-1]))
    induced = pix2d - grid[..., :2]
    gt = grid[..., 2:4]
    mask = grid[..., 4:5]
    num = jnp.sum(jnp.abs(induced - gt) * weights[..., None] * mask)
    return num / (jnp.sum(mask) + 1e-8) / induced.shape[-1]


def cycle_loss(observe_pts, deform_pts, mask):
    """Masked mean of ||observe - deform||^2 / 2 over fg-likelihood-selected
    samples (masked-static form of ref: model.py:934-936 +
    network.py:503-535 boolean gather)."""
    sq = jnp.sum((observe_pts - deform_pts) ** 2, axis=-1) / 2.0
    return jnp.sum(sq * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def make_loss_fn(cfg: Stage2Config, model: HumanObjectField,
                 lpips_apply=None):
    """lpips_apply: callable (pred_nhwc01, tgt_nhwc01) -> [N] or None."""

    def loss_fn(params, lpips_params, batch, iter_val, state_idx, rng):
        outputs = model.apply(
            {"params": params}, batch, iter_val, state_idx, rng=rng,
            perturb=cfg.perturb, is_train=True)

        pred = unpack_patches(outputs["rgb"], batch["patch_masks"],
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

        losses["cycle"] = cycle_loss(
            outputs["observe_pts"], outputs["deform_pts_final"],
            outputs["cycle_mask"])

        flow_gate = (batch["time"] > 0.005).astype(jnp.float32)
        losses["flow"] = flow_gate * flow_loss(
            batch["ray_grid"], batch["newsmpl_to_camera_prev"],
            batch["intrinsics_prev"], outputs["weights"],
            outputs["deform_pts_prev_final"])

        total = (cfg.w_lpips * losses["lpips"] + cfg.w_mse * losses["mse"]
                 + cfg.w_flow * losses["flow"]
                 + cfg.w_cycle * losses["cycle"])
        return total, losses

    return loss_fn


def make_train_step(cfg: Stage2Config, model: HumanObjectField,
                    opt: optax.GradientTransformation,
                    transitions: Optional[np.ndarray] = None,
                    lpips_apply=None):
    trans = (jnp.asarray(transitions, jnp.float32)
             if transitions is not None and len(transitions) else None)
    loss_fn = make_loss_fn(cfg, model, lpips_apply)

    def train_step(params, opt_state, lpips_params, batch, iter_val, rng):
        s_idx = state_index(batch["time"], trans)
        (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, lpips_params, batch, iter_val, s_idx, rng)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        losses["loss"] = loss
        return params, opt_state, losses

    return train_step


def init_state(cfg: Stage2Config, rng: jax.Array,
               example_batch: Dict[str, Any]):
    model = make_model(cfg)
    # is_train=True so the flow/cycle branches trace and ALL submodule
    # params (incl. non_rigid_forward_mlp) are created.
    init_fn = jax.jit(lambda r, b: model.init(
        {"params": r}, b, 0, jnp.int32(0), is_train=True)["params"])
    params = init_fn(rng, example_batch)
    opt = make_optimizer(cfg, params)
    opt_state = opt.init(params)
    return params, opt_state, model, opt
