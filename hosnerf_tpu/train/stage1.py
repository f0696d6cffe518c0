"""Stage-1 training: state-conditional mip-NeRF 360 background scene.

One jitted train step over a 1-D data mesh. The batch's ray axis is sharded
across devices; params are replicated; XLA inserts the gradient psum. This
replaces the reference's Lightning DDP + rank-strided samplers
(ref: 1st_State-Conditional_Scene/run.py:139-156, src/data/sampler.py).

Losses (ref: src/model/mipnerf360/model.py:491-514):
  charbonnier(data) * data_loss_mult
  + interlevel * interlevel_loss_mult
  + distortion * distortion_loss_mult
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hosnerf_tpu.models import scene
from hosnerf_tpu.models.state import state_index
from hosnerf_tpu.train.schedules import warmup_log_lerp


@dataclasses.dataclass(frozen=True)
class Stage1Config:
    max_steps: int = 500_000
    lr_init: float = 2.0e-3
    lr_final: float = 2.0e-5
    lr_delay_steps: int = 512
    lr_delay_mult: float = 0.01
    data_loss_mult: float = 1.0
    interlevel_loss_mult: float = 1.0
    distortion_loss_mult: float = 0.01
    charb_padding: float = 0.001
    grad_max_norm: float = 0.001
    near: float = 0.5
    far: float = 1e6
    num_states: int = 1
    # model size knobs threaded to SceneField
    num_prop_samples: int = 64
    num_nerf_samples: int = 32
    num_levels: int = 3
    nerf_netwidth: int = 1024
    prop_netwidth: int = 256
    # rays per scene-MLP slab (netchunk analog; None = dense)
    mlp_chunk: "int | None" = None
    # rematerialize MLP activations in backward (needed only for large
    # batches; ~1.45x step time at the 4096-ray production batch).
    # False/'none' | 'heavy' (only the 8x1024 nerf trunk) | True/'all'
    remat: "bool | str" = False
    # MLP-trunk computation dtype: 'bf16' runs the big matmuls at the
    # MXU's native rate (params/heads/compositing stay f32), None = f32
    compute_dtype: "str | None" = None


def make_model(cfg: Stage1Config) -> scene.SceneField:
    return scene.SceneField(
        num_states=cfg.num_states,
        num_prop_samples=cfg.num_prop_samples,
        num_nerf_samples=cfg.num_nerf_samples,
        num_levels=cfg.num_levels,
        nerf_netwidth=cfg.nerf_netwidth,
        prop_netwidth=cfg.prop_netwidth,
        mlp_chunk=cfg.mlp_chunk,
        remat=cfg.remat,
        compute_dtype=cfg.compute_dtype,
    )


def make_optimizer(cfg: Stage1Config) -> optax.GradientTransformation:
    schedule = functools.partial(
        warmup_log_lerp, max_steps=cfg.max_steps, lr_init=cfg.lr_init,
        lr_final=cfg.lr_final, lr_delay_steps=cfg.lr_delay_steps,
        lr_delay_mult=cfg.lr_delay_mult)
    txs = []
    if cfg.grad_max_norm > 0:
        txs.append(optax.clip_by_global_norm(cfg.grad_max_norm))
    txs.append(optax.adam(schedule, b1=0.9, b2=0.999))
    return optax.chain(*txs)


def init_state(cfg: Stage1Config, rng: jax.Array,
               example_batch: Dict[str, Any],
               transitions: Optional[np.ndarray] = None):
    """Returns (params, opt_state, model). `transitions` (host array) sets
    the number of states at model-build time via cfg.num_states."""
    model = make_model(cfg)
    dummy_idx = jnp.zeros((), jnp.int32)
    init_fn = jax.jit(lambda r, b: model.init(
        {"params": r}, b, 0.0, False, dummy_idx, cfg.near, cfg.far)["params"])
    params = init_fn(rng, example_batch)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    return params, opt_state, model


def compute_losses(cfg: Stage1Config, renderings, ray_history, target):
    rgb = renderings[-1]["rgb"]
    mse = jnp.mean((rgb - target) ** 2)
    loss = jnp.sqrt(mse + cfg.charb_padding**2) * cfg.data_loss_mult
    loss = loss + scene.interlevel_loss(ray_history) * cfg.interlevel_loss_mult
    loss = loss + scene.distortion_loss(ray_history) * cfg.distortion_loss_mult
    psnr = -10.0 * jnp.log(mse) / jnp.log(10.0)
    return loss, {"mse": mse, "psnr": psnr}


def make_train_step(cfg: Stage1Config, model: scene.SceneField,
                    opt: optax.GradientTransformation,
                    transitions: Optional[np.ndarray] = None):
    """Returns a jittable train_step(params, opt_state, batch, step, rng)."""
    trans = (jnp.asarray(transitions, jnp.float32)
             if transitions is not None and len(transitions) else None)

    def train_step(params, opt_state, batch, step, rng):
        train_frac = jnp.clip(step / cfg.max_steps, 0.0, 1.0)
        # per-ray state indices: the pooled samplers (all_images /
        # dynamic_batch) mix rays from images with different times in one
        # batch; MipMLP broadcasts a [R] index vector per ray
        # (ref ladder semantics: model.py:138-209, applied per forward)
        s_idx = state_index(batch["times"], trans)

        def loss_fn(p):
            renderings, ray_history = model.apply(
                {"params": p}, batch, train_frac, True, s_idx,
                cfg.near, cfg.far, rng=rng)
            return compute_losses(cfg, renderings, ray_history,
                                  batch["target"])

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        aux["loss"] = loss
        return params, opt_state, aux

    return train_step


def make_eval_step(cfg: Stage1Config, model: scene.SceneField,
                   transitions: Optional[np.ndarray] = None):
    trans = (jnp.asarray(transitions, jnp.float32)
             if transitions is not None and len(transitions) else None)

    def eval_step(params, batch, train_frac=1.0):
        s_idx = state_index(batch["times"][0], trans)
        renderings, _ = model.apply(
            {"params": params}, batch, train_frac, False, s_idx,
            cfg.near, cfg.far)
        return renderings[-1]["rgb"]

    return eval_step
