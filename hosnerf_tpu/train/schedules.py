"""Learning-rate schedules matching the reference's optimizer_step hooks."""

from __future__ import annotations

import jax.numpy as jnp


def warmup_log_lerp(step, max_steps: int, lr_init: float, lr_final: float,
                    lr_delay_steps: int = 512, lr_delay_mult: float = 0.01):
    """Stage-1 schedule: sine warmup over `lr_delay_steps`, then log-linear
    interpolation from lr_init to lr_final.
    ref: 1st_State-Conditional_Scene/src/model/mipnerf360/model.py:541-569.
    """
    step = jnp.asarray(step, jnp.float32)
    if lr_delay_steps > 0:
        delay = lr_delay_mult + (1.0 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0))
    else:
        delay = 1.0
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    scaled = jnp.exp(jnp.log(lr_init) * (1.0 - t) + jnp.log(lr_final) * t)
    return delay * scaled


def exp_decay(step, base_lr: float, lrate_decay: int = 500,
              decay_rate: float = 0.1):
    """Stage-2/3 schedule: lr = base * decay_rate^(step / (lrate_decay*1000)).
    ref: 2nd_State_Conditional_Human-Object/src/model/mipnerf360/model.py:
    607-634.
    """
    step = jnp.asarray(step, jnp.float32)
    return base_lr * decay_rate ** (step / (lrate_decay * 1000.0))
