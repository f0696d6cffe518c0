"""Small shared linen layers with torch-matching initialization."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def resolve_remat(spec) -> str:
    """Remat config spec -> 'none' | 'heavy' | 'all'. Accepts bools
    (False->'none', True->'all') or the strings. 'heavy' remats only the
    memory-dominant trunk of a model (scene: the 8x1024 nerf MLP; human:
    the 8x256 canonical MLP) — the smaller MLPs' residuals fit HBM even
    at the 8-patch batch, so they skip remat's ~33% re-forward FLOPs."""
    if isinstance(spec, str):
        key = spec.lower()
        if key in ("none", "heavy", "all"):
            return key
        raise ValueError(f"unknown remat mode {spec!r}")
    return "all" if spec else "none"


def resolve_compute_dtype(spec):
    """Config-surface dtype spec -> jnp dtype or None. Accepts None,
    'bf16'/'bfloat16', 'f32'/'float32', or an actual dtype."""
    if spec is None or not isinstance(spec, str):
        return spec
    key = spec.lower()
    if key in ("bf16", "bfloat16"):
        return jnp.bfloat16
    if key in ("f32", "float32", "fp32"):
        return None
    raise ValueError(f"unknown compute_dtype {spec!r}")


def kaiming_uniform():
    """torch's nn.init.kaiming_uniform_ with default args (gain sqrt(2))."""
    return nn.initializers.variance_scaling(2.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int) -> Callable:
    """torch Linear's default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def xavier_uniform_gain(gain: float):
    """The reference's xavier_uniform_ with explicit gain
    (ref: 2nd.../core/utils/network_util.py:183-259: std = gain *
    sqrt(2/(fan_in+fan_out)), bound = std*sqrt(3))."""
    return nn.initializers.variance_scaling(
        gain * gain, "fan_avg", "uniform")


def small_uniform(bound: float = 1e-5) -> Callable:
    """U(-bound, bound); the reference's near-zero last-layer init."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchLinear(nn.Module):
    """Dense layer matching torch nn.Linear's default init, with optional
    kernel init override.

    `dtype` is the COMPUTATION dtype (params always stored f32): pass
    jnp.bfloat16 to run the matmul at the MXU's bf16 rate."""

    features: int
    kernel_init: Callable | None = None
    bias_init_fan_in: bool = True
    dtype: "jnp.dtype | None" = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kinit = self.kernel_init or kaiming_uniform()
        binit = (torch_bias_init(fan_in) if self.bias_init_fan_in
                 else nn.initializers.zeros_init())
        return nn.Dense(self.features, kernel_init=kinit, bias_init=binit,
                        dtype=self.dtype)(x)
