"""Image quality metrics in jnp: PSNR and SSIM (gaussian and uniform
windows), plus a jitted LPIPS metric wrapper.

The reference uses piqa SSIM/LPIPS for stage-1 eval
(1st.../src/model/interface.py:41-74) and skimage SSIM + the vendored LPIPS
for stages 2/3 (2nd.../src/model/mipnerf360/model.py:530-536). piqa's SSIM
is the classic gaussian-window (11, sigma 1.5) variant; skimage's default
is a uniform 7x7 window — both are provided.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def psnr(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean((pred - target) ** 2)
    return -10.0 * jnp.log(mse) / jnp.log(10.0)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - (size - 1) / 2.0
    g = np.exp(-(x**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _filter2d_separable(img: jnp.ndarray, k1d: jnp.ndarray) -> jnp.ndarray:
    """Depthwise separable 'valid' filtering of NHWC images."""
    n = k1d.shape[0]
    c = img.shape[-1]
    kh = jnp.broadcast_to(k1d.reshape(n, 1, 1, 1), (n, 1, 1, c))
    kw = jnp.broadcast_to(k1d.reshape(1, n, 1, 1), (1, n, 1, c))
    dn = jax.lax.conv_dimension_numbers(img.shape, kh.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(
        img, kh, (1, 1), "VALID", dimension_numbers=dn,
        feature_group_count=c)
    out = jax.lax.conv_general_dilated(
        out, kw, (1, 1), "VALID", dimension_numbers=dn,
        feature_group_count=c)
    return out


def ssim(pred: jnp.ndarray, target: jnp.ndarray, max_val: float = 1.0,
         kernel_size: int = 11, sigma: float = 1.5,
         uniform_window: bool = False) -> jnp.ndarray:
    """SSIM over [H, W, C] or [N, H, W, C] images in [0, max_val].

    gaussian 11/1.5 matches piqa defaults; uniform_window=True with
    kernel_size=7 matches skimage's default."""
    if pred.ndim == 3:
        pred = pred[None]
        target = target[None]
    if uniform_window:
        k1d = jnp.full((kernel_size,), 1.0 / kernel_size)
    else:
        k1d = jnp.asarray(_gaussian_kernel(kernel_size, sigma))

    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_x = _filter2d_separable(pred, k1d)
    mu_y = _filter2d_separable(target, k1d)
    mu_xx = _filter2d_separable(pred * pred, k1d)
    mu_yy = _filter2d_separable(target * target, k1d)
    mu_xy = _filter2d_separable(pred * target, k1d)

    var_x = mu_xx - mu_x**2
    var_y = mu_yy - mu_y**2
    cov = mu_xy - mu_x * mu_y

    ssim_map = ((2 * mu_x * mu_y + c1) * (2 * cov + c2)) / (
        (mu_x**2 + mu_y**2 + c1) * (var_x + var_y + c2))
    return jnp.mean(ssim_map, axis=(1, 2, 3))


def make_lpips_metric(lpips_params):
    """Returns a jitted callable(img_a01, img_b01) -> scalar LPIPS; inputs
    are [H, W, 3] (or [N, H, W, 3]) in [0, 1]."""
    from hosnerf_tpu.models.lpips import LPIPS
    model = LPIPS()

    @jax.jit
    def metric(a, b):
        if a.ndim == 3:
            a = a[None]
            b = b[None]
        return jnp.mean(model.apply({"params": lpips_params},
                                    a * 2.0 - 1.0, b * 2.0 - 1.0))

    return metric
