"""LPIPS (VGG16) perceptual distance in flax — used both as a *training
loss* (stage 2/3 patch loss, weight 1.0) and as an eval metric.

ref: 2nd_State_Conditional_Human-Object/third_parties/lpips/lpips.py:23-80
and pretrained_networks.py (vgg16 slices relu1_2 / relu2_2 / relu3_3 /
relu4_3 / relu5_3).

Weights: the reference vendors only the five 1x1 'lin' heads
(third_parties/lpips/weights/v0.1/vgg.pth); the VGG16 backbone comes from
torchvision, which is NOT present in this zero-egress image. The converter
below imports both when .pth files are supplied; otherwise the backbone
falls back to a fixed-seed He init — the loss stays a valid (random-feature)
perceptual loss and the whole pipeline runs, but metric-grade LPIPS parity
requires dropping in the torchvision weights. Random multi-scale VGG
features are a known-usable perceptual distance; swap in real weights for
published-number comparisons.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# channel counts of the five tap points
VGG_TAPS = (64, 128, 256, 512, 512)
# conv plan: (out_channels, tap_after) per conv layer, 'M' = maxpool before
VGG_PLAN = [64, 64, "T", "M", 128, 128, "T", "M", 256, 256, 256, "T", "M",
            512, 512, 512, "T", "M", 512, 512, 512, "T"]

# imagenet normalization of the reference's ScalingLayer
# (lpips.py shift/scale buffers)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

DEFAULT_LIN_WEIGHTS = (
    "/root/reference/2nd_State_Conditional_Human-Object/third_parties/"
    "lpips/weights/v0.1/vgg.pth")


class VGG16Features(nn.Module):
    """VGG16 conv tower returning the five LPIPS tap activations.
    Input NHWC, imagenet-scaled."""

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        taps = []
        conv_idx = 0
        for item in VGG_PLAN:
            if item == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            elif item == "T":
                taps.append(x)
            else:
                x = nn.Conv(item, (3, 3), padding=1,
                            kernel_init=nn.initializers.he_normal(),
                            name=f"conv_{conv_idx}")(x)
                x = jax.nn.relu(x)
                conv_idx += 1
        return taps


class LPIPS(nn.Module):
    """lpips_value = sum_l mean_hw( lin_l( (norm(f_l(x)) - norm(f_l(y)))^2 ))

    Inputs are NHWC in [-1, 1] (callers use `scale_for_lpips`, i.e.
    img*2-1; ref: 2nd.../src/model/mipnerf360/model.py:889-890).
    """

    @nn.compact
    def __call__(self, x, y):
        if x.shape[1] < 16 or x.shape[2] < 16:
            raise ValueError(
                f"LPIPS needs inputs >= 16x16 (got {x.shape[1]}x{x.shape[2]});"
                " the 5th VGG tap has zero spatial extent below that and the"
                " mean over it is NaN. The reference trains on 32x32 patches.")
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        feats = VGG16Features(name="vgg")
        fx = feats((x - shift) / scale)
        fy = feats((y - shift) / scale)

        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / jnp.maximum(
                jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10)
            b = b / jnp.maximum(
                jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10)
            diff = (a - b) ** 2
            w = self.param(f"lin_{i}", nn.initializers.ones_init(),
                           (diff.shape[-1],))
            # 1x1 conv with non-negative weights (ref applies a plain 1x1
            # conv; weights in the shipped file are non-negative)
            contrib = jnp.einsum("nhwc,c->nhw", diff, w)
            total = total + jnp.mean(contrib, axis=(1, 2))
        return total


def init_lpips_params(rng: jax.Array, image_hw=(32, 32)) -> Dict[str, Any]:
    model = LPIPS()
    x = jnp.zeros((1, image_hw[0], image_hw[1], 3))
    return model.init(rng, x, x)["params"]


def backbone_provenance(vgg_path: str | None) -> str:
    """Which VGG backbone a `load_torch_weights(vgg_path=...)` call yields:
    'vgg16' (real torchvision weights) or 'random-fixed-seed'. Recorded in
    every results.json / bench artifact so no LPIPS number can be read as
    metric-grade without the provenance saying so (KNOWN_GAPS #1)."""
    return ("vgg16" if vgg_path and os.path.exists(vgg_path)
            else "random-fixed-seed")


_BANNER = (
    "=" * 72 + "\n"
    "[lpips] WARNING: VGG16 backbone weights NOT provided — LPIPS runs on\n"
    "[lpips] FIXED-SEED RANDOM features. Training works; LPIPS *numbers*\n"
    "[lpips] are not comparable to published metric-grade LPIPS. Supply\n"
    "[lpips] --lpips_vgg_path / LPIPS_VGG_PATH (torchvision vgg16 .pth)\n"
    "[lpips] for metric parity. results.json records lpips_backbone.\n"
    + "=" * 72)


def load_torch_weights(params: Dict[str, Any],
                       lin_path: str = DEFAULT_LIN_WEIGHTS,
                       vgg_path: str | None = None,
                       quiet: bool = False) -> Dict[str, Any]:
    """Overlay torch weights onto an initialized LPIPS param tree.

    lin_path: the reference's vendored lin heads (vgg.pth).
    vgg_path: a torchvision vgg16 state_dict (features.* keys); optional —
      unavailable in this image, importable when provided. When absent, a
    prominent banner marks the run as random-backbone (KNOWN_GAPS #1).
    """
    import torch

    if backbone_provenance(vgg_path) != "vgg16" and not quiet:
        print(_BANNER, flush=True)
    params = jax.tree.map(np.asarray, params)
    if lin_path and os.path.exists(lin_path):
        sd = torch.load(lin_path, map_location="cpu")
        for i in range(5):
            w = sd[f"lin{i}.model.1.weight"].numpy()  # (1, C, 1, 1)
            params[f"lin_{i}"] = w.reshape(-1).astype(np.float32)
    if vgg_path and os.path.exists(vgg_path):
        sd = torch.load(vgg_path, map_location="cpu")
        conv_keys = sorted(
            {int(k.split(".")[1]) for k in sd
             if k.startswith("features.") and k.endswith(".weight")})
        for j, layer_idx in enumerate(conv_keys):
            w = sd[f"features.{layer_idx}.weight"].numpy()  # (out,in,3,3)
            b = sd[f"features.{layer_idx}.bias"].numpy()
            params["vgg"][f"conv_{j}"]["kernel"] = (
                w.transpose(2, 3, 1, 0).astype(np.float32))
            params["vgg"][f"conv_{j}"]["bias"] = b.astype(np.float32)
    return jax.tree.map(jnp.asarray, params)
