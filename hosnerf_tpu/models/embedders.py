"""Positional embedders for the human-object model.

Matches the reference's two embedders:
* classic NeRF fourier PE with identity prepended and per-frequency
  [sin, cos] interleaving (ref: 2nd_State_Conditional_Human-Object/
  core/nets/human_nerf/embedders/fourier.py:13-57);
* hann-window-annealed PE gated by kick_in_iter/full_band_iter, no identity
  (ref: embedders/hannw_fourier.py:15-72). The window is computed from a
  *traced* iter_val, so training stays single-compile.

Feature LAYOUT matters for checkpoint import: the reference concatenates
[x, sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x), ...] over the last axis
(each term is the full 3-vector).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def fourier_embed(x: jnp.ndarray, multires: int,
                  include_input: bool = True) -> jnp.ndarray:
    """[..., d] -> [..., d*(include + 2*multires)] with reference layout.

    Built as ONE wide [N, 2*F*d] tensor (a python list of [N, 3] pieces
    pads each piece's 3-lane axis to 128 on TPU — observed 42x memory
    expansion in XLA dumps)."""
    d = x.shape[-1]
    freqs = jnp.asarray(2.0 ** np.linspace(0.0, multires - 1, multires),
                        x.dtype)
    scaled = (x[..., None, :] * freqs[:, None])  # [..., F, d]
    # interleave [sin f0, cos f0, sin f1, cos f1, ...] along the freq axis
    both = jnp.stack([jnp.sin(scaled), jnp.cos(scaled)], axis=-2)
    four = both.reshape(x.shape[:-1] + (2 * multires * d,))
    if include_input:
        return jnp.concatenate([x, four], axis=-1)
    return four


def fourier_embed_dim(multires: int, include_input: bool = True,
                      input_dims: int = 3) -> int:
    return input_dims * ((1 if include_input else 0) + 2 * multires)


def hann_alpha(iter_val, kick_in_iter: float, full_band_iter: float,
               multires: int):
    """Annealing progress alpha = m * max(iter-kick,0) / (full-kick).
    ref: hannw_fourier.py:34-40.

    Degenerate configs with full_band_iter <= kick_in_iter (stage-3's
    default.yaml sets both to 0, which makes the reference formula 0/0=NaN
    at step 0) mean 'full band immediately': return alpha = multires.
    """
    if full_band_iter <= kick_in_iter:
        return jnp.float32(multires)
    t = jnp.maximum(jnp.asarray(iter_val, jnp.float32) - kick_in_iter, 0.0)
    n = full_band_iter - kick_in_iter
    return multires * t / n


def hannw_fourier_embed(x: jnp.ndarray, multires: int, alpha) -> jnp.ndarray:
    """Hann-windowed PE, no identity term. [..., d] -> [..., d*2*multires].

    w_j = (1 - cos(pi * clamp(alpha - j, 0, 1))) / 2  (ref: :42-44).
    One wide tensor, same layout rationale as fourier_embed.
    """
    d = x.shape[-1]
    freqs = jnp.asarray(2.0 ** np.linspace(0.0, multires - 1, multires),
                        x.dtype)
    j = jnp.arange(multires, dtype=x.dtype)
    w = (1.0 - jnp.cos(jnp.pi * jnp.clip(alpha - j, 0.0, 1.0))) / 2.0
    scaled = x[..., None, :] * freqs[:, None]  # [..., F, d]
    both = jnp.stack([jnp.sin(scaled), jnp.cos(scaled)],
                     axis=-2) * w[:, None, None]
    return both.reshape(x.shape[:-1] + (2 * multires * d,))
