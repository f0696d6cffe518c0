"""Step-function resampling math for hierarchical (proposal) sampling.

Pure-jnp reimplementation of the reference's CDF/step-function toolkit
(ref: 1st_State-Conditional_Scene/src/model/mipnerf360/helper.py:92-359).

Provenance: the masked-max/min `searchsorted`/`sorted_interp` formulation
is the canonical step-function math from Google's multinerf (Apache-2.0),
which the HOSNeRF reference vendors verbatim; SURVEY.md §7 ordered a 1:1
mirror of helper.py with golden parity, so the formulas match that lineage
(the carrier language and batching are JAX-native).

Everything here is static-shape and branch-free so it fuses under XLA; the
interval search uses the broadcasted-mask formulation (O(n*m) compares on the
VPU), which beats a serial binary search on TPU for the small sample counts
used here (<= ~160 per ray).

Randomness is threaded through explicit ``jax.random`` keys.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hosnerf_tpu.core.rays import EPS


def searchsorted(a: jnp.ndarray, v: jnp.ndarray):
    """For each v, find idx_lo/idx_hi in sorted a s.t. a[lo] <= v < a[hi].

    Out-of-range queries clamp to the first/last index.
    ref: helper.py:92-97.
    """
    i = jnp.arange(a.shape[-1])
    v_ge_a = v[..., None, :] >= a[..., :, None]
    idx_lo = jnp.max(jnp.where(v_ge_a, i[:, None], i[:1, None]), axis=-2)
    idx_hi = jnp.min(jnp.where(~v_ge_a, i[:, None], i[-1:, None]), axis=-2)
    return idx_lo, idx_hi


def inner_outer(t0: jnp.ndarray, t1: jnp.ndarray, y1: jnp.ndarray):
    """Inner/outer bounds of the step fn (t1, y1) resampled onto intervals t0.

    ref: helper.py:100-115.
    """
    cy1 = jnp.concatenate(
        [jnp.zeros_like(y1[..., :1]), jnp.cumsum(y1, axis=-1)], axis=-1)
    idx_lo, idx_hi = searchsorted(t1, t0)

    cy1_lo = jnp.take_along_axis(cy1, idx_lo, axis=-1)
    cy1_hi = jnp.take_along_axis(cy1, idx_hi, axis=-1)

    y0_outer = cy1_hi[..., 1:] - cy1_lo[..., :-1]
    y0_inner = jnp.where(
        idx_hi[..., :-1] <= idx_lo[..., 1:],
        cy1_lo[..., 1:] - cy1_hi[..., :-1],
        jnp.zeros_like(cy1_lo[..., 1:]),
    )
    return y0_inner, y0_outer


def lossfun_outer(t, w, t_env, w_env):
    """Proposal ('interlevel') loss. ref: helper.py:117-119."""
    _, w_outer = inner_outer(t, t_env, w_env)
    return jnp.clip(w - w_outer, min=0.0) ** 2 / (w + EPS)


def lossfun_distortion(t, w):
    """mip-NeRF 360 distortion loss. ref: helper.py:121-128."""
    ut = (t[..., 1:] + t[..., :-1]) / 2.0
    dut = jnp.abs(ut[..., :, None] - ut[..., None, :])
    loss_inter = jnp.sum(w * jnp.sum(w[..., None, :] * dut, axis=-1), axis=-1)
    loss_intra = jnp.sum(w**2 * (t[..., 1:] - t[..., :-1]), axis=-1) / 3.0
    return loss_inter + loss_intra


def weight_to_pdf(t, w):
    """ref: helper.py:152-153."""
    return w / jnp.maximum(t[..., 1:] - t[..., :-1], EPS)


def pdf_to_weight(t, p):
    """ref: helper.py:155-156."""
    return p * (t[..., 1:] - t[..., :-1])


def max_dilate(t, w, dilation, domain=(-jnp.inf, jnp.inf)):
    """Dilate (via max) a step function. ref: helper.py:130-143."""
    t0 = t[..., :-1] - dilation
    t1 = t[..., 1:] + dilation
    t_dilate = jnp.sort(jnp.concatenate([t, t0, t1], axis=-1), axis=-1)
    t_dilate = jnp.clip(t_dilate, domain[0], domain[1])
    mask = (t0[..., None, :] <= t_dilate[..., None]) & (
        t1[..., None, :] > t_dilate[..., None])
    w_dilate = jnp.max(
        jnp.where(mask, w[..., None, :], jnp.zeros_like(w[..., None, :])),
        axis=-1)[..., :-1]
    return t_dilate, w_dilate


def max_dilate_weights(t, w, dilation, domain, renormalize=False):
    """ref: helper.py:158-164."""
    p = weight_to_pdf(t, w)
    t_dilate, p_dilate = max_dilate(t, p, dilation, domain)
    w_dilate = pdf_to_weight(t_dilate, p_dilate)
    if renormalize:
        w_dilate = w_dilate / jnp.maximum(
            jnp.sum(w_dilate, axis=-1, keepdims=True), EPS)
    return t_dilate, w_dilate


def integrate_weights(w):
    """Cumulative weights padded with 0 and 1. ref: helper.py:166-173."""
    cw = jnp.minimum(jnp.cumsum(w[..., :-1], axis=-1), 1.0)
    shape = cw.shape[:-1] + (1,)
    return jnp.concatenate(
        [jnp.zeros(shape, cw.dtype), cw, jnp.ones(shape, cw.dtype)], axis=-1)


def sorted_interp(x, xp, fp):
    """Piecewise-linear interp of (xp, fp) at sorted query x. ref: helper.py:175-190."""
    mask = x[..., None, :] >= xp[..., :, None]

    fp0 = jnp.max(jnp.where(mask, fp[..., None], fp[..., :1, None]), axis=-2)
    fp1 = jnp.min(jnp.where(~mask, fp[..., None], fp[..., -1:, None]), axis=-2)
    xp0 = jnp.max(jnp.where(mask, xp[..., None], xp[..., :1, None]), axis=-2)
    xp1 = jnp.min(jnp.where(~mask, xp[..., None], xp[..., -1:, None]), axis=-2)

    offset = jnp.clip(jnp.nan_to_num((x - xp0) / (xp1 - xp0), nan=0.0), 0.0, 1.0)
    return fp0 + offset * (fp1 - fp0)


def invert_cdf(u, t, w_logits):
    """Invert the CDF of softmax(w_logits) over knots t. ref: helper.py:192-196."""
    w = jax.nn.softmax(w_logits, axis=-1)
    cw = integrate_weights(w)
    return sorted_interp(u, cw, t)


def sample(rng, randomized, t, w_logits, num_samples,
           single_jitter=False, deterministic_center=False):
    """Draw samples from the step function's CDF. ref: helper.py:306-332.

    `rng` may be None when `randomized` is False.
    """
    if not randomized:
        if deterministic_center:
            pad = 1.0 / (2 * num_samples)
            u = jnp.linspace(pad, 1.0 - pad - EPS, num_samples, dtype=t.dtype)
        else:
            u = jnp.linspace(0.0, 1.0 - EPS, num_samples, dtype=t.dtype)
        u = jnp.broadcast_to(u, t.shape[:-1] + (num_samples,))
    else:
        u_max = EPS + (1.0 - EPS) / num_samples
        max_jitter = (1.0 - u_max) / (num_samples - 1) - EPS
        d = 1 if single_jitter else num_samples
        u = (
            jnp.linspace(0.0, 1.0 - u_max, num_samples, dtype=t.dtype)
            + jax.random.uniform(rng, t.shape[:-1] + (d,), dtype=t.dtype)
            * max_jitter
        )
    return invert_cdf(u, t, w_logits)


def sample_intervals(rng, randomized, t, w_logits, num_samples,
                     single_jitter=False, domain=(-jnp.inf, jnp.inf)):
    """Sample *intervals* (as num_samples+1 edges). ref: helper.py:336-359."""
    centers = sample(rng, randomized, t, w_logits, num_samples,
                     single_jitter, deterministic_center=True)
    mid = (centers[..., 1:] + centers[..., :-1]) / 2.0
    min_val, max_val = domain
    first = jnp.maximum(2 * centers[..., :1] - mid[..., :1], min_val)
    last = jnp.minimum(2 * centers[..., -1:] - mid[..., -1:], max_val)
    return jnp.concatenate([first, mid, last], axis=-1)
