"""Pallas LBS kernels vs the XLA gather forms (interpret mode on CPU).

Covers values and gradients for both kernels and both precision modes,
including padding (N not a multiple of the tile) and the documented
epsilon-clamp caveat (x_skel parity only where wsum > 1e-4 — below it
the output is the meaningless eps-clamped ratio in both impls).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hosnerf_tpu.ops import lbs as xlbs
from hosnerf_tpu.ops.pallas import lbs as plbs

B, G = 5, 8


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    N = 700  # not a multiple of TILE: exercises pad/unpad
    pts = jnp.asarray(rng.randn(N, 3) * 0.7, jnp.float32)
    Rs = jnp.asarray(
        np.stack([np.eye(3) + 0.1 * rng.randn(3, 3) for _ in range(B)]),
        jnp.float32)
    Ts = jnp.asarray(0.2 * rng.randn(B, 3), jnp.float32)
    vol = jax.nn.softmax(
        jnp.asarray(rng.randn(B + 1, G, G, G), jnp.float32), axis=0)
    bmin = jnp.asarray([-1.3, -1.1, -1.2], jnp.float32)
    bscale = jnp.asarray([0.9, 1.0, 1.1], jnp.float32)
    return pts, Rs, Ts, vol, bmin, bscale


def test_inverse_values_highest(data):
    pts, Rs, Ts, vol, bmin, bscale = data
    xs_ref, fg_ref, _ = xlbs.inverse_lbs_gather(pts, Rs, Ts, vol, bmin,
                                                bscale)
    xs, fg = plbs.inverse_lbs(pts, Rs, Ts, vol, bmin, bscale,
                              precision="highest")
    np.testing.assert_allclose(fg, fg_ref, atol=2e-6)
    m = fg_ref[:, 0] > 1e-4
    err = jnp.abs(xs - xs_ref).max(axis=1)
    assert float(err[m].max()) < 1e-5


def test_inverse_values_bf16(data):
    pts, Rs, Ts, vol, bmin, bscale = data
    xs_ref, fg_ref, _ = xlbs.inverse_lbs_gather(pts, Rs, Ts, vol, bmin,
                                                bscale)
    xs, fg = plbs.inverse_lbs(pts, Rs, Ts, vol, bmin, bscale,
                              precision="bf16")
    np.testing.assert_allclose(fg, fg_ref, atol=2e-2)
    m = fg_ref[:, 0] > 1e-4
    err = jnp.abs(xs - xs_ref).max(axis=1)
    assert float(err[m].max()) < 2e-2  # bf16 tap-weight contract


def test_inverse_grads_highest(data):
    pts, Rs, Ts, vol, bmin, bscale = data
    _, fg_ref, _ = xlbs.inverse_lbs_gather(pts, Rs, Ts, vol, bmin, bscale)
    m = (fg_ref[:, 0] > 1e-4).astype(jnp.float32)[:, None]

    def loss_ref(p, R, T, v):
        xs, fg, _ = xlbs.inverse_lbs_gather(p, R, T, v, bmin, bscale)
        return jnp.sum(jnp.sin(xs) * m) + jnp.sum(fg * fg)

    def loss_p(p, R, T, v):
        xs, fg = plbs.inverse_lbs(p, R, T, v, bmin, bscale,
                                  precision="highest")
        return jnp.sum(jnp.sin(xs) * m) + jnp.sum(fg * fg)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(pts, Rs, Ts, vol)
    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(pts, Rs, Ts, vol)
    for a, b in zip(gr, gp):
        scale = float(jnp.abs(a).max()) + 1e-6
        assert float(jnp.abs(a - b).max()) / scale < 1e-5


def test_shared_weights_and_grads(data):
    pts, Rs, Ts, vol, bmin, bscale = data
    coords = xlbs.normalize_coords(pts, bmin, bscale)
    taps = xlbs._trilinear_taps(coords, G, G, G)
    vf = vol.reshape(B + 1, -1)
    w_ref = jnp.stack([xlbs._sample_channel(vf[b], taps)
                       for b in range(B)], axis=1)
    w_hi = plbs.bone_weights(pts, vol, bmin, bscale, precision="highest")
    np.testing.assert_allclose(w_hi, w_ref, atol=1e-6)
    w_bf = plbs.bone_weights(pts, vol, bmin, bscale, precision="bf16")
    np.testing.assert_allclose(w_bf, w_ref, atol=2e-2)

    def loss_ref(p, v):
        c = xlbs.normalize_coords(p, bmin, bscale)
        t = xlbs._trilinear_taps(c, G, G, G)
        w = jnp.stack([xlbs._sample_channel(v.reshape(B + 1, -1)[b], t)
                       for b in range(B)], axis=1)
        return jnp.sum(jnp.cos(w * 3.0))

    def loss_p(p, v):
        return jnp.sum(jnp.cos(plbs.bone_weights(
            p, v, bmin, bscale, precision="highest") * 3.0))

    gr = jax.grad(loss_ref, argnums=(0, 1))(pts, vol)
    gp = jax.grad(loss_p, argnums=(0, 1))(pts, vol)
    for a, b in zip(gr, gp):
        scale = float(jnp.abs(a).max()) + 1e-6
        assert float(jnp.abs(a - b).max()) / scale < 1e-5


def test_dispatch_forward_pair_matches_forward_lbs(data):
    """bone_weights + apply_forward_lbs == forward_lbs (the shared-tap
    refactor of the cycle/flow branches, models/human.py)."""
    pts, Rs, Ts, vol, bmin, bscale = data
    x_ref, ws_ref = xlbs.forward_lbs(pts, Rs, Ts, vol, bmin, bscale)
    w = xlbs.bone_weights(pts, vol, bmin, bscale, impl="xla")
    x, ws = xlbs.apply_forward_lbs(w, pts, Rs, Ts)
    np.testing.assert_allclose(x, x_ref, atol=1e-5)
    np.testing.assert_allclose(ws, ws_ref, atol=1e-5)


def test_inverse_warp_dispatch(data):
    pts, Rs, Ts, vol, bmin, bscale = data
    xs_ref, fg_ref, _ = xlbs.inverse_lbs(pts, Rs, Ts, vol, bmin, bscale)
    for impl in ("xla", "gather", "pallas"):
        xs, fg = xlbs.inverse_warp(pts, Rs, Ts, vol, bmin, bscale,
                                   impl=impl)
        m = fg_ref[:, 0] > 1e-4
        tol = 2e-2 if impl == "pallas" else 1e-5  # pallas default = bf16
        assert float(jnp.abs(xs - xs_ref).max(axis=1)[m].max()) < tol
        np.testing.assert_allclose(fg, fg_ref, atol=tol)
