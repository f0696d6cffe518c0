"""Tests for the flax LPIPS (loss-path perceptual distance)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hosnerf_tpu.models import lpips as lpips_mod


@pytest.fixture(scope="module")
def lpips_setup():
    params = lpips_mod.init_lpips_params(jax.random.key(0), (16, 16))
    model = lpips_mod.LPIPS()
    apply = jax.jit(lambda p, a, b: model.apply({"params": p}, a, b))
    return params, apply


def test_lpips_zero_on_identical(lpips_setup):
    params, apply = lpips_setup
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (2, 16, 16, 3)),
                    jnp.float32)
    d = apply(params, x, x)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)


def test_lpips_positive_and_monotone(lpips_setup):
    params, apply = lpips_setup
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 16, 16, 3)), jnp.float32)
    y_small = x + 0.05 * jnp.asarray(rng.normal(size=x.shape), jnp.float32)
    y_big = x + 0.5 * jnp.asarray(rng.normal(size=x.shape), jnp.float32)
    d_small = float(apply(params, x, y_small)[0])
    d_big = float(apply(params, x, y_big)[0])
    assert d_small > 0
    assert d_big > d_small


def test_lpips_gradient_flows(lpips_setup):
    params, apply = lpips_setup
    x = jnp.zeros((1, 16, 16, 3))
    y = jnp.ones((1, 16, 16, 3)) * 0.3
    g = jax.grad(lambda img: jnp.sum(apply(params, img, y)))(x)
    assert float(jnp.abs(g).max()) > 0


@pytest.mark.skipif(
    not os.path.exists(lpips_mod.DEFAULT_LIN_WEIGHTS),
    reason="vendored lin weights unavailable")
def test_lpips_loads_vendored_lin_heads(lpips_setup):
    params, apply = lpips_setup
    loaded = lpips_mod.load_torch_weights(
        jax.tree.map(np.asarray, params))
    for i, c in enumerate(lpips_mod.VGG_TAPS):
        assert loaded[f"lin_{i}"].shape == (c,)
        assert float(jnp.abs(loaded[f"lin_{i}"]).sum()) > 0
    # still computes
    x = jnp.zeros((1, 16, 16, 3))
    y = jnp.ones((1, 16, 16, 3))
    assert np.isfinite(float(apply(loaded, x, y)[0]))
