"""Unit tests for compositing primitives (hosnerf_tpu.core.render)."""

import jax.numpy as jnp
import numpy as np

from hosnerf_tpu.core import render


def test_alpha_weights_opaque_slab():
    # one huge-density interval absorbs everything
    density = jnp.array([[1e10, 0.0]])
    tdist = jnp.array([[0.0, 1.0, 2.0]])
    dirs = jnp.array([[1.0, 0.0, 0.0]])
    w, alpha, trans = render.compute_alpha_weights(density, tdist, dirs)
    np.testing.assert_allclose(w[0], [1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(trans[0], [1.0, 0.0], atol=1e-6)


def test_alpha_weights_sum_le_one():
    rng = np.random.default_rng(0)
    density = jnp.asarray(rng.uniform(0, 5, (16, 8)), jnp.float32)
    tdist = jnp.sort(jnp.asarray(rng.uniform(0, 4, (16, 9)), jnp.float32), -1)
    dirs = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
    w, _, _ = render.compute_alpha_weights(density, tdist, dirs)
    assert float(jnp.max(jnp.sum(w, -1))) <= 1.0 + 1e-5
    assert float(jnp.min(w)) >= 0.0


def test_volumetric_rendering_background_fill():
    w = jnp.zeros((4, 8))
    rgbs = jnp.ones((4, 8, 3)) * 0.5
    out = render.volumetric_rendering(rgbs, w, 1.0)
    np.testing.assert_allclose(out["rgb"], jnp.ones((4, 3)), atol=1e-6)
    np.testing.assert_allclose(out["acc"], jnp.zeros(4), atol=1e-6)


def test_raw2outputs_masked_background():
    # zero fg-likelihood mask -> pure background color
    raw = jnp.ones((2, 4, 4)) * 10.0
    mask = jnp.zeros((2, 4, 1))
    z = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 4), (2, 4))
    rays_d = jnp.array([[0, 0, 1.0], [0, 0, 1.0]])
    bg = jnp.array([255.0, 0.0, 127.5])
    rgb, acc, w, depth = render.raw2outputs(raw, mask, z, rays_d, bg)
    np.testing.assert_allclose(rgb, jnp.broadcast_to(bg / 255.0, (2, 3)),
                               atol=1e-6)
    np.testing.assert_allclose(acc, jnp.zeros(2), atol=1e-6)


def test_raw2outputs_opaque_first_sample():
    raw = jnp.zeros((1, 3, 4))
    raw = raw.at[0, 0, 3].set(1e10)  # huge density at first sample
    raw = raw.at[..., :3].set(5.0)  # sigmoid(5) ~ 0.993
    mask = jnp.ones((1, 3, 1))
    z = jnp.array([[0.0, 0.5, 1.0]])
    rays_d = jnp.array([[0, 0, 1.0]])
    rgb, acc, w, depth = render.raw2outputs(
        raw, mask, z, rays_d, jnp.zeros(3))
    np.testing.assert_allclose(acc[0], 1.0, atol=1e-5)
    np.testing.assert_allclose(w[0], [1.0, 0.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(depth[0], 0.0, atol=1e-5)


def test_raw2outputs_joint_matches_masked_variant():
    """The stage-3 variant on pre-activated inputs matches raw2outputs when
    fed the same underlying values."""
    rng = np.random.default_rng(1)
    raw = jnp.asarray(rng.normal(size=(8, 16, 4)), jnp.float32)
    mask = jnp.asarray(rng.uniform(0, 1, (8, 16, 1)), jnp.float32)
    z = jnp.sort(jnp.asarray(rng.uniform(0, 2, (8, 16)), jnp.float32), -1)
    rays_d = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
    bg = jnp.asarray([12.0, 200.0, 64.0])

    rgb_a, acc_a, w_a, d_a = render.raw2outputs(raw, mask, z, rays_d, bg)

    import jax
    pre = jnp.concatenate(
        [jax.nn.sigmoid(raw[..., :3]), jax.nn.relu(raw[..., 3:])], -1)
    rgb_b, acc_b, w_b, d_b = render.raw2outputs_joint(pre, z, rays_d, mask, bg)
    np.testing.assert_allclose(rgb_a, rgb_b, atol=1e-5)
    np.testing.assert_allclose(w_a, w_b, atol=1e-5)
