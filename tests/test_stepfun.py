"""Unit tests for step-function resampling math (hosnerf_tpu.core.stepfun)."""

import jax
import jax.numpy as jnp
import numpy as np

from hosnerf_tpu.core import stepfun


def test_searchsorted_basic():
    a = jnp.array([[0.0, 1.0, 2.0, 3.0]])
    v = jnp.array([[-0.5, 0.5, 1.0, 2.9, 3.5]])
    lo, hi = stepfun.searchsorted(a, v)
    np.testing.assert_array_equal(lo[0], [0, 0, 1, 2, 3])
    np.testing.assert_array_equal(hi[0], [0, 1, 2, 3, 3])


def test_inner_outer_bounds_true_mass():
    # a covering query interval's outer bound captures the total mass, and
    # inner <= true mass <= outer everywhere
    t1 = jnp.array([[0.0, 1.0, 2.0]])
    y1 = jnp.array([[0.3, 0.4]])
    t0 = jnp.array([[0.0, 2.0]])
    inner, outer = stepfun.inner_outer(t0, t1, y1)
    np.testing.assert_allclose(outer[0], [0.7], atol=1e-6)
    assert float(inner[0, 0]) <= 0.7 + 1e-6

    rng = np.random.default_rng(5)
    t1 = jnp.asarray(np.sort(rng.uniform(0, 1, (4, 9)), -1), jnp.float32)
    y1 = jnp.asarray(rng.uniform(0, 1, (4, 8)), jnp.float32)
    t0 = jnp.asarray(np.sort(rng.uniform(0, 1, (4, 5)), -1), jnp.float32)
    inner, outer = stepfun.inner_outer(t0, t1, y1)
    assert bool(jnp.all(inner <= outer + 1e-6))
    assert bool(jnp.all(inner >= -1e-6))


def test_lossfun_outer_zero_when_bounded():
    # if the proposal (env) puts >= as much mass everywhere, loss is 0
    t = jnp.array([[0.0, 1.0, 2.0]])
    w = jnp.array([[0.3, 0.3]])
    t_env = jnp.array([[0.0, 2.0]])
    w_env = jnp.array([[1.0]])
    loss = stepfun.lossfun_outer(t, w, t_env, w_env)
    np.testing.assert_allclose(loss, 0.0, atol=1e-6)


def test_lossfun_distortion_zero_for_delta():
    # all weight in one tiny interval -> loss ~ w^2 * dt / 3, tends to 0
    t = jnp.array([[0.0, 1e-6, 1.0]])
    w = jnp.array([[1.0, 0.0]])
    loss = stepfun.lossfun_distortion(t, w)
    assert float(loss[0]) < 1e-5


def test_distortion_increases_with_spread():
    t = jnp.array([[0.0, 0.25, 0.5, 0.75, 1.0]])
    w_tight = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    w_spread = jnp.array([[0.25, 0.25, 0.25, 0.25]])
    assert float(stepfun.lossfun_distortion(t, w_spread)[0]) > float(
        stepfun.lossfun_distortion(t, w_tight)[0])


def test_max_dilate_weights_preserves_max_and_covers():
    t = jnp.array([[0.0, 0.2, 0.6, 1.0]])
    w = jnp.array([[0.1, 0.8, 0.1]])
    t_d, w_d = stepfun.max_dilate_weights(t, w, 0.05, (0.0, 1.0),
                                          renormalize=True)
    assert t_d.shape[-1] == t.shape[-1] * 3 - 2  # t plus dilated edges
    np.testing.assert_allclose(jnp.sum(w_d, -1), 1.0, atol=1e-6)
    assert bool(jnp.all(jnp.diff(t_d, axis=-1) >= 0))


def test_integrate_weights_endpoints():
    w = jnp.array([[0.25, 0.25, 0.25, 0.25]])
    cw = stepfun.integrate_weights(w)
    np.testing.assert_allclose(cw[0, 0], 0.0)
    np.testing.assert_allclose(cw[0, -1], 1.0)
    np.testing.assert_allclose(cw[0], [0.0, 0.25, 0.5, 0.75, 1.0], atol=1e-6)


def test_sorted_interp_matches_numpy_interp():
    # note: sorted_interp (like the reference's helper.py:175-190) assumes
    # BOTH xp and fp are ascending, which holds for its only use (CDF
    # inversion: xp=cumweights, fp=t)
    rng = np.random.default_rng(0)
    xp = np.sort(rng.uniform(0, 1, size=(8,)))
    fp = np.sort(rng.normal(size=(8,)))
    x = np.sort(rng.uniform(0, 1, size=(16,)))
    got = stepfun.sorted_interp(
        jnp.asarray(x[None]), jnp.asarray(xp[None]), jnp.asarray(fp[None]))
    want = np.interp(x, xp, fp)
    np.testing.assert_allclose(got[0], want, atol=1e-5)


def test_invert_cdf_uniform_weights():
    t = jnp.array([[0.0, 1.0, 2.0, 3.0, 4.0]])
    logits = jnp.zeros((1, 4))
    u = jnp.array([[0.0, 0.25, 0.5, 0.75, 1.0]])
    t_new = stepfun.invert_cdf(u, t, logits)
    np.testing.assert_allclose(t_new[0], [0.0, 1.0, 2.0, 3.0, 4.0], atol=1e-5)


def test_sample_deterministic_within_domain_and_sorted():
    t = jnp.array([[0.0, 0.5, 1.0]])
    logits = jnp.log(jnp.array([[0.9, 0.1]]))
    s = stepfun.sample(None, False, t, logits, 32)
    assert bool(jnp.all(jnp.diff(s, axis=-1) >= 0))
    assert bool(jnp.all((s >= 0) & (s <= 1)))
    # most samples should land in the heavy first interval
    assert int(jnp.sum(s < 0.5)) > 24


def test_sample_randomized_stratified():
    t = jnp.array([[0.0, 1.0]])
    logits = jnp.zeros((1, 1))
    s = stepfun.sample(jax.random.key(0), True, t, logits, 64,
                       single_jitter=True)
    assert bool(jnp.all(jnp.diff(s, axis=-1) >= 0))
    # stratified: each sample stays in its own 1/64 stratum (+jitter < stratum)
    strata = jnp.floor(s * 64).astype(jnp.int32)
    assert int(jnp.sum(strata[0] == jnp.arange(64))) >= 63


def test_sample_intervals_shapes_and_domain():
    t = jnp.array([[0.0, 0.3, 1.0]])
    logits = jnp.zeros((1, 2))
    edges = stepfun.sample_intervals(
        jax.random.key(1), True, t, logits, 16, single_jitter=True,
        domain=(0.0, 1.0))
    assert edges.shape == (1, 17)
    assert bool(jnp.all(jnp.diff(edges, axis=-1) >= 0))
    assert float(edges.min()) >= 0.0 and float(edges.max()) <= 1.0
