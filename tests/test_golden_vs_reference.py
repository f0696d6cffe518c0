"""Golden parity tests: run the *reference* torch implementation (mounted
read-only at /root/reference) on fixed inputs and compare against our jnp
reimplementation. Skipped cleanly when the reference or torch is missing.

This imports the reference at test time only — no reference code is copied
into this repo.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/1st_State-Conditional_Scene"
sys.path.insert(0, REF)

try:
    import src.model.mipnerf360.helper as ref_helper  # noqa: E402
    HAVE_REF = True
except Exception:  # pragma: no cover
    HAVE_REF = False

pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference unavailable")

import jax.numpy as jnp  # noqa: E402

from hosnerf_tpu.core import geopoly, rays, render, stepfun  # noqa: E402


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(42)
    return rng


def test_ipe_golden(data):
    mean = data.normal(size=(4, 8, 21)).astype(np.float32)
    var = data.uniform(0.0, 0.5, size=(4, 8, 21)).astype(np.float32)
    want = ref_helper.integrated_pos_enc(_t(mean), _t(var), 0, 12).numpy()
    got = rays.integrated_pos_enc(jnp.asarray(mean), jnp.asarray(var), 0, 12)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_pos_enc_golden(data):
    x = data.normal(size=(7, 3)).astype(np.float32)
    want = ref_helper.pos_enc(_t(x), 0, 4, True).numpy()
    got = rays.pos_enc(jnp.asarray(x), 0, 4, True)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_contract_golden(data):
    """Closed-form Jacobian vs the reference's functorch jacrev."""
    try:
        import functorch  # noqa: F401
    except Exception:
        pytest.skip("functorch shim unavailable")
    mean = (data.normal(size=(2, 16, 3)) * 3).astype(np.float32)
    A = (data.normal(size=(2, 16, 3, 3)) * 0.05).astype(np.float32)
    cov = A @ np.swapaxes(A, -1, -2)
    want_mean, want_cov = ref_helper.contract(_t(mean), _t(cov), is_train=True)
    got_mean, got_cov = rays.contract(jnp.asarray(mean), jnp.asarray(cov))
    np.testing.assert_allclose(np.asarray(got_mean), want_mean.numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_cov), want_cov.numpy(),
                               atol=1e-4, rtol=1e-3)


def test_lift_and_diagonalize_golden(data):
    basis_ref = ref_helper.generate_basis("icosahedron", 2)
    basis_ours = geopoly.generate_basis("icosahedron", 2)
    np.testing.assert_allclose(basis_ours, basis_ref.numpy(), atol=1e-6)

    means = data.normal(size=(3, 5, 3)).astype(np.float32)
    A = (data.normal(size=(3, 5, 3, 3)) * 0.1).astype(np.float32)
    covs = A @ np.swapaxes(A, -1, -2)
    want_m, want_v = ref_helper.lift_and_diagonalize(
        _t(means), _t(covs), basis_ref)
    got_m, got_v = rays.lift_and_diagonalize(
        jnp.asarray(means), jnp.asarray(covs), jnp.asarray(basis_ours))
    np.testing.assert_allclose(np.asarray(got_m), want_m.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_v), want_v.numpy(), atol=1e-5)


def test_conical_frustum_golden(data):
    d = data.normal(size=(6, 3)).astype(np.float32)
    t = np.sort(data.uniform(0.5, 6, size=(6, 9)).astype(np.float32), -1)
    radii = data.uniform(0.001, 0.02, size=(6, 1)).astype(np.float32)
    o = data.normal(size=(6, 3)).astype(np.float32)
    want_mean, want_cov = ref_helper.cast_rays(
        _t(t), _t(o), _t(d), _t(radii), "cone", diag=False)
    got_mean, got_cov = rays.cast_rays(
        jnp.asarray(t), jnp.asarray(o), jnp.asarray(d), jnp.asarray(radii),
        "cone", diag=False)
    np.testing.assert_allclose(np.asarray(got_mean), want_mean.numpy(),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_cov), want_cov.numpy(),
                               atol=1e-5)


def test_compute_alpha_weights_golden(data):
    density = data.uniform(0, 3, size=(5, 8)).astype(np.float32)
    tdist = np.sort(data.uniform(0, 5, size=(5, 9)).astype(np.float32), -1)
    dirs = data.normal(size=(5, 3)).astype(np.float32)
    want = ref_helper.compute_alpha_weights(
        _t(density), _t(tdist), _t(dirs))[0].numpy()
    got = render.compute_alpha_weights(
        jnp.asarray(density), jnp.asarray(tdist), jnp.asarray(dirs))[0]
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_sample_intervals_golden_deterministic(data):
    t = np.sort(data.uniform(0, 1, size=(4, 7)).astype(np.float32), -1)
    logits = data.normal(size=(4, 6)).astype(np.float32)
    want = ref_helper.sample_intervals(
        False, _t(t), _t(logits), 16, single_jitter=True,
        domain=(0.0, 1.0)).numpy()
    got = stepfun.sample_intervals(
        None, False, jnp.asarray(t), jnp.asarray(logits), 16,
        single_jitter=True, domain=(0.0, 1.0))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_max_dilate_weights_golden(data):
    t = np.sort(data.uniform(0, 1, size=(4, 9)).astype(np.float32), -1)
    w = data.uniform(0, 1, size=(4, 8)).astype(np.float32)
    want_t, want_w = ref_helper.max_dilate_weights(
        _t(t), _t(w), 0.02, domain=(0.0, 1.0), renormalize=True)
    got_t, got_w = stepfun.max_dilate_weights(
        jnp.asarray(t), jnp.asarray(w), 0.02, (0.0, 1.0), renormalize=True)
    np.testing.assert_allclose(np.asarray(got_t), want_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_w), want_w.numpy(), atol=1e-5)


def test_lossfun_outer_golden(data):
    t = np.sort(data.uniform(0, 1, size=(4, 9)).astype(np.float32), -1)
    w = data.uniform(0, 1, size=(4, 8)).astype(np.float32)
    t_env = np.sort(data.uniform(0, 1, size=(4, 5)).astype(np.float32), -1)
    w_env = data.uniform(0, 1, size=(4, 4)).astype(np.float32)
    want = ref_helper.lossfun_outer(_t(t), _t(w), _t(t_env), _t(w_env)).numpy()
    got = stepfun.lossfun_outer(
        jnp.asarray(t), jnp.asarray(w), jnp.asarray(t_env), jnp.asarray(w_env))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_lossfun_distortion_golden(data):
    t = np.sort(data.uniform(0, 1, size=(4, 9)).astype(np.float32), -1)
    w = data.uniform(0, 1, size=(4, 8)).astype(np.float32)
    want = ref_helper.lossfun_distortion(_t(t), _t(w)).numpy()
    got = stepfun.lossfun_distortion(jnp.asarray(t), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
