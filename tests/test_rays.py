"""Unit tests for hosnerf_tpu.core.rays against closed-form cases and
numerical autodiff (the contraction Jacobian)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hosnerf_tpu.core import geopoly, rays


def test_contract_points_identity_inside_ball():
    x = jnp.array([[0.3, -0.2, 0.1], [0.0, 0.0, 0.0], [0.99, 0.0, 0.0]])
    np.testing.assert_allclose(rays.contract_points(x), x, atol=1e-6)


def test_contract_points_outside_ball():
    x = jnp.array([[4.0, 0.0, 0.0]])
    # r=4 -> scale=(2*4-1)/16 = 7/16 -> 1.75
    np.testing.assert_allclose(
        rays.contract_points(x), [[1.75, 0.0, 0.0]], atol=1e-6)
    # limit: ||f(x)|| -> 2 as r -> inf
    far = jnp.array([[1e6, 0.0, 0.0]])
    np.testing.assert_allclose(
        jnp.linalg.norm(rays.contract_points(far)), 2.0, atol=1e-4)


def test_contract_jacobian_matches_autodiff():
    pts = np.random.default_rng(1).normal(size=(64, 3)) * 3.0
    pts = jnp.asarray(pts, jnp.float32)
    jac_closed = rays.contract_jacobian(pts)
    jac_auto = jax.vmap(jax.jacfwd(rays.contract_points))(pts)
    np.testing.assert_allclose(jac_closed, jac_auto, atol=1e-4, rtol=1e-4)


def test_contract_propagates_cov_and_stops_gradient():
    rng = np.random.default_rng(2)
    mean = jnp.asarray(rng.normal(size=(4, 8, 3)) * 2.0, jnp.float32)
    A = rng.normal(size=(4, 8, 3, 3)) * 0.1
    cov = jnp.asarray(A @ np.swapaxes(A, -1, -2), jnp.float32)
    new_mean, new_cov = rays.contract(mean, cov)
    assert new_mean.shape == mean.shape
    assert new_cov.shape == cov.shape

    # gradient is stopped (reference detaches: helper.py:57-60)
    g = jax.grad(lambda m: jnp.sum(rays.contract(m, cov)[0] ** 2))(mean)
    np.testing.assert_allclose(g, jnp.zeros_like(g))


def test_expected_sin_zero_var_is_sin():
    m = jnp.linspace(-3, 3, 13)
    np.testing.assert_allclose(
        rays.expected_sin(m, jnp.zeros_like(m)), jnp.sin(m), atol=1e-6)


def test_integrated_pos_enc_zero_var_matches_pos_enc():
    x = jnp.asarray(np.random.default_rng(3).normal(size=(5, 3)), jnp.float32)
    ipe = rays.integrated_pos_enc(x, jnp.zeros_like(x), 0, 4)
    pe = rays.pos_enc(x, 0, 4, append_identity=False)
    np.testing.assert_allclose(ipe, pe, atol=1e-6)


def test_ray_warps_roundtrip_and_endpoints():
    t_to_s, s_to_t = rays.construct_ray_warps(0.5, 100.0)
    np.testing.assert_allclose(t_to_s(0.5), 0.0, atol=1e-6)
    np.testing.assert_allclose(t_to_s(100.0), 1.0, atol=1e-6)
    t = jnp.linspace(0.5, 100.0, 11)
    np.testing.assert_allclose(s_to_t(t_to_s(t)), t, rtol=1e-5)


def test_lift_gaussian_diag_vs_full():
    rng = np.random.default_rng(4)
    d = jnp.asarray(rng.normal(size=(6, 3)), jnp.float32)
    t_mean = jnp.asarray(rng.uniform(1, 5, size=(6, 7)), jnp.float32)
    t_var = jnp.asarray(rng.uniform(0.01, 0.1, size=(6, 7)), jnp.float32)
    r_var = jnp.asarray(rng.uniform(0.01, 0.1, size=(6, 7)), jnp.float32)
    mean_d, cov_d = rays.lift_gaussian(d, t_mean, t_var, r_var, diag=True)
    mean_f, cov_f = rays.lift_gaussian(d, t_mean, t_var, r_var, diag=False)
    np.testing.assert_allclose(mean_d, mean_f, atol=1e-6)
    np.testing.assert_allclose(
        cov_d, jnp.diagonal(cov_f, axis1=-2, axis2=-1), atol=1e-5)


def test_cast_rays_cone_centers_near_interval_middle():
    origins = jnp.zeros((2, 3))
    directions = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]])
    radii = jnp.full((2, 1), 0.01)
    t = jnp.broadcast_to(jnp.linspace(1.0, 5.0, 9), (2, 9))
    means, covs = rays.cast_rays(t, origins, directions, radii, "cone", diag=False)
    assert means.shape == (2, 8, 3)
    assert covs.shape == (2, 8, 3, 3)
    # the distance of each mean along the ray lies inside its interval
    proj = jnp.einsum("bsd,bd->bs", means, directions)
    assert bool(jnp.all(proj > t[:, :-1])) and bool(jnp.all(proj < t[:, 1:]))


@pytest.mark.parametrize("shape,expected_n", [("icosahedron", 21)])
def test_generate_basis(shape, expected_n):
    basis = geopoly.generate_basis(shape, 2)
    assert basis.shape == (3, expected_n)
    norms = np.linalg.norm(basis, axis=0)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # no two columns are reflections or duplicates of each other
    dots = np.abs(basis.T @ basis) - np.eye(expected_n)
    assert dots.max() < 1.0 - 1e-4


@pytest.mark.parametrize("shape", ["cone", "cylinder"])
def test_contracted_lifted_gaussians_matches_composed_path(shape):
    """The fused scene hot path (no [N,3,3] intermediates) is numerically
    identical to cast_rays(diag=False) -> contract -> lift_and_diagonalize."""
    rng = np.random.default_rng(3)
    R, S = 32, 17
    o = jnp.asarray(rng.normal(0, 2, (R, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(0, 1, (R, 3)), jnp.float32)
    radii = jnp.asarray(rng.uniform(0.001, 0.01, (R, 1)), jnp.float32)
    t = jnp.sort(jnp.asarray(rng.uniform(0.1, 60.0, (R, S + 1)),
                             jnp.float32), axis=-1)
    basis = jnp.asarray(geopoly.generate_basis("icosahedron", 2))

    means, covs = rays.cast_rays(t, o, d, radii, shape, diag=False)
    cm, cc = rays.contract(means, covs)
    lm, lv = rays.lift_and_diagonalize(cm, cc, basis)
    lm2, lv2 = rays.contracted_lifted_gaussians(o, d, radii, t, basis, shape)
    np.testing.assert_allclose(lm, lm2, atol=1e-6)
    np.testing.assert_allclose(lv, lv2, atol=2e-6)
