"""Tests for the stage-2 human-object model, its components and train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hosnerf_tpu.data import synthetic
from hosnerf_tpu.models import embedders
from hosnerf_tpu.models.human_components import (ConvTranspose3dTorch,
                                                 MotionWeightVolumeDecoder)
from hosnerf_tpu.train import stage2

TINY = dict(n_samples=16, cnl_mlp_width=64, nr_mlp_width=32,
            mweight_volume_size=16, n_patches=2, patch_size=8)


@pytest.fixture(scope="module")
def setup():
    cfg = stage2.Stage2Config(**TINY)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic.human_batch(cfg.n_patches, cfg.patch_size,
                                   grid_size=16).items()}
    params, opt_state, model, opt = stage2.init_state(
        cfg, jax.random.key(0), batch)
    return cfg, batch, params, opt_state, model, opt


def test_fourier_embed_layout():
    x = jnp.array([[0.5, -0.25, 1.0]])
    e = embedders.fourier_embed(x, 4)
    assert e.shape == (1, 3 * (1 + 8))
    np.testing.assert_allclose(e[0, :3], x[0], atol=1e-6)  # identity first
    np.testing.assert_allclose(e[0, 3:6], jnp.sin(x[0]), atol=1e-6)
    np.testing.assert_allclose(e[0, 6:9], jnp.cos(x[0]), atol=1e-6)
    np.testing.assert_allclose(e[0, 9:12], jnp.sin(2 * x[0]), atol=1e-6)


def test_hann_window_annealing():
    x = jnp.ones((2, 3))
    # before kick-in: all windows zero -> embedding all zero
    a0 = embedders.hann_alpha(0, 1000, 5000, 6)
    e0 = embedders.hannw_fourier_embed(x, 6, a0)
    np.testing.assert_allclose(e0, jnp.zeros_like(e0), atol=1e-7)
    # past full band: windows are 1 -> plain sin/cos
    a1 = embedders.hann_alpha(5000, 1000, 5000, 6)
    e1 = embedders.hannw_fourier_embed(x, 6, a1)
    assert float(jnp.abs(e1[0, :3] - jnp.sin(x[0])).max()) < 1e-6
    # midway: low freqs on, high freqs off
    amid = embedders.hann_alpha(3000, 1000, 5000, 6)
    emid = embedders.hannw_fourier_embed(x, 6, amid)
    assert float(jnp.abs(emid[0, :3]).max()) > 0.1       # freq 0 active
    np.testing.assert_allclose(emid[0, -6:], 0.0, atol=1e-6)  # top freq off


def test_conv_transpose_matches_torch(rng_np):
    torch = pytest.importorskip("torch")
    x = rng_np.normal(size=(1, 2, 4, 4, 4)).astype(np.float32)
    tconv = torch.nn.ConvTranspose3d(2, 3, 4, 2, 1)
    with torch.no_grad():
        want = tconv(torch.from_numpy(x)).numpy()

    mod = ConvTranspose3dTorch(3)
    params = mod.init(jax.random.key(0), jnp.zeros((1, 4, 4, 4, 2)))
    # import torch weights: DHWIO = flip(w, spatial).transpose(2,3,4,0,1)
    w = tconv.weight.detach().numpy()
    params = {"params": {
        "kernel": jnp.asarray(np.flip(w, (2, 3, 4)).transpose(2, 3, 4, 0, 1)
                              .copy()),
        "bias": jnp.asarray(tconv.bias.detach().numpy()),
    }}
    got = mod.apply(params, jnp.asarray(x.transpose(0, 2, 3, 4, 1)))
    got = np.asarray(got).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_conv_transpose_conv_impl_matches_phase(rng_np, monkeypatch):
    """The TPU production path (native lhs-dilated conv, no spatial flip)
    must match the phase-decomposed matmul form — values and grads."""
    x = jnp.asarray(rng_np.normal(size=(1, 4, 4, 4, 6)).astype(np.float32))
    mod = ConvTranspose3dTorch(5)
    params = mod.init(jax.random.key(0), x)["params"]

    def loss(p, impl):
        monkeypatch.setenv("HOSNERF_DECONV_IMPL", impl)
        return jnp.sum(jnp.sin(mod.apply({"params": p}, x)))

    monkeypatch.setenv("HOSNERF_DECONV_IMPL", "phase")
    y_phase = mod.apply({"params": params}, x)
    g_phase = jax.grad(lambda p: loss(p, "phase"))(params)
    monkeypatch.setenv("HOSNERF_DECONV_IMPL", "conv")
    y_conv = mod.apply({"params": params}, x)
    g_conv = jax.grad(lambda p: loss(p, "conv"))(params)

    np.testing.assert_allclose(np.asarray(y_conv), np.asarray(y_phase),
                               atol=2e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4),
        g_conv, g_phase)


def test_mweight_decoder_shapes_and_softmax(rng_np):
    dec = MotionWeightVolumeDecoder(volume_size=16, total_bones=26)
    priors = jnp.asarray(
        rng_np.uniform(0.01, 1.0, (27, 16, 16, 16)).astype(np.float32))
    params = dec.init(jax.random.key(0), priors)
    vol = dec.apply(params, priors)
    assert vol.shape == (27, 16, 16, 16)
    np.testing.assert_allclose(
        np.asarray(vol.sum(axis=0)), np.ones((16, 16, 16)), atol=1e-5)


def test_human_forward_shapes(setup):
    cfg, batch, params, _, model, _ = setup
    R = cfg.n_patches * cfg.patch_size**2
    out = model.apply({"params": params}, batch, 1000, jnp.int32(0),
                      is_train=False)
    assert out["rgb"].shape == (R, 3)
    assert out["weights"].shape == (R, cfg.n_samples)
    assert out["human_rgb"].shape == (R, cfg.n_samples, 3)
    assert out["human_density"].shape == (R, cfg.n_samples)
    assert out["newsmpl_pts"].shape == (R, cfg.n_samples, 3)
    assert out["z_vals"].shape == (R, cfg.n_samples)
    assert bool(jnp.all(jnp.isfinite(out["rgb"])))
    # eval path omits training-only branches
    assert "deform_pts_prev_final" not in out


def test_human_forward_train_branches(setup):
    cfg, batch, params, _, model, _ = setup
    R = cfg.n_patches * cfg.patch_size**2
    out = model.apply({"params": params}, batch, 20000, jnp.int32(0),
                      rng=jax.random.key(3), is_train=True)
    assert out["deform_pts_prev_final"].shape == (R, cfg.n_samples, 3)
    assert out["observe_pts"].shape == (R * cfg.n_samples, 3)
    assert out["deform_pts_final"].shape == (R * cfg.n_samples, 3)
    assert out["cycle_mask"].shape == (R * cfg.n_samples,)


def test_pose_refiner_near_identity_at_init(setup):
    """Near-zero last-layer init means refined pose ~= input pose, so
    gating the refiner on/off barely changes the render at init."""
    cfg, batch, params, _, model, _ = setup
    out_on = model.apply({"params": params}, batch, 1000, jnp.int32(0),
                         is_train=False)
    # disable refinement by pushing kick-in far in the future
    import dataclasses
    model_off = stage2.make_model(cfg).clone(pose_kick_in_iter=10**9)
    out_off = model_off.apply({"params": params}, batch, 1000, jnp.int32(0),
                              is_train=False)
    np.testing.assert_allclose(np.asarray(out_on["rgb"]),
                               np.asarray(out_off["rgb"]), atol=1e-3)


def test_stage2_train_step_decreases_loss(setup):
    cfg, batch, params, opt_state, model, opt = setup
    step_fn = jax.jit(stage2.make_train_step(cfg, model, opt))
    rng = jax.random.key(7)
    losses = []
    for i in range(25):
        rng, sub = jax.random.split(rng)
        params, opt_state, aux = step_fn(
            params, opt_state, None, batch, jnp.float32(i), sub)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], (losses[0], losses[-1])


def test_stage2_flow_gated_by_time(setup):
    cfg, batch, params, opt_state, model, opt = setup
    loss_fn = stage2.make_loss_fn(cfg, model)
    b0 = dict(batch)
    b0["time"] = jnp.float32(0.0)
    _, l0 = jax.jit(loss_fn)(params, None, b0, 100, jnp.int32(0),
                             jax.random.key(0))
    assert float(l0["flow"]) == 0.0
    b1 = dict(batch)
    b1["time"] = jnp.float32(0.5)
    _, l1 = jax.jit(loss_fn)(params, None, b1, 100, jnp.int32(0),
                             jax.random.key(0))
    assert float(l1["flow"]) != 0.0


def test_mlp_chunked_eval_matches_dense(setup):
    """nn.scan chunked MLP evaluation is numerically identical to the
    dense pass (same params, same outputs)."""
    cfg, batch, params, _, model, _ = setup
    out_dense = model.apply({"params": params}, batch, 1000, jnp.int32(0),
                            is_train=False)
    model_chunked = stage2.make_model(cfg).clone(mlp_chunk=100)  # non-divisor
    out_chunk = model_chunked.apply({"params": params}, batch, 1000,
                                    jnp.int32(0), is_train=False)
    np.testing.assert_allclose(np.asarray(out_chunk["rgb"]),
                               np.asarray(out_dense["rgb"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_chunk["weights"]),
                               np.asarray(out_dense["weights"]), atol=1e-5)


def test_mlp_chunked_grads_match_dense(setup):
    cfg, batch, params, _, model, _ = setup
    model_chunked = stage2.make_model(cfg).clone(mlp_chunk=128)

    def loss(p, m):
        o = m.apply({"params": p}, batch, 20000, jnp.int32(0),
                    rng=jax.random.key(5), is_train=True)
        return jnp.sum(o["rgb"] ** 2)

    g1 = jax.grad(loss)(params, model)
    g2 = jax.grad(loss)(params, model_chunked)
    d = jax.tree.reduce(max, jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), g1, g2))
    assert d < 1e-4, d  # f32 summation-order noise only
