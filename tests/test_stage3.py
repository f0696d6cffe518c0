"""Tests for stage-3 composition and the joint train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hosnerf_tpu.data import synthetic
from hosnerf_tpu.models import composed
from hosnerf_tpu.train import stage3

TINY = dict(n_samples=16, cnl_mlp_width=64, nr_mlp_width=32,
            mweight_volume_size=16, n_patches=2, patch_size=8,
            num_prop_samples=16, num_nerf_samples=8, nerf_netwidth=64,
            prop_netwidth=32, near_bkg=0.5, far_bkg=20.0)


@pytest.fixture(scope="module")
def setup():
    cfg = stage3.Stage3Config(**TINY)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic.composed_batch(cfg.n_patches, cfg.patch_size,
                                      grid_size=16).items()}
    params, opt_state, scene_model, human_model, opt = stage3.init_state(
        cfg, jax.random.key(0), batch)
    return cfg, batch, params, opt_state, scene_model, human_model, opt


def test_compose_unit_semantics(rng_np):
    """compose() equals the bkg-only composite when the human contributes
    nothing, and blends when the human is opaque and in front."""
    R, Nb, Nh = 4, 8, 6
    scene_last = {
        "rgb": jnp.asarray(rng_np.uniform(0, 1, (R, Nb, 3)), jnp.float32),
        "density": jnp.full((R, Nb), 5.0),
        "tdist": jnp.broadcast_to(jnp.linspace(1.0, 5.0, Nb + 1), (R, Nb + 1)),
    }
    rays_o = jnp.zeros((R, 3))
    rays_d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (R, 3))
    z_h = jnp.broadcast_to(jnp.linspace(1.5, 2.0, Nh), (R, Nh))
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_h[..., None]

    batch = {"rays_o_bkg": rays_o, "rays_d_bkg": rays_d,
             "newsmpl_to_scale_world": jnp.eye(4)}

    # case 1: zero-mass human
    human_out = {
        "human_rgb": jnp.ones((R, Nh, 3)) * 0.5,
        "human_density": jnp.zeros((R, Nh)),
        "newsmpl_pts": pts,
        "pts_mask": jnp.zeros((R, Nh)),
    }
    out = composed.compose(scene_last, human_out, batch)
    assert not bool(out["idx_fg"].any())
    from hosnerf_tpu.core.render import raw2outputs_joint
    bkg_only = raw2outputs_joint(
        jnp.concatenate([scene_last["rgb"],
                         scene_last["density"][..., None]], -1),
        scene_last["tdist"][..., :-1], rays_d,
        jnp.ones((R, Nb, 1)))[0]
    np.testing.assert_allclose(np.asarray(out["rgb"]),
                               np.asarray(bkg_only), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["human_weights"]),
                               np.zeros((R, Nh)), atol=1e-7)

    # case 2: opaque human strictly in FRONT of all bkg mass (z < 1.0)
    z_h2 = jnp.broadcast_to(jnp.linspace(0.1, 0.5, Nh), (R, Nh))
    pts2 = rays_o[:, None, :] + rays_d[:, None, :] * z_h2[..., None]
    human_out2 = {
        "human_rgb": jnp.ones((R, Nh, 3)) * 0.5,
        "human_density": jnp.full((R, Nh), 1e6),
        "newsmpl_pts": pts2,
        "pts_mask": jnp.ones((R, Nh)),
    }
    out2 = composed.compose(scene_last, human_out2, batch)
    assert bool(out2["idx_fg"].all())
    np.testing.assert_allclose(np.asarray(out2["rgb"]), 0.5, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out2["human_weights"].sum(-1)), 1.0, atol=1e-4)
    # all weight on the FIRST human sample, in original order
    np.testing.assert_allclose(
        np.asarray(out2["human_weights"][:, 0]), 1.0, atol=1e-4)


def test_composed_forward_shapes(setup):
    cfg, batch, params, _, scene_model, human_model, _ = setup
    comp, human_out = stage3.composed_forward(
        cfg, scene_model, human_model, params, batch, 100, jnp.int32(0))
    R = cfg.n_patches * cfg.patch_size**2
    assert comp["rgb"].shape == (R, 3)
    assert comp["human_weights"].shape == (R, cfg.n_samples)
    assert bool(jnp.all(jnp.isfinite(comp["rgb"])))


def test_stage3_train_step_runs_and_decreases(setup):
    cfg, batch, params, opt_state, scene_model, human_model, opt = setup
    step_fn = jax.jit(stage3.make_train_step(cfg, scene_model, human_model,
                                             opt))
    rng = jax.random.key(5)
    losses = []
    for i in range(20):
        rng, sub = jax.random.split(rng)
        params, opt_state, aux = step_fn(
            params, opt_state, None, batch, jnp.float32(i), sub)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], (losses[0], losses[-1])


def test_stage3_optimizer_group_labels(setup):
    cfg, batch, params, _, _, _, _ = setup
    import optax
    from hosnerf_tpu.train.stage3 import make_optimizer
    # labels: every scene param -> bkgd; human components -> their group
    opt = make_optimizer(cfg, params)
    # just check it initializes and updates both trees
    state = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = opt.update(grads, state, params)
    # bkgd lr vs pose-decoder lr differ by 10x at step 0
    up_scene = jax.tree.leaves(updates["scene"])[0]
    up_pose = jax.tree.leaves(
        updates["human"]["pose_decoder"])[0]
    ratio = abs(float(up_scene.ravel()[0]) / float(up_pose.ravel()[0]))
    assert 5.0 < ratio < 20.0, ratio


def test_per_model_remat_overrides():
    """scene_remat/human_remat override the shared `remat` knob; None
    inherits it. The 8-patch bench relies on the split being honored."""
    cfg = stage3.Stage3Config(**TINY, remat="heavy", scene_remat="none")
    scene, human = stage3.make_models(cfg)
    assert scene.remat == "none"
    assert human.remat == "heavy"
    cfg2 = stage3.Stage3Config(**TINY, remat="all", human_remat="none")
    scene2, human2 = stage3.make_models(cfg2)
    assert scene2.remat == "all"
    assert human2.remat == "none"


def test_flow_loss_finite_at_camera_plane():
    """Garbage deform points (near-zero forward-LBS support) can project
    with camera z ~ 0; their compositing weight is ~0 but inf * 0 = NaN —
    flow_loss must clamp the division (regression: bench chain NaN at
    specific z-jitter keys, round 4)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hosnerf_tpu.train import stage2 as s2

    R, S = 4, 8
    rng = np.random.default_rng(0)
    ray_grid = jnp.asarray(rng.normal(size=(R, 5)).astype(np.float32))
    E = jnp.eye(4, dtype=jnp.float32)
    K = jnp.eye(3, dtype=jnp.float32)
    weights = jnp.zeros((R, S), jnp.float32)  # zero weight on bad pts
    pts = rng.normal(size=(R, S, 3)).astype(np.float32)
    pts[:, 0, 2] = 0.0          # exactly on the camera plane
    pts[:, 1, 2] = 1e-9         # epsilon in front
    pts[:, 2, 2] = -1e-9        # epsilon behind
    pts = jnp.asarray(pts)

    val = s2.flow_loss(ray_grid, E, K, weights, pts)
    assert np.isfinite(float(val))
    g = jax.grad(lambda p: s2.flow_loss(ray_grid, E, K, weights, p))(pts)
    assert np.isfinite(np.asarray(g)).all()
