"""End-to-end smoke: fabricated on-disk mini-dataset -> REAL loaders ->
REAL train steps for all three stages (SURVEY.md §4(d))."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hosnerf_tpu.data import scene_loader, scene_pipeline, synthetic
from hosnerf_tpu.data.human_dataset import HumanDataset
from hosnerf_tpu.train import stage1, stage2, stage3

TINY_HUMAN = dict(n_samples=8, cnl_mlp_width=32, nr_mlp_width=16,
                  mweight_volume_size=8, n_patches=2, patch_size=8)


@pytest.fixture(scope="module")
def mini(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mini_e2e"))
    synthetic.write_mini_dataset(path, n_frames=20, res=40)
    return path


def test_stage1_smoke(mini):
    scene = scene_loader.load_nerf_360_v2(
        os.path.dirname(mini), os.path.basename(mini), factor=1,
        near=0.2, far=30.0)
    pipe = scene_pipeline.ScenePipeline(scene, batch_size=128)

    cfg = stage1.Stage1Config(max_steps=50, near=0.2, far=30.0,
                              nerf_netwidth=32, prop_netwidth=16,
                              num_prop_samples=8, num_nerf_samples=4,
                              lr_delay_steps=0, num_states=2)
    batch = {k: jnp.asarray(v) for k, v in pipe.sample_train_batch().items()}
    params, opt_state, model = stage1.init_state(cfg, jax.random.key(0),
                                                 batch)
    opt = stage1.make_optimizer(cfg)
    ds = HumanDataset(mini, mode="train", mweight_volume_size=8)
    step = jax.jit(stage1.make_train_step(cfg, model, opt,
                                          transitions=ds.transitions))
    rng = jax.random.key(1)
    losses = []
    for i in range(8):
        b = {k: jnp.asarray(v) for k, v in pipe.sample_train_batch().items()}
        rng, sub = jax.random.split(rng)
        params, opt_state, aux = step(params, opt_state, b, jnp.float32(i),
                                      sub)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()


def test_stage2_smoke_real_loader(mini):
    ds = HumanDataset(mini, mode="train", n_patches=2, patch_size=8,
                      mweight_volume_size=8)
    cfg = stage2.Stage2Config(**TINY_HUMAN)
    item = ds[0]
    batch = {k: jnp.asarray(v) for k, v in item.items()
             if k != "frame_name"}
    params, opt_state, model, opt = stage2.init_state(
        cfg, jax.random.key(0), batch)
    step = jax.jit(stage2.make_train_step(cfg, model, opt,
                                          transitions=ds.transitions))
    rng = jax.random.key(2)
    for i in range(3):
        item = ds[i % len(ds)]
        batch = {k: jnp.asarray(v) for k, v in item.items()
                 if k != "frame_name"}
        rng, sub = jax.random.split(rng)
        params, opt_state, aux = step(params, opt_state, None, batch,
                                      jnp.float32(i), sub)
        assert np.isfinite(float(aux["loss"])), aux


def test_stage3_smoke_real_loader(mini):
    # stage-1 loader must run first to emit cameras_scaleworld.pkl
    scene_loader.load_nerf_360_v2(
        os.path.dirname(mini), os.path.basename(mini), factor=1)
    ds = HumanDataset(mini, mode="train", n_patches=2, patch_size=8,
                      mweight_volume_size=8, use_scaleworld=True)
    cfg = stage3.Stage3Config(
        **TINY_HUMAN, num_prop_samples=8, num_nerf_samples=4,
        nerf_netwidth=32, prop_netwidth=16, near_bkg=0.2, far_bkg=30.0)
    item = ds[0]
    batch = {k: jnp.asarray(v) for k, v in item.items()
             if k != "frame_name"}
    params, opt_state, scene_model, human_model, opt = stage3.init_state(
        cfg, jax.random.key(0), batch)
    step = jax.jit(stage3.make_train_step(cfg, scene_model, human_model,
                                          opt, transitions=ds.transitions))
    rng = jax.random.key(3)
    for i in range(3):
        item = ds[(i + 1) % len(ds)]
        batch = {k: jnp.asarray(v) for k, v in item.items()
                 if k != "frame_name"}
        rng, sub = jax.random.split(rng)
        params, opt_state, aux = step(params, opt_state, None, batch,
                                      jnp.float32(i), sub)
        assert np.isfinite(float(aux["loss"])), aux


def test_stage2_learns_on_real_loader(mini):
    """Beyond finiteness: overfitting one real-loader frame at REFERENCE
    learning rates must reduce the loss substantially (VERDICT r1 weak
    #4). Needs the geometry-consistent mini dataset (subject painted
    along the projected skeleton): measured loss ratio 0.17x at step 100
    / 0.11x at 120 (density ignites ~step 90); asserted at 0.6x."""
    ds = HumanDataset(mini, mode="train", n_patches=2, patch_size=8,
                      mweight_volume_size=16)
    cfg = stage2.Stage2Config(n_samples=16, cnl_mlp_width=32,
                              nr_mlp_width=16, mweight_volume_size=16,
                              n_patches=2, patch_size=8)
    item = ds[0]
    batch = {k: jnp.asarray(v) for k, v in item.items()
             if k != "frame_name"}
    params, opt_state, model, opt = stage2.init_state(
        cfg, jax.random.key(0), batch)
    step = jax.jit(stage2.make_train_step(cfg, model, opt,
                                          transitions=ds.transitions))
    rng = jax.random.key(4)
    losses = []
    for i in range(120):
        rng, sub = jax.random.split(rng)
        params, opt_state, aux = step(params, opt_state, None, batch,
                                      jnp.float32(i), sub)
        losses.append(float(aux["loss"]))
    first, last = np.mean(losses[:5]), np.mean(losses[-5:])
    assert np.isfinite(losses).all()
    assert last < first * 0.6, (first, last)


def test_stage3_learns_on_real_loader(mini):
    """Joint stage-3 overfit of one frame at reference LRs: measured
    0.19x loss at step 100 even at the cheap G=8/S=8 config (the joint
    scene model learns the background fast); asserted at 0.6x."""
    scene_loader.load_nerf_360_v2(
        os.path.dirname(mini), os.path.basename(mini), factor=1)
    ds = HumanDataset(mini, mode="train", n_patches=2, patch_size=8,
                      mweight_volume_size=8, use_scaleworld=True)
    cfg = stage3.Stage3Config(
        **TINY_HUMAN, num_prop_samples=8, num_nerf_samples=4,
        nerf_netwidth=32, prop_netwidth=16, near_bkg=0.2, far_bkg=30.0)
    item = ds[0]
    batch = {k: jnp.asarray(v) for k, v in item.items()
             if k != "frame_name"}
    params, opt_state, scene_model, human_model, opt = stage3.init_state(
        cfg, jax.random.key(0), batch)
    step = jax.jit(stage3.make_train_step(cfg, scene_model, human_model,
                                          opt, transitions=ds.transitions))
    rng = jax.random.key(5)
    losses = []
    for i in range(100):
        rng, sub = jax.random.split(rng)
        params, opt_state, aux = step(params, opt_state, None, batch,
                                      jnp.float32(i), sub)
        losses.append(float(aux["loss"]))
    first, last = np.mean(losses[:5]), np.mean(losses[-5:])
    assert np.isfinite(losses).all()
    assert last < first * 0.6, (first, last)
