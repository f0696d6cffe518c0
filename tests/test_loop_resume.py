"""True-resume + loop-mechanics tests (VERDICT r1 items 3-5, 8).

The reference resumes from Lightning .ckpt files carrying state_dict +
optimizer + loop state (ref: 1st run.py:124-131,158-160); here the orbax
train state is {params, opt_state, step, rng} and the loop restarts at the
saved step so LR schedules and Adam moments continue.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hosnerf_tpu.data import scene_loader, synthetic
from hosnerf_tpu.data.human_dataset import HumanDataset
from hosnerf_tpu.parallel import mesh as pmesh
from hosnerf_tpu.train import checkpoints as ck
from hosnerf_tpu.train import loop, stage2, stage3

TINY_HUMAN = dict(n_samples=8, cnl_mlp_width=32, nr_mlp_width=16,
                  mweight_volume_size=8, n_patches=2, patch_size=8)


@pytest.fixture(scope="module")
def mini(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mini_resume"))
    synthetic.write_mini_dataset(path, n_frames=20, res=40)
    # stage-1 loader emits cameras_scaleworld.pkl for stage 3
    scene_loader.load_nerf_360_v2(
        os.path.dirname(path), os.path.basename(path), factor=1)
    return path


def _counting_step(params, opt_state, batch, step, rng):
    """Fake step: params counts steps, opt_state accumulates step values."""
    return params + 1.0, opt_state + step, {"loss": jnp.float32(1.0)}


def test_loop_saves_full_state_and_resumes(tmp_path):
    logdir = str(tmp_path)
    carry = loop.run_training(
        num_steps=5, sample_batch=dict, step_fn=_counting_step,
        init_carry=(jnp.float32(0), jnp.float32(0)), logdir=logdir,
        checkpoint_every=2, log_every=100, prefetch=0)
    assert float(carry[0]) == 5.0

    p, o, s, rng = ck.restore_train_state(
        os.path.join(logdir, "ckpt"), "last",
        jnp.float32(0), jnp.float32(0), jax.random.key(0))
    assert s == 5 and float(p) == 5.0
    # opt_state accumulated 0+1+2+3+4
    assert float(o) == 10.0
    assert rng.dtype == jax.random.key(0).dtype

    # resume: steps 5..7 run, no repetition of 0..4
    carry = loop.run_training(
        num_steps=8, start_step=s, sample_batch=dict,
        step_fn=_counting_step, init_carry=(p, o), logdir=logdir,
        checkpoint_every=0, log_every=100, rng=rng, prefetch=0)
    assert float(carry[0]) == 8.0
    assert float(carry[1]) == 10.0 + 5 + 6 + 7


def test_progress_fn_schedule_and_empty_trap(tmp_path):
    calls = []

    def progress_fn(carry, step):
        calls.append(step)
        return {"psnr": 10.0, "is_empty_img": step >= 100}

    with pytest.raises(loop.EmptyRenderError):
        loop.run_training(
            num_steps=101, sample_batch=dict, step_fn=_counting_step,
            init_carry=(jnp.float32(0), jnp.float32(0)),
            logdir=str(tmp_path), checkpoint_every=0, log_every=1000,
            prefetch=0, progress_fn=progress_fn, progress_every=40)
    # fires at every progress_every multiple and the reference's step 100
    # (2nd model.py:600-601), where the empty trap raises
    assert calls == [40, 80, 100]


def test_prefetcher_overlaps_and_propagates_errors():
    seen = []

    def sample():
        seen.append(len(seen))
        if len(seen) > 3:
            raise ValueError("boom")
        return {"i": len(seen)}

    f = loop.BatchPrefetcher(sample, depth=1)
    assert f.get()["i"] == 1
    assert f.get()["i"] == 2
    assert f.get()["i"] == 3
    with pytest.raises(ValueError, match="boom"):
        f.get()
    f.close()


def test_stage2_resume_equivalence(tmp_path, mini):
    """2 steps + save/restore + 2 steps == 4 straight steps, bitwise-ish."""
    ds = HumanDataset(mini, mode="train", n_patches=2, patch_size=8,
                      mweight_volume_size=8)
    cfg = stage2.Stage2Config(**TINY_HUMAN)
    item = ds[0]
    batch = {k: jnp.asarray(v) for k, v in item.items()
             if k != "frame_name"}
    params0, opt0, model, opt = stage2.init_state(
        cfg, jax.random.key(0), batch)
    step = jax.jit(stage2.make_train_step(cfg, model, opt,
                                          transitions=ds.transitions))

    def run(params, opt_state, rng, lo, hi):
        for i in range(lo, hi):
            rng, sub = jax.random.split(rng)
            params, opt_state, _ = step(params, opt_state, None, batch,
                                        jnp.float32(i), sub)
        return params, opt_state, rng

    # straight 4 steps
    p_ref, _, _ = run(params0, opt0, jax.random.key(42), 0, 4)

    # 2 steps, checkpoint, restore into fresh trees, 2 more
    p2, o2, rng2 = run(params0, opt0, jax.random.key(42), 0, 2)
    ckdir = str(tmp_path / "ckpt")
    ck.save_checkpoint(ckdir, "last", ck.pack_train_state((p2, o2), 2, rng2))
    pr, orr, s, rngr = ck.restore_train_state(ckdir, "last", params0, opt0,
                                              jax.random.key(0))
    assert s == 2
    p_res, _, _ = run(pr, orr, rngr, s, 4)

    flat_ref = jax.tree.leaves(p_ref)
    flat_res = jax.tree.leaves(p_res)
    for a, b in zip(flat_ref, flat_res):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_stage2_sharded_batch_8dev(mini):
    """The CLI stage-2 path: real-loader batch sharded over the 8-device
    mesh, one jitted step (VERDICT r1 item 4)."""
    ds = HumanDataset(mini, mode="train", n_patches=2, patch_size=8,
                      mweight_volume_size=8)
    cfg = stage2.Stage2Config(**TINY_HUMAN)
    mesh = pmesh.make_mesh()
    assert mesh.size == 8
    item = ds[0]
    batch = pmesh.shard_batch(
        {k: v for k, v in item.items() if k != "frame_name"}, mesh)
    # the ray axis (2*8*8=128 rays) is actually distributed
    assert len(batch["rays_o"].sharding.device_set) == 8

    params, opt_state, model, opt = stage2.init_state(
        cfg, jax.random.key(0), batch)
    rep = pmesh.replicated(mesh)
    params = jax.device_put(params, rep)
    opt_state = jax.device_put(opt_state, rep)
    step = jax.jit(stage2.make_train_step(cfg, model, opt,
                                          transitions=ds.transitions))
    params, opt_state, aux = step(params, opt_state, None, batch,
                                  jnp.float32(0), jax.random.key(1))
    assert np.isfinite(float(aux["loss"]))


def test_stage3_sharded_batch_8dev(mini):
    """CLI stage-3 path: real-loader scaleworld batch over the mesh."""
    ds = HumanDataset(mini, mode="train", n_patches=2, patch_size=8,
                      mweight_volume_size=8, use_scaleworld=True)
    cfg = stage3.Stage3Config(
        **TINY_HUMAN, num_prop_samples=8, num_nerf_samples=4,
        nerf_netwidth=32, prop_netwidth=16, near_bkg=0.2, far_bkg=30.0)
    mesh = pmesh.make_mesh()
    item = ds[0]
    batch = pmesh.shard_batch(
        {k: v for k, v in item.items() if k != "frame_name"}, mesh)
    assert len(batch["rays_o"].sharding.device_set) == 8

    params, opt_state, scene_model, human_model, opt = stage3.init_state(
        cfg, jax.random.key(0), batch)
    rep = pmesh.replicated(mesh)
    params = jax.device_put(params, rep)
    opt_state = jax.device_put(opt_state, rep)
    step = jax.jit(stage3.make_train_step(cfg, scene_model, human_model,
                                          opt, transitions=ds.transitions))
    params, opt_state, aux = step(params, opt_state, None, batch,
                                  jnp.float32(0), jax.random.key(1))
    assert np.isfinite(float(aux["loss"]))
