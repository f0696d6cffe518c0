"""Tests for the stage-1 scene model and train step (incl. 8-device mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hosnerf_tpu.data import synthetic
from hosnerf_tpu.models import scene
from hosnerf_tpu.models.state import state_index
from hosnerf_tpu.parallel import mesh as pmesh
from hosnerf_tpu.train import stage1

TINY = dict(nerf_netwidth=64, prop_netwidth=32, num_prop_samples=16,
            num_nerf_samples=8)


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = stage1.Stage1Config(max_steps=100, near=0.5, far=20.0,
                              grad_max_norm=0.0, lr_init=2e-3, lr_final=2e-4,
                              lr_delay_steps=0, **TINY)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic.scene_ray_batch(64).items()}
    params, opt_state, model = stage1.init_state(
        cfg, jax.random.key(0), batch)
    return cfg, batch, params, opt_state, model


def test_state_index_ladder_semantics():
    trans = jnp.array([0.3, 0.6])
    eps = 1e-5
    cases = [
        (0.0, 0), (0.3 - 2 * eps, 0), (0.3, 1), (0.45, 1), (0.6, 1),
        (0.6 + 2 * eps, 2), (1.0, 2),
    ]
    for t, want in cases:
        got = int(state_index(jnp.float32(t), trans))
        assert got == want, (t, got, want)
    # no transitions -> always state 0
    assert int(state_index(jnp.float32(0.9), None)) == 0
    # batched times
    got = state_index(jnp.array([0.0, 0.45, 0.99]), trans)
    np.testing.assert_array_equal(np.asarray(got), [0, 1, 2])


def test_forward_shapes_and_history(tiny_setup):
    cfg, batch, params, _, model = tiny_setup
    renderings, hist = model.apply(
        {"params": params}, batch, 0.5, False, jnp.int32(0), cfg.near,
        cfg.far)
    assert len(renderings) == 3 and len(hist) == 3
    assert renderings[-1]["rgb"].shape == (64, 3)
    # per-level raw outputs recorded for stage-3 composition
    assert hist[-1]["rgb"].shape == (64, 8, 3)
    assert hist[-1]["density"].shape == (64, 8)
    assert hist[-1]["tdist"].shape == (64, 9)
    assert hist[0]["weights"].shape == (64, 16)
    assert bool(jnp.all(jnp.isfinite(renderings[-1]["rgb"])))


@pytest.mark.parametrize("mode", ["heavy", True])
def test_remat_modes_match_dense(tiny_setup, mode):
    """'heavy' (nerf-trunk-only) and 'all' remat are pure memory/schedule
    knobs: values and grads must equal the dense ('none') model."""
    cfg, batch, params, _, model = tiny_setup

    def loss_of(m):
        def f(p):
            rend, _ = m.apply({"params": p}, batch, 0.5, False,
                              jnp.int32(0), cfg.near, cfg.far)
            return jnp.mean((rend[-1]["rgb"] - batch["target"]) ** 2)
        return f

    base = scene.SceneField(remat=False, **{k: getattr(model, k) for k in
           ("nerf_netwidth", "prop_netwidth", "num_prop_samples",
            "num_nerf_samples", "num_states")})
    other = scene.SceneField(remat=mode, **{k: getattr(model, k) for k in
            ("nerf_netwidth", "prop_netwidth", "num_prop_samples",
             "num_nerf_samples", "num_states")})
    l0, g0 = jax.value_and_grad(loss_of(base))(params)
    l1, g1 = jax.value_and_grad(loss_of(other))(params)
    assert abs(float(l0 - l1)) < 1e-6
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_state_embeddings_change_output(tiny_setup):
    cfg, batch, params, _, model = tiny_setup
    cfg2 = stage1.Stage1Config(**{**cfg.__dict__, "num_states": 3})
    params2, _, model2 = stage1.init_state(cfg2, jax.random.key(1), batch)
    r0, _ = model2.apply({"params": params2}, batch, 0.5, False,
                         jnp.int32(0), cfg.near, cfg.far)
    r1, _ = model2.apply({"params": params2}, batch, 0.5, False,
                         jnp.int32(2), cfg.near, cfg.far)
    assert float(jnp.abs(r0[-1]["rgb"] - r1[-1]["rgb"]).max()) > 1e-4


def test_train_step_decreases_loss(tiny_setup):
    cfg, batch, params, opt_state, model = tiny_setup
    opt = stage1.make_optimizer(cfg)
    step_fn = jax.jit(stage1.make_train_step(cfg, model, opt))
    rng = jax.random.key(2)
    losses = []
    for i in range(30):
        rng, sub = jax.random.split(rng)
        params, opt_state, aux = step_fn(
            params, opt_state, batch, jnp.float32(i), sub)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses[:3] + losses[-3:]


def test_train_step_on_8_device_mesh():
    """The full train step compiles and runs with the ray axis sharded
    across the virtual 8-device CPU mesh."""
    assert len(jax.devices()) == 8
    cfg = stage1.Stage1Config(max_steps=10, near=0.5, far=20.0,
                              lr_delay_steps=0, **TINY)
    m = pmesh.make_mesh()
    host_batch = synthetic.scene_ray_batch(128)
    batch = pmesh.shard_batch(host_batch, m)
    # check the ray axis is actually sharded
    assert len(batch["rays_o"].sharding.device_set) == 8

    params, opt_state, model = stage1.init_state(
        cfg, jax.random.key(0), batch)
    opt = stage1.make_optimizer(cfg)
    step_fn = jax.jit(stage1.make_train_step(cfg, model, opt))
    params2, _, aux = step_fn(params, opt_state, batch, jnp.float32(0),
                              jax.random.key(1))
    assert np.isfinite(float(aux["loss"]))
    # params changed and remain replicated
    diff = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()), params,
                     params2))
    assert diff > 0


def test_eval_step_deterministic(tiny_setup):
    cfg, batch, params, _, model = tiny_setup
    ev = jax.jit(stage1.make_eval_step(cfg, model))
    a = ev(params, batch)
    b = ev(params, batch)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_scene_mlp_chunked_matches_dense(tiny_setup):
    """SceneField mlp_chunk (the netchunk/chunk_bkg analog, KNOWN_GAPS r1
    #4) is numerically identical to the dense pass, values and grads."""
    cfg, batch, params, _, model = tiny_setup
    dense_r, dense_h = model.apply({"params": params}, batch, 0.5, False,
                                   jnp.int32(0), cfg.near, cfg.far)
    chunked = stage1.make_model(cfg).clone(mlp_chunk=24)  # non-divisor of 64
    chunk_r, chunk_h = chunked.apply({"params": params}, batch, 0.5, False,
                                     jnp.int32(0), cfg.near, cfg.far)
    np.testing.assert_allclose(np.asarray(chunk_r[-1]["rgb"]),
                               np.asarray(dense_r[-1]["rgb"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(chunk_h[-1]["density"]),
                               np.asarray(dense_h[-1]["density"]),
                               rtol=1e-6, atol=1e-6)

    def loss(p, m):
        r, _ = m.apply({"params": p}, batch, 0.5, False, jnp.int32(0),
                       cfg.near, cfg.far)
        return jnp.mean((r[-1]["rgb"] - batch["target"]) ** 2)

    g1 = jax.grad(loss)(params, model)
    g2 = jax.grad(loss)(params, chunked)
    d = jax.tree.reduce(max, jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), g1, g2))
    assert d < 1e-5, d


def test_scene_mlp_chunked_per_ray_states(tiny_setup):
    """Chunking must also slice per-ray state indices (stage-1 training
    batches carry one time per ray)."""
    cfg, batch, params, _, model = tiny_setup
    trans = jnp.array([0.5])
    cfg2 = stage1.Stage1Config(**{**cfg.__dict__, "num_states": 2})
    params2, _, model2 = stage1.init_state(cfg2, jax.random.key(1), batch)
    s_idx = state_index(jnp.asarray(batch["times"]), trans)
    dense_r, _ = model2.apply({"params": params2}, batch, 0.5, False,
                              s_idx, cfg.near, cfg.far)
    chunked = stage1.make_model(cfg2).clone(mlp_chunk=24)
    chunk_r, _ = chunked.apply({"params": params2}, batch, 0.5, False,
                               s_idx, cfg.near, cfg.far)
    np.testing.assert_allclose(np.asarray(chunk_r[-1]["rgb"]),
                               np.asarray(dense_r[-1]["rgb"]), atol=1e-6)


def test_shard_eval_fn_matches_single_device():
    """Mesh-sharded eval (shard_eval_fn) returns the same values as the
    plain single-device eval step, with the chunk's ray axis actually
    split across the 8 virtual devices (the DDP-eval analog,
    ref: 1st.../src/model/interface.py:30-39)."""
    assert len(jax.devices()) == 8
    cfg = stage1.Stage1Config(max_steps=10, near=0.5, far=20.0,
                              lr_delay_steps=0, **TINY)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic.scene_ray_batch(128).items()}
    params, _, model = stage1.init_state(cfg, jax.random.key(0), batch)
    eval_step = jax.jit(stage1.make_eval_step(cfg, model))

    host_batch = synthetic.scene_ray_batch(128)
    single = np.asarray(eval_step(
        params, {k: jnp.asarray(v) for k, v in host_batch.items()}))

    m = pmesh.make_mesh()
    sharded_fn = pmesh.shard_eval_fn(eval_step, m)
    seen = {}
    orig_shard_batch = pmesh.shard_batch

    def spy(b, mesh):
        out = orig_shard_batch(b, mesh)
        seen["devices"] = len(out["rays_o"].sharding.device_set)
        return out

    pmesh.shard_batch = spy
    try:
        sharded = np.asarray(sharded_fn(params, host_batch))
    finally:
        pmesh.shard_batch = orig_shard_batch
    assert seen["devices"] == 8
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-6)


def test_shard_eval_fn_single_device_mesh_passthrough():
    m1 = pmesh.make_mesh(jax.devices()[:1])
    fn = lambda p, b: b  # noqa: E731
    assert pmesh.shard_eval_fn(fn, m1) is fn


def test_train_step_uses_per_ray_states():
    """Mixed-time batches (pooled samplers) must give each ray its own
    state embedding in the TRAIN step (round-2 VERDICT weak #3): a mixed
    batch's forward equals the concatenation of per-time forwards."""
    cfg = stage1.Stage1Config(max_steps=10, near=0.5, far=20.0,
                              num_states=2, **TINY)
    trans = np.array([0.5], np.float32)
    b = synthetic.scene_ray_batch(32)
    # two half-batches at different times
    b["times"] = np.concatenate([np.full(16, 0.1, np.float32),
                                 np.full(16, 0.9, np.float32)])
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    params, opt_state, model = stage1.init_state(cfg, jax.random.key(0),
                                                 batch, trans)

    s_idx_vec = state_index(batch["times"], jnp.asarray(trans))
    mixed, _ = model.apply({"params": params}, batch, 0.5, False,
                           s_idx_vec, cfg.near, cfg.far)
    parts = []
    for lo, hi, t in ((0, 16, 0.1), (16, 32, 0.9)):
        sub = {k: v[lo:hi] if hasattr(v, "ndim") and v.ndim and
               v.shape[0] == 32 else v for k, v in batch.items()}
        r, _ = model.apply({"params": params}, sub, 0.5, False,
                           state_index(jnp.float32(t), jnp.asarray(trans)),
                           cfg.near, cfg.far)
        parts.append(np.asarray(r[-1]["rgb"]))
    np.testing.assert_allclose(np.asarray(mixed[-1]["rgb"]),
                               np.concatenate(parts), atol=1e-5)

    # and the train step path itself runs with the vector index (would
    # previously collapse to times[0]'s embedding for every ray)
    opt = stage1.make_optimizer(cfg)
    step = jax.jit(stage1.make_train_step(cfg, model, opt, trans))
    p2, _, aux = step(params, opt_state, batch, 0, jax.random.key(1))
    assert np.isfinite(float(aux["loss"]))
    # BOTH states' embeddings get gradient (each half-batch hits one);
    # state_embeds lives inside every MLP's scope
    flat_new = jax.tree_util.tree_flatten_with_path(p2)[0]
    flat_old = jax.tree.leaves(params)
    found = 0
    for (path, new), old in zip(flat_new, flat_old):
        if any(getattr(p, "key", "") == "state_embeds" for p in path):
            found += 1
            delta = np.abs(np.asarray(new - old)).sum(axis=1)
            assert (delta > 0).all(), path
    assert found >= 1
