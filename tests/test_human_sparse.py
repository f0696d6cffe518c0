"""Liveness-sorted (sparse) human pipeline == dense pipeline.

The sorted path (models/human.py::_samples_sorted) skips the dead
sample prefix in the non-rigid MLP, canonical MLP, forward LBS and
forward non-rigid MLP. Dead samples are masked out of every consumer,
so every masked-consumer output AND all parameter gradients must match
the dense path exactly (same kernels, same per-row math; only skipped
garbage rows differ, and those are zeroed before use).

Runs the Pallas kernels in interpret mode on CPU with fused MLPs
forced (HOSNERF_MLP_IMPL=fused) and lbs_impl='pallas'.

CAVEAT: interpret mode ZERO-FILLS pallas output buffers, so these tests
cannot detect uninitialized-HBM leaks from skipped blocks (the round-5
daux bug class). tools/tpu_grad_parity.py runs the same sparse-vs-dense
gradient comparison on the real chip (measured worst rel 2.4e-6).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hosnerf_tpu.data import synthetic
from hosnerf_tpu.models.human import HumanObjectField
from hosnerf_tpu.ops.pallas import lbs as plbs

S = 32          # samples/ray -> N = 256 * 32 = 8192 samples
G = 32    # production volume size (BPD=28 <= the 31-bit sig limit)


@pytest.fixture(scope="module")
def setup():
    batch = {k: jnp.asarray(v) for k, v in
             synthetic.human_batch(1, 16, grid_size=G).items()}
    # stretch the ray extent so a large fraction of samples falls
    # outside every bone's support (the skip must have real work)
    batch["far"] = batch["far"] * 4.0
    model = HumanObjectField(
        total_bones=26, n_samples=S, mweight_volume_size=G,
        cnl_mlp_width=32, nr_mlp_width=32, cnl_mlp_depth=8,
        nr_mlp_depth=6, lbs_impl="pallas", mlp_impl="fused")
    params = model.init({"params": jax.random.key(0)}, batch, 0,
                        jnp.int32(0), is_train=True)["params"]
    return model, params, batch


def _apply(model, params, batch, sparse: bool):
    os.environ["HOSNERF_SPARSE"] = "1" if sparse else "0"
    try:
        return model.apply({"params": params}, batch, 100.0,
                           jnp.int32(0), rng=jax.random.key(1),
                           perturb=0.0, is_train=True)
    finally:
        os.environ.pop("HOSNERF_SPARSE", None)


def test_dead_prefix_is_nontrivial(setup):
    """The fixture geometry must actually produce a skippable prefix at
    the fused-MLP tile size, else the equality tests are vacuous."""
    model, params, batch = setup
    t_vals = jnp.linspace(0.0, 1.0, S)
    z = batch["near"] * (1 - t_vals)[None] + batch["far"] * t_vals[None]
    pts = (batch["rays_o"][:, None] +
           batch["rays_d"][:, None] * z[..., None]).reshape(-1, 3)
    from hosnerf_tpu.core import body as body_math
    m_sR, m_T, _, _ = body_math.motion_bases(
        batch["dst_Rs"], batch["dst_Ts"], batch["cnl_gtfms"])
    s_, o_ = plbs._grid_affine(batch["cnl_bbox_min_xyz"],
                               batch["cnl_bbox_scale_xyz"], G)
    rg = (m_sR * s_[None, :, None]).reshape(26, 9)
    tg = m_T * s_[None] + o_[None]
    dom = plbs.bp_prepare(pts, rg, tg, G, 26)
    assert int(dom.n_dead_groups) * plbs.SORT_GROUP >= 2048, (
        int(dom.n_dead_groups))


def test_sparse_matches_dense_outputs(setup):
    model, params, batch = setup
    out_s = _apply(model, params, batch, True)
    out_d = _apply(model, params, batch, False)
    # masked-consumer outputs: exactly the same math on live rows,
    # dead rows contribute zero to all of these
    for k in ("rgb", "alpha", "depth", "weights", "pts_mask",
              "cycle_mask"):
        np.testing.assert_allclose(np.asarray(out_s[k]),
                                   np.asarray(out_d[k]),
                                   atol=3e-5, rtol=1e-5, err_msg=k)
    assert np.isfinite(np.asarray(out_s["deform_pts_final"])).all()
    assert np.isfinite(np.asarray(out_s["rgb"])).all()
    # deform streams agree wherever the loss can see them
    cm = np.asarray(out_d["cycle_mask"]) > 0
    np.testing.assert_allclose(
        np.asarray(out_s["deform_pts_final"])[cm],
        np.asarray(out_d["deform_pts_final"])[cm], atol=3e-5, rtol=1e-5)
    w = np.asarray(out_d["weights"]).reshape(-1) > 0
    np.testing.assert_allclose(
        np.asarray(out_s["deform_pts_prev_final"]).reshape(-1, 3)[w],
        np.asarray(out_d["deform_pts_prev_final"]).reshape(-1, 3)[w],
        atol=3e-5, rtol=1e-5)


def test_sparse_matches_dense_grads(setup):
    """Parameter gradients of a stage-2-style masked loss are equal."""
    model, params, batch = setup

    def loss(p, sparse):
        out = _apply(model, p, batch, sparse)
        cyc = jnp.sum(out["cycle_mask"][:, None]
                      * (out["deform_pts_final"]
                         - out["observe_pts"]) ** 2)
        flow = jnp.sum(out["weights"][..., None]
                       * out["deform_pts_prev_final"])
        return (jnp.mean(out["rgb"] ** 2) + jnp.mean(out["alpha"])
                + 1e-2 * cyc + 1e-2 * flow)

    ls, gs = jax.value_and_grad(lambda p: loss(p, True))(params)
    ld, gd = jax.value_and_grad(lambda p: loss(p, False))(params)
    np.testing.assert_allclose(float(ls), float(ld), rtol=1e-5)
    flat_s = jax.tree_util.tree_leaves_with_path(gs)
    flat_d = dict(jax.tree_util.tree_leaves_with_path(gd))
    for path, a in flat_s:
        b = flat_d[path]
        scale = max(float(jnp.abs(b).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=5e-5,
            err_msg=jax.tree_util.keystr(path))


def test_all_dead_batch(setup):
    """A batch whose rays never enter any bone's support (camera missing
    the human): every k0 hits its clamp, outputs must stay finite and
    equal to the dense path's masked outputs (all-zero weights)."""
    model, params, batch = setup
    far_batch = dict(batch)
    far_batch["rays_o"] = batch["rays_o"] + 1e3   # far from the subject
    out_s = _apply(model, params, far_batch, True)
    out_d = _apply(model, params, far_batch, False)
    assert float(jnp.max(out_d["pts_mask"])) == 0.0  # fixture sanity
    for k in ("rgb", "alpha", "weights", "pts_mask"):
        assert np.isfinite(np.asarray(out_s[k])).all(), k
        np.testing.assert_allclose(np.asarray(out_s[k]),
                                   np.asarray(out_d[k]), atol=3e-5,
                                   err_msg=k)
