"""Fused MLP trunk kernels (ops/pallas/mlp.py) vs the flax modules.

Values and gradients, both precision modes, on the CPU interpreter, for
both shipped architectures (CanonicalMLP-shaped: input-first full-input
skip; NonRigidMLP-shaped: h-first sliced skip)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hosnerf_tpu.ops.pallas import mlp as pmlp

N = 70  # deliberately not a TILE multiple


def _mk_params(rng, dims, dout):
    ws = []
    for (di, do) in dims:
        rng, k1, k2 = jax.random.split(rng, 3)
        ws.append((jax.random.normal(k1, (di, do)) * (1.0 / np.sqrt(di)),
                   jax.random.normal(k2, (do,)) * 0.01))
    rng, k1, k2 = jax.random.split(rng, 3)
    wout = (jax.random.normal(k1, (dims[-1][1], dout)) * 0.05,
            jax.random.normal(k2, (dout,)) * 0.01)
    return ws, wout


def _ref_trunk(x, ws, wout, skip_before, skip_order, skip_off, skip_w,
               dtype):
    """Plain-jnp replica of the fused architecture."""
    xc = x.astype(dtype) if dtype else x
    h = xc
    for i, (w, b) in enumerate(ws):
        if i == skip_before:
            src = xc[:, skip_off:skip_off + skip_w]
            h = (jnp.concatenate([src, h], 1)
                 if skip_order == "input_first"
                 else jnp.concatenate([h, src], 1))
        wd = w.astype(dtype) if dtype else w
        bd = b.astype(dtype) if dtype else b
        h = jax.nn.relu(jnp.dot(h, wd) + bd)
    h = h.astype(jnp.float32)
    return jnp.dot(h, wout[0]) + wout[1]


CASES = [
    # cnl-shaped: 4 layers of 32, full-input skip (input first) at 2
    dict(din=24, width=32, depth=4, skip_before=2,
         skip_order="input_first", skip_off=0, skip_w=24, dout=4),
    # nr-shaped: 3 layers of 16, sliced skip (h first) at 1
    dict(din=20, width=16, depth=3, skip_before=1,
         skip_order="h_first", skip_off=8, skip_w=12, dout=3),
    # no skip
    dict(din=10, width=16, depth=2, skip_before=None,
         skip_order="input_first", skip_off=0, skip_w=0, dout=2),
]


@pytest.mark.parametrize("case", CASES)
@pytest.mark.parametrize("prec", ["highest", "bf16"])
def test_fused_trunk_values_and_grads(case, prec):
    rng = jax.random.key(0)
    dims = []
    din = case["din"]
    prev = din
    for i in range(case["depth"]):
        d_in = prev
        if i == case["skip_before"]:
            d_in += case["skip_w"]
        dims.append((d_in, case["width"]))
        prev = case["width"]
    ws, wout = _mk_params(rng, dims, case["dout"])
    x = jax.random.normal(jax.random.key(7), (N, din))

    kw = dict(skip_before=case["skip_before"],
              skip_order=case["skip_order"], skip_off=case["skip_off"],
              skip_width=case["skip_w"])

    out = pmlp.fused_trunk(x, ws, wout, precision=prec, **kw)
    ref_dt = jnp.bfloat16 if prec == "bf16" else None
    ref = _ref_trunk(x, ws, wout, case["skip_before"],
                     case["skip_order"], case["skip_off"], case["skip_w"],
                     ref_dt)
    tol = 3e-2 if prec == "bf16" else 2e-5
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=tol, rtol=tol)

    # gradients wrt x, every W/b, head
    def loss_fused(x, ws, wout):
        o = pmlp.fused_trunk(x, ws, wout, precision=prec, **kw)
        return jnp.sum(jnp.sin(o))

    def loss_ref(x, ws, wout):
        o = _ref_trunk(x, ws, wout, case["skip_before"],
                       case["skip_order"], case["skip_off"],
                       case["skip_w"], ref_dt)
        return jnp.sum(jnp.sin(o))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, ws, wout)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, ws, wout)
    gtol = 6e-2 if prec == "bf16" else 3e-5
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        scale = max(1.0, float(jnp.abs(b).max()))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=gtol * scale, rtol=gtol)


# ---------------------------------------------------------------------------
# embed-fused trunks (round 4): PE built in-kernel vs the flax modules
# ---------------------------------------------------------------------------


def _flax_cnl(pts, state, module, params, multires):
    from hosnerf_tpu.models import embedders
    ex = embedders.fourier_embed(pts, multires)
    st = jnp.broadcast_to(state, ex.shape[:-1] + (state.shape[-1],))
    return module.apply({"params": params},
                        jnp.concatenate([ex, st], axis=-1))


def _flax_nr(pts, cond, alpha, module, params, multires):
    from hosnerf_tpu.models import embedders
    ex = embedders.hannw_fourier_embed(pts, multires, alpha)
    return module.apply({"params": params}, ex, pts, cond)["xyz"]


def _extract(params, depth):
    layers = [(params[f"linear_{i}"]["Dense_0"]["kernel"],
               params[f"linear_{i}"]["Dense_0"]["bias"])
              for i in range(depth)]
    out = (params["output"]["Dense_0"]["kernel"],
           params["output"]["Dense_0"]["bias"])
    return layers, out


def test_fused_embed_canonical_matches_flax():
    from hosnerf_tpu.models.human_components import CanonicalMLP
    multires, depth, width, E = 3, 6, 32, 8
    mod = CanonicalMLP(mlp_depth=depth, mlp_width=width, skips=(2,))
    pts = jax.random.normal(jax.random.key(1), (77, 3)) * 0.6
    state = jax.random.normal(jax.random.key(2), (E,))
    din = 3 * (1 + 2 * multires) + E
    params = mod.init(jax.random.key(0),
                      jnp.zeros((1, din)))["params"]

    def fused(pts, state, params):
        layers, out = _extract(params, depth)
        return pmlp.fused_embed_trunk(
            pts, state, None, layers, out, kind="fourier",
            multires=multires, aux_mode="broadcast", aux_first=False,
            skip_before=3, skip_source="full_input", precision="highest")

    out_f = fused(pts, state, params)
    out_r = _flax_cnl(pts, state, mod, params, multires)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               atol=3e-5, rtol=1e-4)

    def lf(p, s, pr):
        return jnp.sum(jnp.sin(fused(p, s, pr)))

    def lr(p, s, pr):
        return jnp.sum(jnp.sin(_flax_cnl(p, s, mod, pr, multires)))

    gf = jax.grad(lf, argnums=(0, 1, 2))(pts, state, params)
    gr = jax.grad(lr, argnums=(0, 1, 2))(pts, state, params)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        scale = max(1.0, float(jnp.abs(b).max()))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5 * scale, rtol=1e-4)


@pytest.mark.parametrize("alpha", [0.7, 2.0])
def test_fused_embed_nonrigid_matches_flax(alpha):
    from hosnerf_tpu.models.human_components import NonRigidMLP
    multires, depth, width, C = 2, 3, 16, 5
    mod = NonRigidMLP(mlp_depth=depth, mlp_width=width, skips=(1,))
    pts = jax.random.normal(jax.random.key(1), (77, 3)) * 0.6
    cond = jax.random.normal(jax.random.key(2), (77, C))
    ex_w = 6 * multires
    params = mod.init(jax.random.key(0), jnp.zeros((1, ex_w)),
                      jnp.zeros((1, 3)), jnp.zeros((1, C)))["params"]

    def fused(pts, cond, params):
        layers, out = _extract(params, depth)
        trans = pmlp.fused_embed_trunk(
            pts, cond, jnp.float32(alpha), layers, out, kind="hannw",
            multires=multires, aux_mode="stream", aux_first=True,
            skip_before=1, skip_source="embed", precision="highest")
        return pts + trans

    out_f = fused(pts, cond, params)
    out_r = _flax_nr(pts, cond, alpha, mod, params, multires)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               atol=3e-6, rtol=1e-5)

    def lf(p, c, pr):
        return jnp.sum(jnp.sin(fused(p, c, pr) * 3.0))

    def lr(p, c, pr):
        return jnp.sum(jnp.sin(_flax_nr(p, c, alpha, mod, pr,
                                        multires) * 3.0))

    gf = jax.grad(lf, argnums=(0, 1, 2))(pts, cond, params)
    gr = jax.grad(lr, argnums=(0, 1, 2))(pts, cond, params)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        scale = max(1.0, float(jnp.abs(b).max()))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5 * scale, rtol=1e-4)


def test_human_field_fused_mlp_impl_matches_flax():
    """End-to-end HumanObjectField: mlp_impl='fused' (interpret mode on
    CPU) == mlp_impl='flax', outputs and param gradients."""
    from hosnerf_tpu.data import synthetic
    from hosnerf_tpu.models.human import HumanObjectField

    batch = {k: jnp.asarray(v) for k, v in
             synthetic.human_batch(1, 8, grid_size=8).items()}
    kw = dict(total_bones=26, n_samples=16, num_states=1,
              mweight_volume_size=8, lbs_impl="gather")
    m_flax = HumanObjectField(mlp_impl="flax", **kw)
    m_fused = HumanObjectField(mlp_impl="fused", **kw)
    params = m_flax.init({"params": jax.random.key(0)}, batch, 0,
                         jnp.int32(0), is_train=True)["params"]

    def run(m, p):
        out = m.apply({"params": p}, batch, 5000.0, jnp.int32(0),
                      rng=None, perturb=0.0, is_train=True)
        return out

    o1 = run(m_flax, params)
    o2 = run(m_fused, params)
    for k in ("rgb", "human_density", "deform_pts_final",
              "deform_pts_prev_final"):
        np.testing.assert_allclose(np.asarray(o2[k]), np.asarray(o1[k]),
                                   atol=2e-5, rtol=1e-4, err_msg=k)

    def loss(m, p):
        out = run(m, p)
        return (jnp.sum(out["rgb"] ** 2)
                + jnp.sum(out["deform_pts_final"])
                + jnp.sum(out["human_density"]))

    g1 = jax.grad(lambda p: loss(m_flax, p))(params)
    g2 = jax.grad(lambda p: loss(m_fused, p))(params)
    flat1 = jax.tree_util.tree_flatten_with_path(g1)[0]
    flat2 = jax.tree_util.tree_flatten_with_path(g2)[0]
    for (k1, a), (k2, b) in zip(flat1, flat2):
        assert k1 == k2
        scale = max(1.0, float(jnp.abs(a).max()))
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-5 * scale, rtol=2e-4,
            err_msg=jax.tree_util.keystr(k1))
