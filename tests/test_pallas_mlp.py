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
