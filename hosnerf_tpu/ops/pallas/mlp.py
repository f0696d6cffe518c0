"""Fused weights-stationary MLP trunk kernels (SURVEY.md §7 item 3b).

The human-field per-sample MLPs (CanonicalMLP 8x256, NonRigidMLP 6x128)
evaluate 262k+ samples per production step. As separate XLA matmuls,
every layer's activations round-trip HBM ([262144, 256] bf16 = 134 MB
per layer per direction); the MLP weights are tiny (<= 1 MB bf16). These
kernels keep ALL layer weights resident in VMEM and stream sample tiles
through the whole trunk + output head in one grid pass, so HBM traffic
is just x in / out out. The backward kernel recomputes the forward per
tile (no residuals), accumulates dW/db in VMEM across the sequential
grid, and streams dx — the same recompute-in-backward pattern as
ops/pallas/lbs.py.

Architecture covered (one generator, specialized per static spec):
L dense+relu layers with an optional mid-trunk re-concat of a slice of
the input (the reference's skip connections — CanonicalMLP concats
[input, h] before its 6th linear, NonRigidMLP concats [h, pos_embed]
before its 5th; ref mlp_rgb_sigma.py:31-38, mlp_offset.py:55-66),
followed by a linear output head evaluated in f32 (the quality-
sensitive rgb/sigma/offset heads stay full precision, matching
models/human_components.py).

Precision contract mirrors the flax path: `bf16` casts trunk operands
to bfloat16 with f32 matmul accumulation rounded back to bf16 per layer
(what XLA does for flax Dense(dtype=bf16)); `highest` keeps everything
f32 with HIGHEST-precision matmuls.

MEASURED RESULT (v5e, 262k samples, bf16; tools/bench_mlp.py): the
fused kernel is ~10% SLOWER than the plain flax/XLA path at both
production shapes (CanonicalMLP fwd+bwd 11.3 vs 10.3 ms, NonRigidMLP
6.6 vs 6.0 ms) — XLA's own pipelining of back-to-back [N,256]x[256,256]
matmuls already avoids the HBM round-trips this kernel targets. It is
therefore NOT on the default model path (models/human_components.py
keeps the flax trunks); it stays here, tested (tests/test_pallas_mlp.py)
and benchable, as the measured answer to SURVEY.md §7 item 3(b) and a
base to revisit if shapes change (e.g. much wider trunks).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024

_HIGHEST = jax.lax.Precision.HIGHEST


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _mm(a, b, prec: str, dims=None):
    if dims is None:
        dims = (((a.ndim - 1,), (0,)), ((), ()))
    if prec == "bf16":
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
        return jax.lax.dot_general(
            a, b, dims, preferred_element_type=jnp.float32)
    return jax.lax.dot_general(
        a, b, dims, precision=_HIGHEST,
        preferred_element_type=jnp.float32)


def _pad_rows(a, mult):
    n = a.shape[0]
    pad = (-n) % mult
    if pad:
        a = jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
    return a, n


class TrunkSpec:
    """Static architecture of a fused trunk. Hashable (lru_cache key).

    layer_dims: ((din_0, dout_0), ..., (din_{L-1}, dout_{L-1})) —
      din includes the skip concat width at `skip_before`.
    skip_before: layer index whose INPUT is the concat, or None.
    skip_order: 'input_first' ([src, h]) or 'h_first' ([h, src]).
    skip_off/skip_width: the input slice re-concatenated.
    out_dim: output head width (head input = dout_{L-1}).
    """

    def __init__(self, layer_dims, skip_before, skip_order, skip_off,
                 skip_width, out_dim, prec):
        self.layer_dims = tuple(tuple(d) for d in layer_dims)
        self.skip_before = skip_before
        self.skip_order = skip_order
        self.skip_off = skip_off
        self.skip_width = skip_width
        self.out_dim = out_dim
        self.prec = prec

    def key(self):
        return (self.layer_dims, self.skip_before, self.skip_order,
                self.skip_off, self.skip_width, self.out_dim, self.prec)


def _forward_tile(x, wbs, wout, bout, spec: TrunkSpec, keep_acts=False):
    """Run the trunk on one tile. x [T, Din] f32. wbs = [(w, b), ...]
    already-loaded arrays. Returns (out [T, out_dim] f32, acts) where
    acts[i] = (input to layer i, output of layer i) when keep_acts."""
    prec = spec.prec
    dt = jnp.bfloat16 if prec == "bf16" else jnp.float32
    xc = x.astype(dt)
    h = xc
    acts = []
    for i, (w, b) in enumerate(wbs):
        if i == spec.skip_before:
            src = xc[:, spec.skip_off:spec.skip_off + spec.skip_width]
            h = (jnp.concatenate([src, h], axis=1)
                 if spec.skip_order == "input_first"
                 else jnp.concatenate([h, src], axis=1))
        a_in = h
        z = _mm(h, w, prec).astype(dt) + b.astype(dt)
        h = jnp.maximum(z, 0.0)
        if keep_acts:
            acts.append((a_in, h))
    hf = h.astype(jnp.float32)
    out = (_mm(hf, wout.astype(jnp.float32), "highest")
           + bout.astype(jnp.float32))
    if keep_acts:
        return out, hf, acts
    return out


def _fwd_kernel(x_ref, *refs, spec: TrunkSpec):
    out_ref = refs[-1]
    flat = refs[:-1]
    L = len(spec.layer_dims)
    wbs = [(flat[2 * i][:, :], flat[2 * i + 1][:, :]) for i in range(L)]
    wout = flat[2 * L][:, :]
    bout = flat[2 * L + 1][:, :]
    out_ref[:, :] = _forward_tile(x_ref[:, :], wbs, wout, bout, spec)


def _bwd_kernel(x_ref, *refs, spec: TrunkSpec):
    L = len(spec.layer_dims)
    flat = refs[:2 * L + 2]
    gout_ref = refs[2 * L + 2]
    dx_ref = refs[2 * L + 3]
    dwb = refs[2 * L + 4:]  # dW0, db0, ..., dWout, dbout
    prec = spec.prec
    dt = jnp.bfloat16 if prec == "bf16" else jnp.float32
    dims_t = (((0,), (0,)), ((), ()))   # contract over rows (T)
    dims_n = (((1,), (1,)), ((), ()))   # g @ W^T

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        for r in dwb:
            r[:, :] = jnp.zeros_like(r)

    wbs = [(flat[2 * i][:, :], flat[2 * i + 1][:, :]) for i in range(L)]
    wout = flat[2 * L][:, :]
    bout = flat[2 * L + 1][:, :]
    x = x_ref[:, :]
    _, hf, acts = _forward_tile(x, wbs, wout, bout, spec, keep_acts=True)
    gout = gout_ref[:, :]                                   # [T, Dout] f32

    # output head (f32)
    dwb[2 * L][:, :] += _mm(hf, gout, "highest", dims=dims_t)
    dwb[2 * L + 1][:, :] += jnp.sum(gout, axis=0, keepdims=True)
    g = _mm(gout, wout.astype(jnp.float32), "highest", dims=dims_n)

    gskip = None
    for i in reversed(range(L)):
        a_in, h_out = acts[i]
        # relu grad; mask computed in f32 (Mosaic has no bf16 compares)
        g = g * (h_out.astype(jnp.float32) > 0.0).astype(jnp.float32)
        gc = g.astype(dt)
        dwb[2 * i][:, :] += _mm(a_in, gc, prec, dims=dims_t)
        dwb[2 * i + 1][:, :] += jnp.sum(g, axis=0, keepdims=True)
        g = _mm(gc, wbs[i][0], prec, dims=dims_n)           # [T, din_i]
        if i == spec.skip_before:
            sw = spec.skip_width
            if spec.skip_order == "input_first":
                gskip = g[:, :sw]
                g = g[:, sw:]
            else:
                gskip = g[:, g.shape[1] - sw:]
                g = g[:, :g.shape[1] - sw]
    dx = g
    if gskip is not None:
        din = dx.shape[1]
        off = spec.skip_off
        sw = spec.skip_width
        parts = []
        if off > 0:
            parts.append(jnp.zeros((dx.shape[0], off), jnp.float32))
        parts.append(gskip)
        if din - off - sw > 0:
            parts.append(jnp.zeros((dx.shape[0], din - off - sw),
                                   jnp.float32))
        dx = dx + (parts[0] if len(parts) == 1
                   else jnp.concatenate(parts, axis=1))
    dx_ref[:, :] = dx


@functools.lru_cache(maxsize=None)
def _make_fused(spec_key):
    spec = _SpecFromKey(spec_key)
    L = len(spec.layer_dims)
    din0 = spec.layer_dims[0][0]
    dlast = spec.layer_dims[-1][1]

    def wb_specs():
        specs = []
        for (di, do) in spec.layer_dims:
            specs.append(pl.BlockSpec((di, do), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
            specs.append(pl.BlockSpec((1, do), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
        specs.append(pl.BlockSpec((dlast, spec.out_dim), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM))
        specs.append(pl.BlockSpec((1, spec.out_dim), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM))
        return specs

    x_spec = pl.BlockSpec((TILE, din0), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)

    def run_fwd(x, params):
        xp, n = _pad_rows(x.astype(jnp.float32), TILE)
        grid = (xp.shape[0] // TILE,)
        out = pl.pallas_call(
            functools.partial(_fwd_kernel, spec=spec),
            grid=grid,
            in_specs=[x_spec] + wb_specs(),
            out_specs=pl.BlockSpec((TILE, spec.out_dim), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((xp.shape[0], spec.out_dim),
                                           jnp.float32),
            interpret=_interpret(),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20),
        )(xp, *params)
        return out[:n]

    def run_bwd(x, params, gout):
        xp, n = _pad_rows(x.astype(jnp.float32), TILE)
        gp, _ = _pad_rows(gout.astype(jnp.float32), TILE)
        grid = (xp.shape[0] // TILE,)
        dwb_specs, dwb_shapes = [], []
        for (di, do) in list(spec.layer_dims) + [(dlast, spec.out_dim)]:
            dwb_specs.append(pl.BlockSpec((di, do), lambda i: (0, 0),
                                          memory_space=pltpu.VMEM))
            dwb_shapes.append(jax.ShapeDtypeStruct((di, do), jnp.float32))
            dwb_specs.append(pl.BlockSpec((1, do), lambda i: (0, 0),
                                          memory_space=pltpu.VMEM))
            dwb_shapes.append(jax.ShapeDtypeStruct((1, do), jnp.float32))
        outs = pl.pallas_call(
            functools.partial(_bwd_kernel, spec=spec),
            grid=grid,
            in_specs=([x_spec] + wb_specs()
                      + [pl.BlockSpec((TILE, spec.out_dim),
                                      lambda i: (i, 0),
                                      memory_space=pltpu.VMEM)]),
            out_specs=([pl.BlockSpec((TILE, din0), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)]
                       + dwb_specs),
            out_shape=([jax.ShapeDtypeStruct((xp.shape[0], din0),
                                             jnp.float32)]
                       + dwb_shapes),
            interpret=_interpret(),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20),
        )(xp, *params, gp)
        dx = outs[0][:n]
        dparams = []
        for k, g in enumerate(outs[1:]):
            if k % 2 == 1:  # bias: [1, do] -> [do]
                g = g[0]
            dparams.append(g)
        return dx, tuple(dparams)

    @jax.custom_vjp
    def fused(x, *params):
        return run_fwd(x, params)

    def fwd(x, *params):
        return run_fwd(x, params), (x, params)

    def bwd(res, gout):
        x, params = res
        dx, dparams = run_bwd(x, params, gout)
        dparams = tuple(dp.astype(p.dtype)
                        for dp, p in zip(dparams, params))
        return (dx.astype(x.dtype),) + dparams

    fused.defvjp(fwd, bwd)
    return fused


class _SpecFromKey(TrunkSpec):
    def __init__(self, key):
        (layer_dims, skip_before, skip_order, skip_off, skip_width,
         out_dim, prec) = key
        super().__init__(layer_dims, skip_before, skip_order, skip_off,
                         skip_width, out_dim, prec)


def fused_trunk(x, layer_params: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],
                out_params: Tuple[jnp.ndarray, jnp.ndarray], *,
                skip_before: Optional[int] = None,
                skip_order: str = "input_first",
                skip_off: int = 0, skip_width: int = 0,
                precision: str = "bf16") -> jnp.ndarray:
    """Fused MLP trunk + head. x [N, Din] -> [N, out_dim].

    layer_params: [(W_i [din_i, dout_i], b_i [dout_i]), ...] — din of the
    `skip_before` layer already includes the concat width.
    out_params: (W_out, b_out), applied in f32.
    """
    layer_dims = tuple((int(w.shape[0]), int(w.shape[1]))
                       for w, _ in layer_params)
    out_dim = int(out_params[0].shape[1])
    key = (layer_dims, skip_before, skip_order, skip_off, skip_width,
           out_dim, precision)
    fused = _make_fused(key)
    flat = []
    for w, b in layer_params:
        flat.extend((w, b.reshape(1, -1)))
    flat.extend((out_params[0], out_params[1].reshape(1, -1)))
    return fused(x, *flat)
