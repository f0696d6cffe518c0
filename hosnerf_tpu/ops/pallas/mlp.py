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
import numpy as np
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


def _trunk_bwd_tile(x, wbs, wout, bout, gout, dwb, spec: TrunkSpec):
    """Backward of `_forward_tile` for one tile by recomputation.
    Accumulates into the dwb refs (dW0, db0, ..., dWout, dbout — caller
    zeroes them at grid step 0) and returns d/dx [T, Din] f32."""
    prec = spec.prec
    dt = jnp.bfloat16 if prec == "bf16" else jnp.float32
    dims_t = (((0,), (0,)), ((), ()))   # contract over rows (T)
    dims_n = (((1,), (1,)), ((), ()))   # g @ W^T
    L = len(spec.layer_dims)
    _, hf, acts = _forward_tile(x, wbs, wout, bout, spec, keep_acts=True)

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
    return dx


def _bwd_kernel(x_ref, *refs, spec: TrunkSpec):
    L = len(spec.layer_dims)
    flat = refs[:2 * L + 2]
    gout_ref = refs[2 * L + 2]
    dx_ref = refs[2 * L + 3]
    dwb = refs[2 * L + 4:]  # dW0, db0, ..., dWout, dbout

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        for r in dwb:
            r[:, :] = jnp.zeros_like(r)

    wbs = [(flat[2 * i][:, :], flat[2 * i + 1][:, :]) for i in range(L)]
    wout = flat[2 * L][:, :]
    bout = flat[2 * L + 1][:, :]
    dx_ref[:, :] = _trunk_bwd_tile(x_ref[:, :], wbs, wout, bout,
                                   gout_ref[:, :], dwb, spec)


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


# ---------------------------------------------------------------------------
# embed-fused trunks: positional encoding built IN KERNEL (round 4)
# ---------------------------------------------------------------------------
#
# The round-2 trunk-only kernel above measured ~10% behind XLA: back-to-
# back [N, 256] matmuls alone are something XLA already pipelines well.
# What XLA can NOT do is fuse the sin/cos feature build + concat chain
# into the first matmul's operand: the [N, 63]/[N, 36] embeds and the
# [N, 127] concat round-trip HBM, and their backward (cos/sin reruns +
# concat adjoints) does it again. These kernels take the RAW [N, 3]
# points, build the fourier/hann-windowed features in VMEM in a PERMUTED
# layout ([x | sin f0..fF | cos f0..fF] — 3 wide-lane concats instead of
# 2F width-3 interleaved pieces), and compensate by gathering the rows
# of W0 (and of the skip layer's W) on the host side, which autodiff
# transposes for free. Everything else reuses the trunk machinery above.
#
# Grad contract: d(alpha) = 0 (the hann window anneal is a schedule of
# iter_val, never differentiated — matches the flax path where iter_val
# is a non-diff argument).


class EmbedSpec:
    """Static embed preamble config (hashable part of the kernel key).

    kind: 'fourier' (identity prepended) | 'hannw' (windowed, no identity).
    aux_mode: 'broadcast' ([1, A] row, gradient accumulated) or 'stream'
    ([N, A] per-sample, gradient streamed). aux_first: aux before the
    embed in the trunk input concat (NonRigid: [cond, embed]; Canonical:
    [embed, state])."""

    def __init__(self, kind, multires, aux_width, aux_mode, aux_first):
        self.kind = kind
        self.multires = multires
        self.include_input = kind == "fourier"
        self.aux_width = aux_width
        self.aux_mode = aux_mode
        self.aux_first = aux_first

    @property
    def ex_width(self):
        return 3 * (1 if self.include_input else 0) + 6 * self.multires

    def key(self):
        return (self.kind, self.multires, self.aux_width, self.aux_mode,
                self.aux_first)


def embed_row_perm(multires: int, include_input: bool) -> np.ndarray:
    """perm[p] = ORIGINAL embed row feeding permuted-layout lane p.
    Original layout (models/embedders.py): [x?, sin f0 (3), cos f0 (3),
    sin f1 (3), ...]; permuted: [x?, sin f0..fF (3F), cos f0..fF (3F)]."""
    idoff = 3 if include_input else 0
    perm = list(range(idoff))
    for block in (0, 3):  # sin rows, then cos rows
        for j in range(multires):
            for c in range(3):
                perm.append(idoff + 6 * j + block + c)
    return np.asarray(perm)


def _j_row(F: int):
    """[1, 3F] f32 row of lane frequency indices (l // 3), built in-kernel
    (pallas forbids captured array constants)."""
    il = jax.lax.broadcasted_iota(jnp.int32, (1, 3 * F), 1)
    return (il // 3).astype(jnp.float32)


def _embed_build(x, espec: EmbedSpec, alpha):
    """x [T, 3] f32 -> (ex [T, ex_width] permuted layout, s, c, freq_row);
    s/c are the (windowed) sin/cos blocks reused by the backward chain."""
    F = espec.multires
    j_row = _j_row(F)
    freq_row = jnp.exp2(j_row)                             # [1, 3F]
    xrep = jnp.concatenate([x] * F, axis=1)                # [T, 3F]
    scaled = xrep * freq_row
    s = jnp.sin(scaled)
    c = jnp.cos(scaled)
    if espec.kind == "hannw":
        w = (1.0 - jnp.cos(jnp.pi * jnp.clip(alpha - j_row,
                                             0.0, 1.0))) / 2.0
        s = s * w
        c = c * w
    parts = ([x] if espec.include_input else []) + [s, c]
    return jnp.concatenate(parts, axis=1), s, c, freq_row


def _embed_bwd(x, g_ex, espec: EmbedSpec, alpha):
    """d/dx of the embed chain. g_ex [T, ex_width] (permuted layout)."""
    F = espec.multires
    _, s, c, freq_row = _embed_build(x, espec, alpha)
    idoff = 3 if espec.include_input else 0
    g_s = g_ex[:, idoff:idoff + 3 * F]
    g_c = g_ex[:, idoff + 3 * F:idoff + 6 * F]
    # d(w sin(fx))/dx = f * (w cos(fx));  d(w cos(fx))/dx = -f * (w sin)
    t = (g_s * c - g_c * s) * freq_row                     # [T, 3F]
    # sel [3F, 3]: 1 where row % 3 == col (coordinate selector)
    r3 = jax.lax.broadcasted_iota(jnp.int32, (3 * F, 3), 0) % 3
    c3 = jax.lax.broadcasted_iota(jnp.int32, (3 * F, 3), 1)
    sel = (r3 == c3).astype(jnp.float32)
    dx = _mm(t, sel, "highest")
    if espec.include_input:
        dx = dx + g_ex[:, :3]
    return dx


def _assemble_input(ex, aux, espec: EmbedSpec):
    T = ex.shape[0]
    if espec.aux_mode == "broadcast":
        aux = jnp.broadcast_to(aux, (T, espec.aux_width))
    return (jnp.concatenate([aux, ex], axis=1) if espec.aux_first
            else jnp.concatenate([ex, aux], axis=1))


def _efwd_kernel(x_ref, aux_ref, alpha_ref, *refs,
                 spec: TrunkSpec, espec: EmbedSpec):
    out_ref = refs[-1]
    flat = refs[:-1]
    L = len(spec.layer_dims)
    wbs = [(flat[2 * i][:, :], flat[2 * i + 1][:, :]) for i in range(L)]
    wout = flat[2 * L][:, :]
    bout = flat[2 * L + 1][:, :]
    ex, _, _, _ = _embed_build(x_ref[:, :], espec, alpha_ref[0, 0])
    full = _assemble_input(ex, aux_ref[:, :], espec)
    out_ref[:, :] = _forward_tile(full, wbs, wout, bout, spec)


def _ebwd_kernel(x_ref, aux_ref, alpha_ref, *refs,
                 spec: TrunkSpec, espec: EmbedSpec):
    L = len(spec.layer_dims)
    flat = refs[:2 * L + 2]
    gout_ref = refs[2 * L + 2]
    dx_ref = refs[2 * L + 3]
    daux_ref = refs[2 * L + 4]
    dwb = refs[2 * L + 5:]

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        for r in dwb:
            r[:, :] = jnp.zeros_like(r)
        if espec.aux_mode == "broadcast":
            daux_ref[:, :] = jnp.zeros_like(daux_ref)

    wbs = [(flat[2 * i][:, :], flat[2 * i + 1][:, :]) for i in range(L)]
    wout = flat[2 * L][:, :]
    bout = flat[2 * L + 1][:, :]
    x = x_ref[:, :]
    alpha = alpha_ref[0, 0]
    ex, _, _, _ = _embed_build(x, espec, alpha)
    full = _assemble_input(ex, aux_ref[:, :], espec)
    d_full = _trunk_bwd_tile(full, wbs, wout, bout, gout_ref[:, :], dwb,
                             spec)
    A = espec.aux_width
    if espec.aux_first:
        g_aux = d_full[:, :A]
        g_ex = d_full[:, A:]
    else:
        g_ex = d_full[:, :espec.ex_width]
        g_aux = d_full[:, espec.ex_width:]
    if espec.aux_mode == "broadcast":
        daux_ref[:, :] += jnp.sum(g_aux, axis=0, keepdims=True)
    else:
        daux_ref[:, :] = g_aux
    dx_ref[:, :] = _embed_bwd(x, g_ex, espec, alpha)


def _efwd_kernel_k0(k0_ref, *refs, spec, espec):
    """PrefetchScalarGridSpec prepends the k0 scalar ref — drop it (it is
    only consumed by the grid and the index maps)."""
    _efwd_kernel(*refs, spec=spec, espec=espec)


def _ebwd_kernel_k0(k0_ref, *refs, spec, espec):
    _ebwd_kernel(*refs, spec=spec, espec=espec)


@functools.lru_cache(maxsize=None)
def _make_embed_fused(spec_key, espec_key, tile):
    spec = _SpecFromKey(spec_key)
    espec = EmbedSpec(*espec_key)
    L = len(spec.layer_dims)
    dlast = spec.layer_dims[-1][1]
    A = espec.aux_width

    # All index maps receive (i, k0_ref) under PrefetchScalarGridSpec:
    # k0_ref[0] is the first live block — the kernel only runs on blocks
    # [k0, n_blocks), skipping a known-dead prefix (live-suffix mode;
    # k0 = 0 processes everything). Skipped output blocks are UNWRITTEN
    # (garbage) — callers must mask them downstream.
    def wb_specs():
        specs = []
        for (di, do) in spec.layer_dims:
            specs.append(pl.BlockSpec((di, do), lambda i, k0: (0, 0),
                                      memory_space=pltpu.VMEM))
            specs.append(pl.BlockSpec((1, do), lambda i, k0: (0, 0),
                                      memory_space=pltpu.VMEM))
        specs.append(pl.BlockSpec((dlast, spec.out_dim),
                                  lambda i, k0: (0, 0),
                                  memory_space=pltpu.VMEM))
        specs.append(pl.BlockSpec((1, spec.out_dim),
                                  lambda i, k0: (0, 0),
                                  memory_space=pltpu.VMEM))
        return specs

    def live(i, k0):
        return k0[0] + i

    x_spec = pl.BlockSpec((tile, 3), lambda i, k0: (live(i, k0), 0),
                          memory_space=pltpu.VMEM)
    if espec.aux_mode == "broadcast":
        aux_spec = pl.BlockSpec((1, A), lambda i, k0: (0, 0),
                                memory_space=pltpu.VMEM)
    else:
        aux_spec = pl.BlockSpec((tile, A), lambda i, k0: (live(i, k0), 0),
                                memory_space=pltpu.VMEM)
    alpha_spec = pl.BlockSpec((1, 1), lambda i, k0: (0, 0),
                              memory_space=pltpu.SMEM)

    def prep(x, aux, alpha):
        xp, n = _pad_rows(x.astype(jnp.float32), tile)
        if espec.aux_mode == "broadcast":
            auxp = aux.astype(jnp.float32).reshape(1, A)
        else:
            auxp, _ = _pad_rows(aux.astype(jnp.float32), tile)
        al = jnp.asarray(alpha, jnp.float32).reshape(1, 1)
        return xp, auxp, al, n

    def clamp_k0(xp, k0):
        # clamp so an ALL-dead batch (k0 == n_blocks) still runs one
        # in-range block instead of a zero-trip grid whose first block
        # index is out of range (the caller masks dead rows either way)
        n_blocks = xp.shape[0] // tile
        return jnp.minimum(k0, n_blocks - 1)

    def grid_of(xp, k0):
        return (xp.shape[0] // tile - k0[0],)

    def run_fwd(x, aux, alpha, k0, params):
        xp, auxp, al, n = prep(x, aux, alpha)
        k0 = clamp_k0(xp, k0)
        out = pl.pallas_call(
            functools.partial(_efwd_kernel_k0, spec=spec, espec=espec),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid_of(xp, k0),
                in_specs=[x_spec, aux_spec, alpha_spec] + wb_specs(),
                out_specs=pl.BlockSpec((tile, spec.out_dim),
                                       lambda i, k0: (live(i, k0), 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((xp.shape[0], spec.out_dim),
                                           jnp.float32),
            interpret=_interpret(),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20),
        )(k0, xp, auxp, al, *params)
        return out[:n]

    def run_bwd(x, aux, alpha, k0, params, gout):
        xp, auxp, al, n = prep(x, aux, alpha)
        k0 = clamp_k0(xp, k0)
        gp, _ = _pad_rows(gout.astype(jnp.float32), tile)
        dwb_specs, dwb_shapes = [], []
        for (di, do) in list(spec.layer_dims) + [(dlast, spec.out_dim)]:
            dwb_specs.append(pl.BlockSpec((di, do), lambda i, k0: (0, 0),
                                          memory_space=pltpu.VMEM))
            dwb_shapes.append(jax.ShapeDtypeStruct((di, do), jnp.float32))
            dwb_specs.append(pl.BlockSpec((1, do), lambda i, k0: (0, 0),
                                          memory_space=pltpu.VMEM))
            dwb_shapes.append(jax.ShapeDtypeStruct((1, do), jnp.float32))
        if espec.aux_mode == "broadcast":
            daux_spec = pl.BlockSpec((1, A), lambda i, k0: (0, 0),
                                     memory_space=pltpu.VMEM)
            daux_shape = jax.ShapeDtypeStruct((1, A), jnp.float32)
        else:
            daux_spec = pl.BlockSpec((tile, A),
                                     lambda i, k0: (live(i, k0), 0),
                                     memory_space=pltpu.VMEM)
            daux_shape = jax.ShapeDtypeStruct((xp.shape[0], A),
                                              jnp.float32)
        outs = pl.pallas_call(
            functools.partial(_ebwd_kernel_k0, spec=spec, espec=espec),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid_of(xp, k0),
                in_specs=([x_spec, aux_spec, alpha_spec] + wb_specs()
                          + [pl.BlockSpec((tile, spec.out_dim),
                                          lambda i, k0: (live(i, k0), 0),
                                          memory_space=pltpu.VMEM)]),
                out_specs=([pl.BlockSpec((tile, 3),
                                         lambda i, k0: (live(i, k0), 0),
                                         memory_space=pltpu.VMEM),
                            daux_spec] + dwb_specs),
            ),
            out_shape=([jax.ShapeDtypeStruct((xp.shape[0], 3),
                                             jnp.float32),
                        daux_shape] + dwb_shapes),
            interpret=_interpret(),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20),
        )(k0, xp, auxp, al, *params, gp)
        # Zero the skipped dead-prefix rows of the STREAMED outputs: the
        # kernel never writes them (uninitialized HBM). dx the caller
        # could mask, but stream-mode daux feeds aux gradients whose
        # broadcast VJP SUMS ALL ROWS (models/human.py cond/cond_prev) —
        # garbage there silently corrupts pose/condition grads on real
        # TPU (interpret mode zero-fills, so only hardware sees it).
        live_rows = (jax.lax.broadcasted_iota(
            jnp.int32, (xp.shape[0], 1), 0) >= k0[0] * tile)
        dx = jnp.where(live_rows, outs[0], 0.0)[:n]
        daux = outs[1]
        if espec.aux_mode == "broadcast":
            daux = daux[0]
        else:
            daux = jnp.where(live_rows, daux, 0.0)[:n]
        dparams = []
        for k, g in enumerate(outs[2:]):
            if k % 2 == 1:  # bias [1, do] -> [do]
                g = g[0]
            dparams.append(g)
        return dx, daux, tuple(dparams)

    @jax.custom_vjp
    def fused(x, aux, alpha, k0, *params):
        return run_fwd(x, aux, alpha, k0, params)

    def fwd(x, aux, alpha, k0, *params):
        return run_fwd(x, aux, alpha, k0, params), (x, aux, alpha, k0,
                                                    params)

    def bwd(res, gout):
        x, aux, alpha, k0, params = res
        dx, daux, dparams = run_bwd(x, aux, alpha, k0, params, gout)
        dparams = tuple(dp.astype(p.dtype)
                        for dp, p in zip(dparams, params))
        dalpha = jnp.zeros_like(jnp.asarray(alpha, jnp.float32))
        dk0 = np.zeros(np.shape(k0), jax.dtypes.float0)
        return (dx.astype(x.dtype), daux.astype(aux.dtype),
                dalpha, dk0) + dparams

    fused.defvjp(fwd, bwd)
    return fused


def fused_embed_trunk(x, aux, alpha,
                      layer_params: Sequence[Tuple[jnp.ndarray,
                                                   jnp.ndarray]],
                      out_params: Tuple[jnp.ndarray, jnp.ndarray], *,
                      kind: str, multires: int, aux_mode: str,
                      aux_first: bool, skip_before: Optional[int],
                      skip_source: str, precision: str = "bf16",
                      tile: int = 1024, k0_blocks=None) -> jnp.ndarray:
    """Embed + trunk + head, fully fused. x [N, 3] raw points; aux =
    state row [A] (broadcast) or condition codes [N, A] (stream); alpha =
    hann anneal scalar (ignored for 'fourier').

    k0_blocks: optional traced scalar — first live `tile`-block. When the
    caller has sorted its samples so rows [0, k0_blocks*tile) are known
    dead (zero loss contribution AND zero cotangents), the kernel runs
    only blocks [k0_blocks, n_blocks): forward AND backward skip the
    dead prefix, whose output rows are left UNWRITTEN (garbage) — the
    caller MUST mask them before any NaN-sensitive use. Parameter
    gradients are exact (dead rows carry zero cotangents by contract).

    layer_params in the flax orientation ([din, dout] kernels with the
    ORIGINAL interleaved embed row order — this wrapper permutes the rows
    of W0 and of the skip layer's W to the kernel's grouped layout; the
    gather is differentiable so autodiff restores grad order for free).

    skip_source: 'full_input' (CanonicalMLP re-concats [input, h]) or
    'embed' (NonRigidMLP re-concats [h, pos_embed])."""
    espec = EmbedSpec(kind, multires, int(aux.shape[-1]), aux_mode,
                      aux_first)
    ex_w = espec.ex_width
    A = espec.aux_width
    eperm = embed_row_perm(multires, espec.include_input)
    if aux_first:
        full_perm = np.concatenate([np.arange(A), A + eperm])
    else:
        full_perm = np.concatenate([eperm, ex_w + np.arange(A)])

    params = []
    layer_dims = []
    for i, (w, b) in enumerate(layer_params):
        if i == 0:
            w = w[full_perm]
        elif skip_before is not None and i == skip_before:
            din = w.shape[0]
            if skip_source == "full_input":
                # rows = [full input (permuted), h]
                rows = np.concatenate(
                    [full_perm, np.arange(len(full_perm), din)])
            else:
                # rows = [h, embed (permuted)]
                h_w = din - ex_w
                rows = np.concatenate([np.arange(h_w), h_w + eperm])
            w = w[rows]
        params.extend((w, b.reshape(1, -1)))
        layer_dims.append((int(w.shape[0]), int(w.shape[1])))
    params.extend((out_params[0], out_params[1].reshape(1, -1)))

    if skip_source == "full_input":
        skip_order, skip_off, skip_width = "input_first", 0, ex_w + A
    else:
        skip_order = "h_first"
        skip_off = A if aux_first else 0
        skip_width = ex_w
    spec_key = (tuple(layer_dims), skip_before, skip_order, skip_off,
                skip_width, int(out_params[0].shape[1]), precision)
    fused = _make_embed_fused(spec_key, espec.key(), tile)
    if alpha is None:
        alpha = 0.0
    if k0_blocks is None:
        k0_blocks = 0
    k0 = jnp.asarray(k0_blocks, jnp.int32).reshape(1)
    return fused(x, aux, alpha, k0, *params)


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
