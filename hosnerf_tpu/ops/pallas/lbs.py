"""Fused LBS Pallas kernels: trilinear bone-weight sampling on the MXU
with the one-hot rows built in VMEM (never materialized in HBM).

Why a kernel: the XLA one-hot-matmul LBS (ops/lbs.py) is HBM-bound — XLA
materializes each bone's [N, H*W] one-hot row matrix in HBM (~1 GB at the
production 262k samples) because elementwise producers don't fuse into
matmul operands. Honest fetch-forced timing on v5e measured 92 ms forward
/ 152 ms grad per inverse-LBS call, ~80% of it HBM traffic. These kernels
build the one-hot tiles in VMEM per 512-sample block, so HBM traffic is
just pts in / weights out, and the arithmetic runs on the MXU.

Two kernels, mirroring the two access patterns of the reference's
skinning (ref: 2nd_State_Conditional_Human-Object/core/nets/human_nerf/
network.py:302-396):

* `inverse_core`: per-bone positions (obs -> canonical). Each bone
  transforms the points with its own affine before sampling its weight
  channel, so the one-hot rows are rebuilt per bone. The per-bone matmul
  [T, G^2] @ [G^2, G] has a G-wide output (25% MXU lane utilization at
  G=32) — inherent to per-bone sampling.

* `shared_core`: one set of taps for ALL bones (canonical -> obs forward
  skinning samples every channel at the same canonical point). One
  [T, G^2] @ [G^2, B*G] matmul with a full 128-lane output — MXU-perfect.

Both are wrapped in `jax.custom_vjp` with hand-written backward kernels
(recompute-in-backward; no big residuals). Gradients flow to pts, bone
transforms, and the weight volume; the bbox scalars get zero gradients
(they are dataset constants — documented contract).

Numerics: the trilinear tap weights are built with the floor/offset form
(identical tap selection and zeros-padding semantics to ops/lbs.py and
torch F.grid_sample align_corners=True). `precision="highest"` keeps
every operand f32 with HIGHEST matmuls (parity mode, matches the XLA
path to ~1e-6); `precision="bf16"` casts the one-hot rows and volume to
bf16 for single-pass MXU issue with f32 accumulation (~2^-9 relative
error on weights; the production default).

Measured dead end (v5e, kept for the record): per-(tile, bone) support
skipping — predicate `coord range intersects [-1, G]` guarding the tap
build + matmul with `lax.cond`/`pl.when`. The skip itself works (50/50
in/out points: fwd 37->28 ms, grad 145->91 ms) but never fires on real
ray batches: samples arrive ray-ordered, so a 512-sample tile is ~4 full
near->far rays whose per-bone grid-coord span averages ~48 units against
a 32-unit grid — 99.9% of (tile, bone) pairs intersect the volume. All-in
overhead is ~2% on the kernels and ~5% on the train step, so it was
reverted. It would pay only after a sample-reordering pass (e.g. Morton
order), which costs more than it saves at these sizes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Samples per grid step, per kernel family. Measured sweep (v5e, 262k
# samples): the inverse kernels run 512 / 1024 / 2048 at grad 147.6 /
# 135.6 / 134.5 ms — 1024 takes the program-count amortization win
# without 2048's VMEM pressure. The shared kernels see no win from
# bigger tiles (9.6 vs 10.0 ms) and their [T, B*G] intermediates blow
# the 16 MB scoped-vmem limit at 1024, so they stay at 512.
TILE_INV = 1024
TILE_SH = 512

_HIGHEST = jax.lax.Precision.HIGHEST


def _interpret() -> bool:
    """Run in interpreter mode off-TPU (CPU tests)."""
    return jax.default_backend() != "tpu"


def _mm(a, b, prec: str, dims=None):
    """Matmul with the kernel's precision contract. dims: optional
    dot_general dimension_numbers (defaults to plain a @ b)."""
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


def _xy_iotas_f(T: int, G: int):
    """Hoisted per-tile [T, G*G] x/y coordinate grids in f32.

    Measured dead end (v5e, kept for the record): building the taps in
    bf16/int16 to halve VPU time fails in Mosaic — bf16 AND int16
    compares are both unsupported ("Target does not support this
    comparison") and a 32-bit i1 mask can't relayout onto 16-bit select
    operands. Builds stay f32; only matmul operands are cast to bf16
    (in `_mm`). G is a power of two in every shipped config — shifts and
    masks, not div/mod (integer division on the VPU measured 4x slower
    end-to-end).
    """
    iq = jax.lax.broadcasted_iota(jnp.int32, (T, G * G), 1)
    if G & (G - 1) == 0:
        sh = G.bit_length() - 1
        return ((iq & (G - 1)).astype(jnp.float32),
                (iq >> sh).astype(jnp.float32))
    return (jnp.remainder(iq, G).astype(jnp.float32),
            (iq // G).astype(jnp.float32))


def _g_iota_f(T: int, G: int):
    return jax.lax.broadcasted_iota(jnp.int32, (T, G), 1).astype(
        jnp.float32)


def _hat(f, iota):
    """Linear-interpolation tap weights as the hat function
    max(0, 1 - |f - i|): identical values to the floor/offset tap build
    (including zeros padding — out-of-grid taps just don't exist on the
    iota) in 4 VPU ops instead of 6, with no floor.
    f [T,1] f32 grid coords; iota [T,Q] f32 grid lines."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(f - iota))


def _clipped_floor(f, G: int):
    """floor clamped to [-4, G+3] — out-of-grid either way (all taps
    zero), keeps later equality compares exact."""
    return jnp.clip(jnp.floor(f), -4.0, G + 3.0)


def _dhat(f0, iota):
    """d(hat)/df with the reference's floor-based semantics: -1 at
    floor(f), +1 at floor(f)+1 (NOT the hat's sign kink — at exactly
    integer f the gather form assigns -1/+1 to the two taps, which the
    hat's |.| derivative would miss). f0 = `_clipped_floor(f)`."""
    d = iota - f0
    return (jnp.where(d == 1.0, 1.0, 0.0)
            - jnp.where(d == 0.0, 1.0, 0.0))


# ---------------------------------------------------------------------------
# inverse kernel: per-bone positions
# ---------------------------------------------------------------------------


def _inverse_fwd_kernel(pts_ref, rg_ref, tg_ref, vol_ref, out_ref,
                        *, B: int, G: int, prec: str):
    """One tile: accumulate grid-space acc (3) + wsum (1) over B bones.

    pts_ref [T,3] grid-space points; rg_ref [B,9], tg_ref [B,3] grid-space
    bone affines; vol_ref [B, G*G, G] (q=y*G+x rows, z cols);
    out_ref [T,4] = (accx, accy, accz, wsum), all in grid coords.
    """
    x = pts_ref[:, 0:1]
    y = pts_ref[:, 1:2]
    z = pts_ref[:, 2:3]
    T = x.shape[0]
    xq, yq = _xy_iotas_f(T, G)
    ig = _g_iota_f(T, G)

    def body(b, acc):
        fx = rg_ref[b, 0] * x + rg_ref[b, 1] * y + rg_ref[b, 2] * z \
            + tg_ref[b, 0]
        fy = rg_ref[b, 3] * x + rg_ref[b, 4] * y + rg_ref[b, 5] * z \
            + tg_ref[b, 1]
        fz = rg_ref[b, 6] * x + rg_ref[b, 7] * y + rg_ref[b, 8] * z \
            + tg_ref[b, 2]
        # [T, G*G] bilinear one-hot rows, built in VMEM
        onehot = _hat(fx, xq) * _hat(fy, yq)
        zcols = _mm(onehot, vol_ref[b], prec)          # [T, G] f32
        w_b = jnp.sum(_hat(fz, ig) * zcols, axis=1,
                      keepdims=True)                    # [T, 1]
        return acc + w_b * jnp.concatenate([fx, fy, fz,
                                            jnp.ones_like(fx)], axis=1)

    out_ref[:, :] = jax.lax.fori_loop(0, B, body,
                                      jnp.zeros((T, 4), jnp.float32))


def _inverse_bwd_kernel(pts_ref, rg_ref, tg_ref, volt_ref, gacc_ref,
                        dpts_ref, drgt_ref, dtg_ref, dvol_ref,
                        *, B: int, G: int, prec: str):
    """Backward of `_inverse_fwd_kernel` by recomputation.

    Grid = (tiles,) with an in-kernel fori_loop over bones — the iota
    grids, pts/gacc reads and per-program setup are paid once per tile
    instead of once per (tile, bone) (the earlier 2-D grid measured
    ~8-16% of its time in per-program overhead). volt_ref [B, G(z), G*G]
    is the TRANSPOSED volume layout: the z-interpolated slab
    V = tz @ volT [T, G*G] serves w_b, dfx and dfy at once (one matmul
    instead of three zcols-style ones).
    gacc_ref [T,4] = (d/d accx, accy, accz, wsum).
    Outputs: dpts [T,3] per tile; drgt/dtg/dvol are full-resident blocks
    accumulated across the sequential tile programs (dynamic bone-index
    stores inside the loop); drgt [B,3,3] = dRg TRANSPOSED (row j holds
    sum_t p_j * df); dtg [B,1,3]; dvol [B,G*G,G].
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init_accs():
        dvol_ref[:, :, :] = jnp.zeros_like(dvol_ref)
        drgt_ref[:, :, :] = jnp.zeros_like(drgt_ref)
        dtg_ref[:, :, :] = jnp.zeros_like(dtg_ref)

    x = pts_ref[:, 0:1]
    y = pts_ref[:, 1:2]
    z = pts_ref[:, 2:3]
    T = x.shape[0]
    xq, yq = _xy_iotas_f(T, G)
    ig = _g_iota_f(T, G)

    gx = gacc_ref[:, 0:1]
    gy = gacc_ref[:, 1:2]
    gz = gacc_ref[:, 2:3]
    gw_sum = gacc_ref[:, 3:4]

    def body(b, dpts_acc):
        fx = rg_ref[b, 0] * x + rg_ref[b, 1] * y + rg_ref[b, 2] * z \
            + tg_ref[b, 0]
        fy = rg_ref[b, 3] * x + rg_ref[b, 4] * y + rg_ref[b, 5] * z \
            + tg_ref[b, 1]
        fz = rg_ref[b, 6] * x + rg_ref[b, 7] * y + rg_ref[b, 8] * z \
            + tg_ref[b, 2]
        tx = _hat(fx, xq)
        ty = _hat(fy, yq)
        tz = _hat(fz, ig)                                # [T, G]
        onehot = tx * ty                                 # [T, G*G]

        # V = z-interpolated slab; Vdz = its z-derivative (2 small-K
        # matmuls; row-stacking them into one measured no win)
        V = _mm(tz, volt_ref[b], prec)                   # [T, G*G]
        Vdz = _mm(_dhat(_clipped_floor(fz, G), ig), volt_ref[b], prec)

        w_b = jnp.sum(onehot * V, axis=1, keepdims=True)

        # acc = sum_b w_b * (fx, fy, fz, 1)
        gw = gx * fx + gy * fy + gz * fz + gw_sum        # dL/dw_b [T,1]

        # dvol_b[q, z] += sum_t onehot[t,q] * gw[t] * tz[t,z]
        dims_t = (((0,), (0,)), ((), ()))
        dvol_ref[b, :, :] += _mm(onehot * gw, tz, prec, dims=dims_t)

        dfx = gx * w_b + gw * jnp.sum(
            _dhat(_clipped_floor(fx, G), xq) * ty * V, axis=1,
            keepdims=True)
        dfy = gy * w_b + gw * jnp.sum(
            tx * _dhat(_clipped_floor(fy, G), yq) * V, axis=1,
            keepdims=True)
        dfz = gz * w_b + gw * jnp.sum(onehot * Vdz, axis=1, keepdims=True)
        df = jnp.concatenate([dfx, dfy, dfz], axis=1)    # [T, 3]

        # dRg^T rows: row j = sum_t p_j[t] * df[t, :]
        drgt_ref[b, :, :] += jnp.concatenate(
            [jnp.sum(df * x, axis=0, keepdims=True),
             jnp.sum(df * y, axis=0, keepdims=True),
             jnp.sum(df * z, axis=0, keepdims=True)], axis=0)
        dtg_ref[b, :, :] += jnp.sum(df, axis=0, keepdims=True)

        # chain through the bone affine: dpts += df @ Rg_b
        return dpts_acc + jnp.concatenate(
            [dfx * rg_ref[b, 0] + dfy * rg_ref[b, 3] + dfz * rg_ref[b, 6],
             dfx * rg_ref[b, 1] + dfy * rg_ref[b, 4] + dfz * rg_ref[b, 7],
             dfx * rg_ref[b, 2] + dfy * rg_ref[b, 5] + dfz * rg_ref[b, 8]],
            axis=1)

    dpts_ref[:, :] = jax.lax.fori_loop(
        0, B, body, jnp.zeros((T, 3), jnp.float32))


def _pad_rows(a, mult):
    n = a.shape[0]
    pad = (-n) % mult
    if pad:
        a = jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
    return a, n


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def inverse_core(pts_g, rg, tg, vol_qz, prec="bf16"):
    """Grid-space inverse-LBS accumulation.

    pts_g [N,3] grid coords; rg [B,9] / tg [B,3] grid-space bone affines;
    vol_qz [B, G*G, G]. Returns acc [N,4] = (sum_b w_b*f_b, sum_b w_b)
    in grid coordinates. Normalization / world conversion stay in XLA.
    """
    return _inverse_fwd(pts_g, rg, tg, vol_qz, prec)[0]


def _inverse_fwd(pts_g, rg, tg, vol_qz, prec):
    B, QQ, G = vol_qz.shape
    assert QQ == G * G, "inverse_core needs square xy slices"
    pts_p, n = _pad_rows(pts_g.astype(jnp.float32), TILE_INV)
    vol = vol_qz.astype(jnp.bfloat16 if prec == "bf16" else jnp.float32)
    grid = (pts_p.shape[0] // TILE_INV,)
    kern = functools.partial(_inverse_fwd_kernel, B=B, G=G, prec=prec)
    acc = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_INV, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 9), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((B, 3), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((B, G * G, G), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_INV, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((pts_p.shape[0], 4), jnp.float32),
        interpret=_interpret(),
    )(pts_p, rg.astype(jnp.float32), tg.astype(jnp.float32), vol)
    return acc[:n], (pts_g, rg, tg, vol_qz)


def _inverse_bwd(prec, res, gacc):
    pts_g, rg, tg, vol_qz = res
    B, QQ, G = vol_qz.shape
    pts_p, n = _pad_rows(pts_g.astype(jnp.float32), TILE_INV)
    gacc_p, _ = _pad_rows(gacc.astype(jnp.float32), TILE_INV)
    # transposed layout [B, G(z), G*G] for the V-trick (see kernel doc)
    volt = jnp.swapaxes(vol_qz, 1, 2).astype(
        jnp.bfloat16 if prec == "bf16" else jnp.float32)
    grid = (pts_p.shape[0] // TILE_INV,)
    kern = functools.partial(_inverse_bwd_kernel, B=B, G=G, prec=prec)
    dpts, drgt, dtg, dvol = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_INV, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 9), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((B, 3), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((B, G, G * G), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_INV, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_INV, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 3, 3), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1, 3), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, G * G, G), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((pts_p.shape[0], 3), jnp.float32),
            jax.ShapeDtypeStruct((B, 3, 3), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, 3), jnp.float32),
            jax.ShapeDtypeStruct((B, QQ, G), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
    )(pts_p, rg.astype(jnp.float32), tg.astype(jnp.float32), volt, gacc_p)
    drg = jnp.swapaxes(drgt, 1, 2)  # the kernel stores dRg transposed
    return (dpts[:n].astype(pts_g.dtype),
            drg.reshape(B, 9).astype(rg.dtype),
            dtg.reshape(B, 3).astype(tg.dtype), dvol.astype(vol_qz.dtype))


inverse_core.defvjp(lambda p, r, t, v, prec: _inverse_fwd(p, r, t, v, prec),
                    _inverse_bwd)


# ---------------------------------------------------------------------------
# shared-tap kernel: all bones sampled at the same points
# ---------------------------------------------------------------------------


def _shared_fwd_kernel(pts_ref, vol_ref, sum_ref, out_ref,
                       *, B: int, G: int, prec: str):
    """w_all [T, B]: every bone's weight at the same grid-space point.

    vol_ref [G*G, B*G] (col = b*G + z) — ONE full-lane matmul;
    sum_ref [B*G, B] constant 0/1 block-sum matrix.
    """
    fx = pts_ref[:, 0:1]
    fy = pts_ref[:, 1:2]
    fz = pts_ref[:, 2:3]
    T = fx.shape[0]
    xq, yq = _xy_iotas_f(T, G)
    ic = jax.lax.broadcasted_iota(jnp.int32, (T, B * G), 1)
    zc = ((ic & (G - 1)) if G & (G - 1) == 0
          else jnp.remainder(ic, G)).astype(jnp.float32)

    onehot = _hat(fx, xq) * _hat(fy, yq)                 # [T, G*G]
    zcols = _mm(onehot, vol_ref[:, :], prec)             # [T, B*G] f32
    out_ref[:, :] = _mm(zcols * _hat(fz, zc), sum_ref[:, :], prec)


def _shared_bwd_kernel(pts_ref, vol_ref, exp_ref, gw_ref,
                       dpts_ref, dvol_ref, *, B: int, G: int, prec: str):
    """Backward of `_shared_fwd_kernel` by recomputation.

    exp_ref [B, B*G] constant 0/1 bone-expansion matrix; gw_ref [T, B].
    """
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        dvol_ref[:, :] = jnp.zeros_like(dvol_ref)

    fx = pts_ref[:, 0:1]
    fy = pts_ref[:, 1:2]
    fz = pts_ref[:, 2:3]
    T = fx.shape[0]
    xq, yq = _xy_iotas_f(T, G)
    ic = jax.lax.broadcasted_iota(jnp.int32, (T, B * G), 1)
    zc = ((ic & (G - 1)) if G & (G - 1) == 0
          else jnp.remainder(ic, G)).astype(jnp.float32)

    tx = _hat(fx, xq)
    ty = _hat(fy, yq)
    onehot = tx * ty
    ztap = _hat(fz, zc)
    zcols = _mm(onehot, vol_ref[:, :], prec)            # [T, B*G] f32

    gw_exp = _mm(gw_ref[:, :], exp_ref[:, :], prec)     # [T, B*G] f32
    dzcols = gw_exp * ztap
    dims_t = (((0,), (0,)), ((), ()))
    # dvol += onehot^T @ dzcols  [G*G, B*G]
    dvol_ref[:, :] += _mm(onehot, dzcols, prec, dims=dims_t)

    # U[t,q] = sum_c dzcols[t,c] * vol[q,c]
    dims_c = (((1,), (1,)), ((), ()))
    U = _mm(dzcols, vol_ref[:, :], prec, dims=dims_c)   # [T, G*G] f32
    dfx = jnp.sum(_dhat(_clipped_floor(fx, G), xq) * ty * U,
                  axis=1, keepdims=True)
    dfy = jnp.sum(tx * _dhat(_clipped_floor(fy, G), yq) * U,
                  axis=1, keepdims=True)
    dfz = jnp.sum(gw_exp * _dhat(_clipped_floor(fz, G), zc) * zcols,
                  axis=1, keepdims=True)
    dpts_ref[:, :] = jnp.concatenate([dfx, dfy, dfz], axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def shared_core(pts_g, vol_all, prec="bf16"):
    """All-bone trilinear weights at shared grid-space points.

    pts_g [N,3] grid coords; vol_all [G*G, B*G]. Returns w_all [N, B].
    """
    return _shared_fwd(pts_g, vol_all, prec)[0]


def _shared_fwd(pts_g, vol_all, prec):
    QQ, BG = vol_all.shape
    G = int(round(QQ ** 0.5))
    B = BG // G
    assert G * G == QQ and B * G == BG
    pts_p, n = _pad_rows(pts_g.astype(jnp.float32), TILE_SH)
    dt = jnp.bfloat16 if prec == "bf16" else jnp.float32
    vol = vol_all.astype(dt)
    sum_blk = jnp.asarray(np.kron(np.eye(B), np.ones((G, 1))), dt)
    grid = (pts_p.shape[0] // TILE_SH,)
    kern = functools.partial(_shared_fwd_kernel, B=B, G=G, prec=prec)
    w = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_SH, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((QQ, BG), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BG, B), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_SH, B), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((pts_p.shape[0], B), jnp.float32),
        interpret=_interpret(),
    )(pts_p, vol, sum_blk)
    return w[:n], (pts_g, vol_all)


def _shared_bwd(prec, res, gw):
    pts_g, vol_all = res
    QQ, BG = vol_all.shape
    G = int(round(QQ ** 0.5))
    B = BG // G
    pts_p, n = _pad_rows(pts_g.astype(jnp.float32), TILE_SH)
    gw_p, _ = _pad_rows(gw.astype(jnp.float32), TILE_SH)
    dt = jnp.bfloat16 if prec == "bf16" else jnp.float32
    vol = vol_all.astype(dt)
    expand = jnp.asarray(np.kron(np.eye(B), np.ones((1, G))), dt)
    grid = (pts_p.shape[0] // TILE_SH,)
    kern = functools.partial(_shared_bwd_kernel, B=B, G=G, prec=prec)
    dpts, dvol = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_SH, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((QQ, BG), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, BG), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_SH, B), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_SH, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((QQ, BG), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((pts_p.shape[0], 3), jnp.float32),
            jax.ShapeDtypeStruct((QQ, BG), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
    )(pts_p, vol, expand, gw_p)
    return dpts[:n].astype(pts_g.dtype), dvol.astype(vol_all.dtype)


shared_core.defvjp(lambda p, v, prec: _shared_fwd(p, v, prec),
                   _shared_bwd)


# ---------------------------------------------------------------------------
# high-level wrappers matching ops/lbs.py semantics
# ---------------------------------------------------------------------------


def _grid_affine(bbox_min, bbox_scale, G: int):
    """World -> fractional-grid-index affine: f = p*s + o per axis
    (the composition of ops/lbs.normalize_coords with the [-1,1] ->
    [0, G-1] tap mapping)."""
    s = bbox_scale * 0.5 * (G - 1)
    o = -bbox_min * s
    return s, o


def inverse_lbs(pts, motion_scale_Rs, motion_Ts, motion_weights_vol,
                cnl_bbox_min_xyz, cnl_bbox_scale_xyz, *,
                precision: str = "bf16") -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pallas inverse LBS. Same contract as ops/lbs.inverse_lbs but
    returns only (x_skel [N,3], fg_likelihood_mask [N,1]) — the call
    sites discard the per-bone weights (models/human.py:207)."""
    B = motion_weights_vol.shape[0] - 1
    D, H, W = motion_weights_vol.shape[1:]
    assert D == H == W, "pallas inverse_lbs assumes cubic volumes"
    G = D
    s, o = _grid_affine(cnl_bbox_min_xyz, cnl_bbox_scale_xyz, G)
    # fold the world->grid affine into the bone transforms:
    # f = s * (R p + T) + o  =>  Rg = diag(s) R, Tg = s*T + o
    rg = (motion_scale_Rs * s[None, :, None]).reshape(B, 9)
    tg = motion_Ts * s[None, :] + o[None, :]
    # vol[b, z, y, x] -> [b, y*G+x, z]
    vol_qz = jnp.transpose(motion_weights_vol[:B], (0, 2, 3, 1)).reshape(
        B, G * G, G)
    acc = inverse_core(pts, rg, tg, vol_qz, precision)
    wsum = acc[:, 3:4]
    m = jnp.maximum(wsum, 1e-4)
    # grid-space accumulator back to world: p = (f - o)/s
    x_skel = (acc[:, :3] / m - o[None, :] * (wsum / m)) / s[None, :]
    return x_skel, wsum


def bone_weights(pts, motion_weights_vol, cnl_bbox_min_xyz,
                 cnl_bbox_scale_xyz, *,
                 precision: str = "bf16") -> jnp.ndarray:
    """All-bone trilinear weights at shared points -> [N, B] (the
    forward-LBS sampling pattern, ref network.py:355-396: every channel
    sampled at the same canonical point)."""
    B = motion_weights_vol.shape[0] - 1
    D, H, W = motion_weights_vol.shape[1:]
    assert D == H == W, "pallas bone_weights assumes cubic volumes"
    G = D
    s, o = _grid_affine(cnl_bbox_min_xyz, cnl_bbox_scale_xyz, G)
    pts_g = pts * s[None, :] + o[None, :]
    # vol[b, z, y, x] -> [y*G+x, b*G+z]
    vol_all = jnp.transpose(motion_weights_vol[:B], (2, 3, 0, 1)).reshape(
        G * G, B * G)
    return shared_core(pts_g, vol_all, precision)
