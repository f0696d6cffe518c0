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
  channel, so the tap rows are rebuilt per bone. Two measured facts on
  v5e shaped its design:
    (1) ONE MATMUL PER BONE, MINIMAL [T, G^2] TRAFFIC — the joint xy
        tap rows build as ONE fused elementwise chain (hat(fx)*hat(fy),
        written once in the matmul operand dtype) and contract against
        the bone volume relaid [G^2(x,y), G(z)] in ONE full-K matmul.
        This beat both the separable factorization (x-expansion matmul
        at N=G^2 + y-tap VPU build + product + z-block-sum matmul:
        fwd 28.7 vs 22.2 ms, grad 58.7 vs 60.1 at 262k samples) and an
        MXU-tap-expansion variant of it (fwd 37.7, fwd+bwd 116 ms) —
        matmul issue/stream traffic at N=G^2, not VPU flops, binds this
        kernel family.
    (2) LANE PACKING — ablation showed ~60% of a per-bone-loop kernel
        was [T,1]/[T,G] column work at 1-of-128-lane utilization (the
        bone affines, small tap rows, accumulator updates), NOT the
        [T, G^2] arrays or matmuls. The kernels therefore process
        128//G bones per vector op: affine coefficient tables are
        pre-packed per lane ([NG, 4, 128]), z-tap rows build as [T,128],
        per-bone sums go through a segment-sum matmul, and dRg/dTg
        accumulate via contract-over-T matmuls instead of axis-0 VPU
        reductions. Measured (262k samples, B=26, G=32): forward
        35 -> 28 ms, grad 126 -> 89 ms.

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

Measured dead ends (v5e, kept for the record):
* Per-(tile, bone) support skipping — predicate `coord range intersects
  [-1, G]` guarding the tap build + matmul with `lax.cond`/`pl.when`.
  Round 1: never fires on ray-ordered batches (a tile is a few full
  near->far rays; ~99.9% of (tile, bone) pairs intersect the 32-unit
  grid). Round 2 re-ran it WITH a coarse-spatial-cell sort of the
  samples inside the custom_vjp (argsort of 16^3-cell keys + gather
  in / gather out — a permutation's transpose is the inverse
  permutation, so no scatters): the skip then fires on 48% of
  (tile, bone) pairs at TILE=256 (22% at 1024) on production-shaped
  batches, but the stage-3 step REGRESSED 181.5 -> 199.4 ms — the
  per-bone `lax.cond` breaks Mosaic's pipelining of the always-taken
  path and the sort adds ~10 ms. Depth-major and (ray-block x
  depth-chunk) reorderings (transpose-only, no sort) skip ~10% — not
  enough. Only ~24% of (bone, sample) pairs are truly in-grid, so a
  finer-than-tile mechanism could 3x this kernel, but not via conds.
* A binary floor-cell one-hot contracted against a 4-corner-stacked
  volume [G^2, 4G] (value + both xy derivative contractions recovered
  from the corner columns by per-bone scalar algebra; dvol accumulated
  in the shifted-corner basis and un-shifted in XLA): ~5x fewer big VPU
  ops and exact bf16 taps, but the N=4G matmul quadruples real MXU MACs
  — fwd 22.2 -> 30.4 ms, fwd+bwd 82.3 -> 105.4. The N=G matmul output
  is NOT padded to 128 lanes by Mosaic; widening N is real work.
* bf16 tap builds (no compares in the hat form, so Mosaic accepts it):
  measured SLOWER than f32 builds (28.2 vs 26.6 ms fwd) and the bf16
  subtract f - iota at grid coords ~30 costs ~0.25 absolute tap error —
  rejected on both counts.
* `pltpu.repeat` for the z-tap tile expansion: hangs the Mosaic
  pipeline on this toolchain (compile never returns).
* Full 26-bone python unroll: blows the scoped-VMEM stack; a 7-group
  unroll compiled but pushed the enclosing train-step compile past 19
  minutes. Groups therefore run under `fori_loop` (same measured speed,
  ~7x smaller program).

SHIPPED (round 3) — the cond-free fine-grained skip: a scalar-prefetch
compacted PAIR GRID (`pairgrid_inverse`, below at the "pair-grid inverse
kernel" section). Host/XLA side: Morton-sort the samples, compute the
tap-support-exact predicate per (tile, bone-quad), compact surviving
pairs into a static-capacity list sorted by tile (dummy pairs aim at a
zeroed scratch tile). Kernel side: the Pallas grid runs over the pair
list with a DYNAMIC grid length and prefetched (tile, bones) scalars —
every live step does identical work, so Mosaic pipelining is untouched;
the win is the grid simply being ~half as long. The backward kernel
takes the same pair list (skipped pairs have exactly-zero grads).
Measured (v5e, production-shaped 262k samples): inverse-LBS fwd+bwd
82.8 -> 57.4 ms at TILE_PG=128 (0.52 pair density), stage-3 step
~183 -> ~149 ms. This is the production inverse path; the dense
`inverse_core` remains as the fallback and parity oracle.
"""

from __future__ import annotations

import functools
import os as _os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Samples per grid step, per kernel family. Measured sweep (v5e, 262k
# samples, pre-packing design): the inverse kernels ran 512 / 1024 /
# 2048 at grad 147.6 / 135.6 / 134.5 ms — 1024 takes the program-count
# amortization win without 2048's VMEM pressure. The shared kernels see
# no win from bigger tiles (9.6 vs 10.0 ms) and their [T, B*G]
# intermediates blow the 16 MB scoped-vmem limit at 1024, so they stay
# at 512.
TILE_INV = 1024
TILE_SH = int(_os.environ.get("HOSNERF_TILE_SH", 512))
                  # samples per shared-tap tile. Production-shaped sweep
                  # on v5e (262k samples, fused forward-LBS fwd+bwd at
                  # the live-suffix operating point): 12.8 ms @512 vs
                  # 13.0 @1024 — bigger tiles don't lift the tap-matmul
                  # MFU. Env override for sweeps.
assert TILE_SH <= 1024 and 1024 % TILE_SH == 0, (
    "HOSNERF_TILE_SH must divide the fused-MLP tile (1024): the sparse "
    "pipeline aligns the forward-LBS skip boundary to the MLP boundary "
    f"(k0_sh = k0_mlp * 1024/TILE_SH); got {TILE_SH}. A coarser or "
    "non-divisor tile would feed rows of unwritten garbage from the "
    "skipped MLP into the forward-LBS kernel (0 * NaN = NaN in its "
    "resident dRmat accumulator).")

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


def _lane_iota_f(T: int, G: int):
    """[T, 128] repeating 0..G-1 grid-line iota (tap rows for 128//G
    bones packed on the lane axis)."""
    il = jax.lax.broadcasted_iota(jnp.int32, (T, 128), 1)
    return (il & (G - 1)).astype(jnp.float32)


def _xyq_iotas_f(T: int, G: int):
    """[T, G*G] x/y coordinate grids for the q = x*G + y layout."""
    iq = jax.lax.broadcasted_iota(jnp.int32, (T, G * G), 1)
    if G & (G - 1) == 0:
        sh = G.bit_length() - 1
        return ((iq >> sh).astype(jnp.float32),
                (iq & (G - 1)).astype(jnp.float32))
    return ((iq // G).astype(jnp.float32),
            jnp.remainder(iq, G).astype(jnp.float32))


def _inverse_fwd_kernel(pts_ref, rxs_ref, rys_ref, rzs_ref, volq_ref,
                        out_ref, *, BP: int, G: int, prec: str):
    """One tile: accumulate grid-space acc (3) + wsum (1) over BP bones,
    processed in groups of NGB = 128//G with the per-bone scalar work
    PACKED onto the 128-lane axis (measured: the [T,1]/[T,G] column ops
    of a per-bone loop were ~60% of the kernel's runtime at G=32 —
    1-of-128-lane utilization; packing 128//G bones per vector op
    recovers it).

    pts_ref [T,3] grid-space points. rxs/rys/rzs [NG, 4, 128]: per
    group g and lane l, rows 0..2 = affine coefficients of that lane's
    bone (bone = NGB*g + l//G) for grid coord x/y/z, row 3 = its
    translation — so f<c>seg = x*r[0] + y*r[1] + z*r[2] + r[3] computes
    ALL NGB bones' grid coordinate c at once. volq_ref [BP, G*G, G]
    (q = x*G+y rows, z cols); out_ref [T,4] = (accx, accy, accz, wsum),
    all in grid coords.

    Per bone, ONE fused [T, G*G] elementwise chain builds the joint xy
    tap rows (hat(fx) * hat(fy), written once in the matmul operand
    dtype) and ONE full-K matmul contracts them against the bone's
    volume ([T,G*G] @ [G*G,G] -> [T,G] z-columns). This minimizes big-
    array VMEM traffic: the earlier separable form (x-expansion matmul
    at N=G*G + y-tap build + product + z-block-sum matmul) touched the
    [T, G*G] plane ~4x per bone (measured numbers in the module
    docstring; an MXU-tap-expansion variant of it was slower still —
    matmul issue/traffic, not VPU flops, binds this kernel family).
    The z taps stay lane-packed ([T,128] hat over 128//G bones).
    """
    NGB = 128 // G
    NG = BP // NGB
    x = pts_ref[:, 0:1]
    y = pts_ref[:, 1:2]
    z = pts_ref[:, 2:3]
    T = x.shape[0]
    x128 = _lane_iota_f(T, G)
    xq2, yq2 = _xyq_iotas_f(T, G)
    dt = jnp.bfloat16 if prec == "bf16" else jnp.float32

    def group(g, acc):
        fxseg = (x * rxs_ref[g, 0:1, :] + y * rxs_ref[g, 1:2, :]
                 + z * rxs_ref[g, 2:3, :] + rxs_ref[g, 3:4, :])
        fyseg = (x * rys_ref[g, 0:1, :] + y * rys_ref[g, 1:2, :]
                 + z * rys_ref[g, 2:3, :] + rys_ref[g, 3:4, :])
        fzseg = (x * rzs_ref[g, 0:1, :] + y * rzs_ref[g, 1:2, :]
                 + z * rzs_ref[g, 2:3, :] + rzs_ref[g, 3:4, :])
        tz4 = _hat(fzseg, x128)
        zcs = []
        for j in range(NGB):
            b = NGB * g + j
            c = slice(G * j, G * j + 1)
            oh = (_hat(fxseg[:, c], xq2)
                  * _hat(fyseg[:, c], yq2)).astype(dt)   # [T, G*G] fused
            zcs.append(_mm(oh, volq_ref[b], prec))
        zcols4 = jnp.concatenate(zcs, axis=1)               # [T, 128]
        P4 = tz4 * zcols4
        return acc + jnp.concatenate(
            [jnp.sum(P4 * fxseg, axis=1, keepdims=True),
             jnp.sum(P4 * fyseg, axis=1, keepdims=True),
             jnp.sum(P4 * fzseg, axis=1, keepdims=True),
             jnp.sum(P4, axis=1, keepdims=True)], axis=1)

    out_ref[:, :] = jax.lax.fori_loop(0, NG, group,
                                      jnp.zeros((T, 4), jnp.float32))


def _inverse_bwd_kernel(pts_ref, rxs_ref, rys_ref, rzs_ref, volq_ref,
                        kseg_ref, gacc_ref, dpts_ref,
                        dr_ref, dvol_ref, *, BP: int, G: int, prec: str):
    """Backward of `_inverse_fwd_kernel` by recomputation, with the same
    lane packing (NGB = 128//G bones per group) and the same fused-xy-
    chain + full-K-matmul structure: per bone, three [T, G*G] tap chains
    (oh = hx*hy, dhx*hy, hx*dhy) each feed one [T,G*G] @ [G*G,G] matmul
    against the bone volume, giving the z-columns (zc) and the x/y
    gradient cores as SMALL [T,G] arrays; dvol accumulates via one
    contract-over-T matmul (oh^T @ (gw*tz) -> [G*G, G]).

    Two further costs live on the MXU rather than poorly-utilized VPU
    paths (ablation): per-bone segment sums (w_b, dfz core) go through
    one [T,128] @ kseg [128,128] 0/1 matmul (segment-broadcast sums)
    instead of [T,G]-row reductions, and dRg/dTg accumulation contracts
    over T (p4^T @ df4seg -> [4,128]) instead of 8 axis-0 VPU reductions
    per bone.

    Inputs as forward plus: kseg_ref [128, 128] segment-broadcast-sum
    matrix (1 where lanes share a G-lane segment); gacc_ref [T,4] =
    (d/d accx, accy, accz, wsum).
    Outputs: dpts [T,3] per tile; dr_ref [NG, 3, 4, 128] accumulated
    across sequential tile programs — dr[g, c, k, l] = sum_t
    p_k[t] * df_c[t, bone(g,l)] with p = (x, y, z, 1), from which the
    host reads dRg (k<3) and dTg (k=3) at lanes l = G*j; dvol
    [BP, G*G, G] (volq layout).
    """
    NGB = 128 // G
    NG = BP // NGB
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init_accs():
        dvol_ref[:, :, :] = jnp.zeros_like(dvol_ref)
        dr_ref[:, :, :, :] = jnp.zeros_like(dr_ref)

    x = pts_ref[:, 0:1]
    y = pts_ref[:, 1:2]
    z = pts_ref[:, 2:3]
    T = x.shape[0]
    x128 = _lane_iota_f(T, G)
    xq2, yq2 = _xyq_iotas_f(T, G)
    dt = jnp.bfloat16 if prec == "bf16" else jnp.float32

    gx = gacc_ref[:, 0:1]
    gy = gacc_ref[:, 1:2]
    gz = gacc_ref[:, 2:3]
    gw_sum = gacc_ref[:, 3:4]
    dims_t = (((0,), (0,)), ((), ()))
    p4 = jnp.concatenate([x, y, z, jnp.ones_like(x)], axis=1)  # [T,4]

    def segsum(q):  # [T,128] -> per-G-lane-segment sums, seg-broadcast
        # always f32: these sums ARE the outputs (w_b, grad cores) —
        # unlike the tap matmuls there is no bf16-tap contract here
        return _mm(q, kseg_ref[:, :], "highest")

    def group(g, dpts_acc):
        fxseg = (x * rxs_ref[g, 0:1, :] + y * rxs_ref[g, 1:2, :]
                 + z * rxs_ref[g, 2:3, :] + rxs_ref[g, 3:4, :])
        fyseg = (x * rys_ref[g, 0:1, :] + y * rys_ref[g, 1:2, :]
                 + z * rys_ref[g, 2:3, :] + rys_ref[g, 3:4, :])
        fzseg = (x * rzs_ref[g, 0:1, :] + y * rzs_ref[g, 1:2, :]
                 + z * rzs_ref[g, 2:3, :] + rzs_ref[g, 3:4, :])
        gw4 = gx * fxseg + gy * fyseg + gz * fzseg + gw_sum
        tz4 = _hat(fzseg, x128)
        dhz4 = _dhat(_clipped_floor(fzseg, G), x128)

        zcs, dfxrs, dfyrs = [], [], []
        for j in range(NGB):
            b = NGB * g + j
            c = slice(G * j, G * j + 1)
            s = slice(G * j, G * (j + 1))
            hx = _hat(fxseg[:, c], xq2)
            hy = _hat(fyseg[:, c], yq2)
            oh = (hx * hy).astype(dt)                   # [T, G*G] fused
            zc = _mm(oh, volq_ref[b], prec)             # [T, G]
            m2 = _mm((_dhat(_clipped_floor(fxseg[:, c], G), xq2)
                      * hy).astype(dt), volq_ref[b], prec)
            m3 = _mm((hx * _dhat(_clipped_floor(fyseg[:, c], G), yq2)
                      ).astype(dt), volq_ref[b], prec)
            tzj = tz4[:, s]                             # [T, G]
            # dvol_b[q, z] += sum_t oh[t,q] * gw[t] * tz[t,z]
            dvol_ref[b, :, :] += _mm(oh, gw4[:, c] * tzj, prec,
                                     dims=dims_t)
            zcs.append(zc)
            dfxrs.append(jnp.broadcast_to(
                jnp.sum(m2 * tzj, axis=1, keepdims=True), (T, G)))
            dfyrs.append(jnp.broadcast_to(
                jnp.sum(m3 * tzj, axis=1, keepdims=True), (T, G)))
        zcols4 = jnp.concatenate(zcs, axis=1)           # [T, 128]
        dfxr4 = jnp.concatenate(dfxrs, axis=1)          # [T, 128]
        dfyr4 = jnp.concatenate(dfyrs, axis=1)          # [T, 128]

        wB4 = segsum(tz4 * zcols4)                      # w_b, seg-bcast
        dfx4 = gx * wB4 + gw4 * dfxr4
        dfy4 = gy * wB4 + gw4 * dfyr4
        dfz4 = gz * wB4 + gw4 * segsum(dhz4 * zcols4)

        # dRg/dTg: contract over T on the MXU (see docstring); f32 —
        # bf16 would round the raw point coordinates in p4
        dr_ref[g, 0, :, :] += _mm(p4, dfx4, "highest", dims=dims_t)
        dr_ref[g, 1, :, :] += _mm(p4, dfy4, "highest", dims=dims_t)
        dr_ref[g, 2, :, :] += _mm(p4, dfz4, "highest", dims=dims_t)

        # chain through the bone affines: dpts += sum_b df_b @ Rg_b.
        # df<c>4 is segment-broadcast (G identical lanes per bone), so
        # the lane reduction overcounts by G — folded into 1/G.
        inv_g = jnp.float32(1.0 / G)
        return dpts_acc + inv_g * jnp.concatenate(
            [jnp.sum(dfx4 * rxs_ref[g, 0:1, :] + dfy4 * rys_ref[g, 0:1, :]
                     + dfz4 * rzs_ref[g, 0:1, :], axis=1, keepdims=True),
             jnp.sum(dfx4 * rxs_ref[g, 1:2, :] + dfy4 * rys_ref[g, 1:2, :]
                     + dfz4 * rzs_ref[g, 1:2, :], axis=1, keepdims=True),
             jnp.sum(dfx4 * rxs_ref[g, 2:3, :] + dfy4 * rys_ref[g, 2:3, :]
                     + dfz4 * rzs_ref[g, 2:3, :], axis=1, keepdims=True)],
            axis=1)

    dpts_ref[:, :] = jax.lax.fori_loop(
        0, NG, group, jnp.zeros((T, 3), jnp.float32))


def _pad_rows(a, mult):
    n = a.shape[0]
    pad = (-n) % mult
    if pad:
        a = jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
    return a, n




def _pack_shape(B: int, G: int):
    assert G & (G - 1) == 0 and G <= 128, \
        "packed LBS kernels need a power-of-two grid <= 128"
    ngb = 128 // G
    bp = -(-B // ngb) * ngb
    return ngb, bp


def _seg_vectors(rg, tg, G: int, BP: int):
    """Per-group lane-packed affine coefficient tables [NG, 4, 128]
    (rows 0..2 = grid-affine coefficients, row 3 = translation; lane l
    of group g belongs to bone NGB*g + l//G), one table per grid
    coordinate. Built with static index maps — stays inside jit."""
    NGB = 128 // G
    NG = BP // NGB
    pad = BP - rg.shape[0]
    rgp = jnp.pad(rg, ((0, pad), (0, 0)))
    tgp = jnp.pad(tg, ((0, pad), (0, 0)))
    lane_bone = (np.arange(NG)[:, None] * NGB
                 + (np.arange(128)[None, :] // G))     # [NG, 128] static
    out = []
    for c in range(3):
        out.append(jnp.stack(
            [rgp[lane_bone, 3 * c + 0], rgp[lane_bone, 3 * c + 1],
             rgp[lane_bone, 3 * c + 2], tgp[lane_bone, c]], axis=1))
    return out  # 3 x [NG, 4, 128]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def inverse_core(pts_g, rg, tg, vol_qz, prec="bf16"):
    """Grid-space inverse-LBS accumulation.

    pts_g [N,3] grid coords; rg [B,9] / tg [B,3] grid-space bone affines;
    vol_qz [B, G*G(x,y), G(z)]. Returns acc [N,4] = (sum_b w_b*f_b,
    sum_b w_b) in grid coordinates. Normalization / world conversion
    stay in XLA.
    """
    return _inverse_fwd(pts_g, rg, tg, vol_qz, prec)[0]


def _inverse_fwd(pts_g, rg, tg, vol_qz, prec):
    B, QQ, G = vol_qz.shape
    assert QQ == G * G, "inverse_core needs cubic volumes"
    NGB, BP = _pack_shape(B, G)
    pts_p, n = _pad_rows(pts_g.astype(jnp.float32), TILE_INV)
    dt = jnp.bfloat16 if prec == "bf16" else jnp.float32
    vol = jnp.pad(vol_qz, ((0, BP - B), (0, 0), (0, 0))).astype(dt)
    rxs, rys, rzs = _seg_vectors(rg.astype(jnp.float32),
                                 tg.astype(jnp.float32), G, BP)
    NG = BP // NGB
    grid = (pts_p.shape[0] // TILE_INV,)
    kern = functools.partial(_inverse_fwd_kernel, BP=BP, G=G, prec=prec)
    seg_spec = pl.BlockSpec((NG, 4, 128), lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    acc = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_INV, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            seg_spec, seg_spec, seg_spec,
            pl.BlockSpec((BP, G * G, G), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_INV, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((pts_p.shape[0], 4), jnp.float32),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
    )(pts_p, rxs, rys, rzs, vol)
    return acc[:n], (pts_g, rg, tg, vol_qz)


def _inverse_bwd(prec, res, gacc):
    pts_g, rg, tg, vol_qz = res
    B, QQ, G = vol_qz.shape
    NGB, BP = _pack_shape(B, G)
    NG = BP // NGB
    pts_p, n = _pad_rows(pts_g.astype(jnp.float32), TILE_INV)
    gacc_p, _ = _pad_rows(gacc.astype(jnp.float32), TILE_INV)
    dt = jnp.bfloat16 if prec == "bf16" else jnp.float32
    vol = jnp.pad(vol_qz, ((0, BP - B), (0, 0), (0, 0))).astype(dt)
    lane = np.arange(128)
    kseg = jnp.asarray((lane[:, None] // G) == (lane[None, :] // G),
                       jnp.float32)
    rxs, rys, rzs = _seg_vectors(rg.astype(jnp.float32),
                                 tg.astype(jnp.float32), G, BP)
    grid = (pts_p.shape[0] // TILE_INV,)
    kern = functools.partial(_inverse_bwd_kernel, BP=BP, G=G, prec=prec)
    seg_spec = pl.BlockSpec((NG, 4, 128), lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    dpts, dr, dvol = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_INV, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            seg_spec, seg_spec, seg_spec,
            pl.BlockSpec((BP, G * G, G), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_INV, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_INV, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NG, 3, 4, 128), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BP, G * G, G), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((pts_p.shape[0], 3), jnp.float32),
            jax.ShapeDtypeStruct((NG, 3, 4, 128), jnp.float32),
            jax.ShapeDtypeStruct((BP, QQ, G), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
    )(pts_p, rxs, rys, rzs, vol, kseg, gacc_p)
    # dr[g, c, k, G*j] = sum_t p_k * df_c for bone NGB*g + j
    sub = dr[:, :, :, G * np.arange(NGB)]          # [NG, 3, 4, NGB]
    sub = jnp.transpose(sub, (0, 3, 1, 2)).reshape(BP, 3, 4)
    drg = sub[:B, :, :3].reshape(B, 9)
    dtg = sub[:B, :, 3]
    return (dpts[:n].astype(pts_g.dtype), drg.astype(rg.dtype),
            dtg.astype(tg.dtype), dvol[:B].astype(vol_qz.dtype))


inverse_core.defvjp(lambda p, r, t, v, prec: _inverse_fwd(p, r, t, v, prec),
                    _inverse_bwd)


# ---------------------------------------------------------------------------
# pair-grid inverse kernel: the cond-free fine-grained support skip
# ---------------------------------------------------------------------------
#
# Implements the "identified next step" above. Samples are sorted by the
# Morton cell of their 8-sample group centroid (groups keep the sort at
# N/8 keys and the gathers contiguous); per (tile, bone) a support
# predicate (interval arithmetic on the tile's AABB through the bone's
# grid affine — conservative, so results are EXACTLY the dense kernel's)
# kills out-of-support pairs; surviving bones are compacted per tile into
# lane-quads (128//G bones each, dummy lanes aimed at a zero volume
# channel, which zeroes their weights AND their gradients exactly); the
# Pallas grid runs over the compacted pair list with a DYNAMIC length
# (validated: Mosaic runtime grid loops accept traced bounds) and
# PrefetchScalarGridSpec — every step does IDENTICAL work, so pipelining
# is untouched; consecutive same-tile steps accumulate into the revisited
# output block (quad 0 of every tile is forced alive so every block is
# initialized). The backward kernel takes the same pair list: the
# predicate is tap-support-exact, so skipped pairs have exactly-zero
# gradients. Affine coefficients come from an SMEM scalar table instead
# of per-pair HBM tables (no gather, no extra traffic).

TILE_PG = int(_os.environ.get("HOSNERF_TILE_PG", 128))
                  # samples per pair tile. Production-shaped sweep on v5e
                  # (262k samples, tools/bench_lbs_pg.py): fwd+bwd
                  # 57.4 ms @128 (0.52 pair density) vs 61.3 @256 (0.59)
                  # vs 65.9 @64 (density only 0.47 — Morton locality, not
                  # tile granularity, limits the kill rate, and 64-row
                  # matmuls waste the MXU) vs 82.8 dense. Env override
                  # for sweeps. With gather-unsorts (inv_perm): fwd-only
                  # 20.4 ms (the eval/render path), fwd+bwd unchanged
                  # (the hand-written bwd swaps a scatter for a gather
                  # symmetrically).
SORT_GROUP = 8    # consecutive samples sharing one sort key
SORT_CELLS = int(_os.environ.get("HOSNERF_SORT_CELLS", 16))
                  # spatial cells per axis for the Morton keys (measured
                  # insensitive: 57.25 ms @32 vs 57.38 @16)
PG_SORT = _os.environ.get("HOSNERF_PG_SORT", "sig")
                  # pair-grid sample ordering: 'sig' (round 4 default)
                  # sorts sample groups by their OR'd per-sample
                  # tap-support bone signature — tiles become support-
                  # homogeneous, and the tile-alive predicate is the OR
                  # of EXACT per-sample support tests rather than AABB
                  # interval arithmetic. Measured density on production-
                  # shaped batches (tools/pg_density_study.py): 0.522
                  # (morton+AABB) -> 0.456 (morton+exact) -> 0.395
                  # (sig+exact); true (sample,bone) density 0.237.
                  # 'morton' keeps the round-3 spatial-cell ordering.
PG_EPS = 1e-5     # support-predicate widening: the dense kernel's
                  # floor-based _dhat assigns a +-1 tap derivative at
                  # EXACTLY f == -1 / f == G where the hat value is 0;
                  # widening keeps such boundary pairs alive so skipped
                  # pairs have exactly-zero values AND grads (ADVICE r3).

assert TILE_PG % 8 == 0 and TILE_PG % SORT_GROUP == 0, (
    "HOSNERF_TILE_PG must be a multiple of 8 and of SORT_GROUP "
    f"(got {TILE_PG})")  # _group_sort_perm reshape + Pallas block shapes


def _morton3(q):
    """Interleave the bits of q [n, 3] (each in [0, SORT_CELLS)) into a
    Morton key — better tile locality than row-major cell order."""
    bits = (SORT_CELLS - 1).bit_length()
    out = jnp.zeros(q.shape[0], jnp.int32)
    for i in range(bits):
        out = (out
               | (((q[:, 0] >> i) & 1) << (3 * i + 2))
               | (((q[:, 1] >> i) & 1) << (3 * i + 1))
               | (((q[:, 2] >> i) & 1) << (3 * i)))
    return out


def _group_sort_perm(pts_p):
    """(perm, inv_perm) sorting SORT_GROUP-sample groups by centroid
    Morton cell. pts_p [n_pad, 3] (n_pad multiple of SORT_GROUP).

    The inverse is built at GROUP level (one [n_groups] int32 scatter,
    ~n/8 elements) so the unsorts downstream can be row GATHERS by
    inv_perm instead of XLA scatters over [n, 4] floats — scatters
    don't get the sorted/unique fast path and measured ~2x a gather at
    these shapes."""
    n_pad = pts_p.shape[0]
    g = pts_p.reshape(n_pad // SORT_GROUP, SORT_GROUP, 3)
    ctr = jnp.mean(g, axis=1)
    lo = jnp.min(ctr, axis=0)
    hi = jnp.max(ctr, axis=0)
    qf = (ctr - lo) / jnp.maximum(hi - lo, 1e-9) * SORT_CELLS
    q = jnp.clip(qf.astype(jnp.int32), 0, SORT_CELLS - 1)
    gperm = jnp.argsort(_morton3(q))
    n_groups = gperm.shape[0]
    inv_gperm = jnp.zeros((n_groups,), gperm.dtype).at[gperm].set(
        jnp.arange(n_groups, dtype=gperm.dtype), unique_indices=True)
    lane = jnp.arange(SORT_GROUP)[None, :]
    perm = (gperm[:, None] * SORT_GROUP + lane).reshape(-1)
    inv_perm = (inv_gperm[:, None] * SORT_GROUP + lane).reshape(-1)
    return perm, inv_perm


def _sample_support(pts, rgp, tgp, G: int, return_f: bool = False):
    """[n, BPD] bool: EXACT per-sample tap support. hat taps of bone b at
    sample p are nonzero iff every grid coordinate f = Rg_b p + Tg_b lies
    in (-1, G); widened by PG_EPS for the floor-based boundary derivative
    (see PG_EPS note). return_f additionally returns the [n, BPD, 3]
    grid coordinates (the windowed pair builder needs the x floors)."""
    R = rgp.reshape(-1, 3, 3)
    f = (jnp.einsum("nk,bck->nbc", pts, R, precision=_HIGHEST)
         + tgp[None])                               # [n, BPD, 3]
    sup = jnp.all((f > -1.0 - PG_EPS) & (f < G + PG_EPS), axis=-1)
    return (sup, f) if return_f else sup


def _support_sort_perm(sup):
    """(perm, inv_perm, gsig) sorting SORT_GROUP-sample groups by their
    OR'd support-bit signature — support-homogeneous tiles (the Morton
    sort's spatial locality is only a proxy for this). sup [n_pad, BPD]
    bool with n_pad a SORT_GROUP multiple. Group-level inverse, same
    rationale as `_group_sort_perm`."""
    n_pad, BPD = sup.shape
    assert BPD <= 31, "signature packing needs <= 31 bone channels"
    g = jnp.any(sup.reshape(n_pad // SORT_GROUP, SORT_GROUP, BPD), axis=1)
    sig = jnp.sum(g.astype(jnp.int32)
                  << jnp.arange(BPD, dtype=jnp.int32)[None], axis=1)
    gperm = jnp.argsort(sig)                        # stable: ray order
    n_groups = gperm.shape[0]
    inv_gperm = jnp.zeros((n_groups,), gperm.dtype).at[gperm].set(
        jnp.arange(n_groups, dtype=gperm.dtype), unique_indices=True)
    lane = jnp.arange(SORT_GROUP)[None, :]
    perm = (gperm[:, None] * SORT_GROUP + lane).reshape(-1)
    inv_perm = (inv_gperm[:, None] * SORT_GROUP + lane).reshape(-1)
    return perm, inv_perm


def _build_pairs(pts_s, rgp, tgp, B: int, BPD: int, G: int):
    """Compact alive (tile, bone-quad) pairs from sorted samples with the
    round-3 AABB interval predicate (the 'morton' path; conservative —
    bone b can touch tile t iff its grid-coordinate interval over the
    tile's AABB intersects (-1, G) on every axis).

    pts_s [n_pad, 3] sorted points; rgp/tgp [BPD, 9]/[BPD, 3] grid-affine
    (zero-padded past B). Returns (pair_tile [CAP], pair_bone [CAP, NGB],
    n_pairs traced scalar) with pairs sorted by tile, dummy bones = BPD-1."""
    n_tiles = pts_s.shape[0] // TILE_PG
    p = pts_s.reshape(n_tiles, TILE_PG, 3)
    lo = jnp.min(p, axis=1)                          # [n_tiles, 3]
    hi = jnp.max(p, axis=1)
    R = rgp.reshape(BPD, 3, 3)
    a = lo[:, None, None, :] * R[None]               # [n_tiles, BPD, 3, 3]
    b2 = hi[:, None, None, :] * R[None]
    fmin = jnp.sum(jnp.minimum(a, b2), -1) + tgp[None]
    fmax = jnp.sum(jnp.maximum(a, b2), -1) + tgp[None]
    alive = jnp.all((fmax > -1.0 - PG_EPS) & (fmin < G + PG_EPS), axis=-1)
    return _compact_pairs(alive, B, BPD, G)


def _compact_pairs(alive, B: int, BPD: int, G: int):
    """Compact a [n_tiles, BPD] alive matrix into the static-capacity
    (tile, bone-quad) pair list (pairs sorted by tile, dummy bones =
    BPD-1, quad 0 of every tile forced alive)."""
    NGB = 128 // G
    NQ = BPD // NGB
    n_tiles = alive.shape[0]
    alive = alive & (jnp.arange(BPD) < B)[None, :]   # pad channels dead

    # alive bones first (stable by index), dead slots -> dummy bone
    order = jnp.argsort(jnp.logical_not(alive), axis=1, stable=True)
    acount = jnp.sum(alive, axis=1)                  # [n_tiles]
    slot = jnp.arange(BPD)[None, :]
    bones = jnp.where(slot < acount[:, None], order, BPD - 1)
    bones = bones.reshape(n_tiles, NQ, NGB)

    # quad q alive iff it holds any alive bone; quad 0 forced alive so
    # every tile's output block gets initialized
    qidx = jnp.arange(NQ)[None, :]
    qalive = (qidx * NGB < acount[:, None]) | (qidx == 0)
    flat_alive = qalive.reshape(-1)
    pos = jnp.cumsum(flat_alive) - 1
    n_pairs = pos[-1] + 1
    cap = n_tiles * NQ
    tgt = jnp.where(flat_alive, pos, cap)            # dead -> dropped
    tile_of = jnp.repeat(jnp.arange(n_tiles, dtype=jnp.int32), NQ)
    pair_tile = jnp.zeros((cap,), jnp.int32).at[tgt].set(
        tile_of, mode="drop")
    pair_bone = jnp.full((cap, NGB), BPD - 1, jnp.int32).at[tgt].set(
        bones.reshape(cap, NGB).astype(jnp.int32), mode="drop")
    return pair_tile, pair_bone, n_pairs


def _pack_bones(bones, NGB: int):
    """Byte-pack bone indices 4-per-int32 for the SMEM prefetch: at the
    8-patch batch the unpacked [cap, NGB] s32 table alone is 896 KB
    against the 1 MB SMEM budget (measured compile OOM); packed it is
    224 KB. bones [cap, NGB] with values < 256 -> [cap, ceil(NGB/4)]."""
    # byte packing silently corrupts indices >= 256 (ADVICE r3 #1); every
    # shipped config has BPD <= 28 — guard the invariant, not the config
    assert bones.shape[1] == NGB
    cap = bones.shape[0]
    nw = -(-NGB // 4)
    pad = nw * 4 - NGB
    if pad:
        bones = jnp.concatenate(
            [bones, jnp.zeros((cap, pad), bones.dtype)], axis=1)
    b = bones.reshape(cap, nw, 4).astype(jnp.int32)
    shifts = jnp.asarray([0, 8, 16, 24], jnp.int32)
    return jnp.sum(b << shifts[None, None, :], axis=2).reshape(-1)


def _unpack_bone(pbone_ref, i, j: int, NGB: int):
    """Read bone j of pair i from the packed SMEM table (kernel side)."""
    nw = -(-NGB // 4)
    word = pbone_ref[i * nw + j // 4]
    return (word >> (8 * (j % 4))) & 0xFF


def _pg_coef(rgp, tgp):
    """[BPD, 12] SMEM scalar table: coef[b, 4c+k] = affine coefficient of
    grid coord c wrt p_k (k<3), coef[b, 4c+3] = translation of coord c."""
    return jnp.concatenate(
        [jnp.concatenate([rgp[:, 3 * c:3 * c + 3], tgp[:, c:c + 1]], 1)
         for c in range(3)], axis=1)


def _coef_rows(coef_ref, bs, G: int, base: int):
    """Lane-packed [1, 128] coefficient rows (4 per grid coordinate) from
    the SMEM scalar table — the pair-grid analog of `_seg_vectors`' rows.
    Built once per grid step from 16 scalars; keeps the per-sample chains
    full-[T,128] (the per-bone [T,1] scalar-chain variant measured ~1.5x
    per-iteration overhead — the round-2 lane-packing lesson repeats)."""
    return [jnp.concatenate(
        [jnp.full((1, G), coef_ref[b, base + k], jnp.float32) for b in bs],
        axis=1) for k in range(4)]


def _pg_segs(coef_ref, bs, x, y, z, G: int):
    """Packed [T, 128] grid-coordinate chains for the quad's bones, plus
    the coefficient rows (reused by the backward dpts chain)."""
    rx = _coef_rows(coef_ref, bs, G, 0)
    ry = _coef_rows(coef_ref, bs, G, 4)
    rz = _coef_rows(coef_ref, bs, G, 8)
    fxseg = x * rx[0] + y * rx[1] + z * rx[2] + rx[3]
    fyseg = x * ry[0] + y * ry[1] + z * ry[2] + ry[3]
    fzseg = x * rz[0] + y * rz[1] + z * rz[2] + rz[3]
    return fxseg, fyseg, fzseg, rx, ry, rz


def _pg_fwd_kernel(ptile_ref, pbone_ref, coef_ref, pts_ref, volq_ref,
                   out_ref, *, G: int, prec: str):
    """One (tile, bone-quad) pair: the inverse-LBS contribution of NGB
    bones to one tile's grid-space accumulator. Same math as one `group`
    iteration of `_inverse_fwd_kernel` with the lane-packed affine rows
    built from SMEM scalars (segment-constant anyway)."""
    NGB = 128 // G
    i = pl.program_id(0)
    prev = ptile_ref[jnp.maximum(i - 1, 0)]
    first = jnp.logical_or(i == 0, ptile_ref[i] != prev)

    x = pts_ref[:, 0:1]
    y = pts_ref[:, 1:2]
    z = pts_ref[:, 2:3]
    T = x.shape[0]
    x128 = _lane_iota_f(T, G)
    xq2, yq2 = _xyq_iotas_f(T, G)
    dt = jnp.bfloat16 if prec == "bf16" else jnp.float32

    bs = [_unpack_bone(pbone_ref, i, j, NGB) for j in range(NGB)]
    fxseg, fyseg, fzseg, _, _, _ = _pg_segs(coef_ref, bs, x, y, z, G)
    zcs = []
    for j in range(NGB):
        c = slice(G * j, G * j + 1)
        oh = (_hat(fxseg[:, c], xq2)
              * _hat(fyseg[:, c], yq2)).astype(dt)        # [T, G*G]
        zcs.append(_mm(oh, volq_ref[bs[j]], prec))        # [T, G]
    zcols4 = jnp.concatenate(zcs, axis=1)                 # [T, 128]
    P4 = _hat(fzseg, x128) * zcols4
    contrib = jnp.concatenate(
        [jnp.sum(P4 * fxseg, axis=1, keepdims=True),
         jnp.sum(P4 * fyseg, axis=1, keepdims=True),
         jnp.sum(P4 * fzseg, axis=1, keepdims=True),
         jnp.sum(P4, axis=1, keepdims=True)], axis=1)

    @pl.when(first)
    def _set():
        out_ref[:, :] = contrib

    @pl.when(jnp.logical_not(first))
    def _acc():
        out_ref[:, :] += contrib


def _pg_bwd_kernel(ptile_ref, pbone_ref, coef_ref, pts_ref, volq_ref,
                   kseg_ref, gacc_ref, dpts_ref, dr_ref, dvol_ref,
                   *, G: int, prec: str):
    """Backward of one pair by recomputation (mirrors
    `_inverse_bwd_kernel`'s group body). dpts accumulates into the
    revisited tile block; dvol AND dRg/dTg accumulate per bone via
    dynamic-index += into full-size resident blocks (dr was a per-pair
    [cap, 3, 4, 128] HBM table + XLA segment_sum until round 5 — the
    resident [BPD, 4, 3] form retires ~88 MB of HBM traffic and the
    XLA-side pass; measured TIME-NEUTRAL at the 2-patch batch, 48.8 vs
    49.4 ms fwd+bwd — that traffic fully overlapped with compute — and
    kept for the smaller memory footprint and simpler XLA tail)."""
    NGB = 128 // G
    i = pl.program_id(0)
    prev = ptile_ref[jnp.maximum(i - 1, 0)]
    first = jnp.logical_or(i == 0, ptile_ref[i] != prev)

    @pl.when(i == 0)
    def _init():
        dvol_ref[:, :, :] = jnp.zeros_like(dvol_ref)
        dr_ref[:, :, :] = jnp.zeros_like(dr_ref)

    x = pts_ref[:, 0:1]
    y = pts_ref[:, 1:2]
    z = pts_ref[:, 2:3]
    T = x.shape[0]
    x128 = _lane_iota_f(T, G)
    xq2, yq2 = _xyq_iotas_f(T, G)
    dt = jnp.bfloat16 if prec == "bf16" else jnp.float32

    gx = gacc_ref[:, 0:1]
    gy = gacc_ref[:, 1:2]
    gz = gacc_ref[:, 2:3]
    gw_sum = gacc_ref[:, 3:4]
    dims_t = (((0,), (0,)), ((), ()))
    p4 = jnp.concatenate([x, y, z, jnp.ones_like(x)], axis=1)  # [T, 4]

    bs = [_unpack_bone(pbone_ref, i, j, NGB) for j in range(NGB)]
    fxseg, fyseg, fzseg, rx, ry, rz = _pg_segs(coef_ref, bs, x, y, z, G)
    zcs, dfxrs, dfyrs = [], [], []
    gw4 = gx * fxseg + gy * fyseg + gz * fzseg + gw_sum
    tz4 = _hat(fzseg, x128)
    dhz4 = _dhat(_clipped_floor(fzseg, G), x128)

    for j in range(NGB):
        b = bs[j]
        c = slice(G * j, G * j + 1)
        s = slice(G * j, G * (j + 1))
        hx = _hat(fxseg[:, c], xq2)
        hy = _hat(fyseg[:, c], yq2)
        oh = (hx * hy).astype(dt)                       # [T, G*G]
        zc = _mm(oh, volq_ref[b], prec)                 # [T, G]
        m2 = _mm((_dhat(_clipped_floor(fxseg[:, c], G), xq2)
                  * hy).astype(dt), volq_ref[b], prec)
        m3 = _mm((hx * _dhat(_clipped_floor(fyseg[:, c], G), yq2)
                  ).astype(dt), volq_ref[b], prec)
        tzj = tz4[:, s]
        dvol_ref[b] += _mm(oh, gw4[:, c] * tzj, prec, dims=dims_t)
        zcs.append(zc)
        dfxrs.append(jnp.broadcast_to(
            jnp.sum(m2 * tzj, axis=1, keepdims=True), (T, G)))
        dfyrs.append(jnp.broadcast_to(
            jnp.sum(m3 * tzj, axis=1, keepdims=True), (T, G)))
    zcols4 = jnp.concatenate(zcs, axis=1)
    dfxr4 = jnp.concatenate(dfxrs, axis=1)
    dfyr4 = jnp.concatenate(dfyrs, axis=1)

    def segsum(q):
        return _mm(q, kseg_ref[:, :], "highest")

    wB4 = segsum(tz4 * zcols4)
    dfx4 = gx * wB4 + gw4 * dfxr4
    dfy4 = gy * wB4 + gw4 * dfyr4
    dfz4 = gz * wB4 + gw4 * segsum(dhz4 * zcols4)

    # dRg/dTg: per bone, p4^T @ (dfx | dfy | dfz at the segment's first
    # lane — all three are segment-constant) -> [4, 3], accumulated
    for j in range(NGB):
        c = slice(G * j, G * j + 1)
        d3 = jnp.concatenate([dfx4[:, c], dfy4[:, c], dfz4[:, c]],
                             axis=1)                      # [T, 3]
        dr_ref[bs[j]] += _mm(p4, d3, "highest", dims=dims_t)

    # chain through the bone affines (coefficient rows reused from
    # `_pg_segs`); df<c>4 lanes overcount by G -> 1/G
    inv_g = jnp.float32(1.0 / G)
    contrib = inv_g * jnp.concatenate(
        [jnp.sum(dfx4 * rx[k] + dfy4 * ry[k] + dfz4 * rz[k],
                 axis=1, keepdims=True) for k in range(3)], axis=1)

    @pl.when(first)
    def _set():
        dpts_ref[:, :] = contrib

    @pl.when(jnp.logical_not(first))
    def _acc():
        dpts_ref[:, :] += contrib


def _pg_pad_shapes(B: int, G: int):
    """(NGB, BPD): bones padded so BPD is a quad multiple AND has at
    least one dummy (zero-volume) channel for dead lanes."""
    NGB, BP = _pack_shape(B, G)
    BPD = BP if BP > B else BP + NGB
    assert BPD <= 256, (
        f"pair-grid byte-packs bone indices (< 256); got BPD={BPD}")
    return NGB, BPD


def inverse_core_pg(pts_g, rg, tg, vol_qz, prec="bf16"):
    """Pair-grid inverse-LBS accumulation — same contract and (up to f32
    summation order) same values as `inverse_core`, at ~the in-support
    pair density of the work. Autodiff flows through the sort gather +
    the sorted-core custom VJP."""
    B, QQ, G = vol_qz.shape
    if PG_SORT == "sig":
        dom = bp_prepare(pts_g, rg, tg, G, B, kind="quad")
        pts_s = dom.sort_rows(pts_g.astype(jnp.float32))
        acc_s = inverse_core_pg_s(pts_s, rg, tg, vol_qz, *dom.tables,
                                  prec)
        return dom.unsort(acc_s)
    return _pg_legacy(pts_g, rg, tg, vol_qz, prec)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _pg_legacy(pts_g, rg, tg, vol_qz, prec="bf16"):
    """Round-3 'morton' ordering path (AABB pair build inside the VJP)."""
    return _pg_fwd(pts_g, rg, tg, vol_qz, prec)[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def inverse_core_pg_s(pts_s, rg, tg, vol_qz, pair_tile, pair_bone,
                      n_pairs, prec="bf16"):
    """Sorted-domain quad pair-grid core: pts_s [n_pad, 3] liveness-
    sorted (bp_prepare kind='quad'); tables are the compacted quad pair
    lists. Returns acc_s [n_pad, 4] in the SORTED domain (dead rows
    exact zeros — quad 0 of every tile is forced alive)."""
    return _pg_s_fwd(pts_s, rg, tg, vol_qz, pair_tile, pair_bone,
                     n_pairs, prec)[0]


def _pg_s_fwd(pts_s, rg, tg, vol_qz, pair_tile, pair_bone, n_pairs,
              prec):
    B, QQ, G = vol_qz.shape
    assert QQ == G * G, "inverse_core_pg needs cubic volumes"
    NGB, BPD = _pg_pad_shapes(B, G)
    rgp = jnp.pad(rg.astype(jnp.float32), ((0, BPD - B), (0, 0)))
    tgp = jnp.pad(tg.astype(jnp.float32), ((0, BPD - B), (0, 0)))
    coef = _pg_coef(rgp, tgp)
    dt = jnp.bfloat16 if prec == "bf16" else jnp.float32
    vol = _pg_vol(vol_qz, BPD, dt)

    kern = functools.partial(_pg_fwd_kernel, G=G, prec=prec)
    acc_s = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_pairs,),
            in_specs=[
                pl.BlockSpec((TILE_PG, 3), lambda i, pt, pb, cf: (pt[i], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BPD, G * G, G), lambda i, pt, pb, cf:
                             (0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE_PG, 4), lambda i, pt, pb, cf:
                                   (pt[i], 0), memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((pts_s.shape[0], 4), jnp.float32),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
    )(pair_tile, _pack_bones(pair_bone, NGB), coef, pts_s, vol)
    return acc_s, (pts_s, rg, tg, vol_qz, pair_tile, pair_bone, n_pairs)


def _pg_s_bwd(prec, res, gacc_s):
    pts_s, rg, tg, vol_qz, pair_tile, pair_bone, n_pairs = res
    dpts_s, drg, dtg, dvol = _pg_bwd_kernel_run(
        prec, pts_s, rg, tg, vol_qz, pair_tile, pair_bone, n_pairs,
        gacc_s.astype(jnp.float32))
    dtables = tuple(np.zeros(np.shape(t), jax.dtypes.float0)
                    for t in (pair_tile, pair_bone, n_pairs))
    return (dpts_s, drg, dtg, dvol) + dtables


inverse_core_pg_s.defvjp(
    lambda p, r, t, v, pt, pb, ns, prec: _pg_s_fwd(
        p, r, t, v, pt, pb, ns, prec),
    _pg_s_bwd)


def _pg_vol(vol_qz, BPD, dt):
    B = vol_qz.shape[0]
    return jnp.pad(vol_qz, ((0, BPD - B), (0, 0), (0, 0))).astype(dt)


def _pg_fwd(pts_g, rg, tg, vol_qz, prec):
    """Legacy 'morton'-ordered pair-grid forward (AABB pair build).
    The production 'sig' ordering routes through bp_prepare +
    inverse_core_pg_s instead (see inverse_core_pg) — the signature
    sort/alive logic lives ONLY there."""
    B, QQ, G = vol_qz.shape
    assert QQ == G * G, "inverse_core_pg needs cubic volumes"
    NGB, BPD = _pg_pad_shapes(B, G)
    pts_p, n = _pad_rows(pts_g.astype(jnp.float32), TILE_PG)
    rgp = jnp.pad(rg.astype(jnp.float32), ((0, BPD - B), (0, 0)))
    tgp = jnp.pad(tg.astype(jnp.float32), ((0, BPD - B), (0, 0)))
    perm, inv_perm = _group_sort_perm(pts_p)
    pts_s = pts_p[perm]
    pair_tile, pair_bone, n_pairs = _build_pairs(
        pts_s, rgp, tgp, B, BPD, G)
    coef = _pg_coef(rgp, tgp)
    dt = jnp.bfloat16 if prec == "bf16" else jnp.float32
    vol = _pg_vol(vol_qz, BPD, dt)
    n_tiles = pts_s.shape[0] // TILE_PG

    kern = functools.partial(_pg_fwd_kernel, G=G, prec=prec)
    acc_s = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_pairs,),
            in_specs=[
                pl.BlockSpec((TILE_PG, 3), lambda i, pt, pb, cf: (pt[i], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BPD, G * G, G), lambda i, pt, pb, cf:
                             (0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE_PG, 4), lambda i, pt, pb, cf:
                                   (pt[i], 0), memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((pts_s.shape[0], 4), jnp.float32),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
    )(pair_tile, _pack_bones(pair_bone, NGB), coef, pts_s, vol)
    acc = acc_s[inv_perm][:n]
    return acc, (pts_s, rg, tg, vol_qz, pair_tile, pair_bone, n_pairs,
                 perm, inv_perm, n)


def _pg_bwd(prec, res, gacc):
    (pts_s, rg, tg, vol_qz, pair_tile, pair_bone, n_pairs, perm,
     inv_perm, n) = res
    n_pad = pts_s.shape[0]
    gacc_p = jnp.zeros((n_pad, 4), jnp.float32).at[:n].set(
        gacc.astype(jnp.float32))[perm]
    dpts_s, drg, dtg, dvol = _pg_bwd_kernel_run(
        prec, pts_s, rg, tg, vol_qz, pair_tile, pair_bone, n_pairs,
        gacc_p)
    return dpts_s[inv_perm][:n], drg, dtg, dvol


def _pg_bwd_kernel_run(prec, pts_s, rg, tg, vol_qz, pair_tile,
                       pair_bone, n_pairs, gacc_p):
    """Quad pair-grid backward in the SORTED domain (shared by the
    legacy unsorted VJP and `inverse_core_pg_s`)."""
    B, QQ, G = vol_qz.shape
    NGB, BPD = _pg_pad_shapes(B, G)
    n_pad = pts_s.shape[0]
    rgp = jnp.pad(rg.astype(jnp.float32), ((0, BPD - B), (0, 0)))
    tgp = jnp.pad(tg.astype(jnp.float32), ((0, BPD - B), (0, 0)))
    coef = _pg_coef(rgp, tgp)
    dt = jnp.bfloat16 if prec == "bf16" else jnp.float32
    vol = _pg_vol(vol_qz, BPD, dt)
    lane = np.arange(128)
    kseg = jnp.asarray((lane[:, None] // G) == (lane[None, :] // G),
                       jnp.float32)

    kern = functools.partial(_pg_bwd_kernel, G=G, prec=prec)
    dpts_s, dr_pairs, dvol = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_pairs,),
            in_specs=[
                pl.BlockSpec((TILE_PG, 3), lambda i, pt, pb, cf: (pt[i], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BPD, G * G, G), lambda i, pt, pb, cf:
                             (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 128), lambda i, pt, pb, cf: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_PG, 4), lambda i, pt, pb, cf: (pt[i], 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((TILE_PG, 3), lambda i, pt, pb, cf: (pt[i], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BPD, 4, 3), lambda i, pt, pb, cf:
                             (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BPD, G * G, G), lambda i, pt, pb, cf:
                             (0, 0, 0), memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 3), jnp.float32),
            jax.ShapeDtypeStruct((BPD, 4, 3), jnp.float32),
            jax.ShapeDtypeStruct((BPD, QQ, G), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
    )(pair_tile, _pack_bones(pair_bone, NGB), coef, pts_s, vol, kseg,
      gacc_p)

    per_bone = dr_pairs[:B]                          # [B, 4(p4), 3(c)]
    drg = jnp.transpose(per_bone[:, :3, :], (0, 2, 1)).reshape(B, 9)
    dtg = per_bone[:, 3, :]
    return (dpts_s.astype(jnp.float32), drg.astype(rg.dtype),
            dtg.astype(tg.dtype), dvol[:B].astype(vol_qz.dtype))


_pg_legacy.defvjp(
    lambda p, r, t, v, prec: _pg_fwd(p, r, t, v, prec), _pg_bwd)


# ---------------------------------------------------------------------------
# windowed pair-grid inverse kernel (round 4)
# ---------------------------------------------------------------------------
#
# The pair-grid kernel's dominant cost is NOT MXU flops but the [T, G*G]
# one-hot operand traffic: per (pair, bone) it builds and streams a
# [128, 1024] tap plane (bf16 256 KB fwd; 3 planes in bwd). Most pairs
# don't need the full x extent: under the (signature, Morton) lexsort,
# 72% of alive (tile, bone) pairs have their supported x-floors within a
# 16-cell range (tools/pg_window_study.py). This kernel processes
# (tile, bone, x-window) pairs over W = G/2 x-cells: the tap plane is
# [T, W*G] (half), and the volume RHS is a dynamic row-slice
# volq[b, xs*G : (xs+W)*G, :]. EXACTNESS BY ADDITIVITY: every kernel
# quantity (acc, wsum, dvol, the dfx/dfy/dfz cores, dr, dpts) is LINEAR
# in the tap-plane columns, so windows with DISJOINT column ranges sum
# to exactly the dense pair's result — a narrow pair emits ONE sliding
# window [xs, xs+W) covering all its supported floors (taps reach
# xs+W-1+1 = xs+W? no: floor <= xs+W-2 => taps <= xs+W-1 — inside), a
# wide pair emits the TWO aligned halves [0, W) + [W, 2W) which cover
# the whole grid. No masks, no fallback kernel, no conds.
#
# Capacity: windows <= 2 per alive (tile, bone), quads of NGB windows,
# compacted to a static cap of PGW_CAP_QUADS per tile (env override).
# Overflow cannot be handled exactly at a fixed cap, so it POISONS the
# output with NaN (the training loop's NaN trap fires) instead of being
# silently dropped; at the default cap of 8 quads/tile (32 windows) the
# production batches sit at ~3.
#
# MEASURED RESULT (v5e, 262k production-shaped samples, fwd+bwd incl.
# sort and pair build): quad pair-grid 48.9 ms -> windowed 51.7 @TILE 128
# / 49.7 @256 / 49.9 @512 — a ~5% REGRESSION. The windows do cut the
# tap-plane bytes ~36%, but the kernel family's runtime is NOT bound by
# tap-plane traffic: the per-step [T, 128] segment chains, z-taps,
# accumulator tails and matmul issue do not shrink with the window, and
# the 1.285x longer grid eats the savings. Kept OFF the default path
# (HOSNERF_PG_IMPL=win to enable), tested for exactness
# (tests/test_pallas_lbs.py::test_windowed_*) as the measured answer to
# VERDICT r3 #4's finer-granularity hypothesis: at this point density
# 0.395 with support-exact predicates, pair-LIST granularity is no
# longer the lever — per-step fixed work is.

PGW_CAP_QUADS = int(_os.environ.get("HOSNERF_PGW_CAP", 8))


def _win_w(G: int) -> int:
    return G // 2


def _sig_morton_perm(pts_p, sup):
    """Group sort by (support signature, Morton cell) — signature-major
    keeps tiles support-homogeneous (pair density), Morton-minor keeps
    them spatially tight (window width)."""
    n_pad, BPD = sup.shape
    assert BPD <= 31, "signature packing needs <= 31 bone channels"
    g = pts_p.reshape(n_pad // SORT_GROUP, SORT_GROUP, 3)
    ctr = jnp.mean(g, axis=1)
    lo = jnp.min(ctr, axis=0)
    hi = jnp.max(ctr, axis=0)
    qf = (ctr - lo) / jnp.maximum(hi - lo, 1e-9) * SORT_CELLS
    q = jnp.clip(qf.astype(jnp.int32), 0, SORT_CELLS - 1)
    morton = _morton3(q)
    gs = jnp.any(sup.reshape(-1, SORT_GROUP, BPD), axis=1)
    sig = jnp.sum(gs.astype(jnp.int32)
                  << jnp.arange(BPD, dtype=jnp.int32)[None], axis=1)
    gperm = jnp.lexsort((morton, sig))
    n_groups = gperm.shape[0]
    inv_gperm = jnp.zeros((n_groups,), gperm.dtype).at[gperm].set(
        jnp.arange(n_groups, dtype=gperm.dtype), unique_indices=True)
    lane = jnp.arange(SORT_GROUP)[None, :]
    perm = (gperm[:, None] * SORT_GROUP + lane).reshape(-1)
    inv_perm = (inv_gperm[:, None] * SORT_GROUP + lane).reshape(-1)
    return perm, inv_perm


def _build_window_pairs(sup_s, x0_s, B: int, BPD: int, G: int):
    """Compact (tile, bone, x-window) pairs from SORTED support + floors.

    sup_s [n_pad, BPD] bool; x0_s [n_pad, BPD] int32 floor(fx). Returns
    (pair_tile [cap], wwin [cap * NGB//2] packed window words, pair_bone
    [cap, NGB], n_pairs, n_total) — pairs tile-major, NGB windows per
    grid step, dummy windows aim at the zero volume channel (zero values
    AND grads). Window word = bone | xs << 8, two 16-bit fields/int32."""
    NGB = 128 // G
    W = _win_w(G)
    T = TILE_PG
    n_tiles = sup_s.shape[0] // T
    sup_t = sup_s.reshape(n_tiles, T, BPD)
    x0_t = x0_s.reshape(n_tiles, T, BPD)
    big = jnp.int32(10 ** 6)
    xmin = jnp.min(jnp.where(sup_t, x0_t, big), axis=1)      # [nt, BPD]
    xmax = jnp.max(jnp.where(sup_t, x0_t, -big), axis=1)
    alive = jnp.any(sup_t, axis=1) & (jnp.arange(BPD) < B)[None]
    fits = (xmax - xmin) <= (W - 2)
    xs1 = jnp.clip(xmin, 0, G - W)
    # two window slots per bone: fit -> (xs1, dead); wide -> (0, W)
    slot_xs = jnp.stack([jnp.where(fits, xs1, 0),
                         jnp.full_like(xs1, W)], axis=-1)    # [nt, BPD, 2]
    valid = jnp.stack([alive, alive & jnp.logical_not(fits)], axis=-1)
    bones = jnp.broadcast_to(jnp.arange(BPD, dtype=jnp.int32)[None, :,
                                                              None],
                             valid.shape)
    word = bones | (slot_xs.astype(jnp.int32) << 8)
    v2 = valid.reshape(n_tiles, 2 * BPD)
    w2 = word.reshape(n_tiles, 2 * BPD)
    order = jnp.argsort(jnp.logical_not(v2), axis=1, stable=True)
    w2 = jnp.take_along_axis(w2, order, axis=1)
    cnt = jnp.sum(v2, axis=1)                                # [nt]
    dummy = jnp.int32(BPD - 1)                               # xs = 0
    slot = jnp.arange(2 * BPD)[None, :]
    w2 = jnp.where(slot < cnt[:, None], w2, dummy)
    QCAP = -(-2 * BPD // NGB)
    pad = QCAP * NGB - 2 * BPD
    if pad:
        w2 = jnp.concatenate(
            [w2, jnp.full((n_tiles, pad), dummy, jnp.int32)], axis=1)
    wq = w2.reshape(n_tiles, QCAP, NGB)
    qidx = jnp.arange(QCAP)[None, :]
    nq = -(-cnt // NGB)
    qalive = (qidx < nq[:, None]) | (qidx == 0)   # quad 0 forced: init
    flat_alive = qalive.reshape(-1)
    pos = jnp.cumsum(flat_alive) - 1
    n_total = pos[-1] + 1
    cap = -(-n_tiles * PGW_CAP_QUADS // 8) * 8  # (8,128) table blocks
    tgt = jnp.where(flat_alive, pos, cap)
    tile_of = jnp.repeat(jnp.arange(n_tiles, dtype=jnp.int32), QCAP)
    pair_tile = jnp.zeros((cap,), jnp.int32).at[tgt].set(
        tile_of, mode="drop")
    words = wq.reshape(n_tiles * QCAP, NGB)
    packed = words[:, 0::2] | (words[:, 1::2] << 16)  # [ntQ, NGB//2]
    wwin = jnp.full((cap, NGB // 2), dummy | (dummy << 16),
                    jnp.int32).at[tgt].set(packed, mode="drop").reshape(-1)
    pair_bone = jnp.full((cap, NGB), BPD - 1, jnp.int32).at[tgt].set(
        words & 0xFF, mode="drop")
    return pair_tile, wwin, pair_bone, jnp.minimum(n_total, cap), n_total


def _unpack_windows(wwin_ref, i, NGB: int):
    """Kernel-side: (bones, xs) scalars of pair i's NGB windows from the
    flattened SMEM window-word table (scalar loads; a VMEM-block variant
    measured ~15% slower per step — vector->scalar extracts)."""
    nw = NGB // 2
    bs, xss = [], []
    for j in range(NGB):
        w = wwin_ref[i * nw + j // 2] >> (16 * (j % 2))
        bs.append(w & 0xFF)
        xss.append((w >> 8) & 0xFF)
    return bs, xss


def _xyq_iotas_win(T: int, G: int, W: int):
    """[T, W*G] x/y coordinate grids for the windowed q = x*G + y layout
    (x relative to the window start)."""
    iq = jax.lax.broadcasted_iota(jnp.int32, (T, W * G), 1)
    sh = G.bit_length() - 1
    return ((iq >> sh).astype(jnp.float32),
            (iq & (G - 1)).astype(jnp.float32))


def _pgw_fwd_kernel(ptile_ref, wwin_ref, coef_ref, pts_ref, volq_ref,
                    out_ref, *, G: int, prec: str):
    """One (tile, window-quad) pair: NGB windowed bone contributions to
    one tile's grid-space accumulator. Identical math to
    `_pg_fwd_kernel` with the tap plane restricted to the window's
    W = G/2 x-cells (exact by column additivity — see section note)."""
    NGB = 128 // G
    W = _win_w(G)
    i = pl.program_id(0)
    prev = ptile_ref[jnp.maximum(i - 1, 0)]
    first = jnp.logical_or(i == 0, ptile_ref[i] != prev)

    x = pts_ref[:, 0:1]
    y = pts_ref[:, 1:2]
    z = pts_ref[:, 2:3]
    T = x.shape[0]
    x128 = _lane_iota_f(T, G)
    xqw, yqw = _xyq_iotas_win(T, G, W)
    dt = jnp.bfloat16 if prec == "bf16" else jnp.float32

    bs, xss = _unpack_windows(wwin_ref, i, NGB)
    fxseg, fyseg, fzseg, _, _, _ = _pg_segs(coef_ref, bs, x, y, z, G)
    zcs = []
    for j in range(NGB):
        c = slice(G * j, G * j + 1)
        xs_f = xss[j].astype(jnp.float32)
        oh = (_hat(fxseg[:, c] - xs_f, xqw)
              * _hat(fyseg[:, c], yqw)).astype(dt)       # [T, W*G]
        zcs.append(_mm(oh, volq_ref[bs[j], pl.ds(xss[j] * G, W * G), :],
                       prec))                            # [T, G]
    zcols4 = jnp.concatenate(zcs, axis=1)                # [T, 128]
    P4 = _hat(fzseg, x128) * zcols4
    contrib = jnp.concatenate(
        [jnp.sum(P4 * fxseg, axis=1, keepdims=True),
         jnp.sum(P4 * fyseg, axis=1, keepdims=True),
         jnp.sum(P4 * fzseg, axis=1, keepdims=True),
         jnp.sum(P4, axis=1, keepdims=True)], axis=1)

    @pl.when(first)
    def _set():
        out_ref[:, :] = contrib

    @pl.when(jnp.logical_not(first))
    def _acc():
        out_ref[:, :] += contrib


def _pgw_bwd_kernel(ptile_ref, wwin_ref, coef_ref, pts_ref, volq_ref,
                    kseg_ref, gacc_ref, dpts_ref, dr_ref, dvol_ref,
                    *, G: int, prec: str):
    """Backward of one window-quad by recomputation (mirrors
    `_pg_bwd_kernel` with windowed tap planes; every accumulated
    quantity is linear in the plane columns, so per-window contributions
    sum to the dense pair's gradients exactly)."""
    NGB = 128 // G
    W = _win_w(G)
    i = pl.program_id(0)
    prev = ptile_ref[jnp.maximum(i - 1, 0)]
    first = jnp.logical_or(i == 0, ptile_ref[i] != prev)

    @pl.when(i == 0)
    def _init():
        dvol_ref[:, :, :] = jnp.zeros_like(dvol_ref)

    x = pts_ref[:, 0:1]
    y = pts_ref[:, 1:2]
    z = pts_ref[:, 2:3]
    T = x.shape[0]
    x128 = _lane_iota_f(T, G)
    xqw, yqw = _xyq_iotas_win(T, G, W)
    dt = jnp.bfloat16 if prec == "bf16" else jnp.float32

    gx = gacc_ref[:, 0:1]
    gy = gacc_ref[:, 1:2]
    gz = gacc_ref[:, 2:3]
    gw_sum = gacc_ref[:, 3:4]
    dims_t = (((0,), (0,)), ((), ()))
    p4 = jnp.concatenate([x, y, z, jnp.ones_like(x)], axis=1)

    bs, xss = _unpack_windows(wwin_ref, i, NGB)
    fxseg, fyseg, fzseg, rx, ry, rz = _pg_segs(coef_ref, bs, x, y, z, G)
    gw4 = gx * fxseg + gy * fyseg + gz * fzseg + gw_sum
    tz4 = _hat(fzseg, x128)
    dhz4 = _dhat(_clipped_floor(fzseg, G), x128)

    zcs, dfxrs, dfyrs = [], [], []
    for j in range(NGB):
        b = bs[j]
        c = slice(G * j, G * j + 1)
        s = slice(G * j, G * (j + 1))
        xs_f = xss[j].astype(jnp.float32)
        fxw = fxseg[:, c] - xs_f
        hx = _hat(fxw, xqw)
        hy = _hat(fyseg[:, c], yqw)
        oh = (hx * hy).astype(dt)                        # [T, W*G]
        rows = pl.ds(xss[j] * G, W * G)
        zc = _mm(oh, volq_ref[b, rows, :], prec)         # [T, G]
        m2 = _mm((_dhat(_clipped_floor(fxw, G), xqw) * hy).astype(dt),
                 volq_ref[b, rows, :], prec)
        m3 = _mm((hx * _dhat(_clipped_floor(fyseg[:, c], G), yqw)
                  ).astype(dt), volq_ref[b, rows, :], prec)
        tzj = tz4[:, s]
        dvol_ref[b, rows, :] += _mm(oh, gw4[:, c] * tzj, prec,
                                    dims=dims_t)
        zcs.append(zc)
        dfxrs.append(jnp.broadcast_to(
            jnp.sum(m2 * tzj, axis=1, keepdims=True), (T, G)))
        dfyrs.append(jnp.broadcast_to(
            jnp.sum(m3 * tzj, axis=1, keepdims=True), (T, G)))
    zcols4 = jnp.concatenate(zcs, axis=1)
    dfxr4 = jnp.concatenate(dfxrs, axis=1)
    dfyr4 = jnp.concatenate(dfyrs, axis=1)

    def segsum(q):
        return _mm(q, kseg_ref[:, :], "highest")

    wB4 = segsum(tz4 * zcols4)
    dfx4 = gx * wB4 + gw4 * dfxr4
    dfy4 = gy * wB4 + gw4 * dfyr4
    dfz4 = gz * wB4 + gw4 * segsum(dhz4 * zcols4)

    dr_ref[0, 0] = _mm(p4, dfx4, "highest", dims=dims_t)
    dr_ref[0, 1] = _mm(p4, dfy4, "highest", dims=dims_t)
    dr_ref[0, 2] = _mm(p4, dfz4, "highest", dims=dims_t)

    inv_g = jnp.float32(1.0 / G)
    contrib = inv_g * jnp.concatenate(
        [jnp.sum(dfx4 * rx[k] + dfy4 * ry[k] + dfz4 * rz[k],
                 axis=1, keepdims=True) for k in range(3)], axis=1)

    @pl.when(first)
    def _set():
        dpts_ref[:, :] = contrib

    @pl.when(jnp.logical_not(first))
    def _acc():
        dpts_ref[:, :] += contrib


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def inverse_core_pgw(pts_g, rg, tg, vol_qz, prec="bf16"):
    """Windowed pair-grid inverse-LBS accumulation — same contract and
    (up to f32 summation order) same values as `inverse_core`."""
    return _pgw_fwd(pts_g, rg, tg, vol_qz, prec)[0]


def _pgw_fwd(pts_g, rg, tg, vol_qz, prec):
    B, QQ, G = vol_qz.shape
    assert QQ == G * G, "inverse_core_pgw needs cubic volumes"
    NGB, BPD = _pg_pad_shapes(B, G)
    assert NGB % 2 == 0, "window packing needs an even NGB (G <= 64)"
    pts_p, n = _pad_rows(pts_g.astype(jnp.float32), TILE_PG)
    rgp = jnp.pad(rg.astype(jnp.float32), ((0, BPD - B), (0, 0)))
    tgp = jnp.pad(tg.astype(jnp.float32), ((0, BPD - B), (0, 0)))
    sup, f = _sample_support(pts_p, rgp, tgp, G, return_f=True)
    sup = sup & (jnp.arange(BPD) < B)[None, :]
    sup = sup & (jnp.arange(pts_p.shape[0]) < n)[:, None]
    perm, inv_perm = _sig_morton_perm(pts_p, sup)
    pts_s = pts_p[perm]
    x0 = jnp.clip(jnp.floor(f[..., 0]), -1, G).astype(jnp.int32)
    pair_tile, wwin, pair_bone, n_pairs, n_total = _build_window_pairs(
        sup[perm], x0[perm], B, BPD, G)
    coef = _pg_coef(rgp, tgp)
    dt = jnp.bfloat16 if prec == "bf16" else jnp.float32
    vol = _pg_vol(vol_qz, BPD, dt)
    cap = pair_tile.shape[0]

    kern = functools.partial(_pgw_fwd_kernel, G=G, prec=prec)
    acc_s = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_pairs,),
            in_specs=[
                pl.BlockSpec((TILE_PG, 3),
                             lambda i, pt, ww, cf: (pt[i], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BPD, G * G, G), lambda i, pt, ww, cf:
                             (0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE_PG, 4), lambda i, pt, ww, cf:
                                   (pt[i], 0), memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((pts_s.shape[0], 4), jnp.float32),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
    )(pair_tile, wwin, coef, pts_s, vol)
    acc = acc_s[inv_perm][:n]
    # capacity overflow poisons rather than silently dropping pairs
    acc = acc + jnp.where(n_total > cap, jnp.float32(jnp.nan), 0.0)
    return acc, (pts_s, rg, tg, vol_qz, pair_tile, wwin, pair_bone,
                 n_pairs, perm, inv_perm, n)


def _pgw_bwd(prec, res, gacc):
    (pts_s, rg, tg, vol_qz, pair_tile, wwin, pair_bone, n_pairs, perm,
     inv_perm, n) = res
    B, QQ, G = vol_qz.shape
    NGB, BPD = _pg_pad_shapes(B, G)
    n_pad = pts_s.shape[0]
    cap = pair_tile.shape[0]
    gacc_p = jnp.zeros((n_pad, 4), jnp.float32).at[:n].set(
        gacc.astype(jnp.float32))[perm]
    rgp = jnp.pad(rg.astype(jnp.float32), ((0, BPD - B), (0, 0)))
    tgp = jnp.pad(tg.astype(jnp.float32), ((0, BPD - B), (0, 0)))
    coef = _pg_coef(rgp, tgp)
    dt = jnp.bfloat16 if prec == "bf16" else jnp.float32
    vol = _pg_vol(vol_qz, BPD, dt)
    lane = np.arange(128)
    kseg = jnp.asarray((lane[:, None] // G) == (lane[None, :] // G),
                       jnp.float32)

    kern = functools.partial(_pgw_bwd_kernel, G=G, prec=prec)
    dpts_s, dr_pairs, dvol = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_pairs,),
            in_specs=[
                pl.BlockSpec((TILE_PG, 3),
                             lambda i, pt, ww, cf: (pt[i], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BPD, G * G, G), lambda i, pt, ww, cf:
                             (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 128), lambda i, pt, ww, cf: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_PG, 4),
                             lambda i, pt, ww, cf: (pt[i], 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((TILE_PG, 3),
                             lambda i, pt, ww, cf: (pt[i], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, 4, 128), lambda i, pt, ww, cf:
                             (i, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BPD, G * G, G), lambda i, pt, ww, cf:
                             (0, 0, 0), memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 3), jnp.float32),
            jax.ShapeDtypeStruct((cap, 3, 4, 128), jnp.float32),
            jax.ShapeDtypeStruct((BPD, QQ, G), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
    )(pair_tile, wwin, coef, pts_s, vol, kseg, gacc_p)

    dpts = dpts_s[inv_perm][:n]
    valid = (jnp.arange(cap) < n_pairs)[:, None, None, None]
    drm = jnp.where(valid, dr_pairs, 0.0)
    sub = drm[:, :, :, G * np.arange(NGB)]           # [cap, 3, 4, NGB]
    sub = jnp.transpose(sub, (0, 3, 1, 2)).reshape(cap * NGB, 12)
    per_bone = jax.ops.segment_sum(
        sub, pair_bone.reshape(-1), num_segments=BPD)
    per_bone = per_bone.reshape(BPD, 3, 4)
    drg = per_bone[:B, :, :3].reshape(B, 9)
    dtg = per_bone[:B, :, 3]
    return (dpts.astype(jnp.float32), drg.astype(rg.dtype),
            dtg.astype(tg.dtype), dvol[:B].astype(vol_qz.dtype))


inverse_core_pgw.defvjp(
    lambda p, r, t, v, prec: _pgw_fwd(p, r, t, v, prec), _pgw_bwd)


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
# shared-tap + blend kernel: forward LBS fully fused
# ---------------------------------------------------------------------------
#
# The training-path forward skinning (cycle + prev-frame flow branches)
# composes bone_weights (shared_core) with apply_forward_lbs_multi (two
# XLA einsums). As separate ops the [N, B] weight matrix round-trips HBM
# padded 26 -> 128 lanes (4.9x blowup; ~134 MB per touch at 262k samples)
# and is touched by forward, both einsums, and their transposes. This
# kernel blends INSIDE the tile: w stays in VMEM, HBM traffic is pts in /
# [N, 3K+1] out. The K transform sets enter as one [B, 12K] coefficient
# table rmat with column (k, c, j) = 12k + 4c + j holding the world-output
# affine of grid-space inputs (R'_kb = R_kb/s, T'_kb = T_kb - R_kb o/s,
# folded by the XLA wrapper, which autodiffs the fold), j = 3 -> the
# translation. Measured (v5e, 262k samples, K=2, fwd+bwd): composed
# pallas-weights + XLA blend 23.4 ms -> fused 21.7 ms. The residual is
# the shared-tap sampling itself (17.7 ms alone): the [T, G^2] @
# [G^2, B*G] tap matmul evaluates every (bone, z) column — ~850k MACs
# per sample against 208 true taps — and runs at ~60% MFU, so the
# kernel family's floor is FLOP-bound redundancy, not the blend.


def _blend_cols(A, P, K: int):
    """acc[t, 3k+c] = sum_j P[t, j] * A[t, 12k+4c+j] — the per-sample
    affine application, done as 1-lane column ops (3K*4 multiply-adds on
    [T, 1]; negligible next to the tap matmul)."""
    cols = []
    for k in range(K):
        for c in range(3):
            base = 12 * k + 4 * c
            cols.append(P[:, 0:1] * A[:, base:base + 1]
                        + P[:, 1:2] * A[:, base + 1:base + 2]
                        + P[:, 2:3] * A[:, base + 2:base + 3]
                        + A[:, base + 3:base + 4])
    return jnp.concatenate(cols, axis=1)                 # [T, 3K]


def _shared_blend_fwd_kernel(pts_ref, vol_ref, sum_ref, rmat_ref, out_ref,
                             *, B: int, G: int, K: int, prec: str):
    """out[t] = (acc_0 [3], ..., acc_{K-1} [3], wsum [1]) where
    acc_k = sum_b w_b * (R'_kb p_g + T'_kb), w from the shared-tap
    sampling of `_shared_fwd_kernel`."""
    fx = pts_ref[:, 0:1]
    fy = pts_ref[:, 1:2]
    fz = pts_ref[:, 2:3]
    T = fx.shape[0]
    xq, yq = _xy_iotas_f(T, G)
    ic = jax.lax.broadcasted_iota(jnp.int32, (T, B * G), 1)
    zc = ((ic & (G - 1)) if G & (G - 1) == 0
          else jnp.remainder(ic, G)).astype(jnp.float32)

    onehot = _hat(fx, xq) * _hat(fy, yq)                 # [T, G*G]
    zcols = _mm(onehot, vol_ref[:, :], prec)             # [T, B*G]
    w = _mm(zcols * _hat(fz, zc), sum_ref[:, :], prec)   # [T, B]
    A = _mm(w, rmat_ref[:, :], "highest")                # [T, 12K]
    P = jnp.concatenate([fx, fy, fz], axis=1)
    acc = _blend_cols(A, P, K)
    out_ref[:, :] = jnp.concatenate(
        [acc, jnp.sum(w, axis=1, keepdims=True)], axis=1)


def _shared_blend_bwd_kernel(pts_ref, vol_ref, sum_ref, exp_ref, rmat_ref,
                             gout_ref, dpts_ref, dvol_ref, drmat_ref,
                             *, B: int, G: int, K: int, prec: str):
    """Backward by recomputation. gout [T, 3K+1] = (dacc_k, dwsum).
    dvol / drmat accumulate across sequential grid steps."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        dvol_ref[:, :] = jnp.zeros_like(dvol_ref)
        drmat_ref[:, :] = jnp.zeros_like(drmat_ref)

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
    zcols = _mm(onehot, vol_ref[:, :], prec)            # [T, B*G]
    w = _mm(zcols * ztap, sum_ref[:, :], prec)          # [T, B]
    A = _mm(w, rmat_ref[:, :], "highest")               # [T, 12K]

    g = gout_ref[:, :3 * K]                              # [T, 3K]
    gws = gout_ref[:, 3 * K:3 * K + 1]                   # [T, 1]
    # q[t, 12k+4c+j] = g[t, 3k+c] * P[t, j]  (P = (fx, fy, fz, 1))
    qcols = []
    for k in range(K):
        for c in range(3):
            gc = g[:, 3 * k + c:3 * k + c + 1]
            qcols.extend([gc * fx, gc * fy, gc * fz, gc])
    q = jnp.concatenate(qcols, axis=1)                   # [T, 12K]

    dims_t = (((0,), (0,)), ((), ()))
    dims_c = (((1,), (1,)), ((), ()))
    drmat_ref[:, :] += _mm(w, q, "highest", dims=dims_t)  # [B, 12K]
    dw = _mm(q, rmat_ref[:, :], "highest", dims=dims_c) + gws  # [T, B]

    # direct dpts from the blend: dacc/dp_g[c',j] = A columns
    dpts_direct = jnp.concatenate(
        [sum(g[:, 3 * k + c:3 * k + c + 1]
             * A[:, 12 * k + 4 * c + j:12 * k + 4 * c + j + 1]
             for k in range(K) for c in range(3))
         for j in range(3)], axis=1)                     # [T, 3]

    # sampling grads with gw := dw (mirrors `_shared_bwd_kernel`)
    gw_exp = _mm(dw, exp_ref[:, :], prec)                # [T, B*G]
    dzcols = gw_exp * ztap
    dvol_ref[:, :] += _mm(onehot, dzcols, prec, dims=dims_t)
    U = _mm(dzcols, vol_ref[:, :], prec, dims=dims_c)    # [T, G*G]
    dfx = jnp.sum(_dhat(_clipped_floor(fx, G), xq) * ty * U,
                  axis=1, keepdims=True)
    dfy = jnp.sum(tx * _dhat(_clipped_floor(fy, G), yq) * U,
                  axis=1, keepdims=True)
    dfz = jnp.sum(gw_exp * _dhat(_clipped_floor(fz, G), zc) * zcols,
                  axis=1, keepdims=True)
    dpts_ref[:, :] = (jnp.concatenate([dfx, dfy, dfz], axis=1)
                      + dpts_direct)


def _shared_blend_fwd_kernel_k0(k0_ref, *refs, B, G, K, prec):
    """PrefetchScalarGridSpec prepends the k0 scalar ref — drop it."""
    _shared_blend_fwd_kernel(*refs, B=B, G=G, K=K, prec=prec)


def _shared_blend_bwd_kernel_k0(k0_ref, *refs, B, G, K, prec):
    _shared_blend_bwd_kernel(*refs, B=B, G=G, K=K, prec=prec)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def shared_blend_core(pts_g, vol_all, rmat, k0, prec="bf16"):
    """Fused forward LBS: shared-tap weights + K-set affine blend.

    pts_g [N, 3] grid coords; vol_all [G*G, B*G]; rmat [B, 12K];
    k0 [1] int32 — first live TILE_SH block (live-suffix mode: rows
    [0, k0*TILE_SH) are skipped fwd AND bwd, their outputs left
    UNWRITTEN; pass 0 to process everything).
    Returns [N, 3K+1] = (acc_0..acc_{K-1} world coords, wsum)."""
    return _shared_blend_fwd(pts_g, vol_all, rmat, k0, prec)[0]


def _shared_blend_fwd(pts_g, vol_all, rmat, k0, prec):
    QQ, BG = vol_all.shape
    G = int(round(QQ ** 0.5))
    B = BG // G
    K = rmat.shape[1] // 12
    assert G * G == QQ and B * G == BG and rmat.shape == (B, 12 * K)
    pts_p, n = _pad_rows(pts_g.astype(jnp.float32), TILE_SH)
    dt = jnp.bfloat16 if prec == "bf16" else jnp.float32
    vol = vol_all.astype(dt)
    sum_blk = jnp.asarray(np.kron(np.eye(B), np.ones((G, 1))), dt)
    n_blocks = pts_p.shape[0] // TILE_SH
    # all-dead clamp: keep the first block in range / grid >= 1
    k0 = jnp.minimum(k0, n_blocks - 1)
    kern = functools.partial(_shared_blend_fwd_kernel_k0, B=B, G=G, K=K,
                             prec=prec)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks - k0[0],),
            in_specs=[
                pl.BlockSpec((TILE_SH, 3), lambda i, k0: (k0[0] + i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((QQ, BG), lambda i, k0: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BG, B), lambda i, k0: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, 12 * K), lambda i, k0: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE_SH, 3 * K + 1),
                                   lambda i, k0: (k0[0] + i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((pts_p.shape[0], 3 * K + 1),
                                       jnp.float32),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
    )(k0, pts_p, vol, sum_blk, rmat.astype(jnp.float32))
    return out[:n], (pts_g, vol_all, rmat, k0)


def _shared_blend_bwd(prec, res, gout):
    pts_g, vol_all, rmat, k0 = res
    QQ, BG = vol_all.shape
    G = int(round(QQ ** 0.5))
    B = BG // G
    K = rmat.shape[1] // 12
    pts_p, n = _pad_rows(pts_g.astype(jnp.float32), TILE_SH)
    g_p, _ = _pad_rows(gout.astype(jnp.float32), TILE_SH)
    dt = jnp.bfloat16 if prec == "bf16" else jnp.float32
    vol = vol_all.astype(dt)
    sum_blk = jnp.asarray(np.kron(np.eye(B), np.ones((G, 1))), dt)
    expand = jnp.asarray(np.kron(np.eye(B), np.ones((1, G))), dt)
    n_blocks = pts_p.shape[0] // TILE_SH
    k0 = jnp.minimum(k0, n_blocks - 1)
    kern = functools.partial(_shared_blend_bwd_kernel_k0, B=B, G=G, K=K,
                             prec=prec)
    dpts, dvol, drmat = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks - k0[0],),
            in_specs=[
                pl.BlockSpec((TILE_SH, 3), lambda i, k0: (k0[0] + i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((QQ, BG), lambda i, k0: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BG, B), lambda i, k0: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, BG), lambda i, k0: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, 12 * K), lambda i, k0: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_SH, 3 * K + 1),
                             lambda i, k0: (k0[0] + i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((TILE_SH, 3), lambda i, k0: (k0[0] + i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((QQ, BG), lambda i, k0: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, 12 * K), lambda i, k0: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((pts_p.shape[0], 3), jnp.float32),
            jax.ShapeDtypeStruct((QQ, BG), jnp.float32),
            jax.ShapeDtypeStruct((B, 12 * K), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
    )(k0, pts_p, vol, sum_blk, expand, rmat.astype(jnp.float32), g_p)
    # zero the unwritten dead-prefix dpts rows (uninitialized HBM)
    live = (jax.lax.broadcasted_iota(jnp.int32, (pts_p.shape[0], 1), 0)
            >= k0[0] * TILE_SH)
    dpts = jnp.where(live, dpts, 0.0)
    dk0 = np.zeros((1,), jax.dtypes.float0)
    return (dpts[:n].astype(pts_g.dtype), dvol.astype(vol_all.dtype),
            drmat.astype(rmat.dtype), dk0)


shared_blend_core.defvjp(
    lambda p, v, r, k0, prec: _shared_blend_fwd(p, v, r, k0, prec),
    _shared_blend_bwd)


# ---------------------------------------------------------------------------
# bone-packed pair-grid inverse kernel (round 5)
# ---------------------------------------------------------------------------
#
# The quad pair-grid kernel packs 4 CONSECUTIVE surviving bones of ONE
# tile per 128-lane step, so each tile rounds its alive-bone count up to
# a multiple of 4 (plus a forced quad 0) — executed bone-slot density
# 0.395 vs the 0.31 tile-alive bound on production batches (VERDICT r4
# #4). This kernel packs 4 *independent* (tile, bone) pairs per step by
# giving each lane segment ("slot") its OWN pts/output blocks:
#
# * tiles are partitioned into NS = 128//G contiguous chunks balanced by
#   cumulative pair count; slot j walks chunk j's (tile, bone) pairs in
#   tile order (one pair per step), so each slot's tile sequence is
#   non-decreasing and the revisited-output-block accumulation pattern
#   of the quad kernel still applies per slot;
# * the per-sample chains ride the SAME [T, 128] lane packing — segment
#   j now broadcasts slot j's tile coordinates instead of one shared
#   tile's — and per-slot results come out of segment-sum matmuls
#   against a [128, NS] selector;
# * each slot writes its own [n_pad, 4] output array; the XLA side
#   selects per tile by its chunk id (blocks a slot never visited hold
#   garbage but are never selected);
# * dRg/dTg accumulate in a resident [BPD, 4, 3] VMEM block via the
#   dvol dynamic-index pattern — retiring the quad kernel's per-pair
#   [cap, 3, 4, 128] HBM table AND its XLA-side segment_sum;
# * grid length = max slot length; short slots pad by repeating their
#   last tile with the dummy bone (zero volume channel -> the padded
#   steps accumulate exact zeros, values AND grads);
# * SMEM: tile ids pack 2-per-int32 (slot tables at the all-alive
#   worst-case capacity are 689 KB at the 8-patch batch vs the 1 MB
#   budget; unpacked they would not fit).
#
# Exactness: the pair list is built from the same exact per-sample
# support predicate as the quad kernel, so results equal the dense
# kernel's up to f32 summation order (tests/test_pallas_lbs.py).
#
# MEASURED RESULT (v5e, 262k production-shaped samples,
# tools/bench_lbs_pg.py, 2026-08-20): executed density does drop
# 0.396 -> 0.308 (-22% pairs), but the kernel REGRESSES vs the quad
# pair-grid — fwd 18.6 -> 24.6 ms, fwd+bwd 48.8 -> 59.4 ms. The
# per-step fixed work grew more than the grid shrank: 4 independent
# small pts/out block streams replace one revisited block, the
# per-slot [T,128]->[T,NS] segment-sum matmuls and 4x set/accumulate
# branches replace single full-lane reductions, and the resident
# [BPD, 4, 3] dRg accumulation adds 4 dynamic-index updates per step.
# Same lesson as the windowed variant: at this density, per-step fixed
# work — not pair count — is the binding constraint. Kept OFF the
# default path (HOSNERF_PG_IMPL=bp to enable), tested for exactness
# (tests/test_pallas_lbs.py::test_bonepacked_*) as the measured answer
# to VERDICT r4 #4's bone-packing hypothesis.


def _seg_matrix(G: int):
    """[128, NS] f32 slot selector: column j = 1 on lanes of segment j
    (built in-kernel; pallas forbids captured array constants)."""
    NS = 128 // G
    lane = jax.lax.broadcasted_iota(jnp.int32, (128, NS), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (128, NS), 1)
    sh = G.bit_length() - 1
    return ((lane >> sh) == col).astype(jnp.float32)


def _bp_tile_id(ptile_ref, j: int, idx):
    """Tile id of slot j at step idx from the 16-bit-packed SMEM table.
    Arithmetic >> then mask is sign-safe for ids < 65536."""
    w = ptile_ref[j, idx // 2]
    return (w >> (16 * (idx % 2))) & 0xFFFF


def _bp_store(oref, ptile_ref, j: int, i, contrib):
    """Set-or-accumulate into slot j's revisited output block."""
    cur = _bp_tile_id(ptile_ref, j, i)
    prev = _bp_tile_id(ptile_ref, j, jnp.maximum(i - 1, 0))
    first = jnp.logical_or(i == 0, cur != prev)

    @pl.when(first)
    def _set():
        oref[:, :] = contrib

    @pl.when(jnp.logical_not(first))
    def _acc():
        oref[:, :] += contrib


def _slot_pairs(alive, B: int, BPD: int, G: int):
    """Partition the alive (tile, bone) pairs into NS = 128//G balanced
    per-slot streams (tiles contiguous and non-decreasing per slot; dead
    tiles contribute one dummy pair so every output block initializes).

    alive [n_tiles, BPD] bool. Returns (ptile16 [NS, CAP//2] int32 with
    two tile ids per word, pbone [CAP] int32 with NS byte-packed bones
    per step, slot_of [n_tiles] int32, n_steps traced scalar)."""
    NS = 128 // G
    n_tiles = alive.shape[0]
    assert n_tiles < (1 << 16), "16-bit tile packing needs < 65536 tiles"
    alive = alive & (jnp.arange(BPD) < B)[None, :]
    order = jnp.argsort(jnp.logical_not(alive), axis=1, stable=True)
    acount = jnp.sum(alive, axis=1)
    cnt = jnp.maximum(acount, 1)
    cum = jnp.cumsum(cnt)
    total = cum[-1]
    cum_ex = cum - cnt
    slot_of = jnp.minimum((cum_ex * NS) // total, NS - 1).astype(jnp.int32)
    # per-slot stream offsets: cum_ex of the slot's first tile
    is_first = jnp.concatenate(
        [jnp.ones((1,), bool), slot_of[1:] != slot_of[:-1]])
    slot_start = jnp.zeros((NS,), cum_ex.dtype).at[
        jnp.where(is_first, slot_of, NS)].set(
        jnp.where(is_first, cum_ex, 0), mode="drop")
    slot_len = jnp.zeros((NS,), jnp.int32).at[slot_of].add(
        cnt.astype(jnp.int32))
    last_tile = jnp.zeros((NS,), jnp.int32).at[slot_of].max(
        jnp.arange(n_tiles, dtype=jnp.int32))

    # scatter each tile's pair run into its slot's stream
    cap = n_tiles * BPD // NS + BPD      # all-alive worst case + boundary
    cap += cap % 2                       # even, for 16-bit packing
    slot = jnp.arange(BPD)[None, :]
    valid = slot < cnt[:, None]
    bones = jnp.where(slot < acount[:, None], order, BPD - 1)
    base = (cum_ex - slot_start[slot_of]).astype(jnp.int32)
    pos = slot_of[:, None] * cap + base[:, None] + slot
    tgt = jnp.where(valid, pos, NS * cap)
    tile_of = jnp.broadcast_to(
        jnp.arange(n_tiles, dtype=jnp.int32)[:, None], (n_tiles, BPD))
    flat_tile = jnp.zeros((NS * cap,), jnp.int32).at[tgt.reshape(-1)].set(
        tile_of.reshape(-1), mode="drop")
    flat_bone = jnp.full((NS * cap,), BPD - 1, jnp.int32).at[
        tgt.reshape(-1)].set(bones.reshape(-1).astype(jnp.int32),
                             mode="drop")
    # pad region repeats the slot's last tile (same block -> accumulate
    # exact zeros via the dummy bone, never an overwrite)
    sidx = jnp.arange(NS * cap) // cap
    pidx = jnp.arange(NS * cap) % cap
    in_pad = pidx >= slot_len[sidx]
    flat_tile = jnp.where(in_pad, last_tile[sidx], flat_tile)

    t2 = flat_tile.reshape(NS, cap)
    ptile16 = t2[:, 0::2] | (t2[:, 1::2] << 16)
    pbone = _pack_bones(flat_bone.reshape(NS, cap).T, NS)
    n_steps = jnp.maximum(jnp.max(slot_len), 1)
    return ptile16, pbone, slot_of, n_steps


def _bp_segs(coef_ref, bs, prefs, T: int, G: int):
    """Per-slot grid-coordinate chains on the [T, 128] lane packing:
    segment j broadcasts slot j's tile coordinates."""
    NS = len(bs)
    xs = jnp.concatenate([jnp.broadcast_to(prefs[j][:, 0:1], (T, G))
                          for j in range(NS)], axis=1)
    ys = jnp.concatenate([jnp.broadcast_to(prefs[j][:, 1:2], (T, G))
                          for j in range(NS)], axis=1)
    zs = jnp.concatenate([jnp.broadcast_to(prefs[j][:, 2:3], (T, G))
                          for j in range(NS)], axis=1)
    rx = _coef_rows(coef_ref, bs, G, 0)
    ry = _coef_rows(coef_ref, bs, G, 4)
    rz = _coef_rows(coef_ref, bs, G, 8)
    fxseg = xs * rx[0] + ys * rx[1] + zs * rx[2] + rx[3]
    fyseg = xs * ry[0] + ys * ry[1] + zs * ry[2] + ry[3]
    fzseg = xs * rz[0] + ys * rz[1] + zs * rz[2] + rz[3]
    return fxseg, fyseg, fzseg, rx, ry, rz


def _bp_fwd_kernel(ptile_ref, pbone_ref, coef_ref, *refs,
                   G: int, prec: str):
    """One step = NS independent (tile, bone) pairs, one per lane
    segment. Same per-segment math as `_pg_fwd_kernel`; per-slot sums
    come from a [128, NS] segment-sum matmul instead of full-lane sums."""
    NS = 128 // G
    prefs = refs[:NS]
    volq_ref = refs[NS]
    orefs = refs[NS + 1:]
    i = pl.program_id(0)
    T = prefs[0].shape[0]
    x128 = _lane_iota_f(T, G)
    xq2, yq2 = _xyq_iotas_f(T, G)
    dt = jnp.bfloat16 if prec == "bf16" else jnp.float32

    bs = [_unpack_bone(pbone_ref, i, j, NS) for j in range(NS)]
    fxseg, fyseg, fzseg, _, _, _ = _bp_segs(coef_ref, bs, prefs, T, G)
    zcs = []
    for j in range(NS):
        c = slice(G * j, G * j + 1)
        oh = (_hat(fxseg[:, c], xq2)
              * _hat(fyseg[:, c], yq2)).astype(dt)        # [T, G*G]
        zcs.append(_mm(oh, volq_ref[bs[j]], prec))        # [T, G]
    zcols4 = jnp.concatenate(zcs, axis=1)                 # [T, 128]
    P4 = _hat(fzseg, x128) * zcols4
    segm = _seg_matrix(G)
    sx = _mm(P4 * fxseg, segm, "highest")                 # [T, NS]
    sy = _mm(P4 * fyseg, segm, "highest")
    sz = _mm(P4 * fzseg, segm, "highest")
    sw = _mm(P4, segm, "highest")
    for j in range(NS):
        _bp_store(orefs[j], ptile_ref, j, i,
                  jnp.concatenate([sx[:, j:j + 1], sy[:, j:j + 1],
                                   sz[:, j:j + 1], sw[:, j:j + 1]],
                                  axis=1))


def _bp_bwd_kernel(ptile_ref, pbone_ref, coef_ref, *refs,
                   G: int, prec: str):
    """Backward by recomputation (mirrors `_pg_bwd_kernel` per segment).
    dRg/dTg accumulate into a resident [BPD, 4, 3] block per bone (the
    dvol pattern) instead of the quad kernel's per-pair HBM table."""
    NS = 128 // G
    prefs = refs[:NS]
    volq_ref = refs[NS]
    kseg_ref = refs[NS + 1]
    grefs = refs[NS + 2:2 * NS + 2]
    drefs = refs[2 * NS + 2:3 * NS + 2]
    dr_ref = refs[3 * NS + 2]
    dvol_ref = refs[3 * NS + 3]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dvol_ref[:, :, :] = jnp.zeros_like(dvol_ref)
        dr_ref[:, :, :] = jnp.zeros_like(dr_ref)

    T = prefs[0].shape[0]
    x128 = _lane_iota_f(T, G)
    xq2, yq2 = _xyq_iotas_f(T, G)
    dt = jnp.bfloat16 if prec == "bf16" else jnp.float32
    dims_t = (((0,), (0,)), ((), ()))

    bs = [_unpack_bone(pbone_ref, i, j, NS) for j in range(NS)]
    fxseg, fyseg, fzseg, rx, ry, rz = _bp_segs(coef_ref, bs, prefs, T, G)
    gx4 = jnp.concatenate([jnp.broadcast_to(grefs[j][:, 0:1], (T, G))
                           for j in range(NS)], axis=1)
    gy4 = jnp.concatenate([jnp.broadcast_to(grefs[j][:, 1:2], (T, G))
                           for j in range(NS)], axis=1)
    gz4 = jnp.concatenate([jnp.broadcast_to(grefs[j][:, 2:3], (T, G))
                           for j in range(NS)], axis=1)
    gws4 = jnp.concatenate([jnp.broadcast_to(grefs[j][:, 3:4], (T, G))
                            for j in range(NS)], axis=1)
    gw4 = gx4 * fxseg + gy4 * fyseg + gz4 * fzseg + gws4
    tz4 = _hat(fzseg, x128)
    dhz4 = _dhat(_clipped_floor(fzseg, G), x128)

    zcs, dfxrs, dfyrs = [], [], []
    for j in range(NS):
        b = bs[j]
        c = slice(G * j, G * j + 1)
        s = slice(G * j, G * (j + 1))
        hx = _hat(fxseg[:, c], xq2)
        hy = _hat(fyseg[:, c], yq2)
        oh = (hx * hy).astype(dt)                       # [T, G*G]
        zc = _mm(oh, volq_ref[b], prec)                 # [T, G]
        m2 = _mm((_dhat(_clipped_floor(fxseg[:, c], G), xq2)
                  * hy).astype(dt), volq_ref[b], prec)
        m3 = _mm((hx * _dhat(_clipped_floor(fyseg[:, c], G), yq2)
                  ).astype(dt), volq_ref[b], prec)
        tzj = tz4[:, s]
        dvol_ref[b] += _mm(oh, gw4[:, c] * tzj, prec, dims=dims_t)
        zcs.append(zc)
        dfxrs.append(jnp.broadcast_to(
            jnp.sum(m2 * tzj, axis=1, keepdims=True), (T, G)))
        dfyrs.append(jnp.broadcast_to(
            jnp.sum(m3 * tzj, axis=1, keepdims=True), (T, G)))
    zcols4 = jnp.concatenate(zcs, axis=1)
    dfxr4 = jnp.concatenate(dfxrs, axis=1)
    dfyr4 = jnp.concatenate(dfyrs, axis=1)

    def segsum(q):
        return _mm(q, kseg_ref[:, :], "highest")

    wB4 = segsum(tz4 * zcols4)
    dfx4 = gx4 * wB4 + gw4 * dfxr4
    dfy4 = gy4 * wB4 + gw4 * dfyr4
    dfz4 = gz4 * wB4 + gw4 * segsum(dhz4 * zcols4)

    # dRg/dTg: per slot, p4^T @ (dfx | dfy | dfz at the segment's first
    # lane — segment-constant) -> [4, 3], accumulated per bone
    ones = jnp.ones((T, 1), jnp.float32)
    for j in range(NS):
        c = slice(G * j, G * j + 1)
        d3 = jnp.concatenate([dfx4[:, c], dfy4[:, c], dfz4[:, c]],
                             axis=1)                      # [T, 3]
        p4j = jnp.concatenate([prefs[j][:, :], ones], axis=1)  # [T, 4]
        dr_ref[bs[j]] += _mm(p4j, d3, "highest", dims=dims_t)

    # dpts per slot via segment sums; lanes overcount by G -> 1/G
    segm = _seg_matrix(G)
    inv_g = jnp.float32(1.0 / G)
    qs = [_mm(dfx4 * rx[k] + dfy4 * ry[k] + dfz4 * rz[k], segm,
              "highest") for k in range(3)]               # [T, NS] each
    for j in range(NS):
        contrib = inv_g * jnp.concatenate(
            [qs[0][:, j:j + 1], qs[1][:, j:j + 1], qs[2][:, j:j + 1]],
            axis=1)
        _bp_store(drefs[j], ptile_ref, j, i, contrib)


def _bp_combine(slot_of, outs, TILE: int):
    """Select each tile's rows from its owning slot's output array."""
    sel = jnp.repeat(slot_of, TILE)
    acc = outs[0]
    for j in range(1, len(outs)):
        acc = jnp.where((sel == j)[:, None], outs[j], acc)
    return acc


@jax.custom_vjp
def permute_rows(x, perm, inv_perm):
    """x[perm] whose VJP is a GATHER by the known inverse permutation
    instead of autodiff's scatter-add (scatters don't get the
    sorted/unique fast path — measured ~2x a gather at these shapes;
    the round-2 lesson, re-applied to the hoisted sort)."""
    return x[perm]


def _permute_fwd(x, perm, inv_perm):
    return x[perm], (perm, inv_perm)


def _permute_bwd(res, g):
    perm, inv_perm = res
    zt = tuple(np.zeros(np.shape(p), jax.dtypes.float0)
               for p in (perm, inv_perm))
    return (g[inv_perm],) + zt


permute_rows.defvjp(_permute_fwd, _permute_bwd)


class BPDomain:
    """Liveness-sorted sample domain shared by the bone-packed inverse
    kernel AND every downstream per-sample op (live-suffix skipping).

    Under the ascending signature sort, zero-support sample GROUPS (of
    SORT_GROUP) form a contiguous PREFIX of the sorted array — so any
    tile-granular consumer can skip its dead prefix with one traced
    block offset (`k0_for(tile)`), and the exact sample-level dead/live
    boundary is `n_dead_groups * SORT_GROUP` (`live_row_mask`)."""

    def __init__(self, n_pad, perm, inv_perm, n, alive, n_dead_groups,
                 tables):
        self.n_pad = n_pad              # padded (sorted-domain) rows
        self.perm = perm                # [n_pad]
        self.inv_perm = inv_perm        # [n_pad]
        self.n = n                      # true (unpadded) sample count
        self.alive = alive              # [n_tiles, BPD] bool
        self.n_dead_groups = n_dead_groups   # traced scalar
        self.tables = tables            # kernel pair tables

    def k0_for(self, tile: int):
        """First live block at a consumer's tile size (floor — blocks
        straddling the boundary are processed)."""
        return (self.n_dead_groups * SORT_GROUP) // tile

    def live_row_mask(self):
        """[n_pad, 1] f32: 1 on rows at/after the exact dead/live sample
        boundary. Rows below it are dead in exact math (zero support ->
        masked out of every loss) and may hold kernel garbage."""
        boundary = self.n_dead_groups * SORT_GROUP
        return (jnp.arange(self.n_pad) >= boundary).astype(
            jnp.float32)[:, None]

    def unsort(self, x_s):
        """Sorted-domain array -> original row order, pad stripped
        (gather both directions via `permute_rows`)."""
        return permute_rows(x_s, self.inv_perm, self.perm)[:self.n]

    def sort_rows(self, x):
        """Original-order [n, ...] array -> sorted domain [n_pad, ...]
        (zero-pads, then gathers; VJP is gathers both ways)."""
        pad = self.n_pad - x.shape[0]
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
        return permute_rows(x, self.perm, self.inv_perm)


def bp_prepare(pts_g, rg, tg, G: int, B: int,
               kind: str = "quad") -> BPDomain:
    """Support + signature sort + pair tables for the sorted-domain
    inverse kernels. One pass, shared by the inverse kernel and the
    live-suffix consumers (the model calls this once per step).
    kind: 'quad' (production — `inverse_core_pg_s` tables) or 'bp'
    (the bone-packed experiment — `inverse_core_bp_s` tables)."""
    _, BPD = _pg_pad_shapes(B, G)
    assert BPD <= 31, (
        "signature packing shifts int32 by the bone-channel index; "
        f"BPD={BPD} would overflow into the sign bit and break the "
        "dead-prefix invariant (live groups sorted before dead)")
    pts_p, n = _pad_rows(pts_g.astype(jnp.float32), TILE_PG)
    n_pad = pts_p.shape[0]
    rgp = jnp.pad(rg.astype(jnp.float32), ((0, BPD - B), (0, 0)))
    tgp = jnp.pad(tg.astype(jnp.float32), ((0, BPD - B), (0, 0)))
    sup = _sample_support(jax.lax.stop_gradient(pts_p),
                          jax.lax.stop_gradient(rgp),
                          jax.lax.stop_gradient(tgp), G)
    sup = sup & (jnp.arange(BPD) < B)[None, :]
    sup = sup & (jnp.arange(n_pad) < n)[:, None]
    # everything below works on GROUP-level signatures ([n/8, BPD]) —
    # the full [n_pad, BPD] support matrix is never permuted (that
    # gather measured ~2 ms at production sizes)
    n_groups = n_pad // SORT_GROUP
    g = jnp.any(sup.reshape(n_groups, SORT_GROUP, BPD), axis=1)
    sig = jnp.sum(g.astype(jnp.int32)
                  << jnp.arange(BPD, dtype=jnp.int32)[None], axis=1)
    gperm = jnp.argsort(sig)                        # stable: ray order
    inv_gperm = jnp.zeros((n_groups,), gperm.dtype).at[gperm].set(
        jnp.arange(n_groups, dtype=gperm.dtype), unique_indices=True)
    lane = jnp.arange(SORT_GROUP)[None, :]
    perm = (gperm[:, None] * SORT_GROUP + lane).reshape(-1)
    inv_perm = (inv_gperm[:, None] * SORT_GROUP + lane).reshape(-1)
    n_dead_groups = n_groups - jnp.sum(
        jnp.any(g, axis=1).astype(jnp.int32))
    gpt = TILE_PG // SORT_GROUP                     # groups per tile
    n_tiles = n_pad // TILE_PG
    alive = jnp.any(g[gperm].reshape(n_tiles, gpt, BPD), axis=1)
    tables = (_slot_pairs(alive, B, BPD, G) if kind == "bp"
              else _compact_pairs(alive, B, BPD, G))
    return BPDomain(n_pad, perm, inv_perm, n, alive, n_dead_groups,
                    tables)


def inverse_core_bp(pts_g, rg, tg, vol_qz, prec="bf16"):
    """Bone-packed pair-grid inverse-LBS accumulation — same contract
    and (up to f32 summation order) same values as `inverse_core_pg`,
    at the tile-alive pair density (no quad rounding). Autodiff flows
    through the sort gather + the sorted-core custom VJP."""
    B, QQ, G = vol_qz.shape
    dom = bp_prepare(pts_g, rg, tg, G, B, kind="bp")
    # re-gather with gradient (bp_prepare's pts_s is stop_gradient'd
    # only inside the support predicate; the kernel input needs grads)
    pts_s = dom.sort_rows(pts_g.astype(jnp.float32))
    acc_s = inverse_core_bp_s(pts_s, rg, tg, vol_qz, *dom.tables, prec)
    return dom.unsort(acc_s)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def inverse_core_bp_s(pts_s, rg, tg, vol_qz, ptile16, pbone, slot_of,
                      n_steps, prec="bf16"):
    """Sorted-domain bone-packed core: pts_s [n_pad, 3] liveness-sorted;
    tables from `bp_prepare`. Returns acc_s [n_pad, 4] in the SORTED
    domain (dead rows exact — every tile gets at least one pair)."""
    return _bp_fwd(pts_s, rg, tg, vol_qz, ptile16, pbone, slot_of,
                   n_steps, prec)[0]


def _bp_fwd(pts_s, rg, tg, vol_qz, ptile16, pbone, slot_of, n_steps,
            prec):
    B, QQ, G = vol_qz.shape
    assert QQ == G * G, "inverse_core_bp needs cubic volumes"
    NS = 128 // G
    _, BPD = _pg_pad_shapes(B, G)
    rgp = jnp.pad(rg.astype(jnp.float32), ((0, BPD - B), (0, 0)))
    tgp = jnp.pad(tg.astype(jnp.float32), ((0, BPD - B), (0, 0)))
    coef = _pg_coef(rgp, tgp)
    dt = jnp.bfloat16 if prec == "bf16" else jnp.float32
    vol = _pg_vol(vol_qz, BPD, dt)

    def pts_spec(j):
        return pl.BlockSpec(
            (TILE_PG, 3),
            lambda i, pt, pb, cf, j=j: (_bp_tile_id(pt, j, i), 0),
            memory_space=pltpu.VMEM)

    def out_spec(j):
        return pl.BlockSpec(
            (TILE_PG, 4),
            lambda i, pt, pb, cf, j=j: (_bp_tile_id(pt, j, i), 0),
            memory_space=pltpu.VMEM)

    kern = functools.partial(_bp_fwd_kernel, G=G, prec=prec)
    outs = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_steps,),
            in_specs=[pts_spec(j) for j in range(NS)] + [
                pl.BlockSpec((BPD, G * G, G), lambda i, pt, pb, cf:
                             (0, 0, 0), memory_space=pltpu.VMEM)],
            out_specs=[out_spec(j) for j in range(NS)],
        ),
        out_shape=[jax.ShapeDtypeStruct((pts_s.shape[0], 4), jnp.float32)
                   for _ in range(NS)],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
    )(ptile16, pbone, coef, *([pts_s] * NS), vol)
    acc_s = _bp_combine(slot_of, outs, TILE_PG)
    return acc_s, (pts_s, rg, tg, vol_qz, ptile16, pbone, slot_of,
                   n_steps)


def _bp_bwd(prec, res, gacc_s):
    (pts_s, rg, tg, vol_qz, ptile16, pbone, slot_of, n_steps) = res
    B, QQ, G = vol_qz.shape
    NS = 128 // G
    _, BPD = _pg_pad_shapes(B, G)
    n_pad = pts_s.shape[0]
    gacc_p = gacc_s.astype(jnp.float32)
    rgp = jnp.pad(rg.astype(jnp.float32), ((0, BPD - B), (0, 0)))
    tgp = jnp.pad(tg.astype(jnp.float32), ((0, BPD - B), (0, 0)))
    coef = _pg_coef(rgp, tgp)
    dt = jnp.bfloat16 if prec == "bf16" else jnp.float32
    vol = _pg_vol(vol_qz, BPD, dt)
    lane = np.arange(128)
    kseg = jnp.asarray((lane[:, None] // G) == (lane[None, :] // G),
                       jnp.float32)

    def blk_spec(j, w):
        return pl.BlockSpec(
            (TILE_PG, w),
            lambda i, pt, pb, cf, j=j: (_bp_tile_id(pt, j, i), 0),
            memory_space=pltpu.VMEM)

    kern = functools.partial(_bp_bwd_kernel, G=G, prec=prec)
    outs = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_steps,),
            in_specs=([blk_spec(j, 3) for j in range(NS)] + [
                pl.BlockSpec((BPD, G * G, G), lambda i, pt, pb, cf:
                             (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 128), lambda i, pt, pb, cf: (0, 0),
                             memory_space=pltpu.VMEM)]
                + [blk_spec(j, 4) for j in range(NS)]),
            out_specs=([blk_spec(j, 3) for j in range(NS)] + [
                pl.BlockSpec((BPD, 4, 3), lambda i, pt, pb, cf:
                             (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BPD, G * G, G), lambda i, pt, pb, cf:
                             (0, 0, 0), memory_space=pltpu.VMEM)]),
        ),
        out_shape=([jax.ShapeDtypeStruct((n_pad, 3), jnp.float32)
                    for _ in range(NS)]
                   + [jax.ShapeDtypeStruct((BPD, 4, 3), jnp.float32),
                      jax.ShapeDtypeStruct((BPD, QQ, G), jnp.float32)]),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
    )(ptile16, pbone, coef, *([pts_s] * NS), vol, kseg,
      *([gacc_p] * NS))
    dpts_s = _bp_combine(slot_of, outs[:NS], TILE_PG)
    per_bone = outs[NS][:B]                             # [B, 4, 3]
    drg = jnp.transpose(per_bone[:, :3, :], (0, 2, 1)).reshape(B, 9)
    dtg = per_bone[:, 3, :]
    dvol = outs[NS + 1]
    dtables = tuple(np.zeros(np.shape(t), jax.dtypes.float0)
                    for t in (ptile16, pbone, slot_of, n_steps))
    return (dpts_s.astype(jnp.float32), drg.astype(rg.dtype),
            dtg.astype(tg.dtype),
            dvol[:B].astype(vol_qz.dtype)) + dtables


inverse_core_bp_s.defvjp(
    lambda p, r, t, v, pt16, pb, so, ns, prec: _bp_fwd(
        p, r, t, v, pt16, pb, so, ns, prec),
    _bp_bwd)


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
                precision: str = "bf16",
                pair_grid: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pallas inverse LBS. Same contract as ops/lbs.inverse_lbs but
    returns only (x_skel [N,3], fg_likelihood_mask [N,1]) — the call
    sites discard the per-bone weights (models/human.py:207).
    pair_grid=True (default) runs the compacted-pair kernel (identical
    values up to f32 summation order; ~2x fewer executed (tile, bone)
    pairs); False runs the dense tile kernel."""
    B = motion_weights_vol.shape[0] - 1
    D, H, W = motion_weights_vol.shape[1:]
    assert D == H == W, "pallas inverse_lbs assumes cubic volumes"
    G = D
    s, o = _grid_affine(cnl_bbox_min_xyz, cnl_bbox_scale_xyz, G)
    # fold the world->grid affine into the bone transforms:
    # f = s * (R p + T) + o  =>  Rg = diag(s) R, Tg = s*T + o
    rg = (motion_scale_Rs * s[None, :, None]).reshape(B, 9)
    tg = motion_Ts * s[None, :] + o[None, :]
    # vol[b, z, y, x] -> [b, x*G+y, z] (xy-onehot kernel layout)
    vol_qz = jnp.transpose(motion_weights_vol[:B], (0, 3, 2, 1)).reshape(
        B, G * G, G)
    if pair_grid:
        core = {"win": inverse_core_pgw,
                "quad": inverse_core_pg,
                "bp": inverse_core_bp}[
            _os.environ.get("HOSNERF_PG_IMPL", "quad")]
    else:
        core = inverse_core
    acc = core(pts, rg, tg, vol_qz, precision)
    wsum = acc[:, 3:4]
    m = jnp.maximum(wsum, 1e-4)
    # grid-space accumulator back to world: p = (f - o)/s
    x_skel = (acc[:, :3] / m - o[None, :] * (wsum / m)) / s[None, :]
    return x_skel, wsum


def forward_lbs_multi(pts, motion_scale_Rs_fwd, motion_Ts_fwd,
                      motion_weights_vol, cnl_bbox_min_xyz,
                      cnl_bbox_scale_xyz, *, precision: str = "bf16",
                      k0_blocks=None):
    """Fully fused forward LBS for K transform sets: bone weights sampled
    once at the shared canonical points and blended against each set's
    affines inside the kernel — semantics of ops/lbs.bone_weights +
    ops/lbs.apply_forward_lbs_multi (ref network.py:355-396,472-535).

    pts [N,3] world canonical points; motion_scale_Rs_fwd [K,B,3,3];
    motion_Ts_fwd [K,B,3]. Returns (x_deform [K,N,3], wsum [N,1]).

    k0_blocks: optional traced scalar — first live TILE_SH block when the
    caller's points are liveness-sorted (dead prefix skipped fwd+bwd;
    its output rows are garbage and must be masked downstream)."""
    B = motion_weights_vol.shape[0] - 1
    D, H, W = motion_weights_vol.shape[1:]
    assert D == H == W, "pallas forward_lbs_multi assumes cubic volumes"
    G = D
    K = motion_scale_Rs_fwd.shape[0]
    s, o = _grid_affine(cnl_bbox_min_xyz, cnl_bbox_scale_xyz, G)
    pts_g = pts * s[None, :] + o[None, :]
    # vol[b, z, y, x] -> [y*G+x, b*G+z] (shared kernel layout)
    vol_all = jnp.transpose(motion_weights_vol[:B], (2, 3, 0, 1)).reshape(
        G * G, B * G)
    # world output from grid input: p = (p_g - o)/s =>
    #   R' = R diag(1/s), T' = T - R (o/s)
    inv_s = 1.0 / s
    Rp = motion_scale_Rs_fwd * inv_s[None, None, None, :]   # [K,B,3,3]
    Tp = motion_Ts_fwd - jnp.einsum(
        "kbcj,j->kbc", Rp, o, precision=_HIGHEST)            # [K,B,3]
    # rmat [B, 12K], col (k, c, j) = 12k + 4c + j; j == 3 -> translation
    rmat = jnp.concatenate(
        [jnp.concatenate([Rp[k, :, c, :], Tp[k, :, c:c + 1]], axis=1)
         for k in range(K) for c in range(3)], axis=1)
    k0 = jnp.asarray(0 if k0_blocks is None else k0_blocks,
                     jnp.int32).reshape(1)
    out = shared_blend_core(pts_g, vol_all, rmat, k0, precision)
    wsum = out[:, 3 * K:3 * K + 1]
    m = jnp.maximum(wsum, 1e-4)
    acc = out[:, :3 * K].reshape(-1, K, 3)
    x_deform = jnp.transpose(acc, (1, 0, 2)) / m[None]
    return x_deform, wsum


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
