"""Prototype: validate the Mosaic features the pair-grid LBS kernel needs.

Tested on the live chip (and CPU interpret mode):
  1. dynamic grid length (traced scalar number of grid steps)
  2. PrefetchScalarGridSpec with output index_map driven by a prefetched
     pair->tile array, consecutive revisiting + pl.when first-visit init
  3. in-kernel dynamic leading-axis slice of a resident VMEM volume
  4. in-kernel dynamic-index += accumulation into a full-size output

Usage: python tools/proto_pairgrid.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 128          # tile rows
G = 32
BPD = 8          # bones incl. dummy
NGB = 2          # bones per pair


def kernel(ptile_ref, pbone_ref, pts_ref, vol_ref, out_ref, dvol_ref):
    i = pl.program_id(0)
    first = jnp.logical_or(
        i == 0, ptile_ref[i] != ptile_ref[jnp.maximum(i - 1, 0)])

    @pl.when(i == 0)
    def _init_dvol():
        dvol_ref[:, :, :] = jnp.zeros_like(dvol_ref)

    x = pts_ref[:, 0:1]                       # [T,1]
    contrib = jnp.zeros((T, G), jnp.float32)
    for j in range(NGB):
        b = pbone_ref[i * NGB + j]
        vslab = vol_ref[b]                    # dynamic leading-axis slice
        contrib = contrib + x * jnp.sum(vslab, axis=0)[None, :]
        # dynamic-index accumulate
        dvol_ref[b, :, :] += jnp.full((G, G), 1.0, jnp.float32)

    @pl.when(first)
    def _set():
        out_ref[:, :] = contrib

    @pl.when(jnp.logical_not(first))
    def _acc():
        out_ref[:, :] += contrib


def run(n_pairs, ptile, pbone, pts, vol, n_tiles, interpret):
    grid = (n_pairs,)                         # DYNAMIC length
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((T, 1), lambda i, pt, pb: (pt[i], 0)),
                pl.BlockSpec((BPD, G, G), lambda i, pt, pb: (0, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((T, G), lambda i, pt, pb: (pt[i], 0)),
                pl.BlockSpec((BPD, G, G), lambda i, pt, pb: (0, 0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * T, G), jnp.float32),
            jax.ShapeDtypeStruct((BPD, G, G), jnp.float32),
        ],
        interpret=interpret,
    )(ptile, pbone, pts, vol)


def main():
    interpret = jax.default_backend() != "tpu"
    print("backend:", jax.default_backend(), "interpret:", interpret)
    n_tiles = 4
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(n_tiles * T, 1)).astype(np.float32))
    vol = jnp.asarray(rng.normal(size=(BPD, G, G)).astype(np.float32))

    # pairs: tile 0 -> 2 pairs, tile 1 -> 1, tile 2 -> 3, tile 3 -> 1 (=7)
    ptile = np.array([0, 0, 1, 2, 2, 2, 3], np.int32)
    pbone = np.array([[0, 1], [2, 3], [1, 7], [4, 5], [6, 7], [0, 2], [3, 3]],
                     np.int32)
    CAP = 12
    ptile_p = np.concatenate([ptile, np.zeros(CAP - 7, np.int32)])
    pbone_p = np.concatenate([pbone, np.zeros((CAP - 7, NGB), np.int32)])

    fn = jax.jit(functools.partial(run, n_tiles=n_tiles,
                                   interpret=interpret),
                 static_argnums=())
    out, dvol = fn(jnp.int32(7), jnp.asarray(ptile_p),
                   jnp.asarray(pbone_p.reshape(-1)), pts, vol)
    out = np.asarray(out)
    dvol = np.asarray(dvol)

    # reference
    ref = np.zeros((n_tiles * T, G), np.float32)
    ref_dvol = np.zeros((BPD, G, G), np.float32)
    x = np.asarray(pts)
    v = np.asarray(vol)
    for p in range(7):
        t = ptile[p]
        sl = slice(t * T, (t + 1) * T)
        for j in range(NGB):
            b = pbone[p, j]
            ref[sl] += x[sl] * v[b].sum(0)[None, :]
            ref_dvol[b] += 1.0
    err = np.abs(out - ref).max()
    derr = np.abs(dvol - ref_dvol).max()
    print("out err:", err, "dvol err:", derr)
    assert err < 1e-4 and derr < 1e-6, "MISMATCH"

    # dynamic length: shorter grid must skip pairs
    out2, _ = fn(jnp.int32(2), jnp.asarray(ptile_p),
                 jnp.asarray(pbone_p.reshape(-1)), pts, vol)
    out2 = np.asarray(out2)
    ref2 = np.zeros_like(ref)
    for p in range(2):
        t = ptile[p]
        sl = slice(t * T, (t + 1) * T)
        for j in range(NGB):
            ref2[sl] += x[sl] * v[pbone[p, j]].sum(0)[None, :]
    err2 = np.abs(out2[:T] - ref2[:T]).max()   # only tile 0 written
    print("dynamic-length tile0 err:", err2)
    assert err2 < 1e-4
    print("ALL OK")


if __name__ == "__main__":
    main()
