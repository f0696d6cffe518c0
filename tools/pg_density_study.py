"""Offline study: executed pair density of the pair-grid LBS kernel
under candidate sort keys and tile-alive predicates, on production-shaped
ray samples. No kernel changes — pure XLA counting.

Variants:
  morton+aabb   : shipped round-3 behavior (baseline)
  morton+exact  : Morton sort, tile-alive = OR of per-sample exact
                  tap-support tests (strictly kills AABB false-positives)
  sig+exact     : sort groups by their OR'd 26-bit support signature
                  (support-homogeneous tiles), exact predicate
  sigmorton+exact: primary signature, secondary Morton (lexicographic)

Usage: python tools/pg_density_study.py [n_patches]
"""

import os
import sys

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

from hosnerf_tpu.core import body as body_math
from hosnerf_tpu.data import synthetic
from hosnerf_tpu.ops.pallas import lbs as plbs

N_PATCHES = int(sys.argv[1]) if len(sys.argv) > 1 else 2
S = 128
G = 32
B = 26
EPS = 1e-5  # predicate widening (ADVICE r3 #2)


def sample_support(pts, rgp, tgp):
    """[N, BPD] bool: exact per-sample tap support (any nonzero hat tap)."""
    # f[n, b, c] = sum_k pts[n,k] * R[b,c,k] + T[b,c]
    R = rgp.reshape(-1, 3, 3)
    f = jnp.einsum("nk,bck->nbc", pts, R) + tgp[None]
    return jnp.all((f > -1.0 - EPS) & (f < G + EPS), axis=-1)


def count_pairs(pts_sorted, rgp, tgp, BPD, NGB, mode):
    n_tiles = pts_sorted.shape[0] // plbs.TILE_PG
    if mode == "aabb":
        _, _, n_pairs = plbs._build_pairs(pts_sorted, rgp, tgp, B, BPD, G)
        return int(n_pairs), n_tiles * (BPD // NGB)
    sup = sample_support(pts_sorted, rgp, tgp)            # [n, BPD]
    sup = sup & (jnp.arange(BPD) < B)[None, :]
    tile_alive = jnp.any(
        sup.reshape(n_tiles, plbs.TILE_PG, BPD), axis=1)  # [n_tiles, BPD]
    acount = jnp.sum(tile_alive, axis=1)
    nq = jnp.maximum(-(-acount // NGB), 1)                # quad0 forced
    return int(jnp.sum(nq)), n_tiles * (BPD // NGB)


def main():
    b = {k: jnp.asarray(v) for k, v in
         synthetic.human_batch(N_PATCHES, 32, grid_size=32).items()}
    t_vals = jnp.linspace(0.0, 1.0, S)
    z_vals = b["near"] * (1 - t_vals)[None, :] + b["far"] * t_vals[None, :]
    pts = (b["rays_o"][:, None, :]
           + b["rays_d"][:, None, :] * z_vals[..., None]).reshape(-1, 3)
    m_sR, m_T, _, _ = body_math.motion_bases(
        b["dst_Rs"], b["dst_Ts"], b["cnl_gtfms"])
    s_, o_ = plbs._grid_affine(b["cnl_bbox_min_xyz"],
                               b["cnl_bbox_scale_xyz"], G)
    rg = (m_sR * s_[None, :, None]).reshape(B, 9)
    tg = m_T * s_[None, :] + o_[None, :]
    NGB, BPD = plbs._pg_pad_shapes(B, G)
    rgp = jnp.pad(rg, ((0, BPD - B), (0, 0)))
    tgp = jnp.pad(tg, ((0, BPD - B), (0, 0)))
    pts_p, n = plbs._pad_rows(pts, plbs.TILE_PG)
    print(f"samples={n} TILE_PG={plbs.TILE_PG} NGB={NGB}", flush=True)

    # true per-(sample, bone) in-support density (the floor)
    sup = sample_support(pts_p[:n], rgp, tgp)[:, :B]
    print(f"true (sample,bone) density: {float(jnp.mean(sup)):.3f}",
          flush=True)

    gsz = plbs.SORT_GROUP
    ngroups = pts_p.shape[0] // gsz
    grp = pts_p.reshape(ngroups, gsz, 3)

    # morton key (centroid), as shipped
    ctr = jnp.mean(grp, axis=1)
    lo, hi = jnp.min(ctr, 0), jnp.max(ctr, 0)
    qf = (ctr - lo) / jnp.maximum(hi - lo, 1e-9) * plbs.SORT_CELLS
    q = jnp.clip(qf.astype(jnp.int32), 0, plbs.SORT_CELLS - 1)
    morton = plbs._morton3(q)

    # group OR-signature key
    sup_p = sample_support(pts_p, rgp, tgp)[:, :B]
    gsig = jnp.any(sup_p.reshape(ngroups, gsz, B), axis=1)
    sig = jnp.sum(gsig.astype(jnp.int64)
                  * (1 << jnp.arange(B, dtype=jnp.int64))[None], axis=1)
    print(f"distinct signatures: "
          f"{int(jnp.unique(sig, size=ngroups, fill_value=-1).size)}"
          f" (upper bound print; see below)", flush=True)
    uniq = np.unique(np.asarray(sig))
    print(f"distinct group signatures: {uniq.size} / {ngroups} groups",
          flush=True)

    def expand(gperm):
        lane = jnp.arange(gsz)[None, :]
        return (gperm[:, None] * gsz + lane).reshape(-1)

    variants = {
        "morton": jnp.argsort(morton),
        "sig": jnp.argsort(sig),
        "sigmorton": jnp.lexsort((morton, sig)),
        "mortonsig": jnp.lexsort((sig, morton)),
    }
    for name, gperm in variants.items():
        pts_s = pts_p[expand(gperm)]
        for mode in (("aabb", "exact") if name == "morton" else ("exact",)):
            np_, cap = count_pairs(pts_s, rgp, tgp, BPD, NGB, mode)
            print(f"{name:10s} + {mode:5s}: {np_:6d}/{cap} = "
                  f"{np_ / cap:.3f}", flush=True)


if __name__ == "__main__":
    main()
