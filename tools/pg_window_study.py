"""Study: per-(tile, alive bone) grid-coordinate ranges under candidate
sample orders — feasibility of WINDOWED pair-grid kernels (x-window
narrows the one-hot build + matmul K; z-window narrows the matmul N).

For each (tile, bone) alive pair, the windowed kernel needs the tile's
tap support to fit [ws, ws+W): range(floor(f)) <= W - 2. Reports, for
W in {8, 16, 24}, the fraction of alive pairs whose fx (and fz) ranges
fit, under 'sig' (round-4 shipped) and 'sigmorton' orders.

Usage: python tools/pg_window_study.py [n_patches]
"""

import sys

import jax

sys.path.insert(0, "/root/repo")
try:
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

from hosnerf_tpu.core import body as body_math
from hosnerf_tpu.data import synthetic
from hosnerf_tpu.ops.pallas import lbs as plbs

N_PATCHES = int(sys.argv[1]) if len(sys.argv) > 1 else 2
S, G, B = 128, 32, 26


def main():
    b = {k: jnp.asarray(v) for k, v in
         synthetic.human_batch(N_PATCHES, 32, grid_size=32).items()}
    t_vals = jnp.linspace(0.0, 1.0, S)
    z_vals = b["near"] * (1 - t_vals)[None] + b["far"] * t_vals[None]
    pts = (b["rays_o"][:, None] + b["rays_d"][:, None]
           * z_vals[..., None]).reshape(-1, 3)
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

    sup = plbs._sample_support(pts_p, rgp, tgp, G)
    sup = sup & (jnp.arange(BPD) < B)[None, :]
    sup = sup & (jnp.arange(pts_p.shape[0]) < n)[:, None]

    # morton key per group (reuse shipped machinery)
    gsz = plbs.SORT_GROUP
    ngroups = pts_p.shape[0] // gsz
    grp = pts_p.reshape(ngroups, gsz, 3)
    ctr = jnp.mean(grp, axis=1)
    lo, hi = jnp.min(ctr, 0), jnp.max(ctr, 0)
    qf = (ctr - lo) / jnp.maximum(hi - lo, 1e-9) * plbs.SORT_CELLS
    q = jnp.clip(qf.astype(jnp.int32), 0, plbs.SORT_CELLS - 1)
    morton = plbs._morton3(q)
    gsig = jnp.any(sup.reshape(ngroups, gsz, BPD), axis=1)
    sig = jnp.sum(gsig.astype(jnp.int32)
                  << jnp.arange(BPD, dtype=jnp.int32)[None], axis=1)

    orders = {
        "sig": jnp.argsort(sig),
        "sigmorton": jnp.lexsort((morton, sig)),
    }
    lane = jnp.arange(gsz)[None, :]
    R3 = rgp.reshape(BPD, 3, 3)
    for name, gperm in orders.items():
        perm = (gperm[:, None] * gsz + lane).reshape(-1)
        pts_s = np.asarray(pts_p[perm])
        sup_s = np.asarray(sup[perm])
        n_tiles = pts_s.shape[0] // plbs.TILE_PG
        f = np.einsum("nk,bck->nbc", pts_s, np.asarray(R3)) \
            + np.asarray(tgp)[None]                  # [n, BPD, 3]
        fl = np.clip(np.floor(f), -1, G).astype(np.int32)
        tiles_f = fl.reshape(n_tiles, plbs.TILE_PG, BPD, 3)
        tiles_sup = sup_s.reshape(n_tiles, plbs.TILE_PG, BPD)
        alive = tiles_sup.any(axis=1)                # [n_tiles, BPD]
        # range of floor(f) over SUPPORTED samples only (others get
        # zero taps anyway — the window must cover supported taps)
        big = 10**6
        fmin = np.where(tiles_sup[..., None], tiles_f, big).min(axis=1)
        fmax = np.where(tiles_sup[..., None], tiles_f, -big).max(axis=1)
        rng = np.where(alive[..., None], fmax - fmin, 0)   # [nt, BPD, 3]
        rr = rng[alive]                              # [n_alive, 3]
        print(f"--- {name}: alive pairs={rr.shape[0]} "
              f"(density {alive[:, :B].sum() / (n_tiles * B):.3f})")
        for W in (8, 16, 24):
            fit = (rr <= W - 2)
            both = fit[:, 0] & fit[:, 2]
            print(f"  W={W:2d}: fx fits {fit[:, 0].mean():.2%}  "
                  f"fy {fit[:, 1].mean():.2%}  fz {fit[:, 2].mean():.2%}  "
                  f"fx&fz {both.mean():.2%}")
        print(f"  mean ranges fx={rr[:, 0].mean():.1f} "
              f"fy={rr[:, 1].mean():.1f} fz={rr[:, 2].mean():.1f}")


if __name__ == "__main__":
    main()
