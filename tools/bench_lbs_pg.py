"""Microbench: pair-grid vs dense Pallas inverse-LBS on the live chip,
with PRODUCTION-SHAPED points (ray samples from the synthetic human
batch, not an isotropic blob — the pair density, and therefore the
pair-grid win, depends on the sample distribution).

Times fwd and fwd+bwd with the fetch-forced chained protocol and prints
the measured pair density (n_pairs / capacity).

Usage: python tools/bench_lbs_pg.py [n_patches]
"""

import os
import sys
import time

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
from hosnerf_tpu.ops import lbs as lbs_ops
from hosnerf_tpu.ops.pallas import lbs as plbs
from hosnerf_tpu.utils.benchtools import force_value

N_PATCHES = int(sys.argv[1]) if len(sys.argv) > 1 else 2
S = 128
ITERS = 10
WARMUP = 2
KEYS = [jax.random.fold_in(jax.random.key(7), i) for i in range(64)]


def chain(name, fn):
    prev = jnp.float32(0.0)
    for i in range(WARMUP):
        prev = fn(prev, KEYS[i])
    force_value(prev)
    t0 = time.perf_counter()
    for i in range(WARMUP, WARMUP + ITERS):
        prev = fn(prev, KEYS[i])
    force_value(prev)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:30s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    b = {k: jnp.asarray(v) for k, v in
         synthetic.human_batch(N_PATCHES, 32, grid_size=32).items()}
    R = b["rays_o"].shape[0]
    t_vals = jnp.linspace(0.0, 1.0, S)
    z_vals = b["near"] * (1 - t_vals)[None, :] + b["far"] * t_vals[None, :]
    pts = (b["rays_o"][:, None, :]
           + b["rays_d"][:, None, :] * z_vals[..., None]).reshape(-1, 3)
    m_sR, m_T, _, _ = body_math.motion_bases(
        b["dst_Rs"], b["dst_Ts"], b["cnl_gtfms"])
    vol = jax.nn.softmax(jax.random.normal(
        jax.random.key(3), (27, 32, 32, 32)), axis=0)
    bmin = b["cnl_bbox_min_xyz"]
    bscale = b["cnl_bbox_scale_xyz"]
    n = pts.shape[0]
    print(f"rays={R} samples={n}", flush=True)

    # measured pair density
    G = 32
    s_, o_ = plbs._grid_affine(bmin, bscale, G)
    rg = (m_sR * s_[None, :, None]).reshape(26, 9)
    tg = m_T * s_[None, :] + o_[None, :]
    NGB, BPD = plbs._pg_pad_shapes(26, G)
    rgp = jnp.pad(rg, ((0, BPD - 26), (0, 0)))
    tgp = jnp.pad(tg, ((0, BPD - 26), (0, 0)))
    pts_p, _ = plbs._pad_rows(pts, plbs.TILE_PG)
    perm, _ = plbs._group_sort_perm(pts_p)
    _, _, n_pairs = plbs._build_pairs(pts_p[perm], rgp, tgp, 26, BPD, G)
    cap = (pts_p.shape[0] // plbs.TILE_PG) * (BPD // NGB)
    print(f"pair density: {int(n_pairs)}/{cap} = "
          f"{int(n_pairs) / cap:.3f} (TILE_PG={plbs.TILE_PG})", flush=True)

    for impl in ("pallas_dense", "pallas"):
        @jax.jit
        def fwd(prev, k, impl=impl):
            p = pts + 1e-6 * jax.random.uniform(k, (1,))
            x, m = lbs_ops.inverse_warp(p, m_sR, m_T, vol, bmin, bscale,
                                        impl=impl)
            return jnp.mean(x) + jnp.mean(m) + 0.0 * prev

        chain(f"{impl} fwd", fwd)

        def loss(p, vol_, prev, k, impl=impl):
            p = p + 1e-6 * jax.random.uniform(k, (1,))
            x, m = lbs_ops.inverse_warp(p, m_sR, m_T, vol_, bmin, bscale,
                                        impl=impl)
            return jnp.mean(x) + jnp.mean(m) + 0.0 * prev

        g = jax.jit(jax.grad(loss, argnums=(0, 1)))

        @jax.jit
        def fb(prev, k, impl=impl):
            gp, gv = g(pts, vol, prev, k)
            return gp.ravel()[0] + gv.ravel()[0]

        chain(f"{impl} fwd+bwd", fb)


if __name__ == "__main__":
    main()
