"""Offline study: SAMPLE-level liveness on production-shaped batches.

The reference only forward-warps (and cycle/flow-losses) samples with
fg_likelihood_mask > threshold, via boolean indexing
(ref: 2nd.../core/nets/human_nerf/network.py:503-535). This tool
measures what fraction of samples is actually alive — the bound that
round 5's liveness-sorted sparse pipeline (models/human.py::
_samples_sorted) realizes: tile_alive below IS the fraction of
fused-MLP / forward-LBS grid work the production path executes.

Prints:
  inv_alive   : fraction of samples with ANY inverse-bone tap support
                (these produce nonzero fg_mask; the rest are dead rows)
  fg_alive    : fraction with fg_mask > 0.005 after the real warp at
                init params (what the cycle_mask keeps)
  tile_alive  : fraction of TILE_PG-sample tiles (after the pair-grid's
                sig+morton sort) containing >= 1 inv-alive sample — the
                fraction of forward-branch work a tile-level compaction
                must keep.

Usage: JAX_PLATFORMS=cpu python tools/fg_density_study.py [n_patches]
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

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
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from hosnerf_tpu.core import body as body_math
from hosnerf_tpu.data import synthetic
from hosnerf_tpu.train import stage3

N_PATCHES = int(sys.argv[1]) if len(sys.argv) > 1 else 2
G = 32
B = 26
EPS = 1e-5


def main():
    os.environ["HOSNERF_MLP_IMPL"] = "flax"
    cfg = stage3.Stage3Config(n_patches=N_PATCHES, compute_dtype=None,
                              lbs_impl="xla")
    batch = {k: jnp.asarray(v) for k, v in
             synthetic.composed_batch(N_PATCHES, 32, grid_size=G).items()}
    params, _, _, human_model, _ = stage3.init_state(
        cfg, jax.random.key(0), batch)

    out = human_model.apply({"params": params["human"]}, batch,
                            100.0, jnp.int32(0), rng=jax.random.key(1),
                            perturb=0.0, is_train=True)
    fg = np.asarray(out["pts_mask"]).reshape(-1)
    print(f"samples                 {fg.size}")
    print(f"fg_alive (>0.005)       {np.mean(fg > 0.005):.3f}")
    print(f"fg_alive (>0)           {np.mean(fg > 0.0):.3f}")

    # exact inverse tap support (any bone)
    dst_Rs, dst_Ts = batch["dst_Rs"], batch["dst_Ts"]
    m_sR, m_T, _, _ = body_math.motion_bases(dst_Rs, dst_Ts,
                                             batch["cnl_gtfms"])
    scale = batch["cnl_bbox_scale_xyz"] * (G - 1) / 2.0
    mn = batch["cnl_bbox_min_xyz"]
    rg = (m_sR * scale[None, :, None]).reshape(B, 9)
    tg = (m_T - mn[None]) * scale[None]
    pts = np.asarray(out["newsmpl_pts"]).reshape(-1, 3)
    R = rg.reshape(B, 3, 3)
    f = jnp.einsum("nk,bck->nbc", jnp.asarray(pts), R) + tg[None]
    sup = np.asarray(jnp.all((f > -1.0 - EPS) & (f < G + EPS), axis=-1))
    inv_alive = sup.any(axis=1)
    print(f"inv_alive (any bone)    {inv_alive.mean():.3f}")
    print(f"pair density (true)     {sup.mean():.3f}")

    # tile-level liveness under a (liveness, morton) sort at TILE sizes
    from hosnerf_tpu.ops.pallas import lbs as plbs
    n = pts.shape[0]
    T_MAX = 256  # pad to the largest tile studied so no tail is dropped
    n_pad = -(-n // max(plbs.TILE_PG, T_MAX)) * max(plbs.TILE_PG, T_MAX)
    pts_p = np.zeros((n_pad, 3), np.float32)
    pts_p[:n] = pts
    sup_p = np.zeros((n_pad, B), bool)
    sup_p[:n] = sup
    perm, _ = plbs._support_sort_perm(jnp.asarray(sup_p))
    inv_alive_pad = np.zeros(n_pad, bool)
    inv_alive_pad[:n] = inv_alive
    alive_sorted = inv_alive_pad[np.asarray(perm)]
    for T in (64, 128, T_MAX):
        tiles = alive_sorted.reshape(-1, T)
        print(f"tile_alive @T={T:<4d}      {tiles.any(axis=1).mean():.3f}")

    # cnl-space support of the forward warp INPUTS (cnl_pts: the points
    # fed to forward_warp_multi, i.e. where the shared-tap weight volume
    # is actually sampled in the forward branch)
    cnl = np.asarray(out["cnl_pts"])
    fwd_f = (cnl - np.asarray(mn)[None]) * np.asarray(scale)[None]
    fwd_in = ((fwd_f > -1 - EPS) & (fwd_f < G + EPS)).all(axis=1)
    print(f"fwd in-grid             {fwd_in.mean():.3f}")


if __name__ == "__main__":
    main()
