"""Fine-grained timing of the human-field components on the live chip.

Times fwd+bwd of each piece at production sizes (2 patches x 32^2 rays x
128 samples = 262144 samples) with the fetch-forced chained protocol.

Usage: python tools/profile_human.py [n_patches]
"""

import os
import sys
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

from hosnerf_tpu.data import synthetic
from hosnerf_tpu.models import embedders
from hosnerf_tpu.models.human_components import (CanonicalMLP,
                                                 MotionWeightVolumeDecoder,
                                                 NonRigidMLP)
from hosnerf_tpu.ops import lbs as lbs_ops
from hosnerf_tpu.utils.benchtools import force_value

N_PATCHES = int(sys.argv[1]) if len(sys.argv) > 1 else 2
RAYS = N_PATCHES * 32 * 32
S = 128
N = RAYS * S
ITERS = 10
WARMUP = 2

KEYS = [jax.random.fold_in(jax.random.key(7), i) for i in range(64)]


def chain_time(name, grad_fn, base_args):
    """grad_fn(prev, rng, *base_args) -> grads pytree; chained on prev."""
    st = {"prev": jnp.float32(0.0)}

    def run(i):
        g = grad_fn(st["prev"], KEYS[i], *base_args)
        st["prev"] = jax.tree.leaves(g)[0].ravel()[0]
    for i in range(WARMUP):
        run(i)
    force_value(st["prev"])
    t0 = time.perf_counter()
    for i in range(WARMUP, WARMUP + ITERS):
        run(i)
    force_value(st["prev"])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:34s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    print(f"n_patches={N_PATCHES} samples={N}", flush=True)
    rng = jax.random.key(0)
    pts = jax.random.normal(rng, (N, 3)) * 0.5
    B = 26
    G = 32
    m_sR = jax.random.normal(rng, (B, 3, 3)) * 0.1 + jnp.eye(3)
    m_T = jax.random.normal(rng, (B, 3)) * 0.1
    vol = jax.nn.softmax(jax.random.normal(rng, (B + 1, G, G, G)), axis=0)
    bbox_min = jnp.array([-1.0, -1.0, -1.0])
    bbox_scale = jnp.array([2.0 / 2, 2.0 / 2, 2.0 / 2])

    # ---- inverse_warp (pallas) fwd+bwd ----
    def inv_loss(prev, rngk, p, vol_):
        p = p + 1e-6 * jax.random.uniform(rngk, (1,))
        x, m = lbs_ops.inverse_warp(p, m_sR, m_T, vol_, bbox_min,
                                    bbox_scale, impl="pallas")
        return jnp.mean(x) + jnp.mean(m) + 0.0 * prev

    g = jax.jit(jax.grad(inv_loss, argnums=(2, 3)))
    chain_time("inverse_warp pallas fwd+bwd", g, (pts, vol))

    def inv_loss_x(prev, rngk, p, vol_):
        p = p + 1e-6 * jax.random.uniform(rngk, (1,))
        x, m = lbs_ops.inverse_warp(p, m_sR, m_T, vol_, bbox_min,
                                    bbox_scale, impl="xla")
        return jnp.mean(x) + jnp.mean(m) + 0.0 * prev

    gx = jax.jit(jax.grad(inv_loss_x, argnums=(2, 3)))
    chain_time("inverse_warp xla fwd+bwd", gx, (pts, vol))

    # ---- bone_weights + 2x apply_forward_lbs ----
    def fwd_loss(prev, rngk, p, vol_):
        p = p + 1e-6 * jax.random.uniform(rngk, (1,))
        w = lbs_ops.bone_weights(p, vol_, bbox_min, bbox_scale,
                                 impl="pallas")
        d1, _ = lbs_ops.apply_forward_lbs(w, p, m_sR, m_T)
        d2, _ = lbs_ops.apply_forward_lbs(w, p, m_sR, m_T)
        return jnp.mean(d1) + jnp.mean(d2) + 0.0 * prev

    gf = jax.jit(jax.grad(fwd_loss, argnums=(2, 3)))
    chain_time("bone_weights+2 fwd_lbs fwd+bwd", gf, (pts, vol))

    # ---- canonical MLP ----
    cnl = CanonicalMLP(mlp_depth=8, mlp_width=256,
                       compute_dtype=jnp.bfloat16)
    feat = jax.random.normal(rng, (N, 63 + 64))
    cp = cnl.init(rng, feat)["params"]

    def cnl_loss(prev, rngk, p, f):
        f = f + 1e-6 * jax.random.uniform(rngk, (1,))
        return jnp.mean(cnl.apply({"params": p}, f)) + 0.0 * prev

    gc = jax.jit(jax.grad(cnl_loss, argnums=(2,)))
    chain_time("cnl_mlp fwd+bwd", gc, (cp, feat))

    # ---- non-rigid MLP x3 ----
    nr = NonRigidMLP(mlp_depth=6, mlp_width=128, skips=(4,),
                     compute_dtype=jnp.bfloat16)
    emb = jax.random.normal(rng, (N, 36))
    cond = jax.random.normal(rng, (N, 75))
    np_ = nr.init(rng, emb, pts, cond)["params"]

    def nr_loss(prev, rngk, p, e):
        e = e + 1e-6 * jax.random.uniform(rngk, (1,))
        o1 = nr.apply({"params": p}, e, pts, cond)["xyz"]
        o2 = nr.apply({"params": p}, e, o1, cond)["xyz"]
        o3 = nr.apply({"params": p}, e, o2, cond)["xyz"]
        return jnp.mean(o3) + 0.0 * prev

    gn = jax.jit(jax.grad(nr_loss, argnums=(2,)))
    chain_time("nr_mlp x3 fwd+bwd", gn, (np_, emb))

    # ---- embedders: hannw x3 + fourier ----
    def emb_loss(prev, rngk, p):
        p = p + 1e-6 * jax.random.uniform(rngk, (1,))
        a = embedders.hann_alpha(10000.0, 10000, 50000, 6)
        e1 = embedders.hannw_fourier_embed(p, 6, a)
        e2 = embedders.hannw_fourier_embed(p + 0.1, 6, a)
        e3 = embedders.hannw_fourier_embed(p + 0.2, 6, a)
        e4 = embedders.fourier_embed(p, 10)
        return (jnp.mean(e1) + jnp.mean(e2) + jnp.mean(e3)
                + jnp.mean(e4) + 0.0 * prev)

    ge = jax.jit(jax.grad(emb_loss, argnums=(2,)))  # 2 = p (the points)
    chain_time("embedders (3 hannw + fourier)", ge, (pts,))

    # ---- motion weight volume decoder ----
    dec = MotionWeightVolumeDecoder(embedding_size=256, volume_size=32,
                                    total_bones=26)
    priors = jnp.asarray(np.random.default_rng(0).uniform(
        0.01, 1.0, (27, 32, 32, 32)).astype(np.float32))
    dp = dec.init(rng, priors)["params"]

    def dec_loss(prev, rngk, p):
        pr = priors + 1e-6 * jax.random.uniform(rngk, (1,))
        return jnp.mean(dec.apply({"params": p}, pr)) + 0.0 * prev

    gd = jax.jit(jax.grad(dec_loss, argnums=(2,)))
    chain_time("mweight_vol_decoder fwd+bwd", gd, (dp,))


if __name__ == "__main__":
    main()
