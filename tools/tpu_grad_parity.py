"""Sparse-vs-dense FULL-STEP gradient parity ON REAL TPU HARDWARE.

The interpret-mode tests (tests/test_human_sparse.py) zero-fill pallas
output buffers, so they cannot detect uninitialized-HBM leaks from the
live-suffix kernels' skipped blocks (the round-5 daux bug class:
garbage rows summed into cond/cond_prev gradients by the broadcast
VJP). This tool compares every parameter gradient of the production
stage-3 loss between HOSNERF_SPARSE=1 and =0 on the live chip.

Measured 2026-08-20 (v5e, post-fix): worst relative diff 2.4e-6
(pose_decoder head bias), PASS.

Usage: python tools/tpu_grad_parity.py
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

from hosnerf_tpu.data import synthetic
from hosnerf_tpu.train import stage3

TOL = 5e-3  # bf16 kernels; measured parity is ~1e-6


def main():
    cfg = stage3.Stage3Config(n_patches=2, compute_dtype="bf16")
    batch = {k: jnp.asarray(v) for k, v in
             synthetic.composed_batch(2, 32, grid_size=32).items()}
    params, _, sm, hm, _ = stage3.init_state(cfg, jax.random.key(0),
                                             batch)
    loss_fn = stage3.make_loss_fn(cfg, sm, hm, None)

    def grads(sparse: bool):
        os.environ["HOSNERF_SPARSE"] = "1" if sparse else "0"
        try:
            g = jax.jit(jax.grad(
                lambda p: loss_fn(p, None, batch, jnp.float32(100.0),
                                  jnp.int32(0), jax.random.key(7))[0]))(
                params)
            return jax.tree.map(np.asarray, g)
        finally:
            os.environ.pop("HOSNERF_SPARSE", None)

    gs, gd = grads(True), grads(False)
    worst, worst_name, bad = 0.0, "", 0
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(gs),
            jax.tree_util.tree_leaves_with_path(gd)):
        name = jax.tree_util.keystr(path)
        if not np.isfinite(a).all():
            print("NONFINITE sparse grad:", name, flush=True)
            bad += 1
            continue
        scale = max(float(np.abs(b).max()), 1e-9)
        rel = float(np.abs(a - b).max()) / scale
        if rel > worst:
            worst, worst_name = rel, name
        if rel > TOL:
            print(f"MISMATCH {name}: rel={rel:.3e}", flush=True)
            bad += 1
    print(f"worst rel diff: {worst:.3e} at {worst_name}", flush=True)
    print("TPU GRAD PARITY:", "FAIL" if bad else "PASS", flush=True)
    raise SystemExit(1 if bad else 0)


if __name__ == "__main__":
    main()
