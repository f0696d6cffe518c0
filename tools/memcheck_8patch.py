"""HBM accounting for the 8-patch stage-3 step across remat splits.

AOT-compiles the full joint train step (no execution) and prints XLA's
own memory analysis (argument/output/temp/generated-code bytes) for
each (scene_remat, human_remat) combination, so the 8-patch operating
point can keep dense exactly the trunks HBM allows. The recompute
price is wildly asymmetric at equal residual footprints (scene nerf
re-forward ~4.4 TFLOP vs human canonical ~1.1 TFLOP at 8x32x32 rays),
so the cheapest feasible split is "nerf dense, canonical remat".

Usage: python tools/memcheck_8patch.py [n_patches] [combo ...]
  combo: scene:human with values none|heavy|all, e.g. none:heavy
  (default: the four interesting splits)
"""

import os
import sys

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

from hosnerf_tpu.data import synthetic
from hosnerf_tpu.train import stage3

N_PATCHES = int(sys.argv[1]) if len(sys.argv) > 1 else 8
COMBOS = [tuple(c.split(":")) for c in sys.argv[2:]] or [
    ("heavy", "heavy"),   # current bench 8-patch config
    ("none", "heavy"),    # nerf dense (cheap split if it fits)
    ("heavy", "none"),    # canonical dense
    ("none", "none"),     # fully dense (expected OOM at 8 patches)
]

GB = 1024 ** 3


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          flush=True)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic.composed_batch(N_PATCHES, 32, grid_size=32).items()}
    results = []
    for scene_r, human_r in COMBOS:
        cfg = stage3.Stage3Config(
            n_patches=N_PATCHES, compute_dtype="bf16", remat="none",
            scene_remat=scene_r, human_remat=human_r)
        params, opt_state, sm, hm, opt = stage3.init_state(
            cfg, jax.random.key(0), batch)
        raw = stage3.make_train_step(cfg, sm, hm, opt)
        step = jax.jit(raw)
        try:
            compiled = step.lower(params, opt_state, None, batch,
                                  jnp.float32(100.0),
                                  jax.random.key(1)).compile()
            mem = compiled.memory_analysis()
            temp = getattr(mem, "temp_size_in_bytes", None)
            arg = getattr(mem, "argument_size_in_bytes", None)
            out = getattr(mem, "output_size_in_bytes", None)
            alias = getattr(mem, "alias_size_in_bytes", 0) or 0
            peak = (temp or 0) + (arg or 0) + (out or 0) - alias
            line = (f"scene={scene_r:5s} human={human_r:5s}  "
                    f"temp={temp / GB:6.2f} GB  args={arg / GB:5.2f} GB  "
                    f"out={out / GB:5.2f} GB  ~peak={peak / GB:6.2f} GB")
            results.append((scene_r, human_r, temp, peak))
        except Exception as e:  # noqa: BLE001 - report per-combo failure
            line = (f"scene={scene_r:5s} human={human_r:5s}  "
                    f"FAILED: {type(e).__name__}: {str(e)[:200]}")
        print(line, flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
