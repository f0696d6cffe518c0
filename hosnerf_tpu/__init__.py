"""HOSNeRF-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for dynamic
human-object-scene radiance fields from monocular video.

Re-designed from scratch with the capabilities of TencentARC/HOSNeRF
(ICCV 2023): a state-conditional mip-NeRF 360 background model (stage 1),
a state-conditional dynamic human-object model with inverse-LBS skinning
(stage 2), and the composed, jointly fine-tuned model (stage 3).

Layering (bottom-up):
  core/      pure-jnp ray math, step functions, rendering, body/skeleton math
  ops/       device ops: trilinear grid sampling, fused LBS, sortless merge
             (XLA-shaped formulations; see ops/pallas for the measured
             kernel-vs-XLA accounting)
  models/    flax.linen fields: SceneField, HumanObjectField, ComposedField, LPIPS
  data/      CPU-side input pipeline (360-v2 scene loader, per-frame human data)
  train/     pjit train steps per stage, optimizers/schedules, checkpoints
  eval/      metrics (PSNR/SSIM/LPIPS) and renderers
  parallel/  device mesh + sharding helpers
  config/    typed config tree with gin/yaml-compatible surfaces
"""

__version__ = "0.1.0"
