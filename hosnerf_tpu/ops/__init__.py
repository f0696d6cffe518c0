from hosnerf_tpu.ops import grid_sample, lbs, merge  # noqa: F401
