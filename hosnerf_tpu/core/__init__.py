from hosnerf_tpu.core import body, geopoly, rays, render, stepfun  # noqa: F401
