from hosnerf_tpu.parallel import mesh  # noqa: F401
