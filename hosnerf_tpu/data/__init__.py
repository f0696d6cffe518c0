from hosnerf_tpu.data import synthetic  # noqa: F401
