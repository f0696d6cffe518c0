from hosnerf_tpu.config import ginlite, yamlcfg  # noqa: F401
