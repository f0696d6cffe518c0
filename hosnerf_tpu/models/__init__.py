from hosnerf_tpu.models import scene  # noqa: F401
