from hosnerf_tpu.eval import io, metrics  # noqa: F401
