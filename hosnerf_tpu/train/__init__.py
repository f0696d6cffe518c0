from hosnerf_tpu.train import schedules, stage1  # noqa: F401
