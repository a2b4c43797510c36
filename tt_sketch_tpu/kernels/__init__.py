from tt_sketch_tpu import config as _config  # noqa: F401  (enables x64)
