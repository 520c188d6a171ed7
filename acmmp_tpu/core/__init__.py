from acmmp_tpu.core.geometry import Camera  # noqa: F401
