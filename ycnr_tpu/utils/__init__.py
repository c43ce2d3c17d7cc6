from ycnr_tpu.utils.profiling import phase_timer, trace  # noqa: F401
