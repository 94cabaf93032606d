from det3d_tpu.utils.timing import StageTimers, time_fn  # noqa: F401
