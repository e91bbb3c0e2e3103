from hippomm_tpu.utils.timers import StageTimer, Throughput  # noqa: F401
